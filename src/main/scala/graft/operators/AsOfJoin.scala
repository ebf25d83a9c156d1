package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — the time-series operator
  * Spark has no built-in for (SURVEY.md §7.3 preference order a:
  * compose existing ops).
  *
  * Formulation: tag both sides, UNION them, sort within each key by
  * (timestamp, side, order), and carry the latest right-side payload
  * forward with `last(_, ignoreNulls)` over an unbounded-preceding
  * window; left rows then read their match off the carried columns.
  *
  * Scale properties: ONE shuffle on the join keys, no row explosion —
  * the classic range-join formulation (`left.join(right, lts >= rts)`
  * + keep-max) explodes to |L|×|R| per key before pruning; this stays
  * |L|+|R| and streams through the window operator. Left-join
  * semantics: unmatched left rows keep null payloads.
  */
object AsOfJoin {

  /** @param keys       equality keys (both sides)
    * @param leftTs     left timestamp column (any orderable type)
    * @param rightTs    right timestamp column (same type)
    * @param payload    right columns to attach to each left row
    * @param rightOrder unique right column breaking ties when several
    *                   right rows share (keys, ts) — the LAST in this
    *                   order wins, deterministically
    * @return left rows (all columns) + matched payload columns
    */
  def asofBackward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      rightOrder: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightSchema = right.schema

    def nullOf(c: String, from: org.apache.spark.sql.types.StructType): Column =
      lit(null).cast(from(c).dataType)

    // Unified layout: keys ++ __ts ++ __side ++ __ord ++ left payload ++ right payload
    // The whole right payload rides in ONE nullable struct so a match is
    // always a single consistent right ROW (per-column carry could mix
    // rows when payload columns are individually null).
    val rStructType = org.apache.spark.sql.types.StructType(
      payload.map(c => rightSchema(c)))

    val lPassthrough = leftCols.filterNot(c => keys.contains(c) || c == leftTs)
    val lNorm = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__side"),
        nullOf(rightOrder, rightSchema).as("__ord"),
        lit(null).cast(rStructType).as("__r")) ++
        lPassthrough.map(col): _*)
    val rNorm = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__side"),
        col(rightOrder).as("__ord"),
        struct(payload.map(col): _*).as("__r")) ++
        lPassthrough.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // right rows sort BEFORE left rows at equal ts → "at-or-before"
    // (ASOF lts >= rts); __ord makes duplicate-(key, ts) ties
    // deterministic.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = lNorm.unionByName(rNorm)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .withColumnRenamed("__ts", leftTs)
      .select(leftCols.map(col) ++ payload.map(c => col(s"__m.$c").as(c)): _*)
  }
}
