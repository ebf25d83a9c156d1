package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the standard event-stream segmentation
  * (a new session starts when the gap to the previous event of the same
  * key exceeds `gap`).
  *
  * Classic two-window formulation over ONE shuffle on the key: lag() to
  * flag session starts, running sum of flags to number sessions. Both
  * windows share the same partitioning+ordering so Spark plans a single
  * sort + a single WindowExec. At 100 TB the shuffle is keyed by the
  * session key (user), which is the natural high-cardinality partitioner
  * — no global ordering is ever required.
  */
object Sessionize {

  /** Append a `session_seq` column (1-based per key).
    *
    * @param tsCol   numeric/orderable timestamp column
    * @param gap     same units as tsCol; gap STRICTLY greater starts a
    *                new session
    * @param tiebreak unique column ordering events at equal timestamps
    */
  def sessionize(events: DataFrame, keys: Seq[String], tsCol: String,
      gap: Long, tiebreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(tiebreak))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn("__new",
        when(col("__prev_ts").isNull ||
          col(tsCol) - col("__prev_ts") > gap, 1).otherwise(0))
      .withColumn("session_seq", sum(col("__new")).over(run))
      .drop("__prev_ts", "__new")
  }

  /** Per-session rollup: (keys…, session_seq, n_events, start, end). */
  def sessions(events: DataFrame, keys: Seq[String], tsCol: String,
      gap: Long, tiebreak: String): DataFrame =
    sessionize(events, keys, tsCol, gap, tiebreak)
      .groupBy((keys :+ "session_seq").map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
}
