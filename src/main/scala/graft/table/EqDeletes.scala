package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.catalog.DataFileEntry

/** Equality-delete application, shared by the native scan assembly and
  * the SQL MOR relation (one definition of the semantics, two plan
  * entry points).
  *
  * An equality-delete file (`equalityKey = Some("col")` or, for
  * COMPOSITE keys, `Some("col1,col2")` — column names cannot contain
  * commas, enforced at write — a parquet of deleted key tuples)
  * applies to exactly the DATA files that precede it in replay order —
  * so `DELETE WHERE k = 5` followed by an append of a new `k = 5` row
  * leaves the new row visible (keyed-CDC semantics; Iceberg v2
  * sequence-number rules, expressed here by log position; Iceberg's
  * own equality deletes are field-LIST-valued for the same composite
  * CDC keys). The subtraction is a broadcast anti-join per (segment,
  * delete) on all key columns: delete files are predicate-sized, so
  * the broadcast is bounded and the data side never shuffles.
  *
  * Null keys: an equality delete never removes null-keyed rows (the
  * anti-join's `=` is null-rejecting on both sides, per column),
  * matching SQL `(k1, k2) IN (…)` semantics. */
object EqDeletes {

  def isEq(f: DataFileEntry): Boolean =
    f.deleteFile.contains(true) && f.equalityKey.isDefined
  def isPos(f: DataFileEntry): Boolean =
    f.deleteFile.contains(true) && f.equalityKey.isEmpty

  /** Key columns of an equality-delete entry (comma-encoded). */
  def keyCols(f: DataFileEntry): Seq[String] =
    f.equalityKey.get.split(',').toSeq

  /** Segment the replay-ordered entries into (data files, equality
    * deletes that apply to them) groups: consecutive data files with
    * the same downstream-delete suffix share a segment, so the number
    * of segments is ≤ live equality deletes + 1 (bounded by the replay
    * window, not the table). `keepData` applies metadata pruning to
    * data entries without disturbing the sequence. */
  def segments(ordered: Seq[DataFileEntry], keepData: DataFileEntry => Boolean)
      : Seq[(Seq[DataFileEntry], Seq[DataFileEntry])] = {
    // walk backwards accumulating the eq-delete suffix
    val out = scala.collection.mutable.ListBuffer
      .empty[(Seq[DataFileEntry], Seq[DataFileEntry])]
    var suffix = List.empty[DataFileEntry]
    var bucket = List.empty[DataFileEntry]
    ordered.reverse.foreach { f =>
      if (isEq(f)) {
        if (bucket.nonEmpty) { out.prepend((bucket, suffix)); bucket = Nil }
        suffix = f :: suffix
      } else if (!f.deleteFile.contains(true) && keepData(f)) {
        bucket = f :: bucket
      }
    }
    if (bucket.nonEmpty) out.prepend((bucket, suffix))
    out.toList
  }

  /** The data side of a scan with equality deletes applied: per-segment
    * parquet reads, each anti-joined against its applicable delete-key
    * sets, unioned. `withMeta` additionally carries
    * `_metadata.file_path` / `_metadata.row_index` (as `__scan_file` /
    * `__scan_pos`) through the union for a downstream position-vector
    * subtraction — metadata columns must be selected inside each read. */
  def readSubtracted(spark: SparkSession, readSchema: StructType,
      segs: Seq[(Seq[DataFileEntry], Seq[DataFileEntry])],
      withMeta: Boolean): DataFrame = {
    val parts = segs.map { case (data, eqDels) =>
      val base0 = spark.read.schema(readSchema).parquet(data.map(_.path): _*)
      val base = if (!withMeta) base0
        else base0.select(col("*"),
          col("_metadata.file_path").as("__scan_file"),
          col("_metadata.row_index").as("__scan_pos"))
      eqDels.foldLeft(base) { (df, del) =>
        val cols = keyCols(del)
        val keys = broadcast(
          spark.read.parquet(del.path)
            .select(cols.zipWithIndex.map { case (c, i) =>
              col(c).as(s"__eqdel_$i") }: _*).distinct())
        df.join(keys,
          cols.zipWithIndex.map { case (c, i) => df(c) === col(s"__eqdel_$i") }
            .reduce(_ && _), "left_anti")
      }
    }
    parts.reduce(_.unionByName(_))
  }
}
