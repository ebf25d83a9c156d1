package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.catalog.{Catalog, Snapshot}
import graft.table.LakehouseTable
import graft.types.SchemaInfer

/** End-to-end ingest — parity with the reference's `run_pipeline`
  * (`main-polars.py:99-191`, lazy twin `main-polars-lazy.py:130-245`):
  *
  *   scan parquet → infer schema (sample-file policy) → create
  *   namespace+table with identity partition spec → partitioned write →
  *   ONE snapshot commit → history read-back.
  *
  * Differences that are the point of a Spark-first design (SURVEY §3.2):
  * the reference's driver-side loop — distinct partition values, then a
  * filter+write per value (`main-polars.py:113-119`) — collapses into a
  * single `partitionBy` write job: one pass over the data, all
  * partitions written in parallel, no driver-side value list. The
  * per-file append loop + transaction (`main-polars.py:165-186`)
  * collapses into the same single job committing ONE snapshot.
  */
object Ingest {

  final case class Report(
      table: LakehouseTable,
      snapshot: Snapshot,
      rowsIngested: Long)

  /** @param referenceTypePolicy apply the reference's 3-way+fallback
    *   type policy (§1.3) instead of keeping native Spark types. */
  def run(
      spark: SparkSession,
      catalog: Catalog,
      namespace: String,
      tableName: String,
      inputPath: String,
      partitionColumns: Seq[String] = Seq.empty,
      properties: Map[String, String] = Map.empty,
      referenceTypePolicy: Boolean = false): Report = {

    // S1/S3: parquet scan; Spark globs + parallelizes splits natively.
    val raw = spark.read.parquet(inputPath)
    ingestDf(catalog, namespace, tableName, raw, partitionColumns,
      properties, referenceTypePolicy)
  }

  def ingestDf(
      catalog: Catalog,
      namespace: String,
      tableName: String,
      raw: DataFrame,
      partitionColumns: Seq[String] = Seq.empty,
      properties: Map[String, String] = Map.empty,
      referenceTypePolicy: Boolean = false): Report = {

    // S8/§1.4: schema from the scan (Spark reads footers only), then the
    // chosen type policy.
    val tableSchema =
      if (referenceTypePolicy) SchemaInfer.referencePolicy(raw.schema)
      else SchemaInfer.nativePolicy(raw.schema)

    // S20: namespace + table create (idempotent).
    val table = LakehouseTable.create(
      catalog, raw.sparkSession, namespace, tableName,
      tableSchema, partitionColumns, properties)

    // S12+S15/S16: normalize → partitioned write → ONE snapshot.
    val snap = table.append(raw)
    Report(table, snap, snap.files.map(_.rowCount).sum)
  }
}
