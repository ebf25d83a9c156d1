package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.pipeline.Upsert
import graft.table.LakehouseTable

/** Structured-Streaming front door for the lakehouse (SURVEY.md §2.9:
  * the reference's incremental append snapshots re-expressed as a real
  * stream): `readStream` over a parquet drop directory, then either
  *
  *  - [[upsertEachBatch]] — `foreachBatch` MERGE into a Snaplog table:
  *    every micro-batch becomes one upsert commit (exactly the
  *    reference's append-per-batch snapshot cadence, but with
  *    keyed-dedup semantics instead of blind append), or
  *  - [[windowedCounts]] — watermarked tumbling-window aggregation, the
  *    canonical stateful-streaming shape.
  *
  * Scale notes: parquet-dir streaming scales by file listing only
  * (maxFilesPerTrigger bounds batch size); the foreachBatch upsert
  * inherits the anti-join MERGE's single key shuffle per batch;
  * watermark bounds window state so long-running jobs don't grow
  * unboundedly.
  */
object StreamingIngest {

  /** Stream a parquet directory as micro-batches. */
  def readParquetStream(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** foreachBatch MERGE: each micro-batch upserts into `table` keyed by
    * `keys`. Runs the stream to completion of currently-available input
    * (synchronous — callers control the lifecycle for long-lived jobs).
    * Returns the number of micro-batches committed. */
  def upsertEachBatch(stream: DataFrame, table: LakehouseTable,
      keys: Seq[String]): Long = {
    var batches = 0L
    // explicit function value avoids the Scala/Java foreachBatch
    // overload ambiguity
    val perBatch: (DataFrame, Long) => Unit = (batch, _) => {
      if (!batch.isEmpty) {
        Upsert.upsertTable(table, batch, keys)
        batches += 1
      }
    }
    val q = stream.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch(perBatch)
      .start()
    q.processAllAvailable()
    q.stop()
    batches
  }

  /** Watermarked streaming deduplication: `dropDuplicates` on the key
    * columns with dedup state bounded by the event-time watermark (the
    * standard exactly-once ingest guard in front of an append sink).
    * Emits the deduplicated rows to the memory sink (append mode — a
    * single stateful operator, so every surviving row is emitted
    * deterministically for a static input) and returns them. */
  def dedupStream(spark: SparkSession, stream: DataFrame, tsCol: String,
      keys: Seq[String], watermark: String, queryName: String): DataFrame = {
    val deduped = stream
      .withWatermark(tsCol, watermark)
      .dropDuplicates(keys :+ tsCol)
    val q = deduped.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Watermarked tumbling-window counts per key column — the stateful
    * aggregation shape. Materializes currently-available input through
    * the memory sink and returns the result (deterministic for a static
    * input set: equals the batch aggregation). */
  def windowedCounts(spark: SparkSession, stream: DataFrame, tsCol: String,
      keyCol: String, windowLen: String, watermark: String,
      queryName: String): DataFrame = {
    val agg = stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
