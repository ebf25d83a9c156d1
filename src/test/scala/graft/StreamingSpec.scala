package graft

import java.nio.file.Files

import graft.catalog.Snaplog
import graft.streaming.StreamingIngest
import graft.table.LakehouseTable

/** Streaming sink semantics not covered by the driver's oracle queries:
  * foreachBatch is at-least-once, so the upsert sink must recognize and
  * skip replayed micro-batches via the batchId high-water mark it
  * records in each commit summary. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming upsert sink is idempotent under batch replay") {
    val drop = Files.createTempDirectory("graft-stream-drop").toString
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "k", "v")
    df.filter($"id" <= 2).coalesce(1).write.mode("append").parquet(drop)
    df.filter($"id" === 3).coalesce(1).write.mode("append").parquet(drop)
    val cat = new Snaplog(Files.createTempDirectory("graft-stream-wh").toString)
    val table = LakehouseTable.create(cat, spark, "ns", "t", df.schema)
    def run(): Long = StreamingIngest.upsertEachBatch(
      StreamingIngest.readParquetStream(spark, drop, df.schema,
        maxFilesPerTrigger = 1),
      table, Seq("id"))

    assert(run() == 2L) // two files, one batch each
    val snapsAfter = cat.snapshots("ns", "t").size

    // a fresh run with no checkpoint replays every batch from id 0 —
    // the recorded high-water mark must reject all of them unchanged
    assert(run() == 0L)
    assert(cat.snapshots("ns", "t").size == snapsAfter)
    assert(table.scan().count() == 3)
    assert(table.maxSummaryValue(StreamingIngest.StreamBatchKey).contains(1L))
  }
}
