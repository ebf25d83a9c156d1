package graft

import java.nio.file.Files

import graft.catalog.Snaplog
import graft.streaming.StreamingIngest
import graft.table.LakehouseTable

/** Streaming sink semantics not covered by the driver's oracle queries:
  * foreachBatch is at-least-once, so the upsert sink must recognize and
  * skip replayed micro-batches — but ONLY batches replayed from one
  * durable checkpoint. A re-invocation without a checkpoint restarts
  * batch ids at 0, so its batches must never be skipped against a stale
  * high-water mark (that would silently drop newly-landed files). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("checkpointed upsert sink applies only the delta on re-invocation") {
    val drop = Files.createTempDirectory("graft-stream-drop").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "k", "v")
    df.filter($"id" <= 2).coalesce(1).write.mode("append").parquet(drop)
    df.filter($"id" === 3).coalesce(1).write.mode("append").parquet(drop)
    val cat = new Snaplog(Files.createTempDirectory("graft-stream-wh").toString)
    val table = LakehouseTable.create(cat, spark, "ns", "t", df.schema)
    def run(): Long = StreamingIngest.upsertEachBatch(
      StreamingIngest.readParquetStream(spark, drop, df.schema,
        maxFilesPerTrigger = 1),
      table, Seq("id"), checkpointLocation = Some(ckpt))

    assert(run() == 2L) // two files, one batch each
    assert(table.maxSummaryValue(StreamingIngest.StreamBatchKey).contains(1L))

    // same checkpoint, no new files: nothing re-processes
    assert(run() == 0L)
    assert(table.scan().count() == 3)

    // a NEW file lands; the checkpoint makes its batch id monotonic
    // (2 > high-water 1) so exactly the delta applies
    Seq((4L, "d", 40.0), (1L, "a2", 11.0)).toDF("id", "k", "v")
      .coalesce(1).write.mode("append").parquet(drop)
    assert(run() == 1L)
    assert(table.maxSummaryValue(StreamingIngest.StreamBatchKey).contains(2L))
    val got = table.scan().orderBy("id").collect()
    assert(got.length == 4)
    assert(got.head.getAs[String]("k") == "a2") // id 1 upserted by the delta
  }

  test("uncheckpointed re-invocation never skips new data against a stale mark") {
    val drop = Files.createTempDirectory("graft-stream-drop2").toString
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "k", "v")
    df.filter($"id" <= 2).coalesce(1).write.mode("append").parquet(drop)
    df.filter($"id" === 3).coalesce(1).write.mode("append").parquet(drop)
    val cat = new Snaplog(Files.createTempDirectory("graft-stream-wh2").toString)
    val table = LakehouseTable.create(cat, spark, "ns", "t", df.schema)
    def run(): Long = StreamingIngest.upsertEachBatch(
      StreamingIngest.readParquetStream(spark, drop, df.schema,
        maxFilesPerTrigger = 1),
      table, Seq("id"))

    assert(run() == 2L)
    assert(table.scan().count() == 3)

    // new file lands; with no checkpoint the whole directory replays
    // from batch 0 under a FRESH run-scoped key — the old run's mark
    // must not suppress it. Replays re-apply idempotently; the new
    // file's rows land.
    Seq((4L, "d", 40.0)).toDF("id", "k", "v")
      .coalesce(1).write.mode("append").parquet(drop)
    assert(run() == 3L)
    assert(table.scan().count() == 4)
    assert(table.scan().orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L, 3L, 4L))
  }
}
