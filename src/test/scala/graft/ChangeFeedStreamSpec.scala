package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.catalog.Snaplog
import graft.table.LakehouseTable

/** Streaming change feed (`readStream.format("graft-changes")`):
  * changelog batches over snapshot-id offsets, retractions streaming
  * through the commits the append-only table stream refuses, and
  * checkpointed resume. */
class ChangeFeedStreamSpec extends SparkSpec {
  import spark.implicits._
  import LakehouseTable.{ChangeTypeCol, ChangeSnapshotCol, ChangeInsert, ChangeDelete}

  private def fixture(ids: Int*) =
    ids.map(i => (i, s"g${i % 3}", i * 1.5)).toDF("id", "grp", "v")

  private def freshTable(name: String): (String, LakehouseTable) = {
    val wh = Files.createTempDirectory(s"graft-cf-$name").toString
    (wh, LakehouseTable.create(
      new Snaplog(wh), spark, "ns", name, fixture(1).schema))
  }

  /** One AvailableNow pass into a recoverable parquet sink; returns the
    * CUMULATIVE (change_type, snapshot_id, id) rows in the output. */
  private def runToDir(wh: String, tableName: String, ckpt: String,
      out: String, options: Map[String, String] = Map.empty)
      : Seq[(String, Long, Int)] = {
    var r = spark.readStream.format("graft-changes")
      .option("warehouse", wh).option("table", s"ns.$tableName")
    options.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.load()
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    q.exception.foreach(throw _)
    spark.read.parquet(out)
      .select(col(ChangeTypeCol), col(ChangeSnapshotCol), col("id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      .toSeq.sorted
  }

  test("merge commits stream through the feed as delete+insert per upserted key") {
    val (wh, t) = freshTable("merge")
    t.append(fixture(1, 2, 3))                                   // snap 1
    val ckpt = Files.createTempDirectory("graft-cf-merge-ck").toString
    val out = Files.createTempDirectory("graft-cf-merge-out").toString
    assert(runToDir(wh, "merge", ckpt, out).size == 3)           // initial
    graft.pipeline.Upsert.upsertTable(t,                         // snap 2
      Seq((2, "gX", 9.9), (4, "g1", 6.0)).toDF("id", "grp", "v"), Seq("id"))
    // the merge commit's preimage retraction AND postimage/new inserts
    // arrive in the same feed batch — the CDC-of-upserts shape
    val got = runToDir(wh, "merge", ckpt, out)
      .filter(_._2 == 2L)
    assert(got == Seq(
      (ChangeDelete, 2L, 2),    // preimage of the updated key
      (ChangeInsert, 2L, 2),    // postimage
      (ChangeInsert, 2L, 4)))   // brand-new key
  }

  test("change feed streams inserts and eq-delete retractions") {
    val (wh, t) = freshTable("basic")
    t.append(fixture(1, 2)) // 1
    val ckpt = Files.createTempDirectory("graft-cf-ck").toString
    val out = Files.createTempDirectory("graft-cf-out").toString
    assert(runToDir(wh, "basic", ckpt, out) ==
      Seq((ChangeInsert, 1L, 1), (ChangeInsert, 1L, 2)))
    // idle re-run: no duplicates
    assert(runToDir(wh, "basic", ckpt, out).size == 2)
    // an eq delete RETRACTS a row run 1 already emitted — the exact
    // case the append-only table stream documents as its blind spot
    t.deleteEq("id", Seq(2)) // 2
    t.append(fixture(3))     // 3
    assert(runToDir(wh, "basic", ckpt, out) == Seq(
      (ChangeDelete, 2L, 2),
      (ChangeInsert, 1L, 1), (ChangeInsert, 1L, 2), (ChangeInsert, 3L, 3)))
  }

  test("COW delete and overwrite stream through as change rows") {
    val (wh, t) = freshTable("resets")
    t.append(fixture(1, 2)) // 1
    t.append(fixture(3, 4)) // 2
    val ckpt = Files.createTempDirectory("graft-cf-rck").toString
    val out = Files.createTempDirectory("graft-cf-rout").toString
    assert(runToDir(wh, "resets", ckpt, out).size == 4)
    t.delete(col("id") === 4)  // 3 — COW reset: table stream would fail
    t.overwrite(fixture(9))    // 4 — full overwrite
    val got = runToDir(wh, "resets", ckpt, out)
    assert(got.filter(_._2 > 2L) == Seq(
      (ChangeDelete, 3L, 4),
      (ChangeDelete, 4L, 1), (ChangeDelete, 4L, 2), (ChangeDelete, 4L, 3),
      (ChangeInsert, 4L, 9)))
    // net effect of the cumulative feed == the table's visible state
    val all = spark.read.parquet(out)
    val net = all.filter(col(ChangeTypeCol) === ChangeInsert)
      .select("id", "grp", "v")
      .exceptAll(all.filter(col(ChangeTypeCol) === ChangeDelete)
        .select("id", "grp", "v"))
      .collect().map(_.getInt(0)).toSeq.sorted
    assert(net == Seq(9))
  }

  test("startSnapshotId skips history; maxCommitsPerTrigger bounds batches") {
    val (wh, t) = freshTable("opts")
    t.append(fixture(1)) // 1
    t.append(fixture(2)) // 2
    t.append(fixture(3)) // 3
    t.append(fixture(4)) // 4
    val got = runToDir(wh, "opts",
      Files.createTempDirectory("graft-cf-ock").toString,
      Files.createTempDirectory("graft-cf-oout").toString,
      Map("startSnapshotId" -> "2"))
    assert(got == Seq((ChangeInsert, 3L, 3), (ChangeInsert, 4L, 4)))

    // rate limit: 1-commit batches (getOffset-poll shaped, so use the
    // default ProcessingTime trigger and drain with processAllAvailable)
    val q = spark.readStream.format("graft-changes")
      .option("warehouse", wh).option("table", "ns.opts")
      .option("startSnapshotId", "1")
      .option("maxCommitsPerTrigger", "1")
      .load()
      .writeStream.format("memory").queryName("cf_rate")
      .start()
    q.processAllAvailable()
    q.exception.foreach(throw _)
    val rows = spark.table("cf_rate")
      .select(col(ChangeSnapshotCol), col("id")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
    val batches = q.recentProgress.count(_.numInputRows > 0)
    q.stop()
    assert(rows == Seq((2L, 2), (3L, 3), (4L, 4)))
    assert(batches == 3)
  }

  test("refusals: bad options and expired checkpointed offsets") {
    val (wh, t) = freshTable("bad")
    t.append(fixture(1))
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft-changes")
        .option("warehouse", wh).load()
    }
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft-changes")
        .option("warehouse", wh).option("table", "nodots").load()
    }
    // a typo'd start id fails at source construction, not silently
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft-changes")
        .option("warehouse", wh).option("table", "ns.bad")
        .option("startSnapshotId", "42")
        .load()
        .writeStream.format("memory").queryName("cf_bad")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      q.exception.foreach(throw _)
    }
    assert(ex.getMessage.contains("42") ||
      Option(ex.getCause).exists(_.getMessage.contains("42")))
  }

  test("schema of the feed is the table's changesSchema") {
    val (wh, t) = freshTable("sch")
    t.append(fixture(1))
    val df = spark.readStream.format("graft-changes")
      .option("warehouse", wh).option("table", "ns.sch").load()
    assert(df.schema == t.changesSchema)
    assert(df.isStreaming)
  }

  test("lineage=true stamps durable row ids onto the streamed feed") {
    // the streaming form of scanChangesLineage (round 17): a CDC
    // consumer keys on _row_id across micro-batches — a MERGE's
    // postimage arrives CARRYING its preimage's id
    val wh = Files.createTempDirectory("graft-cf-lin").toString
    val t = LakehouseTable.create(new Snaplog(wh), spark, "ns", "cflin",
      fixture(1).schema,
      properties = Map(Snaplog.RowLineageProp -> "true"))
    t.append(fixture(1, 2, 3).repartition(1)
      .sortWithinPartitions("id"))                               // 1: ids 0,1,2
    val dfS = spark.readStream.format("graft-changes")
      .option("warehouse", wh).option("table", "ns.cflin")
      .option("lineage", "true").load()
    assert(dfS.schema == t.changesLineageSchema)
    val ckpt = Files.createTempDirectory("graft-cf-lin-ck").toString
    val out = Files.createTempDirectory("graft-cf-lin-out").toString
    def run(): Seq[(String, Long, Int, Long, Long)] = {
      val q = spark.readStream.format("graft-changes")
        .option("warehouse", wh).option("table", "ns.cflin")
        .option("lineage", "true").load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      q.exception.foreach(throw _)
      spark.read.parquet(out)
        .select(col(ChangeTypeCol), col(ChangeSnapshotCol), col("id"),
          col("_row_id"), col("_last_updated_sequence_number"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
          r.getLong(3), r.getLong(4))).toSeq.sorted
    }
    assert(run() == Seq(
      (ChangeInsert, 1L, 1, 0L, 1L),
      (ChangeInsert, 1L, 2, 1L, 1L),
      (ChangeInsert, 1L, 3, 2L, 1L)))
    graft.pipeline.Upsert.upsertTable(t,                         // 2
      Seq((2, "gX", 9.9)).toDF("id", "grp", "v"), Seq("id"))
    val batch2 = run().filter(_._2 == 2L)
    assert(batch2 == Seq(
      (ChangeDelete, 2L, 2, 1L, 1L),   // preimage: the id it held
      (ChangeInsert, 2L, 2, 1L, 2L)),  // postimage: SAME id, bumped seq
      batch2.toString)
  }

  test("refresh=true replicates a LIVE foreign tree's changes, retractions included") {
    val (wh, src) = freshTable("cfsrc")
    src.append(fixture(1, 2, 3))
    val dest = Files.createTempDirectory("graft-cf-mirror-ice")
    graft.interop.IcebergExport.export(src, dest)
    graft.interop.IcebergImport.register(
      new Snaplog(wh), spark, dest, "ns", "cfmirror")
    val ckpt = Files.createTempDirectory("graft-cf-mirror-ck").toString
    val out = Files.createTempDirectory("graft-cf-mirror-out").toString
    val opts = Map("refresh" -> "true")
    // run 1: the registered content arrives as inserts
    val g1 = runToDir(wh, "cfmirror", ckpt, out, opts)
    assert(g1.map(x => (x._1, x._3)).sorted ==
      Seq((ChangeInsert, 1), (ChangeInsert, 2), (ChangeInsert, 3)))
    // the SOURCE advances (append + equality delete); nobody refreshes
    // by hand — the feed emits inserts AND the retractions the
    // append-only table stream can only skip
    src.append(fixture(4, 5))
    src.deleteEq("id", Seq(1, 4))
    graft.interop.IcebergExport.export(src, dest)
    val g2 = runToDir(wh, "cfmirror", ckpt, out, opts)
    val delta = g2.diff(g1)
    assert(delta.map(x => (x._1, x._3)).sorted ==
      Seq((ChangeDelete, 1), (ChangeDelete, 4),
        (ChangeInsert, 4), (ChangeInsert, 5)), delta.toString)
    // a foreign COMPACTION lands as a reset commit; the feed crosses
    // it as a content NO-OP (same rows, new files — the changelog's
    // multiset diff cancels the rewrite churn)
    src.compact()
    graft.interop.IcebergExport.export(src, dest)
    val g3 = runToDir(wh, "cfmirror", ckpt, out, opts)
    assert(g3 == g2, s"compaction must emit no change rows: ${g3.diff(g2)}")
    assert(new Snaplog(wh).snapshots("ns", "cfmirror")
      .last.operation == graft.catalog.Snaplog.OpReplace,
      "the foreign rewrite must have landed as a reset")
    // refresh=true on a NON-imported table refuses loudly
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft-changes")
        .option("warehouse", wh).option("table", "ns.cfsrc")
        .option("refresh", "true")
        .load()
        .writeStream.format("memory").queryName("cf_mirror_refuse")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-cf-mirror-ck2").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      q.exception.foreach(throw _)
    }
    val chain = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(chain.contains("imported from an Iceberg tree"), chain)
  }
}
