package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.catalog.Snaplog
import graft.sql.GraftSqlCatalog
import graft.table.LakehouseTable

/** Streaming READ of a snaplog table (`spark.readStream.table`):
  * snapshot-id offsets, initial-content batch, checkpointed delta
  * resume, admission control, and the append-only failure contract. */
class StreamTableSourceSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(ids: Range, g: String) =
    ids.map(i => (i, g, i * 1.5f, i * 10)).toDF("id", "group", "value1", "value2")

  private var n = 0
  /** Run one AvailableNow pass of readStream.table into a fresh memory
    * sink; returns the ids that arrived this run. */
  private def runOnce(tableName: String, ckpt: String,
      options: Map[String, String] = Map.empty): (Seq[Int], Int) = {
    n += 1
    val sink = s"stream_tbl_sink_$n"
    var r = spark.readStream
    options.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.table(tableName)
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val batches = q.recentProgress.count(_.numInputRows > 0)
    (spark.table(sink).select("id").collect().map(_.getInt(0)).toSeq.sorted,
      batches)
  }

  /** One AvailableNow pass into a RECOVERABLE (parquet) sink — the
    * memory sink refuses checkpoint recovery, and resume-across-restart
    * is exactly what these tests prove. Returns the CUMULATIVE ids in
    * the output dir: delta-only resume shows as each id exactly once. */
  private def runToDir(tableName: String, ckpt: String, out: String,
      options: Map[String, String] = Map.empty): Seq[Int] = {
    var r = spark.readStream
    options.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.table(tableName)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    q.exception.foreach(throw _)
    spark.read.parquet(out).select("id").collect().map(_.getInt(0)).toSeq.sorted
  }

  test("table streams: full content first, then checkpointed deltas only") {
    val wh = Files.createTempDirectory("graft-streamsrc").toString
    val cat = new Snaplog(wh)
    val tbl = LakehouseTable.create(cat, spark, "ns", "s", fixture(1 to 2, "A").schema)
    tbl.append(fixture(1 to 2, "A"))   // snapshot 1
    tbl.append(fixture(3 to 4, "B"))   // snapshot 2
    spark.conf.set("spark.sql.catalog.gstream", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gstream.warehouse", wh)
    val ckpt = Files.createTempDirectory("graft-streamsrc-ck").toString
    val out = Files.createTempDirectory("graft-streamsrc-out").toString

    // run 1: virgin offset → the table's full live content
    assert(runToDir("gstream.ns.s", ckpt, out) == Seq(1, 2, 3, 4))
    // run 2: nothing new landed → no duplicates appended
    assert(runToDir("gstream.ns.s", ckpt, out) == Seq(1, 2, 3, 4))
    // new commits, one of them WAP-staged (content no-op on main)
    tbl.append(fixture(5 to 5, "C"))                       // snapshot 3
    tbl.appendToBranch("audit", fixture(99 to 99, "Z"))    // staged — invisible
    // run 3: exactly the delta — ids 1-4 NOT re-read, staged 99 absent
    assert(runToDir("gstream.ns.s", ckpt, out) == Seq(1, 2, 3, 4, 5))
    // a fresh checkpoint re-reads everything (still without the branch)
    assert(runOnce("gstream.ns.s",
      Files.createTempDirectory("graft-streamsrc-ck2").toString)._1 ==
      Seq(1, 2, 3, 4, 5))
  }

  test("nested-column tables stream: struct payload intact across delta resume") {
    import org.apache.spark.sql.functions.{col, struct}
    val wh = Files.createTempDirectory("graft-streamnest").toString
    val cat = new Snaplog(wh)
    val mk = (ids: Range, g: String) => fixture(ids, g)
      .withColumn("p", struct(col("group").as("g"), (col("id") * 10).as("v")))
    val tbl = LakehouseTable.create(cat, spark, "ns", "sn", mk(1 to 1, "A").schema)
    tbl.append(mk(1 to 2, "A"))
    spark.conf.set("spark.sql.catalog.gstrnest", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gstrnest.warehouse", wh)
    val ckpt = Files.createTempDirectory("graft-streamnest-ck").toString
    val out = Files.createTempDirectory("graft-streamnest-out").toString
    def drain(): Seq[(Int, String, Int)] = {
      val q = spark.readStream.table("gstrnest.ns.sn")
        .select(col("id"), col("p.g"), col("p.v"))
        .writeStream.format("parquet").option("path", out.toString)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      q.exception.foreach(throw _)
      spark.read.parquet(out.toString).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).sortBy(_._1).toSeq
    }
    assert(drain() == Seq((1, "A", 10), (2, "A", 20)))
    tbl.append(mk(3 to 3, "B"))
    assert(drain() == Seq((1, "A", 10), (2, "A", 20), (3, "B", 30)))
  }

  test("startSnapshotId tails only commits after the given snapshot") {
    val wh = Files.createTempDirectory("graft-streamtail").toString
    val cat = new Snaplog(wh)
    val tbl = LakehouseTable.create(cat, spark, "ns", "tl", fixture(1 to 2, "A").schema)
    tbl.append(fixture(1 to 2, "A"))   // snapshot 1
    tbl.append(fixture(3 to 4, "B"))   // snapshot 2
    spark.conf.set("spark.sql.catalog.gstail", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gstail.warehouse", wh)
    val ckpt = Files.createTempDirectory("graft-streamtail-ck").toString
    assert(runOnce("gstail.ns.tl", ckpt,
      Map("startSnapshotId" -> "1"))._1 == Seq(3, 4))
  }

  test("maxFilesPerTrigger splits the catch-up into bounded batches") {
    val wh = Files.createTempDirectory("graft-streamrate").toString
    val cat = new Snaplog(wh)
    val tbl = LakehouseTable.create(cat, spark, "ns", "r", fixture(1 to 1, "A").schema)
    // 4 single-file commits (coalesce(1) → one file per append)
    (1 to 4).foreach(i => tbl.append(fixture(i to i, "A").coalesce(1)))
    assert(cat.liveFiles("ns", "r").size == 4)
    spark.conf.set("spark.sql.catalog.grate", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.grate.warehouse", wh)
    val ckpt = Files.createTempDirectory("graft-streamrate-ck").toString
    val (ids, batches) = runOnce("grate.ns.r", ckpt,
      Map("maxFilesPerTrigger" -> "1"))
    assert(ids == Seq(1, 2, 3, 4))
    // first batch = live set at snapshot 1 (1 file), then one commit per
    // batch → 4 non-empty micro-batches, not one catch-all
    assert(batches == 4, s"expected 4 bounded batches, got $batches")
  }

  test("maxBytesPerTrigger bounds batches by size, composing with maxFiles") {
    val wh = Files.createTempDirectory("graft-streambytes").toString
    val cat = new Snaplog(wh)
    val tbl = LakehouseTable.create(cat, spark, "ns", "rb", fixture(1 to 1, "A").schema)
    (1 to 4).foreach(i => tbl.append(fixture(i to i, "A").coalesce(1)))
    val sizes = cat.liveFiles("ns", "rb").map(_.sizeBytes)
    assert(sizes.size == 4)
    spark.conf.set("spark.sql.catalog.gbyte", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gbyte.warehouse", wh)
    // budget of one file's bytes → one commit per batch (same cadence
    // the file limit would give, proven from the BYTE ledger)
    val ckpt = Files.createTempDirectory("graft-streambytes-ck").toString
    val (ids, batches) = runOnce("gbyte.ns.rb", ckpt,
      Map("maxBytesPerTrigger" -> sizes.max.toString))
    assert(ids == Seq(1, 2, 3, 4))
    assert(batches == 4, s"expected 4 byte-bounded batches, got $batches")
    // a budget covering two files admits two commits per batch
    val ckpt2 = Files.createTempDirectory("graft-streambytes-ck2").toString
    val (ids2, batches2) = runOnce("gbyte.ns.rb", ckpt2,
      Map("maxBytesPerTrigger" -> (sizes.max * 2).toString))
    assert(ids2 == Seq(1, 2, 3, 4))
    assert(batches2 == 2, s"expected 2 two-commit batches, got $batches2")
    // composite: a generous byte budget with maxFilesPerTrigger=1 still
    // closes per commit — the tighter limit wins
    val ckpt3 = Files.createTempDirectory("graft-streambytes-ck3").toString
    val (ids3, batches3) = runOnce("gbyte.ns.rb", ckpt3,
      Map("maxBytesPerTrigger" -> (sizes.sum * 10).toString,
        "maxFilesPerTrigger" -> "1"))
    assert(ids3 == Seq(1, 2, 3, 4))
    assert(batches3 == 4, s"expected the file limit to win, got $batches3")
    // zero/negative refuses loudly
    intercept[Exception] {
      runOnce("gbyte.ns.rb",
        Files.createTempDirectory("graft-streambytes-ck4").toString,
        Map("maxBytesPerTrigger" -> "0"))
    }
  }

  test("append-only contract: a reset commit inside the range fails loudly") {
    val wh = Files.createTempDirectory("graft-streamreset").toString
    val cat = new Snaplog(wh)
    val tbl = LakehouseTable.create(cat, spark, "ns", "x", fixture(1 to 2, "A").schema)
    tbl.append(fixture(1 to 2, "A"))
    spark.conf.set("spark.sql.catalog.gsreset", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsreset.warehouse", wh)
    val ckpt = Files.createTempDirectory("graft-streamreset-ck").toString
    val out = Files.createTempDirectory("graft-streamreset-out").toString
    assert(runToDir("gsreset.ns.x", ckpt, out) == Seq(1, 2))
    tbl.overwrite(fixture(7 to 8, "B")) // reset — delta undefined
    val ex = intercept[Exception] { runToDir("gsreset.ns.x", ckpt, out) }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("reset commit")),
      s"expected the append-only error, got: $ex")
    // a fresh checkpoint recovers: reads current (post-overwrite) content
    val ckpt2 = Files.createTempDirectory("graft-streamreset-ck2").toString
    assert(runOnce("gsreset.ns.x", ckpt2)._1 == Seq(7, 8))
  }

  test("equality deletes stream through: batch-split skip semantics, delta resume") {
    val wh = Files.createTempDirectory("graft-streameq").toString
    val cat = new Snaplog(wh)
    val tbl = LakehouseTable.create(cat, spark, "ns", "eq", fixture(1 to 4, "A").schema)
    tbl.append(fixture(1 to 4, "A"))                       // snap 1
    spark.conf.set("spark.sql.catalog.gseq", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gseq.warehouse", wh)
    val ckpt = Files.createTempDirectory("graft-streameq-ck").toString
    val out = Files.createTempDirectory("graft-streameq-out").toString
    assert(runToDir("gseq.ns.eq", ckpt, out) == Seq(1, 2, 3, 4))
    // an eq delete lands, then an append: the RESUMED stream must cross
    // the delete (its keys touch only already-emitted rows) and emit
    // exactly the new append — the refusal-turned-delta
    tbl.deleteEq("id", Seq(2, 3))                          // snap 2
    tbl.append(fixture(5 to 6, "A"))                       // snap 3
    assert(runToDir("gseq.ns.eq", ckpt, out) == Seq(1, 2, 3, 4, 5, 6),
      "resume must cross the eq delete and emit only the delta")
    // the table's own content nets the delete out (batch reads subtract)
    assert(tbl.scan().select("id").collect().map(_.getInt(0)).sorted.toSeq
      == Seq(1, 4, 5, 6))
    // a FRESH stream replays history append-only: admission starts the
    // initial batch BEFORE the delete (so no batch needs subtraction)
    // and the deleted-then-skipped rows appear once, like any
    // already-emitted row — the documented skip semantics
    val ckpt2 = Files.createTempDirectory("graft-streameq-ck2").toString
    val out2 = Files.createTempDirectory("graft-streameq-out2").toString
    assert(runToDir("gseq.ns.eq", ckpt2, out2) == Seq(1, 2, 3, 4, 5, 6))
    // after compaction the deletes are materialized: a fresh stream's
    // initial content is the NET table
    tbl.compact()
    val ckpt3 = Files.createTempDirectory("graft-streameq-ck3").toString
    assert(runOnce("gseq.ns.eq", ckpt3)._1 == Seq(1, 4, 5, 6))
  }

  test("an unconsumed append→eqdelete→append window splits at the delete boundary") {
    val wh = Files.createTempDirectory("graft-streameqs").toString
    val cat = new Snaplog(wh)
    val tbl = LakehouseTable.create(cat, spark, "ns", "eqs", fixture(1 to 2, "A").schema)
    tbl.append(fixture(1 to 2, "A"))                       // snap 1
    spark.conf.set("spark.sql.catalog.gseqs", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gseqs.warehouse", wh)
    val ckpt = Files.createTempDirectory("graft-streameqs-ck").toString
    val out = Files.createTempDirectory("graft-streameqs-out").toString
    assert(runToDir("gseqs.ns.eqs", ckpt, out) == Seq(1, 2))
    // three unconsumed commits; admission must close the first batch
    // BEFORE the delete so no batch needs row subtraction
    tbl.append(fixture(3 to 4, "A"))                       // snap 2
    tbl.deleteEq("id", Seq(3))                             // snap 3
    tbl.append(fixture(5 to 6, "A"))                       // snap 4
    assert(runToDir("gseqs.ns.eqs", ckpt, out) == Seq(1, 2, 3, 4, 5, 6),
      "append→eqdelete→append must stream as two clean batches")
    assert(tbl.scan().select("id").collect().map(_.getInt(0)).sorted.toSeq
      == Seq(1, 2, 4, 5, 6))
  }

  test("MOR vectors stream through at batch boundaries with skip semantics") {
    val wh = Files.createTempDirectory("graft-streammor").toString
    val cat = new Snaplog(wh)
    val tbl = LakehouseTable.create(cat, spark, "ns", "m", fixture(1 to 4, "A").schema)
    tbl.append(fixture(1 to 4, "A"))                       // snap 1
    tbl.deleteMor($"id" === 2)                             // snap 2 (vector)
    spark.conf.set("spark.sql.catalog.gsmor", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsmor.warehouse", wh)
    // virgin stream: admission closes the initial batch BEFORE the
    // vector commit (its content is then a plain file list), then
    // crosses the vector as a no-op — rows it deleted were already
    // emitted (skip semantics, like equality deletes; a retraction
    // consumer uses the graft-changes feed)
    val ckpt = Files.createTempDirectory("graft-streammor-ck").toString
    val out = Files.createTempDirectory("graft-streammor-out").toString
    assert(runToDir("gsmor.ns.m", ckpt, out) == Seq(1, 2, 3, 4))
    // delta resume across the consumed vector: only new rows arrive
    tbl.append(fixture(5 to 6, "B"))                       // snap 3
    assert(runToDir("gsmor.ns.m", ckpt, out) == Seq(1, 2, 3, 4, 5, 6))
    // an in-window vector AFTER in-window adds still refuses: replay a
    // fresh stream over history where adds precede a later vector in
    // one admission-planned window is impossible, but a fresh virgin
    // stream sees [append, vector, append] and splits — all rows emit
    val ckpt2 = Files.createTempDirectory("graft-streammor-ck2").toString
    val out2 = Files.createTempDirectory("graft-streammor-out2").toString
    assert(runToDir("gsmor.ns.m", ckpt2, out2) == Seq(1, 2, 3, 4, 5, 6))
    // a FRESH stream after compaction sees the subtracted content
    tbl.compact()
    val ckpt3 = Files.createTempDirectory("graft-streammor-ck3").toString
    assert(runOnce("gsmor.ns.m", ckpt3)._1 == Seq(1, 3, 4, 5, 6))
  }

  test("a [checkpoint-fold, vector] window streams through (fold is not an add)") {
    // regression: the leading-vector guard must not count a checkpoint
    // fold's RE-LISTED files as in-window adds — a consumed stream that
    // sees [fold, morDelete] would otherwise refuse spuriously
    val wh = Files.createTempDirectory("graft-streammorck").toString
    val cat = new Snaplog(wh, checkpointInterval = 3)
    val tbl = LakehouseTable.create(cat, spark, "ns", "mc", fixture(1 to 4, "A").schema)
    tbl.append(fixture(1 to 4, "A"))                       // snap 1
    spark.conf.set("spark.sql.catalog.gsmorck", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsmorck.warehouse", wh)
    val ckpt = Files.createTempDirectory("graft-streammorck-ck").toString
    val out = Files.createTempDirectory("graft-streammorck-out").toString
    assert(runToDir("gsmorck.ns.mc", ckpt, out) == Seq(1, 2, 3, 4))
    tbl.append(fixture(5 to 5, "B"))                       // snap 2
    tbl.deleteMor($"id" === 2)                             // snap 3 (+ auto fold)
    assert(cat.snapshots("ns", "mc")
      .exists(_.operation == graft.catalog.Snaplog.OpCheckpoint),
      "fixture must actually contain a checkpoint fold")
    tbl.deleteMor($"id" === 3)                             // post-fold vector
    // resume: the new row arrives; both vectors cross as no-ops
    assert(runToDir("gsmorck.ns.mc", ckpt, out) == Seq(1, 2, 3, 4, 5))
    // a fresh VIRGIN stream whose checkpoint-folded initial content
    // carries a vector NO LONGER refuses: the source materializes the
    // batch scan's MOR subtraction for the initial batch (id 2 never
    // emits), then crosses the post-fold vector as a no-op (id 3 was
    // emitted by the initial batch — skip semantics, no retraction)
    val ckptV = Files.createTempDirectory("graft-streammorck-ckv").toString
    assert(runOnce("gsmorck.ns.mc", ckptV)._1 == Seq(1, 3, 4, 5))
    // after compaction the net content streams (vectors materialized)
    tbl.compact()
    val ckpt2 = Files.createTempDirectory("graft-streammorck-ck2").toString
    assert(runOnce("gsmorck.ns.mc", ckpt2)._1 == Seq(1, 4, 5))
  }

  test("a virgin stream over folded EQUALITY deletes materializes the subtraction") {
    // the initial-batch materialization covers the equality tier too:
    // a checkpoint fold re-lists the outstanding key file, so a fresh
    // stream's initial content needs the keyed anti-join — previously a
    // compact-first refusal, now a scan-materialized batch
    val wh = Files.createTempDirectory("graft-streameqfold").toString
    val cat = new Snaplog(wh, checkpointInterval = 2)
    val tbl = LakehouseTable.create(cat, spark, "ns", "ef", fixture(1 to 4, "A").schema)
    tbl.append(fixture(1 to 4, "A"))                       // snap 1
    tbl.deleteEq("id", Seq(2, 3))                          // snap 2 (+ fold)
    assert(cat.snapshots("ns", "ef")
      .exists(_.operation == graft.catalog.Snaplog.OpCheckpoint),
      "fixture must fold so the initial content carries the key file")
    assert(cat.liveDeleteFiles("ns", "ef").nonEmpty)
    spark.conf.set("spark.sql.catalog.gseqf", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gseqf.warehouse", wh)
    val ckpt = Files.createTempDirectory("graft-streameqfold-ck").toString
    val out = Files.createTempDirectory("graft-streameqfold-out").toString
    assert(runToDir("gseqf.ns.ef", ckpt, out) == Seq(1, 4))
    // the stream only materialized a copy — the delete stays outstanding
    assert(cat.liveDeleteFiles("ns", "ef").nonEmpty)
    // delta resume continues normally past the materialized batch; a
    // re-inserted key is a NEW row (replay order: append after delete)
    tbl.append(fixture(2 to 2, "B"))
    assert(runToDir("gseqf.ns.ef", ckpt, out) == Seq(1, 2, 4))
  }

  test("partitioned tables stream with partition columns intact") {
    val wh = Files.createTempDirectory("graft-streampart").toString
    val cat = new Snaplog(wh)
    val tbl = LakehouseTable.create(cat, spark, "ns", "p",
      fixture(1 to 2, "A").schema, Seq("group"))
    tbl.append(fixture(1 to 2, "A").union(fixture(3 to 4, "B")))
    spark.conf.set("spark.sql.catalog.gspart", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gspart.warehouse", wh)
    val ckpt = Files.createTempDirectory("graft-streampart-ck").toString
    n += 1
    val sink = s"stream_tbl_sink_$n"
    val q = spark.readStream.table("gspart.ns.p")
      .groupBy("group").count()
      .writeStream.format("memory").queryName(sink)
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val rows = spark.table(sink).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("A" -> 2L, "B" -> 2L))
  }

  test("refresh=true tails a LIVE foreign Iceberg tree through its mirror") {
    val wh = Files.createTempDirectory("graft-streammirror").toString
    val cat = new Snaplog(wh)
    val src = LakehouseTable.create(cat, spark, "ns", "live",
      fixture(1 to 2, "A").schema)
    src.append(fixture(1 to 2, "A"))
    val dest = Files.createTempDirectory("graft-streammirror-ice")
    graft.interop.IcebergExport.export(src, dest)
    graft.interop.IcebergImport.register(cat, spark, dest, "ns", "mirror")
    spark.conf.set("spark.sql.catalog.gsmir", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsmir.warehouse", wh)
    val ckpt = Files.createTempDirectory("graft-streammirror-ck").toString
    val out = Files.createTempDirectory("graft-streammirror-out").toString
    val opts = Map("refresh" -> "true")

    // run 1: the mirror's registered content
    assert(runToDir("gsmir.ns.mirror", ckpt, out, opts) == Seq(1, 2))
    // the SOURCE advances; nobody calls refresh — the stream does
    src.append(fixture(3 to 4, "B"))
    graft.interop.IcebergExport.export(src, dest)
    assert(runToDir("gsmir.ns.mirror", ckpt, out, opts) == Seq(1, 2, 3, 4))
    // a source DELETE lands as a native delete boundary: nothing is
    // re-emitted (skip semantics), and the next source append streams
    src.deleteEq("group", Seq("A"))
    graft.interop.IcebergExport.export(src, dest)
    assert(runToDir("gsmir.ns.mirror", ckpt, out, opts) == Seq(1, 2, 3, 4))
    src.append(fixture(5 to 5, "C"))
    graft.interop.IcebergExport.export(src, dest)
    assert(runToDir("gsmir.ns.mirror", ckpt, out, opts) == Seq(1, 2, 3, 4, 5))
    // the mirror itself holds the net state (deletes applied)
    assert(LakehouseTable.load(cat, spark, "ns", "mirror").scan()
      .select("id").collect().map(_.getInt(0)).sorted.toSeq == Seq(3, 4, 5))
    // a fresh checkpoint replays like any native table with a delete
    // in its history: the batch splits AT the delete boundary, rows
    // before it emit, the delete itself is a skip no-op (same contract
    // the native eq-delete streaming tests pin)
    assert(runOnce("gsmir.ns.mirror",
      Files.createTempDirectory("graft-streammirror-ck2").toString,
      opts)._1 == Seq(1, 2, 3, 4, 5))
    // a foreign REWRITE lands as a reset commit, which the APPEND-ONLY
    // contract cannot cross: the stream fails with restart guidance
    // (the retraction-capable change feed is the source that streams
    // through it — pinned in ChangeFeedStreamSpec)
    src.compact()
    graft.interop.IcebergExport.export(src, dest)
    val eReset = intercept[Exception](runToDir("gsmir.ns.mirror", ckpt, out, opts))
    val resetChain = Iterator.iterate[Throwable](eReset)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(resetChain.contains("reset commit"), resetChain)

    // refresh=true on a NON-imported table refuses loudly at start
    val e = intercept[Exception] {
      val q = spark.readStream.option("refresh", "true")
        .table("gsmir.ns.live")
        .writeStream.format("memory").queryName("mirror_refuse")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-streammirror-ck3").toString)
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
