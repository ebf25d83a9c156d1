package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Sessionize}

/** Unit tests for the time-series operators (as-of join, sessionize)
  * on small literal frames where the expected answer is hand-checkable. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("asofBackward picks the latest right row at-or-before each left ts") {
    val trades = Seq(
      (1L, "A", 100L), (2L, "A", 205L), (3L, "A", 300L), (4L, "B", 50L)
    ).toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("A", 90L, 10L, 1.0), ("A", 200L, 11L, 2.0), ("A", 205L, 12L, 3.0),
      ("A", 400L, 13L, 9.0), ("B", 60L, 14L, 4.0)
    ).toDF("sym", "ts", "quote_id", "px")

    val out = AsOfJoin.asofBackward(trades, quotes, Seq("sym"),
      "ts", "ts", Seq("quote_id", "px"), rightOrder = "quote_id")
      .orderBy(col("trade_id"))
      .select(col("trade_id"), col("quote_id"), col("px"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2)))

    assert(out.toSeq === Seq(
      (1L, 10L, 1.0),   // 100 → quote@90
      (2L, 12L, 3.0),   // 205 → quote@205 (at-or-before includes equal)
      (3L, 12L, 3.0),   // 300 → quote@205 still latest
      (4L, -1L, -1.0))) // B@50: no quote yet → left-join null
  }

  test("asofBackward matched payload columns come from one right row") {
    val left = Seq((1L, "k", 100L)).toDF("id", "k", "ts")
    val right = Seq(
      ("k", 10L, 1L, "x"), ("k", 20L, 2L, "y")
    ).toDF("k", "ts", "rid", "tag")
    val out = AsOfJoin.asofBackward(left, right, Seq("k"),
      "ts", "ts", Seq("rid", "tag"), rightOrder = "rid").collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("rid") === 2L)
    assert(out.head.getAs[String]("tag") === "y")
  }

  test("sessionize splits on gaps strictly greater than the threshold") {
    val ev = Seq(
      (1L, 0L), (1L, 100L), (1L, 200L),   // gaps 100,100 → same session
      (1L, 301L),                         // gap 101 > 100 → new session
      (2L, 0L)
    ).zipWithIndex.map { case ((u, ts), i) => (u, ts, i.toLong) }
      .toDF("user_id", "ts", "event_id")
    val sess = Sessionize.sessions(ev, Seq("user_id"), "ts",
      gap = 100L, tiebreak = "event_id")
      .orderBy(col("user_id"), col("session_seq"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sess.toSeq === Seq(
      (1L, 1L, 3L),  // user 1, session 1: 3 events
      (1L, 2L, 1L),  // user 1, session 2: the ts=301 event
      (2L, 1L, 1L)))
  }

  test("table maintenance: compact + expire + vacuum keep data identical") {
    import java.nio.file.Files
    val cat = new graft.catalog.Snaplog(
      Files.createTempDirectory("graft-maint").toString)
    val df = spark.range(100).select(col("id"),
      (col("id") % 7).as("grp"))
    val table = graft.table.LakehouseTable.create(
      cat, spark, "ns", "m", df.schema)
    (0 until 3).foreach(i => table.append(df.filter(col("id") % 3 === i)))
    assert(cat.liveFiles("ns", "m").size >= 3)
    table.compact()
    assert(cat.liveFiles("ns", "m").size === 1)
    assert(cat.currentSnapshot("ns", "m").get.operation === "replace")
    assert(table.scan().count() === 100)
    // expire everything before the compaction, vacuum the orphans
    val kept = cat.expireSnapshots("ns", "m", keepLast = 1)
    assert(kept.map(_.operation) === Seq("replace"))
    val deleted = cat.vacuum("ns", "m", graceMs = 0)
    assert(deleted.nonEmpty)
    assert(table.scan().count() === 100)
    assert(table.scan().agg(sum(col("id"))).head.getLong(0) === 4950L)
  }

  test("expireSnapshots refuses to drop snapshots still contributing files") {
    import java.nio.file.Files
    val cat = new graft.catalog.Snaplog(
      Files.createTempDirectory("graft-maint2").toString)
    val df = spark.range(10).toDF("id")
    val table = graft.table.LakehouseTable.create(
      cat, spark, "ns", "m2", df.schema)
    table.append(df)
    table.append(df)
    intercept[IllegalArgumentException] {
      cat.expireSnapshots("ns", "m2", keepLast = 1)
    }
  }

  test("streaming sessionization equals batch sessionization") {
    // The flatMapGroupsWithState operator must reproduce the batch
    // gap-sessionization exactly for a static input (same per-user
    // session counts), with all state flushed by the sentinel watermark.
    val stream = SparkEntry.queries("stream_sessionize")(spark, sf).collect()
    val batch = SparkEntry.queries("sessionize_users")(spark, sf).collect()
    assert(stream.length === batch.length)
    def num(r: org.apache.spark.sql.Row, i: Int): Long =
      r.get(i).asInstanceOf[Number].longValue
    stream.zip(batch).foreach { case (a, b) =>
      (0 to 3).foreach(i => assert(num(a, i) === num(b, i)))
    }
  }

  test("schema evolution: old files read the added column as null") {
    import java.nio.file.Files
    val cat = new graft.catalog.Snaplog(
      Files.createTempDirectory("graft-evo").toString)
    val df = spark.range(5).toDF("id")
    val table = graft.table.LakehouseTable.create(
      cat, spark, "ns", "e", df.schema)
    table.append(df)
    table.addColumn("extra", org.apache.spark.sql.types.LongType)
    table.append(spark.range(5, 8).toDF("id").withColumn("extra", col("id") * 10))
    val rows = table.scan().orderBy("id").collect()
    assert(rows.length === 8)
    assert(rows.take(5).forall(_.isNullAt(1)))
    assert(rows.drop(5).map(_.getLong(1)).toSeq === Seq(50L, 60L, 70L))
  }
}
