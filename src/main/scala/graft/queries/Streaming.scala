package graft.queries

import org.apache.spark.sql.functions._

import graft.catalog.Snaplog
import graft.streaming.StreamingIngest
import graft.table.LakehouseTable
import Common._

/** Structured-Streaming surface, driver-checked: for a static input set,
  * a correctly-implemented streaming job must produce EXACTLY the batch
  * answer — so the DuckDB oracle for each streaming query is the plain
  * batch SQL over the same rows. Scratch drop-dirs under target/qwh.
  */
object Streaming {

  val defs: Seq[QueryDef] = Seq(

    // Watermarked tumbling-window aggregation via the memory sink.
    QueryDef("stream_windowed_daily",
      (s, d) => {
        val drop = scratchDir("stream_windowed_daily", d)
        val ev = events(s, d).select("event_id", "ts", "event_type", "value")
        ev.coalesce(2).write.mode("append").parquet(drop)
        val stream = StreamingIngest.readParquetStream(s, drop, ev.schema)
        StreamingIngest.windowedCounts(s, stream, "ts", "event_type",
          windowLen = "1 day", watermark = "1 day",
          queryName = "stream_windowed_daily_mem")
          .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
            col("event_type"), col("n"), col("total_value"))
          .orderBy(col("day"), col("event_type"))
      },
      Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
          COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM events GROUP BY day, event_type ORDER BY day, event_type""")),

    // foreachBatch MERGE into a Snaplog table: three single-file batches
    // streamed in, upserted by key, then the table is read back.
    QueryDef("stream_upsert_ingest",
      (s, d) => {
        val drop = scratchDir("stream_upsert_ingest_drop", d)
        val orders = t(s, d, "orders")
        (0 until 3).foreach { i =>
          orders.filter(col("o_orderkey") % 3 === i)
            .coalesce(1).write.mode("append").parquet(drop)
        }
        val cat = new Snaplog(scratchDir("stream_upsert_ingest_wh", d))
        val table = LakehouseTable.create(cat, s, "lake", "orders_stream",
          orders.schema)
        val stream = StreamingIngest.readParquetStream(s, drop, orders.schema,
          maxFilesPerTrigger = 1)
        val nBatches = StreamingIngest.upsertEachBatch(stream, table, Seq("o_orderkey"))
        // delta-sized sink contract: every micro-batch committed as ONE
        // merge-on-read snapshot (eq-delete key file + the batch's own
        // data files); data files from earlier batches are never
        // rewritten — each stays listed, by path, in every later commit
        locally {
          val snaps = cat.snapshots("lake", "orders_stream")
          assert(snaps.forall(_.operation == graft.catalog.Snaplog.OpEqDelete),
            s"expected merge-on-read commits, got ${snaps.map(_.operation)}")
          snaps.foldLeft(Set.empty[String]) { (prior, snap) =>
            val data = snap.files.filterNot(_.deleteFile.contains(true)).map(_.path).toSet
            assert(snap.files.exists(_.deleteFile.contains(true)),
              "merge commit must carry its eq-delete key file")
            val live = cat.liveFiles("lake", "orders_stream", Some(snap.snapshotId))
              .map(_.path).toSet
            assert(prior.subsetOf(live),
              "a merge commit rewrote or dropped a prior batch's data file")
            prior ++ data
          }
        }
        table.scan()
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .withColumn("n_batches", lit(nBatches).cast("int"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
          3 AS n_batches
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Watermarked streaming dedup: the same event feed delivered twice;
    // dropDuplicates state (bounded by the watermark) must make the
    // result equal the batch DISTINCT.
    QueryDef("stream_dedup",
      (s, d) => {
        val drop = scratchDir("stream_dedup", d)
        val ev = events(s, d).select("event_id", "ts", "event_type", "value")
        ev.coalesce(1).write.mode("append").parquet(drop)
        ev.coalesce(1).write.mode("append").parquet(drop)
        val stream = StreamingIngest.readParquetStream(s, drop, ev.schema,
          maxFilesPerTrigger = 1)
        StreamingIngest.dedupStream(s, stream, "ts", Seq("event_id"),
          watermark = "40 days", queryName = "stream_dedup_mem")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("total_value"))
          .orderBy(col("event_type"))
      },
      Some("""WITH dedup AS (SELECT DISTINCT event_id, ts, event_type, value
          FROM events)
        SELECT event_type, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM dedup GROUP BY event_type ORDER BY event_type""")),

    // Stream–static enrichment join: the event stream joins a STATIC
    // per-user dimension (order counts) that Spark re-plans and
    // broadcasts per micro-batch — the standard streaming enrichment
    // shape, stateless on the join itself.
    QueryDef("stream_static_join",
      (s, d) => {
        val drop = scratchDir("stream_static_join", d)
        val ev = events(s, d).select("event_id", "user_id", "ts", "event_type", "value")
        ev.coalesce(2).write.mode("append").parquet(drop)
        val userOrders = t(s, d, "orders")
          .groupBy(col("o_custkey").as("user_id"))
          .agg(count(lit(1)).as("n_orders"))
        val stream = StreamingIngest.readParquetStream(s, drop, ev.schema)
        val enriched = stream.join(broadcast(userOrders), Seq("user_id"), "inner")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("n_orders")).as("total_orders"))
        StreamingIngest.withStreamShufflePartitions(s) {
          val q = enriched.writeStream
            .outputMode("complete").format("memory")
            .queryName("stream_static_mem").start()
          q.processAllAvailable(); q.stop()
        }
        s.table("stream_static_mem").orderBy(col("event_type"))
      },
      Some("""WITH uo AS (SELECT o_custkey AS user_id, COUNT(*) AS n_orders
            FROM orders GROUP BY o_custkey)
        SELECT event_type, COUNT(*) AS n_events,
          CAST(SUM(n_orders) AS BIGINT) AS total_orders
        FROM events e JOIN uo USING (user_id)
        GROUP BY event_type ORDER BY event_type""")),

    // Stream–stream interval join: purchases joined to the views in the
    // 10 minutes before them, both sides streaming with watermark-
    // bounded join state. Oracle: the batch interval join (range_join's
    // SQL) — event timestamps are exactly µs-precision so the ts
    // comparison is engine-identical.
    QueryDef("stream_interval_join",
      (s, d) => {
        val ev = events(s, d)
        val pDrop = scratchDir("stream_ij_purchases", d)
        val vDrop = scratchDir("stream_ij_views", d)
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_event_id"),
            col("user_id").as("p_user_id"), col("ts").as("p_ts"))
        val v = ev.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user_id"), col("ts").as("v_ts"),
            col("value").as("v_value"))
        p.coalesce(1).write.mode("append").parquet(pDrop)
        v.coalesce(1).write.mode("append").parquet(vDrop)
        val joined = StreamingIngest.intervalJoinStreams(
          StreamingIngest.readParquetStream(s, pDrop, p.schema), "p_ts",
          StreamingIngest.readParquetStream(s, vDrop, v.schema), "v_ts",
          "p_user_id = v_user_id AND v_ts >= p_ts - INTERVAL 10 MINUTES AND v_ts < p_ts",
          watermark = "1 day", queryName = "stream_ij_mem")
        joined.groupBy(col("p_event_id"))
          .agg(count(lit(1)).as("n_views"), dsum(col("v_value"), 6).as("views_value"))
          .select(col("p_event_id").as("event_id"), col("n_views"), col("views_value"))
          .orderBy(col("event_id"))
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'),
          v AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view')
        SELECT p.event_id, COUNT(*) AS n_views,
          CAST(SUM(CAST(v.value AS DECIMAL(18,6))) AS DOUBLE) AS views_value
        FROM p JOIN v ON p.user_id = v.user_id
          AND v.ts >= p.ts - INTERVAL 10 MINUTE AND v.ts < p.ts
        GROUP BY p.event_id ORDER BY p.event_id""")),

    // Stream–stream SEMI interval join: purchases that had at least one
    // view in the preceding 10 minutes — existence check only, so the
    // view side never materializes into the output and its state
    // evicts as soon as a match is recorded (cheaper than inner join +
    // distinct at scale). Oracle: batch EXISTS.
    QueryDef("stream_semi_interval_join",
      (s, d) => {
        val ev = events(s, d)
        val pDrop = scratchDir("stream_sij_purchases", d)
        val vDrop = scratchDir("stream_sij_views", d)
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_event_id"),
            col("user_id").as("p_user_id"), col("ts").as("p_ts"),
            col("value").as("p_value"))
        val v = ev.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user_id"), col("ts").as("v_ts"))
        p.coalesce(1).write.mode("append").parquet(pDrop)
        v.coalesce(1).write.mode("append").parquet(vDrop)
        val joined = StreamingIngest.intervalJoinStreams(
          StreamingIngest.readParquetStream(s, pDrop, p.schema), "p_ts",
          StreamingIngest.readParquetStream(s, vDrop, v.schema), "v_ts",
          "p_user_id = v_user_id AND v_ts >= p_ts - INTERVAL 10 MINUTES AND v_ts < p_ts",
          watermark = "1 day", queryName = "stream_sij_mem",
          joinType = "left_semi")
        joined
          .agg(count(lit(1)).as("n_purchases"),
            dsum(col("p_value"), 6).as("purchase_value"))
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'purchase'),
          v AS (SELECT user_id, ts FROM events WHERE event_type = 'view')
        SELECT COUNT(*) AS n_purchases,
          CAST(SUM(CAST(p.value AS DECIMAL(18,6))) AS DOUBLE) AS purchase_value
        FROM p WHERE EXISTS (SELECT 1 FROM v
          WHERE v.user_id = p.user_id
            AND v.ts >= p.ts - INTERVAL 10 MINUTE AND v.ts < p.ts)""")),

    // Stream–stream LEFT OUTER interval join: purchases with no views in
    // the preceding 10 minutes must STILL emit (null-padded) — which only
    // happens once the watermark passes their join window, so two future
    // sentinel files per side drive the watermark forward batch-by-batch
    // (single-file triggers), exactly like stream_sessionize. Sentinels
    // filter out of the result; the oracle is the batch LEFT JOIN.
    QueryDef("stream_outer_interval_join",
      (s, d) => {
        val ev = events(s, d)
        val pDrop = scratchDir("stream_oij_purchases", d)
        val vDrop = scratchDir("stream_oij_views", d)
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_event_id"),
            col("user_id").as("p_user_id"), col("ts").as("p_ts"))
        val v = ev.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user_id"), col("ts").as("v_ts"),
            col("value").as("v_value"))
        p.coalesce(1).write.mode("append").parquet(pDrop)
        v.coalesce(1).write.mode("append").parquet(vDrop)
        val maxTs = ev.agg(max(col("ts_ns"))).head().getLong(0)
        val nsPerDay = 24L * 3600 * 1000 * 1000 * 1000
        def sentinels(drop: String, mk: Long => org.apache.spark.sql.DataFrame): Unit =
          Seq(maxTs + 100 * nsPerDay, maxTs + 200 * nsPerDay).foreach(ts =>
            mk(ts).coalesce(1).write.mode("append").parquet(drop))
        def sentinelTs(tsNs: Long) = timestamp_micros(lit(tsNs / 1000))
        sentinels(pDrop, ts => p.limit(0).sparkSession.range(1)
          .select(lit(-1L).as("p_event_id"), lit(-1L).as("p_user_id"),
            sentinelTs(ts).as("p_ts")))
        sentinels(vDrop, ts => v.limit(0).sparkSession.range(1)
          .select(lit(-1L).as("v_user_id"), sentinelTs(ts).as("v_ts"),
            lit(0.0).as("v_value")))
        // two files per trigger (like stream_sessionize): batch 1 =
        // [real, sentinelA] — the watermark only advances BETWEEN
        // batches, so all real rows enter join state first; batch 2 =
        // [sentinelB] runs with the watermark past every real join
        // window and flushes the null-padded unmatched rows. One fewer
        // micro-batch than single-file triggers, same output.
        val joined = StreamingIngest.intervalJoinStreams(
          StreamingIngest.readParquetStream(s, pDrop, p.schema, maxFilesPerTrigger = 2), "p_ts",
          StreamingIngest.readParquetStream(s, vDrop, v.schema, maxFilesPerTrigger = 2), "v_ts",
          "p_user_id = v_user_id AND v_ts >= p_ts - INTERVAL 10 MINUTES AND v_ts < p_ts",
          watermark = "1 day", queryName = "stream_oij_mem", joinType = "left_outer")
        joined.filter(col("p_user_id") =!= -1L)
          .groupBy(col("p_event_id"))
          .agg(count(col("v_value")).as("n_views"),
            dsum(col("v_value"), 6).as("views_value"))
          .select(col("p_event_id").as("event_id"), col("n_views"), col("views_value"))
          .orderBy(col("event_id"))
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'),
          v AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view')
        SELECT p.event_id, COUNT(v.value) AS n_views,
          CAST(SUM(CAST(v.value AS DECIMAL(18,6))) AS DOUBLE) AS views_value
        FROM p LEFT JOIN v ON p.user_id = v.user_id
          AND v.ts >= p.ts - INTERVAL 10 MINUTE AND v.ts < p.ts
        GROUP BY p.event_id ORDER BY p.event_id""")),

    // Stream–stream FULL OUTER interval join: completes the join family
    // (inner / left-outer / full-outer) — unmatched rows on EITHER side
    // emit null-padded once the watermark passes their join window, via
    // the same sentinel scheme as the left-outer query. Sentinel rows on
    // either side never join anything real (their timestamps are 100+
    // days out) and are filtered with null-safe guards, since unmatched
    // rows carry nulls for the other side's columns.
    QueryDef("stream_full_outer_interval_join",
      (s, d) => {
        val ev = events(s, d)
        val pDrop = scratchDir("stream_foij_purchases", d)
        val vDrop = scratchDir("stream_foij_views", d)
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_event_id"),
            col("user_id").as("p_user_id"), col("ts").as("p_ts"))
        val v = ev.filter(col("event_type") === "view")
          .select(col("event_id").as("v_event_id"),
            col("user_id").as("v_user_id"), col("ts").as("v_ts"),
            col("value").as("v_value"))
        p.coalesce(1).write.mode("append").parquet(pDrop)
        v.coalesce(1).write.mode("append").parquet(vDrop)
        val maxTs = ev.agg(max(col("ts_ns"))).head().getLong(0)
        val nsPerDay = 24L * 3600 * 1000 * 1000 * 1000
        def sentinelTs(tsNs: Long) = timestamp_micros(lit(tsNs / 1000))
        Seq(maxTs + 100 * nsPerDay, maxTs + 200 * nsPerDay).foreach { ts =>
          s.range(1).select(lit(-1L).as("p_event_id"), lit(-1L).as("p_user_id"),
            sentinelTs(ts).as("p_ts")).coalesce(1).write.mode("append").parquet(pDrop)
          s.range(1).select(lit(-1L).as("v_event_id"), lit(-1L).as("v_user_id"),
            sentinelTs(ts).as("v_ts"), lit(0.0).as("v_value"))
            .coalesce(1).write.mode("append").parquet(vDrop)
        }
        val joined = StreamingIngest.intervalJoinStreams(
          StreamingIngest.readParquetStream(s, pDrop, p.schema, maxFilesPerTrigger = 2), "p_ts",
          StreamingIngest.readParquetStream(s, vDrop, v.schema, maxFilesPerTrigger = 2), "v_ts",
          "p_user_id = v_user_id AND v_ts >= p_ts - INTERVAL 10 MINUTES AND v_ts < p_ts",
          watermark = "1 day", queryName = "stream_foij_mem", joinType = "full_outer")
        joined
          .filter(coalesce(col("p_user_id"), lit(0L)) =!= -1L &&
            coalesce(col("v_user_id"), lit(0L)) =!= -1L)
          .agg(
            count(when(col("p_event_id").isNotNull && col("v_event_id").isNotNull, 1))
              .as("n_matched"),
            count(when(col("v_event_id").isNull, 1)).as("n_lonely_purchases"),
            count(when(col("p_event_id").isNull, 1)).as("n_lonely_views"),
            dsum(when(col("p_event_id").isNotNull, col("v_value")), 6)
              .as("matched_value"))
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'),
          v AS (SELECT event_id AS v_event_id, user_id, ts AS v_ts, value
            FROM events WHERE event_type = 'view')
        SELECT COUNT(CASE WHEN p.event_id IS NOT NULL
              AND v.v_event_id IS NOT NULL THEN 1 END) AS n_matched,
          COUNT(CASE WHEN v.v_event_id IS NULL THEN 1 END) AS n_lonely_purchases,
          COUNT(CASE WHEN p.event_id IS NULL THEN 1 END) AS n_lonely_views,
          CAST(SUM(CASE WHEN p.event_id IS NOT NULL
            THEN CAST(v.value AS DECIMAL(18,6)) END) AS DOUBLE) AS matched_value
        FROM p FULL JOIN v ON p.user_id = v.user_id
          AND v.v_ts >= p.ts - INTERVAL 10 MINUTE AND v.v_ts < p.ts""")),

    // Custom stateful operator: gap sessionization via
    // flatMapGroupsWithState with event-time timeout. Two sentinel
    // events (written LAST, so the file source processes them after the
    // real data) push the watermark past every real session: the first
    // advances it, the second triggers the batch in which all real
    // users' state times out and emits. The sentinel user's own state
    // never times out and is never emitted. Oracle: identical to the
    // batch sessionize_users aggregate.
    QueryDef("stream_sessionize",
      (s, d) => {
        val nsPerDay = 24L * 3600 * 1000 * 1000 * 1000
        val gapNs = 30L * 60 * 1000 * 1000 * 1000
        val drop = scratchDir("stream_sessionize", d)
        val ev = events(s, d)
          .select(col("user_id"), col("ts"), col("ts_ns"), col("event_id"))
        ev.coalesce(1).write.mode("append").parquet(drop)
        val maxNs = ev.agg(max(col("ts_ns"))).head().getLong(0)
        def sentinel(tsNs: Long): Unit = {
          import s.implicits._
          Seq((-1L, tsNs, -1L)).toDF("user_id", "ts_ns", "event_id")
            .select(col("user_id"),
              timestamp_micros(expr("ts_ns div 1000")).as("ts"),
              col("ts_ns"), col("event_id"))
            .coalesce(1).write.mode("append").parquet(drop)
        }
        sentinel(maxNs + 100 * nsPerDay)
        sentinel(maxNs + 200 * nsPerDay)
        // two files per trigger: [real, sentinelA] then [sentinelB] —
        // the watermark still only advances BETWEEN batches, so all
        // real data is in state before any timeout can fire, with one
        // fewer micro-batch than single-file triggers
        val stream = StreamingIngest.readParquetStream(s, drop, ev.schema,
          maxFilesPerTrigger = 2)
        val sess = StreamingIngest.sessionizeStream(s, stream, "ts", gapNs,
          watermark = "1 day", queryName = "stream_sessionize_mem")
        sess.groupBy(col("user_id"))
          .agg(max(col("session_seq")).as("n_sessions"),
            sum(col("n_events")).as("n_events"),
            count(when(col("n_events") > 1, 1)).as("n_multi"))
          .orderBy(col("user_id"))
      },
      Some("""WITH e AS (SELECT user_id, ts, event_id,
            LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
          FROM events),
        f AS (SELECT user_id, ts, event_id,
            CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
          FROM e),
        g AS (SELECT user_id, SUM(is_new) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
          FROM f),
        sess AS (SELECT user_id, session_seq, COUNT(*) AS n_events
          FROM g GROUP BY user_id, session_seq)
        SELECT user_id, CAST(MAX(session_seq) AS INT) AS n_sessions,
          CAST(SUM(n_events) AS BIGINT) AS n_events,
          COUNT(CASE WHEN n_events > 1 THEN 1 END) AS n_multi
        FROM sess GROUP BY user_id ORDER BY user_id"""))
  )
}
