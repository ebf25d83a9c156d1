package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Sessionize}
import Common._

/** Time-series operators over the events table: as-of join, interval
  * (range) join, gap-based sessionization — operators Spark has no
  * single built-in for, composed scale-first (SURVEY.md §7.3a).
  *
  * All timestamp math runs on the raw nanosecond longs (`ts_ns`) so
  * ordering and gap arithmetic are bit-identical to DuckDB's
  * full-precision TIMESTAMP_NS comparisons.
  */
object TimeSeries {

  private val NsPerMinute = 60L * 1000 * 1000 * 1000

  val defs: Seq[QueryDef] = Seq(

    // For each purchase, the user's most recent at-or-before view —
    // union + carry-forward as-of join (one shuffle, |L|+|R| rows).
    QueryDef("asof_join",
      (s, d) => {
        val ev = events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_ns"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts_ns"),
            col("event_id").as("view_event_id"),
            col("value").as("view_value"))
        AsOfJoin.asofBackward(purchases, views, Seq("user_id"),
          "ts_ns", "ts_ns", Seq("view_event_id", "view_value"),
          rightOrder = "view_event_id")
          .select(col("event_id"), col("user_id"),
            col("view_event_id"), col("view_value"))
          .orderBy(col("event_id"))
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'),
          v AS (SELECT user_id, ts, event_id AS view_event_id,
            value AS view_value FROM events WHERE event_type = 'view')
        SELECT p.event_id, p.user_id, v.view_event_id, v.view_value
        FROM p ASOF LEFT JOIN v
          ON p.user_id = v.user_id AND p.ts >= v.ts
        ORDER BY p.event_id""")),

    // Interval join: views inside the 10 minutes before each purchase of
    // the same user. Equi key (user) + range predicate → shuffles once
    // on the user key; never a cross product.
    QueryDef("range_join",
      (s, d) => {
        val win = 10L * NsPerMinute
        val ev = events(s, d)
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_event_id"),
            col("user_id").as("p_user_id"), col("ts_ns").as("p_ts"))
        val v = ev.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user_id"), col("ts_ns").as("v_ts"),
            col("value").as("v_value"))
        p.join(v, col("p_user_id") === col("v_user_id") &&
            col("v_ts") >= col("p_ts") - win && col("v_ts") < col("p_ts"))
          .groupBy(col("p_event_id"))
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

    // Gap-based sessionization (30 min): per-user session count, event
    // count, and multi-event session count.
    QueryDef("sessionize_users",
      (s, d) => {
        val gap = 30L * NsPerMinute
        val sess = Sessionize.sessions(
          events(s, d).select(col("user_id"), col("ts_ns"), col("event_id")),
          Seq("user_id"), "ts_ns", gap, tiebreak = "event_id")
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
        SELECT user_id, CAST(MAX(session_seq) AS BIGINT) AS n_sessions,
          CAST(SUM(n_events) AS BIGINT) AS n_events,
          COUNT(CASE WHEN n_events > 1 THEN 1 END) AS n_multi
        FROM sess GROUP BY user_id ORDER BY user_id""")),

    // Funnel analysis: users progressing signup → view → purchase in
    // strict timestamp order, each stage anchored at the EARLIEST event
    // after the previous stage (the standard product-analytics funnel,
    // which Spark has no built-in for). Three stage aggregations, each
    // one shuffle on user_id with the prior stage riding along as a
    // 1-column join — no windows over the full event stream, no
    // per-user event collection, so stage state is one row per
    // surviving user at any scale.
    QueryDef("funnel_conversion",
      (s, d) => {
        val ev = events(s, d).select(col("user_id"), col("event_type"), col("ts_ns"))
        val s1 = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts_ns")).as("t1"))
        val s2 = ev.filter(col("event_type") === "view")
          .join(s1, Seq("user_id"))
          .filter(col("ts_ns") > col("t1"))
          .groupBy(col("user_id")).agg(min(col("ts_ns")).as("t2"))
        val s3 = ev.filter(col("event_type") === "purchase")
          .join(s2, Seq("user_id"))
          .filter(col("ts_ns") > col("t2"))
          .groupBy(col("user_id")).agg(min(col("ts_ns")).as("t3"))
        s1.agg(count(lit(1)).as("n_signup")).crossJoin(
          s2.agg(count(lit(1)).as("n_signup_view"))).crossJoin(
          s3.agg(count(lit(1)).as("n_full_funnel")))
      },
      Some("""WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = 'signup' GROUP BY user_id),
          s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
            JOIN s1 USING (user_id)
            WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY e.user_id),
          s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
            JOIN s2 USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
        SELECT (SELECT COUNT(*) FROM s1) AS n_signup,
          (SELECT COUNT(*) FROM s2) AS n_signup_view,
          (SELECT COUNT(*) FROM s3) AS n_full_funnel""")),

    // Cohort retention: users grouped by first-activity day, with
    // same-day actives (d0) and 1-7-day returners (d1_7) per cohort —
    // the second standard product-analytics shape next to the funnel.
    // Two shuffles (per-user first day, then the cohort rollup); daily
    // activity is distinct-ed BEFORE the join so the join carries one
    // row per user-day, not per event.
    QueryDef("cohort_retention",
      (s, d) => {
        val ev = events(s, d)
        val activity = ev
          .select(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
          .distinct()
        val firstDay = activity.groupBy(col("user_id"))
          .agg(min(col("day")).as("cohort_day"))
        activity.join(firstDay, Seq("user_id"))
          .withColumn("k", datediff(col("day"), col("cohort_day")))
          .filter(col("k") <= 7)
          .groupBy(col("cohort_day"))
          .agg(
            countDistinct(when(col("k") === 0, col("user_id"))).as("d0"),
            countDistinct(when(col("k").between(1, 7), col("user_id"))).as("d1_7"))
          .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
            col("d0"), col("d1_7"))
          .orderBy(col("cohort_day"))
      },
      Some("""WITH act AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day
            FROM events),
          fst AS (SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY user_id),
          j AS (SELECT a.user_id, f.cohort_day,
              date_diff('day', f.cohort_day, a.day) AS k
            FROM act a JOIN fst f USING (user_id)
            WHERE date_diff('day', f.cohort_day, a.day) <= 7)
        SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
          COUNT(DISTINCT CASE WHEN k = 0 THEN user_id END) AS d0,
          COUNT(DISTINCT CASE WHEN k BETWEEN 1 AND 7 THEN user_id END) AS d1_7
        FROM j GROUP BY cohort_day ORDER BY cohort_day""")),

    // Skew-safe distinct aggregation: COUNT(DISTINCT user) per event
    // type, computed as a two-stage salted aggregate. A single hot
    // event_type would funnel its whole distinct set through one
    // reducer; salting on a hash of the DISTINCT key splits each group
    // 16 ways, and because the salt is a function of the key, per-salt
    // distinct counts add up exactly. Stage 2 shuffles |types|·16 scalar
    // rows — nothing at corpus scale.
    QueryDef("skew_salted_agg",
      (s, d) => {
        val ev = events(s, d)
        ev.groupBy(col("event_type"), pmod(col("user_id"), lit(16)).as("salt"))
          .agg(countDistinct(col("user_id")).as("du"), count(lit(1)).as("n"))
          .groupBy(col("event_type"))
          .agg(sum(col("du")).cast("long").as("n_users"),
            sum(col("n")).cast("long").as("n_events"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
          COUNT(*) AS n_events
        FROM events GROUP BY event_type ORDER BY event_type"""))
  )
}
