package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Common._

/** Declarative analytics surface over the driver testdata, demonstrating
  * the general operator categories (SURVEY.md §2.4-§2.8 notes several as
  * ABSENT in the reference — covered here with Spark built-ins so the
  * engine is a complete query surface, per §7.1 step 6).
  *
  * Every query is fully deterministic across engines: decimal-exact
  * monetary aggregates cast back to double (see [[Common.dsum]]), total
  * ORDER BY with unique tiebreaks, timestamps rendered as strings/ints.
  * All plans are shuffle-minimal: filters/projections reach the parquet
  * scan (Catalyst pushdown), dimension joins broadcast (small sides),
  * aggregations use map-side partial aggregation automatically.
  */
object Analytics {

  val defs: Seq[QueryDef] = Seq(

    // ---- A: aggregations over lineitem (TPC-H Q1 flavor) ---------------
    QueryDef("q01_pricing_summary",
      (s, d) => {
        val li = t(s, d, "lineitem").filter(col("l_shipdate") <= lit("1998-09-02"))
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("sum_disc_price"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_extendedprice")).as("avg_price"),
            davg(col("l_discount"), 6).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
        COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ---- joins: 3-table join + group + top-k (TPC-H Q3 flavor) ---------
    QueryDef("q03_shipping_priority",
      (s, d) => {
        val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        val ord = t(s, d, "orders").filter(col("o_orderdate") < lit("1998-01-01"))
        val li = t(s, d, "lineitem").filter(col("l_shipdate") > lit("1998-01-01"))
        // customer is small → broadcast; lineitem⋈orders shuffles on the key.
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"))
          .select(col("l_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
            col("o_orderpriority"), col("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        o_orderpriority,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey, orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // ---- 6-table star join (TPC-H Q5 flavor) ---------------------------
    QueryDef("q05_local_supplier_volume",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val ord = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
        val cust = t(s, d, "customer")
        val supp = t(s, d, "supplier")
        val nat = t(s, d, "nation")
        val reg = t(s, d, "region")
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
          .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey") &&
            cust("c_nationkey") === supp("s_nationkey"))
          .join(broadcast(nat), supp("s_nationkey") === nat("n_nationkey"))
          .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("n_name"))
      },
      Some("""SELECT n_name,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name ORDER BY n_name""")),

    // ---- distinct projection (reference A1/P1, `main-polars.py:113`) ---
    QueryDef("distinct_projection",
      (s, d) => t(s, d, "customer").select(col("c_mktsegment")).distinct()
        .orderBy(col("c_mktsegment")),
      Some("SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment")),

    // ---- filter + projection, pushdown-shaped (reference P2/P3) --------
    QueryDef("filter_projection",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_returnflag") === "R" && col("l_quantity") > 45.0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE l_returnflag = 'R' AND l_quantity > 45.0
        ORDER BY l_orderkey, l_linenumber""")),

    // ---- union all of two scans (reference U1/U2) ----------------------
    QueryDef("union_all_branches",
      (s, d) => {
        val o = t(s, d, "orders")
        val hi = o.filter(col("o_totalprice") > 400000.0)
          .withColumn("bucket", lit("high"))
        val lo = o.filter(col("o_totalprice") < 40000.0)
          .withColumn("bucket", lit("low"))
        hi.unionByName(lo)
          .groupBy(col("bucket"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("bucket"), col("o_orderstatus"))
      },
      Some("""WITH u AS (
          SELECT 'high' AS bucket, o_orderstatus, o_totalprice FROM orders WHERE o_totalprice > 400000.0
          UNION ALL
          SELECT 'low' AS bucket, o_orderstatus, o_totalprice FROM orders WHERE o_totalprice < 40000.0)
        SELECT bucket, o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM u GROUP BY bucket, o_orderstatus ORDER BY bucket, o_orderstatus""")),

    // ---- INTERSECT / EXCEPT (absent in reference, §2.7) ----------------
    QueryDef("set_intersect_except",
      (s, d) => {
        val buyers = t(s, d, "orders").select(col("o_custkey").as("custkey")).distinct()
        val big = t(s, d, "customer").filter(col("c_acctbal") > 5000.0)
          .select(col("c_custkey").as("custkey")).distinct()
        val both = buyers.intersect(big).withColumn("side", lit("both"))
        val only = big.except(buyers).withColumn("side", lit("rich_no_orders"))
        both.unionByName(only).groupBy(col("side")).agg(count(lit(1)).as("n"))
          .orderBy(col("side"))
      },
      Some("""WITH buyers AS (SELECT DISTINCT o_custkey AS custkey FROM orders),
          big AS (SELECT DISTINCT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000.0),
          u AS (
            SELECT 'both' AS side, custkey FROM (SELECT custkey FROM buyers INTERSECT SELECT custkey FROM big)
            UNION ALL
            SELECT 'rich_no_orders' AS side, custkey FROM (SELECT custkey FROM big EXCEPT SELECT custkey FROM buyers))
        SELECT side, COUNT(*) AS n FROM u GROUP BY side ORDER BY side""")),

    // ---- semi/anti joins ------------------------------------------------
    QueryDef("semi_anti_join",
      (s, d) => {
        val cust = t(s, d, "customer")
        val ordKeys = t(s, d, "orders").select(col("o_custkey"))
        val withOrders = cust.join(ordKeys, cust("c_custkey") === ordKeys("o_custkey"), "left_semi")
          .withColumn("cohort", lit("active"))
        val without = cust.join(ordKeys, cust("c_custkey") === ordKeys("o_custkey"), "left_anti")
          .withColumn("cohort", lit("dormant"))
        withOrders.unionByName(without)
          .groupBy(col("cohort"), col("c_nationkey")).agg(count(lit(1)).as("n"))
          .orderBy(col("cohort"), col("c_nationkey"))
      },
      Some("""WITH u AS (
          SELECT 'active' AS cohort, c_nationkey FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
          UNION ALL
          SELECT 'dormant' AS cohort, c_nationkey FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))
        SELECT cohort, c_nationkey, COUNT(*) AS n FROM u
        GROUP BY cohort, c_nationkey ORDER BY cohort, c_nationkey""")),

    // ---- grouping sets / rollup ----------------------------------------
    QueryDef("rollup_flags",
      (s, d) => t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("<all>")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("<all>")).as("linestatus"),
          col("n"), col("qty"))
        .orderBy(col("returnflag"), col("linestatus")),
      Some("""SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
          COALESCE(l_linestatus, '<all>') AS linestatus,
          COUNT(*) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY returnflag, linestatus""")),

    // ---- window: rank + running total ----------------------------------
    QueryDef("window_top_customers",
      (s, d) => {
        val rev = t(s, d, "orders")
          .groupBy(col("o_custkey"))
          .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
        // Global top-k via orderBy+limit (TakeOrderedAndProject: partial
        // per-partition top-k, no global shuffle); the unpartitioned rank
        // window then runs over only the 25 surviving rows.
        val w = Window.orderBy(col("revenue").desc, col("o_custkey"))
        rev.orderBy(col("revenue").desc, col("o_custkey")).limit(25)
          .withColumn("rk", row_number().over(w))
          .select(col("rk"), col("o_custkey"), col("revenue"), col("n_orders"))
          .orderBy(col("rk"))
      },
      Some("""WITH rev AS (
          SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
            COUNT(*) AS n_orders
          FROM orders GROUP BY o_custkey)
        SELECT rk, o_custkey, revenue, n_orders FROM (
          SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, o_custkey) AS rk FROM rev)
        WHERE rk <= 25 ORDER BY rk""")),

    QueryDef("window_running_sum",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, d, "orders").filter(col("o_custkey") <= 100)
          .withColumn("running_total",
            sum(col("o_totalprice").cast(DecimalType(18, 2)))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast("double"))
          .withColumn("order_seq", row_number().over(w))
          .select(col("o_custkey"), col("order_seq"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
            col("running_total"))
          .orderBy(col("o_custkey"), col("order_seq"))
      },
      Some("""SELECT o_custkey,
          ROW_NUMBER() OVER w AS order_seq,
          strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        FROM orders WHERE o_custkey <= 100
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, order_seq""")),

    QueryDef("window_lag_lead",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
        events(s, d).filter(col("user_id") <= 50)
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("prev_type"), col("next_type"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id, event_type,
          LAG(event_type, 1) OVER w AS prev_type,
          LEAD(event_type, 1) OVER w AS next_type
        FROM events WHERE user_id <= 50
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, event_id""")),

    // ---- sort + limit (top-k) ------------------------------------------
    QueryDef("topk_expensive_items",
      (s, d) => t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(100),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""")),

    // ---- scalar function surface (dates, strings, math, case) ----------
    QueryDef("scalar_functions",
      (s, d) => t(s, d, "orders")
        .withColumn("yr", year(col("o_orderdate")))
        .withColumn("mo", month(col("o_orderdate")))
        .withColumn("prio_code", upper(substring(col("o_orderpriority"), 1, 1)))
        .withColumn("price_band",
          when(col("o_totalprice") >= 300000.0, "big")
            .when(col("o_totalprice") >= 100000.0, "mid")
            .otherwise("small"))
        .groupBy(col("yr"), col("mo"), col("prio_code"), col("price_band"))
        .agg(count(lit(1)).as("n"),
          dsum(round(col("o_totalprice") / 1000.0, 3)).as("ksum"))
        .orderBy(col("yr"), col("mo"), col("prio_code"), col("price_band")),
      Some("""SELECT EXTRACT(year FROM o_orderdate) AS yr,
          EXTRACT(month FROM o_orderdate) AS mo,
          UPPER(SUBSTR(o_orderpriority, 1, 1)) AS prio_code,
          CASE WHEN o_totalprice >= 300000.0 THEN 'big'
               WHEN o_totalprice >= 100000.0 THEN 'mid'
               ELSE 'small' END AS price_band,
          COUNT(*) AS n,
          CAST(SUM(CAST(ROUND(o_totalprice / 1000.0, 3) AS DECIMAL(18,2))) AS DOUBLE) AS ksum
        FROM orders GROUP BY yr, mo, prio_code, price_band
        ORDER BY yr, mo, prio_code, price_band""")),

    // ---- events: per-day time bucketing + conditional agg --------------
    QueryDef("events_daily",
      (s, d) => events(s, d)
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("users"),
          dsum(col("value"), 6).as("total_value"),
          count(when(col("value") > 50.0, 1)).as("n_high"))
        .orderBy(col("day"), col("event_type")),
      Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
          COUNT(*) AS n, COUNT(DISTINCT user_id) AS users,
          CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
          COUNT(CASE WHEN value > 50.0 THEN 1 END) AS n_high
        FROM events GROUP BY day, event_type ORDER BY day, event_type""")),

    // ---- JSON-ish props extraction -------------------------------------
    QueryDef("events_json_props",
      (s, d) => events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n_with_k"),
          dsum(col("k"), 0).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type,
          COUNT(CAST(json_extract_string(props, '$.k') AS INT)) AS n_with_k,
          CAST(SUM(CAST(CAST(json_extract_string(props, '$.k') AS INT) AS DECIMAL(18,0))) AS DOUBLE) AS sum_k,
          MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
          MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- correlated-exists flavor (TPC-H Q4 adapted) -------------------
    QueryDef("priority_with_returns",
      (s, d) => {
        val returned = t(s, d, "lineitem").filter(col("l_returnflag") === "R")
          .select(col("l_orderkey")).distinct()
        val ord = t(s, d, "orders")
        ord.join(returned, ord("o_orderkey") === returned("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- min/max/count stats profile ------------------------------------
    QueryDef("stats_profile",
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey")).as("n_parts"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          min(col("l_shipdate")).cast("date").cast("string").as("first_ship"),
          max(col("l_shipdate")).cast("date").cast("string").as("last_ship"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, COUNT(*) AS n,
          COUNT(DISTINCT l_orderkey) AS n_orders,
          COUNT(DISTINCT l_partkey) AS n_parts,
          MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
          CAST(CAST(MIN(l_shipdate) AS DATE) AS VARCHAR) AS first_ship,
          CAST(CAST(MAX(l_shipdate) AS DATE) AS VARCHAR) AS last_ship
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- TPC-H Q6 flavor: pure filter-aggregate --------------------------
    // Every predicate reaches the parquet scan (PushedFilters) — the
    // canonical pushdown showcase; no shuffle at all but the final agg.
    QueryDef("q06_forecast_revenue",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24.0)
        .agg(dsum(col("l_extendedprice") * col("l_discount"), 6).as("revenue")),
      Some("""SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0""")),

    // ---- TPC-H Q17 flavor: per-group scalar threshold join ---------------
    QueryDef("q17_small_quantity",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val thresh = li.groupBy(col("l_partkey"))
          .agg(((dsum(col("l_quantity")) / count(col("l_quantity"))) * lit(0.2))
            .as("qty_thresh"))
        li.join(thresh, "l_partkey")
          .filter(col("l_quantity") < col("qty_thresh"))
          .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
      },
      Some("""WITH a AS (SELECT l_partkey,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
              / COUNT(l_quantity) * 0.2 AS qty_thresh
          FROM lineitem GROUP BY l_partkey)
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
        FROM lineitem JOIN a USING (l_partkey)
        WHERE l_quantity < qty_thresh""")),

    // ---- TPC-H Q18 flavor: HAVING-style large orders ---------------------
    QueryDef("q18_large_orders",
      (s, d) => {
        val big = t(s, d, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(dsum(col("l_quantity")).as("sum_qty"))
          .filter(col("sum_qty") > 300.0)
        val ord = t(s, d, "orders")
        val cust = t(s, d, "customer")
        ord.join(big, ord("o_orderkey") === big("l_orderkey"))
          .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
          .select(col("c_name"), col("o_custkey"), col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
            col("o_totalprice"), col("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      Some("""WITH big AS (SELECT l_orderkey,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
          FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 300.0)
        SELECT c_name, o_custkey, o_orderkey,
          strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_totalprice, sum_qty
        FROM orders JOIN big ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")),

    // ---- pivot (status × priority count matrix) --------------------------
    QueryDef("pivot_status_matrix",
      (s, d) => t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0, Seq("F", "O", "P"))
        .select(col("o_orderpriority"), col("F").as("n_f"),
          col("O").as("n_o"), col("P").as("n_p"))
        .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority,
          COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
          COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
          COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- exact percentiles (interpolated, same (n-1)*p definition in
    // both engines over the identical stored doubles) --------------------
    QueryDef("percentile_prices",
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          percentile(col("l_extendedprice"), lit(0.5)).as("median_price"),
          percentile(col("l_extendedprice"), lit(0.9)).as("p90_price"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, COUNT(*) AS n,
          quantile_cont(l_extendedprice, 0.5) AS median_price,
          quantile_cont(l_extendedprice, 0.9) AS p90_price
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- window frames: trailing RANGE window + distribution funcs -----
    // (single-partition window is fine at daily grain — ~2.4k rows after
    // the aggregate; at scale the frame would partition by month)
    QueryDef("window_frames",
      (s, d) => {
        val daily = t(s, d, "orders")
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(dsum(col("o_totalprice")).as("rev"))
          .withColumn("day_num", datediff(col("day"), lit("1990-01-01")))
        val w7 = Window.orderBy(col("day_num")).rangeBetween(-6, 0)
        val wr = Window.orderBy(col("rev"), col("day"))
        daily
          .withColumn("rev7",
            sum(col("rev").cast(DecimalType(18, 2))).over(w7).cast("double"))
          .withColumn("pr", percent_rank().over(wr))
          .withColumn("quartile", ntile(4).over(wr))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("rev"), col("rev7"), col("pr"), col("quartile"))
          .orderBy(col("day"))
      },
      Some("""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
          FROM orders GROUP BY 1)
        SELECT strftime(day, '%Y-%m-%d') AS day, rev,
          CAST(SUM(CAST(rev AS DECIMAL(18,2))) OVER (ORDER BY day
            RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev7,
          percent_rank() OVER (ORDER BY rev, day) AS pr,
          CAST(ntile(4) OVER (ORDER BY rev, day) AS INT) AS quartile
        FROM daily ORDER BY day""")),

    // ---- custom UDAF: bounded-heap per-group top-k ---------------------
    // Unlike window rank (sorts+shuffles every row), the native
    // TypedImperativeAggregate ships at most k values per group per
    // partition — the map-side-combinable top-k for 100 TB groups.
    QueryDef("topk_agg_prices",
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(graft.functions.TopK.topkDouble(s, col("l_extendedprice"), 5).as("tp"))
        .select(col("l_returnflag"), posexplode(col("tp")).as(Seq("pos", "price")))
        .orderBy(col("l_returnflag"), col("pos")),
      Some("""WITH t AS (SELECT l_returnflag,
            list_slice(list(l_extendedprice ORDER BY l_extendedprice DESC), 1, 5) AS tp
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, CAST(generate_subscripts(tp, 1) - 1 AS INT) AS pos,
          unnest(tp) AS price
        FROM t ORDER BY l_returnflag, pos""")),

    // ---- approximate sketches: HLL++ distinct + quantile sketch --------
    // No SQL oracle (DuckDB's sketches hash differently, so estimates
    // legitimately differ engine-to-engine) → rows-only driver gate;
    // SketchSpec bounds both estimates against the exact answers.
    QueryDef("approx_sketches",
      (s, d) => events(s, d)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
          percentile_approx(col("value"), lit(0.5), lit(10000)).as("approx_median"))
        .orderBy(col("event_type")),
      None),

    // EXACT-TWIN of the sketches: the same statistics computed exactly
    // (COUNT DISTINCT and the interpolated median), hash-checked
    // against DuckDB — the sketch gate above stays rows-only because
    // estimates legitimately differ engine-to-engine, but the exact
    // formulations must match bit-for-bit.
    QueryDef("approx_sketches_exact",
      (s, d) => events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"),
          expr("percentile(value, 0.5)").as("exact_median"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
          quantile_cont(value, 0.5) AS exact_median
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- grouping sets: full CUBE (rollup's bigger sibling) ------------
    QueryDef("cube_returns",
      (s, d) => t(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("revenue"))
        .select(
          coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
          coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
          col("n"), col("revenue"))
        .orderBy(col("status"), col("priority")),
      Some("""SELECT COALESCE(o_orderstatus, '<all>') AS status,
          COALESCE(o_orderpriority, '<all>') AS priority,
          COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY status, priority""")),

    // ---- full outer join: per-nation customer vs supplier counts -------
    // (disjoint key ranges on both sides exercise both null-padded
    // directions; the nation dim broadcasts)
    QueryDef("full_outer_join",
      (s, d) => {
        val cust = t(s, d, "customer").groupBy(col("c_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_cust"))
          .filter(col("nationkey") < 20)
        val supp = t(s, d, "supplier").groupBy(col("s_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_supp"))
          .filter(col("nationkey") >= 5)
        cust.join(supp, Seq("nationkey"), "full_outer")
          .select(col("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy(col("nationkey"))
      },
      Some("""WITH c AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
            FROM customer GROUP BY 1 HAVING c_nationkey < 20),
          s AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp
            FROM supplier GROUP BY 1 HAVING s_nationkey >= 5)
        SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
          COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
        ORDER BY nationkey""")),

    // ---- skew-salted join: 5-value key domain = worst-case skew --------
    // (pattern demo at gated correctness: result must equal the plain
    // join; in production the dim side would broadcast — salting is the
    // big-big fallback, see Salt scaladoc)
    QueryDef("skew_salted_join",
      (s, d) => {
        val ev = events(s, d).select(col("event_id"), col("event_type"), col("value"))
        val dim = ev.groupBy(col("event_type"))
          .agg(davg(col("value"), 6).as("avg_value"))
        graft.operators.Salt.saltedJoin(ev, dim, "event_type", factor = 8)
          .filter(col("value") > col("avg_value"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_above"), dsum(col("value"), 6).as("sum_above"))
          .orderBy(col("event_type"))
      },
      Some("""WITH dim AS (SELECT event_type,
            CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS avg_value
          FROM events GROUP BY event_type)
        SELECT e.event_type, COUNT(*) AS n_above,
          CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_above
        FROM events e JOIN dim ON e.event_type = dim.event_type
        WHERE e.value > dim.avg_value
        GROUP BY e.event_type ORDER BY e.event_type""")),

    // ---- correlated EXISTS (TPC-H Q4 flavor): order priority check -----
    // Catalyst rewrites the EXISTS into a left-semi join — never a
    // per-row subquery execution.
    QueryDef("q04_order_priority",
      (s, d) => {
        val o = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1995-01-01") &&
            col("o_orderdate") < lit("1995-07-01"))
        val late = t(s, d, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"))
        o.join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1995-07-01'
          AND EXISTS (SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""))
  )
}
