package graft.queries

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.{JdbcCatalog, Snaplog}
import graft.interop.IcebergExport
import graft.pipeline.{Ingest, Upsert}
import graft.table.LakehouseTable
import Common._

/** Driver-facing queries that exercise the full lakehouse lifecycle
  * (SURVEY.md §2.1 S9-S21 + §3): each builds a scratch Snaplog warehouse
  * from the testdata, runs the lifecycle op, and returns a deterministic
  * aggregate that a DuckDB oracle reproduces straight from the source
  * parquet — so the ENTIRE path (create → write → snapshot log → scan)
  * is correctness-gated, not just the final query.
  *
  * Scratch warehouses live under `target/qwh/` (inside the repo, wiped
  * and rebuilt per invocation — idempotent under re-runs).
  */
object Lakehouse {

  private def wh(name: String, sfDir: String): String = scratchDir(name, sfDir)

  /** Register a DSv2 catalog over `whDir` under a name derived from the
    * dir (Spark caches catalog instances per session+name and never
    * re-runs initialize on conf change, so a name that moves with the
    * warehouse is what keeps same-session re-runs from aliasing a stale
    * scratch dir). Returns the catalog name to interpolate into SQL. */
  private def sqlCatalog(s: org.apache.spark.sql.SparkSession, prefix: String,
      whDir: String): String = {
    val cn = prefix + "_" +
      java.lang.Long.toHexString(whDir.hashCode.toLong & 0xffffffffL)
    s.conf.set(s"spark.sql.catalog.$cn", classOf[graft.sql.GraftSqlCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cn.warehouse", whDir)
    cn
  }

  val defs: Seq[QueryDef] = Seq(

    // Ingest lineitem partitioned by l_returnflag → scan → aggregate.
    // Exercises S1, S12, S15, S19, S20, P7 in one path.
    QueryDef("lake_ingest_scan",
      (s, d) => {
        val cat = new Snaplog(wh("lake_ingest_scan", d))
        val rep = Ingest.run(s, cat, "lake", "lineitem",
          s"$d/lineitem.parquet", partitionColumns = Seq("l_returnflag"))
        rep.table.scan()
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("total"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Metadata partition pruning: only files of partition R reach Spark.
    QueryDef("lake_partition_pruning",
      (s, d) => {
        val cat = new Snaplog(wh("lake_partition_pruning", d))
        val rep = Ingest.run(s, cat, "lake", "lineitem",
          s"$d/lineitem.parquet", partitionColumns = Seq("l_returnflag"))
        rep.table.scan(partitionFilter = Map("l_returnflag" -> "R"))
          .groupBy(col("l_linestatus"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
          .orderBy(col("l_linestatus"))
      },
      Some("""SELECT l_linestatus, COUNT(*) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM lineitem WHERE l_returnflag = 'R'
        GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // MERGE/upsert: patch = every 10th order with doubled price and
    // status 'U'; new-wins semantics (reference upsert.py:44-56).
    QueryDef("lake_upsert_merge",
      (s, d) => {
        val cat = new Snaplog(wh("lake_upsert_merge", d))
        val orders = t(s, d, "orders")
        val rep = Ingest.ingestDf(cat, "lake", "orders", orders)
        val patch = orders.filter(col("o_orderkey") % 10 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 2.0)
          .withColumn("o_orderstatus", lit("U"))
        Upsert.upsertTable(rep.table, patch, Seq("o_orderkey"))
        rep.table.scan()
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""WITH patch AS (
          SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
            o_totalprice * 2.0 AS o_totalprice, o_orderdate, o_orderpriority
          FROM orders WHERE o_orderkey % 10 = 0),
        merged AS (
          SELECT * FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM patch p WHERE p.o_orderkey = o.o_orderkey)
          UNION ALL SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
            o_orderdate, o_orderpriority FROM patch)
        SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // CDC apply — MERGE with a delete clause (Upsert.applyChanges): one
    // change feed carrying deletes, updates, and inserts lands in ONE
    // atomic delta-sized merge-on-read snapshot (eq-delete key file +
    // the feed's data files), then the final table state is checked.
    QueryDef("lake_merge_scd",
      (s, d) => {
        val cat = new Snaplog(wh("lake_merge_scd", d))
        val orders = t(s, d, "orders")
        val rep = Ingest.ingestDf(cat, "lake", "orders", orders)
        val deletes = orders.filter(col("o_orderkey") % 10 === 0)
          .withColumn("op", lit("D"))
        val updates = orders.filter(col("o_orderkey") % 10 === 1)
          .withColumn("o_totalprice", col("o_totalprice") + 50.0)
          .withColumn("o_orderstatus", lit("U"))
          .withColumn("op", lit("U"))
        val inserts = orders.filter(col("o_orderkey") % 10 === 2)
          .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
          .withColumn("o_orderstatus", lit("N"))
          .withColumn("op", lit("I"))
        Upsert.applyChanges(rep.table,
          deletes.unionByName(updates).unionByName(inserts), Seq("o_orderkey"))
        rep.table.scan()
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""WITH upd AS (SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
            o_totalprice + 50.0 AS o_totalprice, o_orderdate, o_orderpriority
          FROM orders WHERE o_orderkey % 10 = 1),
        ins AS (SELECT o_orderkey + 100000000 AS o_orderkey, o_custkey,
            'N' AS o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
          FROM orders WHERE o_orderkey % 10 = 2),
        kept AS (SELECT * FROM orders WHERE o_orderkey % 10 NOT IN (0, 1)),
        merged AS (SELECT * FROM kept UNION ALL SELECT * FROM upd
          UNION ALL SELECT * FROM ins)
        SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Z-order clustering for multi-dimensional file skipping: orders laid
    // out along a Morton curve over (o_custkey, o_totalprice), so every
    // file's [min,max] stats form a tight box in BOTH dimensions and a
    // 2-D box filter prunes files from log metadata alone (ZOrderSpec
    // asserts the z-layout strictly out-prunes a one-column range layout
    // on the same box; the scan stays correct either way because the
    // row-level predicate is still applied).
    QueryDef("lake_zorder_skipping",
      (s, d) => {
        val cat = new Snaplog(wh("lake_zorder_skipping", d))
        val orders = t(s, d, "orders")
        val zkey = graft.functions.ZOrder.zorder2(col("o_custkey"),
          floor(col("o_totalprice") / lit(1000.0)).cast("long"), bits = 16)
        val rep = Ingest.ingestDf(cat, "lake", "orders",
          orders.repartitionByRange(8, zkey))
        rep.table.scan(rangeFilter = Map(
            "o_custkey" -> (Some(0.0), Some(400.0)),
            "o_totalprice" -> (Some(0.0), Some(100000.0))))
          .filter(col("o_custkey").between(0, 400) &&
            col("o_totalprice").between(0.0, 100000.0))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders WHERE o_custkey BETWEEN 0 AND 400
          AND o_totalprice BETWEEN 0 AND 100000
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Dynamic partition overwrite: re-run one partition's pipeline (flag
    // R gets filtered + repriced) and commit — only R's files rewrite,
    // the other flags' files carry into the new snapshot untouched
    // (asserted in SnaplogSpec by path identity).
    QueryDef("lake_partition_overwrite",
      (s, d) => {
        val cat = new Snaplog(wh("lake_partition_overwrite", d))
        val li = t(s, d, "lineitem")
        val rep = Ingest.ingestDf(cat, "lake", "lineitem", li,
          partitionColumns = Seq("l_returnflag"))
        val patch = li.filter(col("l_returnflag") === "R" && col("l_quantity") > 10)
          .withColumn("l_extendedprice", col("l_extendedprice") * 2.0)
        rep.table.overwritePartitions(patch)
        rep.table.scan()
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("total"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH merged AS (
          SELECT l_returnflag, l_extendedprice FROM lineitem WHERE l_returnflag <> 'R'
          UNION ALL
          SELECT l_returnflag, l_extendedprice * 2.0 AS l_extendedprice
          FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 10)
        SELECT l_returnflag, COUNT(*) AS n,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM merged GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Dynamic partition overwrite under HIDDEN partitioning: the same
    // daily-recompute pattern on a days(ts) events table — the patch
    // covers one calendar day, attribution runs the writer's own
    // transform expression, so exactly that day's files replace and
    // every other day carries by path (asserted in-result).
    QueryDef("lake_partition_overwrite_days",
      (s, d) => {
        val cat = new Snaplog(wh("lake_partition_overwrite_days", d))
        val ev = events(s, d)
          .select("event_id", "ts", "user_id", "event_type", "value")
        val rep = Ingest.ingestDf(cat, "lake", "events_days", ev,
          partitionColumns = Seq("days(ts)"))
        val before = cat.liveFiles("lake", "events_days")
        // recompute the fixture's third day (deterministic at any sf)
        val target = ev.agg(date_add(to_date(min(col("ts"))), 2)).head().getDate(0)
        val patch = ev.filter(to_date(col("ts")) === lit(target))
          .withColumn("value", col("value") * 2.0)
        rep.table.overwritePartitions(patch)
        val after = cat.liveFiles("lake", "events_days").map(_.path).toSet
        val targetDay = target.toLocalDate.toEpochDay.toString
        val carried = before
          .filter(_.partitionValues("ts_day") != targetDay)
          .forall(f => after(f.path))
        rep.table.scan()
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
          .withColumn("other_days_carried", lit(carried))
          .orderBy(col("event_type"))
      },
      Some("""WITH target AS (
          SELECT date_trunc('day', MIN(ts)) + INTERVAL 2 DAY AS day FROM events),
        merged AS (
          SELECT event_type, value FROM events
          WHERE date_trunc('day', ts) <> (SELECT day FROM target)
          UNION ALL
          SELECT event_type, value * 2.0 AS value FROM events
          WHERE date_trunc('day', ts) = (SELECT day FROM target))
        SELECT event_type, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
          TRUE AS other_days_carried
        FROM merged GROUP BY event_type ORDER BY event_type""")),

    // Snapshot refs: tag the first commit "v1" (immutable), keep
    // appending, then read the tag and the head side by side — time
    // travel by NAME, the release-pinning workflow (training runs pin a
    // tag; ingestion advances the head). Ref bookkeeping is pure
    // catalog metadata; both scans are ordinary pruned file lists.
    QueryDef("lake_branch_tag",
      (s, d) => {
        val cat = new Snaplog(wh("lake_branch_tag", d))
        val orders = t(s, d, "orders")
        val even = orders.filter(col("o_orderkey") % 2 === 0)
        val odd = orders.filter(col("o_orderkey") % 2 === 1)
        val rep = Ingest.ingestDf(cat, "lake", "orders", even)
        rep.table.tag("v1")
        rep.table.append(odd)
        rep.table.setBranch("dev", 2L)
        val tagged = rep.table.scanRef("v1")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_tag"), dsum(col("o_totalprice")).as("total_tag"))
        val head = rep.table.scanRef("dev")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_head"), dsum(col("o_totalprice")).as("total_head"))
        tagged.join(head, Seq("o_orderstatus")).orderBy(col("o_orderstatus"))
      },
      Some("""WITH tag AS (SELECT o_orderstatus, COUNT(*) AS n_tag,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_tag
          FROM orders WHERE o_orderkey % 2 = 0 GROUP BY o_orderstatus),
        head AS (SELECT o_orderstatus, COUNT(*) AS n_head,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_head
          FROM orders GROUP BY o_orderstatus)
        SELECT o_orderstatus, n_tag, total_tag, n_head, total_head
        FROM tag JOIN head USING (o_orderstatus) ORDER BY o_orderstatus""")),

    // Write-audit-publish: stage an append on a branch (main untouched,
    // branch auditable), publish via CALL system.fast_forward through
    // the SQL catalog, then verify the published table. The result
    // carries the pre-publish main count and the branch count as
    // evidence that staging really was isolated.
    QueryDef("lake_wap_publish",
      (s, d) => {
        val whDir = wh("lake_wap_publish", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders")
        val even = orders.filter(col("o_orderkey") % 2 === 0)
        val odd = orders.filter(col("o_orderkey") % 2 === 1)
        val rep = Ingest.ingestDf(cat, "lake", "orders_wap", even)
        rep.table.appendToBranch("audit", odd)
        val mainBefore = rep.table.scan().count()
        val cn = sqlCatalog(s, "gwap", whDir)
        // the AUDIT step itself runs as a SQL query on the branch
        val branchCount = s.sql(
          s"SELECT COUNT(*) FROM $cn.lake.orders_wap VERSION AS OF 'audit'")
          .head().getLong(0)
        s.sql(s"CALL $cn.system.fast_forward('lake', 'orders_wap', 'audit')").collect()
        rep.table.scan()
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .withColumn("main_before", lit(mainBefore))
          .withColumn("branch_count", lit(branchCount))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
          (SELECT COUNT(*) FROM orders WHERE o_orderkey % 2 = 0) AS main_before,
          (SELECT COUNT(*) FROM orders) AS branch_count
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Time travel: two appends, read back snapshot 1 only.
    QueryDef("lake_time_travel",
      (s, d) => {
        val cat = new Snaplog(wh("lake_time_travel", d))
        val orders = t(s, d, "orders")
        val even = orders.filter(col("o_orderkey") % 2 === 0)
        val odd = orders.filter(col("o_orderkey") % 2 === 1)
        val rep = Ingest.ingestDf(cat, "lake", "orders", even)
        rep.table.append(odd)
        rep.table.scan(asOf = Some(1L))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders WHERE o_orderkey % 2 = 0
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Incremental (CDC) read: three appends, then read ONLY what landed
    // after snapshot 1 — metadata decides the delta file set, Spark
    // never touches snapshot-1 data.
    QueryDef("lake_incremental_read",
      (s, d) => {
        val cat = new Snaplog(wh("lake_incremental_read", d))
        val orders = t(s, d, "orders")
        val rep = Ingest.ingestDf(cat, "lake", "orders",
          orders.filter(col("o_orderkey") % 3 === 0))
        rep.table.append(orders.filter(col("o_orderkey") % 3 === 1))
        rep.table.append(orders.filter(col("o_orderkey") % 3 === 2))
        rep.table.scanIncremental(fromSnapshot = 1L)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders WHERE o_orderkey % 3 IN (1, 2)
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Row-level CHANGELOG read (scanChanges / Delta-CDF analogue):
    // appends, a DataFrame-valued equality delete, then another append —
    // the changelog must emit every insert, retract exactly the rows the
    // delete saw (not the later re-inserts of the same keys), and stamp
    // each change with its commit. Consumed through the SQL view surface
    // (registerChangesView) so both APIs are gated at once.
    QueryDef("lake_changelog",
      (s, d) => {
        val cat = new Snaplog(wh("lake_changelog", d))
        val orders = t(s, d, "orders")
        val rep = Ingest.ingestDf(cat, "lake", "orders",
          orders.filter(col("o_orderkey") % 3 === 0))            // 1
        rep.table.append(orders.filter(col("o_orderkey") % 3 === 1)) // 2
        rep.table.deleteEq("o_orderkey",                             // 3
          orders.filter(col("o_orderkey") % 5 === 0).select("o_orderkey"))
        rep.table.append(orders.filter(col("o_orderkey") % 3 === 2)) // 4
        rep.table.registerChangesView("lake_changelog_ch", 0L)
        s.sql("""SELECT _change_type AS change_type, o_orderstatus,
            COUNT(*) AS n,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          FROM lake_changelog_ch
          GROUP BY change_type, o_orderstatus
          ORDER BY change_type, o_orderstatus""")
      },
      Some("""SELECT change_type, o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM (
          SELECT 'insert' AS change_type, o_orderstatus, o_totalprice
          FROM orders
          UNION ALL
          SELECT 'delete' AS change_type, o_orderstatus, o_totalprice
          FROM orders
          WHERE o_orderkey % 3 IN (0, 1) AND o_orderkey % 5 = 0
        ) ch
        GROUP BY change_type, o_orderstatus
        ORDER BY change_type, o_orderstatus""")),

    // RETRACTION-CAPABLE incremental aggregate maintenance: the
    // additive variant (lake_incremental_agg) refuses delete-bearing
    // windows; here the maintained summary applies the CHANGELOG as
    // signed deltas (+insert/−delete, exact decimal partials), so it
    // stays correct across an equality delete AND a COW delete without
    // ever re-reading the base — maintained ≡ full recompute, which is
    // exactly what the oracle computes.
    QueryDef("lake_changelog_agg",
      (s, d) => {
        val whDir = wh("lake_changelog_agg", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders")
        val tbl = LakehouseTable.create(cat, s, "lake", "orders_cagg", orders.schema)
        tbl.append(orders.filter(col("o_orderkey") % 3 === 0))      // snap 1
        val baseAt = tbl.currentSnapshotId
        val base = tbl.scan().groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n0"),
            sum(col("o_totalprice").cast("decimal(18,2)")).as("s0"))
        tbl.append(orders.filter(col("o_orderkey") % 3 === 1))      // snap 2
        tbl.deleteEq("o_orderkey",                                  // snap 3
          orders.filter(col("o_orderkey") % 5 === 0).select("o_orderkey"))
        tbl.delete(col("o_orderkey") % 7 === 0)                     // snap 4 (COW)
        val tc = graft.table.LakehouseTable.ChangeTypeCol
        val sign = when(col(tc) === "insert" || col(tc) === "update_postimage",
          lit(1)).otherwise(lit(-1))
        val delta = tbl.scanChanges(baseAt)
          .groupBy(col("o_orderstatus"))
          .agg(sum(sign.cast("long")).as("dn"),
            sum((sign * col("o_totalprice")).cast("decimal(18,2)")).as("ds"))
        base.join(delta, Seq("o_orderstatus"), "full_outer")
          .select(col("o_orderstatus"),
            (coalesce(col("n0"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
            (coalesce(col("s0"), lit(java.math.BigDecimal.ZERO).cast("decimal(18,2)")) +
              coalesce(col("ds"), lit(java.math.BigDecimal.ZERO).cast("decimal(18,2)")))
              .cast("double").as("total"))
          .filter(col("n") > 0)
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        WHERE o_orderkey % 3 IN (0, 1)
          AND o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // KEYED changelog (scanChangesKeyed): a SQL COW UPDATE rewrites the
    // touched files; keyed pairing must classify exactly the modified
    // rows as update_preimage/update_postimage (copied carry rows
    // cancel, untouched files never appear) with the old and new prices
    // on the respective images — the oracle recomputes both sides.
    QueryDef("lake_changelog_updates",
      (s, d) => {
        val whDir = wh("lake_changelog_updates", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders")
        val tbl = LakehouseTable.create(cat, s, "lake", "orders_upd_cl", orders.schema)
        tbl.append(orders)                                        // snap 1
        val cn = sqlCatalog(s, "gclu", whDir)
        s.sql(s"""UPDATE $cn.lake.orders_upd_cl
          SET o_totalprice = o_totalprice + 1.0
          WHERE o_orderkey % 10 = 0""")                           // snap 2 (COW)
        tbl.scanChangesKeyed(Seq("o_orderkey"), 1L)
          .groupBy(
            col(graft.table.LakehouseTable.ChangeTypeCol).as("change_type"),
            col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("change_type"), col("o_orderstatus"))
      },
      Some("""SELECT change_type, o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM (
          SELECT 'update_preimage' AS change_type, o_orderstatus,
            o_totalprice AS price
          FROM orders WHERE o_orderkey % 10 = 0
          UNION ALL
          SELECT 'update_postimage' AS change_type, o_orderstatus,
            o_totalprice + 1.0 AS price
          FROM orders WHERE o_orderkey % 10 = 0
        ) ch
        GROUP BY change_type, o_orderstatus
        ORDER BY change_type, o_orderstatus""")),

    // Changelog across row-level DML: a COW delete (carries untouched
    // files, rewrites the rest — copied rows must CANCEL, never appear
    // as churn) followed by a MOR position delete (vector rows must
    // materialize as retractions). Everything after the ingest is a
    // 'delete'; the oracle recomputes the exact deleted-row set.
    QueryDef("lake_changelog_dml",
      (s, d) => {
        val cat = new Snaplog(wh("lake_changelog_dml", d))
        val li = t(s, d, "lineitem").filter(col("l_orderkey") % 4 === 0)
        val rep = Ingest.ingestDf(cat, "lake", "lineitem",
          li.repartitionByRange(4, col("l_orderkey")))         // 1
        rep.table.delete(col("l_quantity") >= 45)              // 2 (COW)
        rep.table.deleteMor(col("l_quantity") <= 2)            // 3 (MOR)
        rep.table.scanChanges(1L)
          .groupBy(
            col(graft.table.LakehouseTable.ChangeTypeCol).as("change_type"),
            col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            dsum(col("l_extendedprice")).as("revenue"))
          .orderBy(col("change_type"), col("l_returnflag"))
      },
      Some("""SELECT 'delete' AS change_type, l_returnflag, COUNT(*) AS n,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_orderkey % 4 = 0 AND (l_quantity >= 45 OR l_quantity <= 2)
        GROUP BY change_type, l_returnflag
        ORDER BY change_type, l_returnflag""")),

    // Stat-based file skipping: orders range-partitioned on the key so
    // data files carry disjoint [min,max] bounds; a key-range scan then
    // prunes to the matching files from LOG METADATA alone (Iceberg
    // manifest pruning) — the row-level filter on top keeps exactness.
    // PlanAuditSpec asserts the pruned file count.
    QueryDef("lake_file_skipping",
      (s, d) => {
        val cat = new Snaplog(wh("lake_file_skipping", d))
        val orders = t(s, d, "orders")
        val rep = Ingest.ingestDf(cat, "lake", "orders",
          orders.repartitionByRange(4, col("o_orderkey")))
        rep.table
          .scan(rangeFilter = Map("o_orderkey" -> (Some(1000.0), Some(3000.0))))
          .filter(col("o_orderkey").between(1000, 3000))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders WHERE o_orderkey BETWEEN 1000 AND 3000
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // BLOOM-FILTER SKIPPING (`write.bloom-filter-columns` property):
    // [min,max] bounds cannot prune point lookups on a high-cardinality
    // key whose values interleave across files (every file's range
    // covers every key) — a per-row-group bloom filter answers
    // "definitely absent" instead, and the parquet reader applies it to
    // pushed equality/IN predicates automatically. The gate asserts the
    // filters are physically present in every data file's footer
    // (in-result), then oracle-checks a point-IN lookup.
    QueryDef("lake_bloom_skipping",
      (s, d) => {
        val cat = new Snaplog(wh("lake_bloom_skipping", d))
        val orders = t(s, d, "orders")
        val tbl = LakehouseTable.create(cat, s, "lake", "orders_bloom",
          orders.schema,
          properties = Map("write.bloom-filter-columns" -> "o_orderkey"))
        tbl.append(orders.repartition(4))
        locally {
          val conf = s.sessionState.newHadoopConf()
          cat.liveFiles("lake", "orders_bloom").foreach { f =>
            val r = org.apache.parquet.hadoop.ParquetFileReader.open(
              org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
                new org.apache.hadoop.fs.Path(f.path), conf))
            try {
              import scala.jdk.CollectionConverters._
              assert(r.getFooter.getBlocks.asScala.forall(
                _.getColumns.asScala.exists(c =>
                  c.getPath.toDotString == "o_orderkey" &&
                    c.getBloomFilterOffset >= 0)),
                s"no bloom filter for o_orderkey in ${f.path}")
            } finally r.close()
          }
        }
        tbl.scan()
          .filter(col("o_orderkey").isin(1L, 7L, 32L, 9999999L))
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey IN (1, 7, 32, 9999999)
        ORDER BY o_orderkey""")),

    // TYPE WIDENING (Iceberg's safe schema promotions): int->bigint and
    // float->double are METADATA-ONLY — old files keep narrow physical
    // values (the vectorized reader widens, value-preserving), new
    // writes land wide, and at 100 TB no byte moves. The gate appends a
    // narrow batch, widens both columns, appends a second batch under
    // the wide schema, and oracle-checks aggregates over the mixed
    // files (MIN/MAX for the float axis — order-independent and
    // IEEE-exact across the float->double promotion).
    QueryDef("lake_type_widening",
      (s, d) => {
        val whDir = wh("lake_type_widening", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders")
        val narrow = orders.select(col("o_orderkey"),
          col("o_custkey").cast("int").as("cust"),
          col("o_totalprice").cast("float").as("price"))
        val tbl = LakehouseTable.create(cat, s, "lake", "orders_widen",
          narrow.schema)
        tbl.append(narrow.filter(col("o_orderkey") % 2 === 0))
        tbl.widenColumn("cust", org.apache.spark.sql.types.LongType)
        tbl.widenColumn("price", org.apache.spark.sql.types.DoubleType)
        tbl.append(narrow.filter(col("o_orderkey") % 2 === 1))
        require(tbl.scan().schema("cust").dataType ==
          org.apache.spark.sql.types.LongType, "widen did not stick")
        tbl.scan()
          .groupBy((col("o_orderkey") % 10).as("g"))
          .agg(count(lit(1)).as("n"), sum(col("cust")).as("sum_cust"),
            min(col("price")).as("min_p"), max(col("price")).as("max_p"))
          .orderBy(col("g"))
      },
      Some("""SELECT o_orderkey % 10 AS g, COUNT(*) AS n,
          CAST(SUM(CAST(o_custkey AS INTEGER)) AS BIGINT) AS sum_cust,
          CAST(MIN(CAST(o_totalprice AS REAL)) AS DOUBLE) AS min_p,
          CAST(MAX(CAST(o_totalprice AS REAL)) AS DOUBLE) AS max_p
        FROM orders GROUP BY g ORDER BY g""")),

    // DELETE-TIER COMPACTION (`rewriteDeleteFiles` — Iceberg's
    // rewrite_position_delete_files + dangling-delete removal, taken to
    // completion): outstanding equality deletes / position vectors
    // retire by re-materializing ONLY the data files they can touch —
    // a file whose key bounds are provably disjoint from the delete's
    // recorded key bounds carries BY PATH, unread. The gate appends two
    // key-disjoint batches, equality-deletes keys from the second, runs
    // the maintenance, and asserts in-result that (a) no delete entry
    // survives, (b) the first batch's files carried by path, then
    // oracle-checks the content.
    QueryDef("lake_rewrite_deletes",
      (s, d) => {
        val whDir = wh("lake_rewrite_deletes", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders")
        val tbl = LakehouseTable.create(cat, s, "lake", "orders_rdf",
          orders.schema)
        val lo = orders.filter(col("o_orderkey") < 1000)
        val hi = orders.filter(col("o_orderkey") >= 1000)
        tbl.append(lo)
        val loPaths = cat.liveFiles("lake", "orders_rdf").map(_.path).toSet
        tbl.append(hi)
        // delete a key range that lives entirely in the second batch
        val keys = hi.filter(col("o_orderkey") % 10 === 3)
          .select(col("o_orderkey"))
        tbl.deleteEq("o_orderkey", keys)
        val snap = tbl.rewriteDeleteFiles()
        require(cat.liveDeleteFiles("lake", "orders_rdf").isEmpty,
          "delete entries survived rewriteDeleteFiles")
        val after = cat.liveFiles("lake", "orders_rdf").map(_.path).toSet
        require(loPaths.subsetOf(after),
          "key-disjoint first batch was rewritten instead of carried")
        require(snap.summary("rewritten-files").toInt > 0,
          "nothing rewritten — the delete never applied")
        tbl.scan()
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        WHERE NOT (o_orderkey >= 1000 AND o_orderkey % 10 = 3)
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // RUNTIME FILE PRUNING (Spark's DSv2 dynamic partition pruning —
    // Iceberg's SparkScan runtime filtering): the dim side's filter
    // becomes a fact-side FILE drop at execution. Spark computes the
    // exact join-key value set from the (broadcast) dim and hands it to
    // the fact scan, which re-proves each file's recorded partition
    // value / transform index against it and drops provable misses
    // BEFORE tasks launch. At 100 TB this is the complement of
    // broadcast joins: `dim.n_name IN (...)` reads 3 of 25 fact
    // partitions, not all of them row-filtered. The gate asserts the
    // pruning actually fired (in-result: kept < planned files), then
    // oracle-checks the join.
    QueryDef("lake_runtime_pruning",
      (s, d) => {
        val whDir = wh("lake_runtime_pruning", d)
        val cat = new Snaplog(whDir)
        val cust = t(s, d, "customer")
        val facts = LakehouseTable.create(cat, s, "lake", "cust_rp",
          cust.schema, Seq("c_nationkey"))
        facts.append(cust)
        val cn = sqlCatalog(s, "grpq", whDir)
        graft.sql.GraftStreamableParquetScan.pruneLog.remove("lake.cust_rp")
        val dim = t(s, d, "nation")
          .filter(col("n_name").isin("NATION_3", "NATION_7", "NATION_12"))
        val j = s.table(s"$cn.lake.cust_rp")
          .join(dim, col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("total_bal"))
        val rows = j.collect().toSeq
        val (total, kept) = Option(
          graft.sql.GraftStreamableParquetScan.pruneLog.get("lake.cust_rp"))
          .getOrElse(throw new IllegalStateException(
            "runtime filter never reached the fact scan — DPP not planned"))
        require(kept < total,
          s"runtime pruning inert: kept $kept of $total files")
        s.createDataFrame(rows.asJava, j.schema).orderBy(col("n_name"))
      },
      Some("""SELECT n_name, COUNT(*) AS n,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_12')
        GROUP BY n_name ORDER BY n_name""")),

    // Bucketed co-located join: both sides written bucketed+sorted on
    // the join key → the sort-merge join runs with ZERO exchanges and
    // zero sorts (asserted in PlanAuditSpec). At 100 TB this is the
    // difference between shuffling the fact table per join and reading
    // co-partitioned buckets in place; the lineitem self-join keeps both
    // sides fact-sized so the broadcast planner can't hide the shuffle.
    QueryDef("bucketed_colocated_join",
      (s, d) => {
        val db = "graft_buck"
        s.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '${wh("bucketdb", d)}'")
        s.sql(s"DROP TABLE IF EXISTS $db.li")
        // one writer task per bucket → one file per bucket, so the scan
        // reports the in-bucket sort order and the merge join needs no
        // sort at all
        t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
          .repartition(8, col("l_orderkey"))
          .write.mode("overwrite")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .format("parquet").saveAsTable(s"$db.li")
        val a = s.table(s"$db.li").select(col("l_orderkey"),
          col("l_linenumber").as("ln_a"), col("l_extendedprice").as("price_a"))
        val b = s.table(s"$db.li").select(col("l_orderkey"),
          col("l_linenumber").as("ln_b"))
        // MERGE hint: at bench scale the projection would fit a
        // broadcast, which hides the co-location property being
        // demonstrated (at 100 TB neither side broadcasts)
        a.hint("merge").join(b.hint("merge"), Seq("l_orderkey"))
          .filter(col("ln_a") < col("ln_b"))
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n_pairs"), dsum(col("price_a")).as("price_sum"))
          .agg(count(lit(1)).as("n_orders"), sum(col("n_pairs")).as("n_pairs"),
            dsum(col("price_sum")).as("total"))
      },
      Some("""WITH p AS (
          SELECT a.l_orderkey, a.l_extendedprice AS price_a
          FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
            AND a.l_linenumber < b.l_linenumber),
        g AS (SELECT l_orderkey, COUNT(*) AS n_pairs,
            CAST(SUM(CAST(price_a AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
          FROM p GROUP BY l_orderkey)
        SELECT COUNT(*) AS n_orders, CAST(SUM(n_pairs) AS BIGINT) AS n_pairs,
          CAST(SUM(CAST(price_sum AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM g""")),

    // Equality-delete tier (Iceberg v2 equality deletes): DELETE WHERE
    // key IN (…) as ONE key-valued delete file — zero data scan, unlike
    // the position-vector path's pushdown pass — then a LATER append
    // re-inserts half the deleted keys, which must survive (the delete
    // applies only to files before it in replay order: keyed-CDC
    // semantics). Audited in-result: data files untouched, exactly one
    // key-valued delete entry.
    QueryDef("lake_delete_eq",
      (s, d) => {
        val cat = new Snaplog(wh("lake_delete_eq", d))
        val orders = t(s, d, "orders")
        val table = LakehouseTable.create(cat, s, "lake", "orders_eq", orders.schema)
        table.append(orders)
        val dataBefore = cat.liveFiles("lake", "orders_eq").map(_.path).toSet
        // key feed stays a DataFrame end-to-end: dedup + delete-file
        // write run as cluster jobs, nothing collects to the driver
        // (at 100 TB this key set is ~1/7 of all order keys)
        table.deleteEq("o_orderkey",
          orders.filter(col("o_orderkey") % 7 === 0).select("o_orderkey"))
        // no data file rewritten; one key-valued delete entry
        require(cat.liveFiles("lake", "orders_eq").map(_.path).toSet == dataBefore,
          "equality delete must not touch data files")
        val dels = cat.liveDeleteFiles("lake", "orders_eq")
        require(dels.size == 1 && dels.head.equalityKey.contains("o_orderkey"),
          s"expected one o_orderkey-valued delete file, got $dels")
        // later re-insert of a subset of deleted keys must survive
        table.append(orders.filter(col("o_orderkey") % 14 === 0))
        table.scan()
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""WITH content AS (
          SELECT * FROM orders WHERE o_orderkey % 7 <> 0
          UNION ALL
          SELECT * FROM orders WHERE o_orderkey % 14 = 0)
        SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM content GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // COMPOSITE-key equality delete (Iceberg field-list equality
    // deletes): a CDC feed keyed by the natural composite key
    // (l_orderkey, l_linenumber) retires TUPLES — rows match only when
    // every key column matches (a column-wise IN would delete far
    // more), plus the SQL conjunction route (`WHERE k1 = v1 AND
    // k2 = v2` under equality mode) landing in the same tier. Audited
    // in-result: data files untouched, composite-encoded delete
    // entries, SQL route taken.
    QueryDef("lake_delete_eq_composite",
      (s, d) => {
        val whDir = wh("lake_delete_eq_composite", d)
        val cat = new Snaplog(whDir)
        val li = t(s, d, "lineitem")
        val table = LakehouseTable.create(cat, s, "lake", "li_cdc", li.schema,
          properties = Map("write.delete.mode" -> "equality"))
        table.append(li)
        val dataBefore = cat.liveFiles("lake", "li_cdc").map(_.path).toSet
        // retire line 1 of every 5th order — a distributed tuple feed
        table.deleteEq(Seq("l_orderkey", "l_linenumber"),
          li.filter(col("l_orderkey") % 5 === 0 && col("l_linenumber") === 1)
            .select("l_orderkey", "l_linenumber"))
        // SQL conjunction: one more tuple through the DELETE statement
        val cn = sqlCatalog(s, "gceq", whDir)
        s.sql(s"DELETE FROM $cn.lake.li_cdc " +
          "WHERE l_orderkey = 3 AND l_linenumber = 2")
        val dels = cat.liveDeleteFiles("lake", "li_cdc")
        val untouched = cat.liveFiles("lake", "li_cdc").map(_.path).toSet == dataBefore
        table.scan()
          .groupBy(col("l_linestatus"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
          .withColumn("data_untouched", lit(untouched))
          .withColumn("composite_entries", lit(dels.size == 2 &&
            dels.forall(_.equalityKey.contains("l_orderkey,l_linenumber"))))
          .orderBy(col("l_linestatus"))
      },
      Some("""WITH content AS (
          SELECT l_linestatus, l_quantity FROM lineitem
          WHERE NOT (l_orderkey % 5 = 0 AND l_linenumber = 1)
            AND NOT (l_orderkey = 3 AND l_linenumber = 2))
        SELECT l_linestatus, COUNT(*) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
          TRUE AS data_untouched, TRUE AS composite_entries
        FROM content GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // DataFrame-valued equality deletes (CDC-feed shape): the delete
    // feed is ANOTHER TABLE — keys never collect to the driver. Leg 1
    // deletes via the native deleteEq(DataFrame); leg 2 re-inserts a
    // subset (replay-order survival) and deletes again through SQL
    // `DELETE … WHERE k IN (SELECT …)` under write.delete.mode=equality,
    // which must route to the SAME tier: audited in-result — data files
    // untouched by both deletes, exactly two key-valued delete entries,
    // zero rewritten files.
    QueryDef("lake_delete_eq_feed",
      (s, d) => {
        val whDir = wh("lake_delete_eq_feed", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders")
        val table = LakehouseTable.create(cat, s, "lake", "orders_cdc",
          orders.schema,
          properties = Map("write.delete.mode" -> "equality"))
        table.append(orders)
        val dataBefore = cat.liveFiles("lake", "orders_cdc").map(_.path).toSet
        // feed 1: a distributed key DataFrame (with duplicate rows —
        // the tier dedups on write)
        val feed1 = orders.filter(col("o_orderkey") % 7 === 0)
          .select("o_orderkey")
          .unionAll(orders.filter(col("o_orderkey") % 14 === 0)
            .select("o_orderkey"))
        table.deleteEq("o_orderkey", feed1)
        // re-insert a subset of the deleted keys: must survive (the
        // delete applies only to files before it in replay order)
        table.append(orders.filter(col("o_orderkey") % 14 === 0))
        // feed 2 through SQL: subquery-IN routes to the equality tier
        val cn = sqlCatalog(s, "gcdc", whDir)
        t(s, d, "customer").createOrReplaceTempView("cdc_churned")
        s.sql(s"""DELETE FROM $cn.lake.orders_cdc
          WHERE o_custkey IN (SELECT c_custkey FROM cdc_churned
                              WHERE c_mktsegment = 'BUILDING')""")
        require(cat.liveFiles("lake", "orders_cdc").map(_.path).toSet
            .intersect(dataBefore) == dataBefore,
          "equality deletes must not touch data files")
        val dels = cat.liveDeleteFiles("lake", "orders_cdc")
        require(dels.size == 2 && dels.forall(_.equalityKey.isDefined),
          s"expected two key-valued delete entries, got $dels")
        table.scan()
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""WITH content AS (
          SELECT * FROM orders WHERE o_orderkey % 7 <> 0
          UNION ALL
          SELECT * FROM orders WHERE o_orderkey % 14 = 0),
        kept AS (SELECT * FROM content WHERE o_custkey NOT IN
          (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'))
        SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM kept GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // COW UPDATE over an OUTSTANDING equality delete: the keyed-CDC
    // table takes row-level DML without compacting first. Affected
    // files materialize post-delete rows (deleted keys cannot be
    // resurrected by the rewrite); untouched covered files carry BY
    // PATH with the delete entry re-listed behind them, so the keyed
    // layering (delete → later re-insert survives) holds through the
    // reset commit — both claims asserted in-result.
    QueryDef("lake_update_eqdelete",
      (s, d) => {
        val whDir = wh("lake_update_eqdelete", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders")
        val table = LakehouseTable.create(cat, s, "lake", "orders_upd",
          orders.schema, partitionColumns = Seq("o_orderstatus"),
          properties = Map("write.delete.mode" -> "equality"))
        table.append(orders)
        // CDC: retire every 7th key (distributed feed), then re-insert
        // every 14th — replay order keeps the re-inserts visible
        table.deleteEq("o_orderkey",
          orders.filter(col("o_orderkey") % 7 === 0).select("o_orderkey"))
        table.append(orders.filter(col("o_orderkey") % 14 === 0)
          .withColumn("o_orderpriority", lit("REBORN")))
        val before = cat.liveFiles("lake", "orders_upd").map(_.path).toSet
        val cn = sqlCatalog(s, "gupd", whDir)
        s.sql(s"""UPDATE $cn.lake.orders_upd
          SET o_totalprice = o_totalprice + 1.0 WHERE o_orderstatus = 'F'""")
        val sum = cat.snapshots("lake", "orders_upd").last.summary
        val after = cat.liveFiles("lake", "orders_upd").map(_.path).toSet
        val carried = before.intersect(after).size
        val delLayer = cat.liveDeleteFiles("lake", "orders_upd")
        table.scan()
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .withColumn("delete_layer_carried",
            lit(delLayer.nonEmpty && delLayer.forall(_.equalityKey.isDefined)))
          .withColumn("other_partitions_carried",
            lit(carried >= 1 && sum.get("carried-files").exists(_.toInt >= 1)))
          .orderBy(col("o_orderstatus"))
      },
      Some("""WITH content AS (
          SELECT * FROM orders WHERE o_orderkey % 7 <> 0
          UNION ALL
          SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
            o_orderdate, 'REBORN' AS o_orderpriority
          FROM orders WHERE o_orderkey % 14 = 0),
        upd AS (SELECT o_orderstatus,
          CASE WHEN o_orderstatus = 'F' THEN o_totalprice + 1.0
               ELSE o_totalprice END AS o_totalprice
          FROM content)
        SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
          TRUE AS delete_layer_carried, TRUE AS other_partitions_carried
        FROM upd GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Hidden partitioning (Iceberg PartitionSpec semantics, beyond the
    // reference's identity-only spec): CREATE PARTITIONED BY (days(ts),
    // bucket(8, user_id)) → INSERT lays files out by the TRANSFORMED
    // values and records them in the log → a day-window scan on the raw
    // ts column prunes files purely from transform metadata (asserted
    // in-result: pruning must drop files or the query fails). At 100 TB
    // this is what makes an events table queryable: the user filters
    // ts, the engine reads only the touched days.
    QueryDef("lake_partition_transform",
      (s, d) => {
        val whDir = wh("lake_partition_transform", d)
        val cat = new Snaplog(whDir)
        cat.createNamespace("ns")
        val cn = sqlCatalog(s, "gptx", whDir)
        s.sql(s"""CREATE TABLE $cn.ns.ev
          (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
           event_type STRING, value DOUBLE)
          PARTITIONED BY (days(ts), bucket(8, user_id))""")
        events(s, d).select("event_id", "ts", "user_id", "event_type", "value")
          .createOrReplaceTempView("lpt_src")
        s.sql(s"INSERT INTO $cn.ns.ev SELECT * FROM lpt_src")
        val minTs = s.sql("SELECT MIN(ts) FROM lpt_src").head().getTimestamp(0)
        val start = new java.sql.Timestamp(minTs.getTime + 2L * 86400000)
        val end = new java.sql.Timestamp(minTs.getTime + 4L * 86400000)
        val cond = s"ts >= TIMESTAMP '$start' AND ts < TIMESTAMP '$end'"
        // prune audit: the 2-day window over ~30 days of data must drop
        // files from the plan, or the query fails (inputFiles is empty
        // for non-FileTable DSv2 relations, so count via the FileScan)
        val total = cat.liveFiles("ns", "ev").size
        val pruned = s.sql(s"SELECT * FROM $cn.ns.ev WHERE $cond")
          .queryExecution.sparkPlan
          .collect { case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan }
          .collect { case fs: org.apache.spark.sql.execution.datasources.v2.FileScan =>
            fs.fileIndex.inputFiles.length }.sum
        require(pruned > 0 && pruned < total,
          s"hidden-partition pruning inert: scanned $pruned of $total files")
        s.sql(s"""SELECT event_type, COUNT(*) AS n,
            CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
          FROM $cn.ns.ev WHERE $cond
          GROUP BY event_type ORDER BY event_type""")
      },
      Some("""WITH w AS (SELECT MIN(ts) + INTERVAL 2 DAY AS lo,
            MIN(ts) + INTERVAL 4 DAY AS hi FROM events)
        SELECT event_type, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM events, w WHERE ts >= w.lo AND ts < w.hi
        GROUP BY event_type ORDER BY event_type""")),

    // STORAGE-PARTITIONED JOIN: two graft tables identity-partitioned
    // on the same key report KeyGroupedPartitioning, so the join AND
    // the downstream aggregation plan with ZERO shuffles (asserted
    // in-line) — at 100 TB, a fact-fact join on the partition key with
    // no data movement. The aggregate then hash-matches the oracle.
    QueryDef("lake_spj_join",
      (s, d) => {
        val whDir = wh("lake_spj_join", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders")
        val facts = LakehouseTable.create(cat, s, "lake", "orders_spj",
          orders.schema, Seq("o_orderstatus"))
        facts.append(orders)
        val dim = orders.groupBy(col("o_orderstatus"))
          .agg(countDistinct(col("o_orderpriority")).as("n_prio"))
        val dimT = LakehouseTable.create(cat, s, "lake", "status_dim",
          dim.schema, Seq("o_orderstatus"))
        dimT.append(dim)
        val cn = sqlCatalog(s, "gspj", whDir)
        val pairs = Seq(
          "spark.sql.sources.v2.bucketing.enabled" -> "true",
          "spark.sql.adaptive.enabled" -> "false",
          "spark.sql.autoBroadcastJoinThreshold" -> "-1")
        val saved = pairs.map { case (k, _) => k -> s.conf.getOption(k) }
        pairs.foreach { case (k, v) => s.conf.set(k, v) }
        try {
          val j = s.table(s"$cn.lake.orders_spj")
            .join(s.table(s"$cn.lake.status_dim"), "o_orderstatus")
            .groupBy(col("o_orderstatus"), col("n_prio"))
            .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          val shuffles = j.queryExecution.executedPlan.collect {
            case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
          }.size
          require(shuffles == 0,
            s"storage-partitioned join inert: $shuffles shuffle(s) in\n" +
              j.queryExecution.executedPlan)
          // identity SPJ also reports per-partition key ordering
          // (SupportsReportOrdering) — the sort-merge join must drop
          // its sorts too, not just its exchanges
          val sorts = j.queryExecution.executedPlan.collect {
            case e: org.apache.spark.sql.execution.SortExec => e
          }.size
          require(sorts == 0,
            s"SPJ ordering report inert: $sorts sort(s) in\n" +
              j.queryExecution.executedPlan)
          // materialize under the SPJ plan, THEN order for determinism
          val rows = j.collect().toSeq
          s.createDataFrame(rows.asJava, j.schema)
            .orderBy(col("o_orderstatus"))
        } finally saved.foreach {
          case (k, Some(v)) => s.conf.set(k, v)
          case (k, None) => s.conf.unset(k)
        }
      },
      Some("""WITH dim AS (SELECT o_orderstatus,
            COUNT(DISTINCT o_orderpriority) AS n_prio
          FROM orders GROUP BY o_orderstatus)
        SELECT o.o_orderstatus, dim.n_prio, COUNT(*) AS n,
          CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders o JOIN dim ON o.o_orderstatus = dim.o_orderstatus
        GROUP BY o.o_orderstatus, dim.n_prio
        ORDER BY o.o_orderstatus""")),

    // STORAGE-PARTITIONED JOIN, BUCKET FORM — the marquee 100 TB case:
    // two fact tables bucket(8, key)-partitioned on a HIGH-CARDINALITY
    // join key (you bucket order keys, you don't identity-partition
    // them). The catalog's canonical V2 bucket function lets Spark
    // match both sides' transforms, and the key join plans with ZERO
    // shuffles (asserted in-line).
    QueryDef("lake_spj_bucket_join",
      (s, d) => {
        val whDir = wh("lake_spj_bucket_join", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders")
        val t1 = LakehouseTable.create(cat, s, "lake", "orders_b1",
          orders.schema, Seq("bucket(8,o_orderkey)"))
        t1.append(orders.filter(col("o_orderkey") % 2 === 0))
        val t2 = LakehouseTable.create(cat, s, "lake", "orders_b2",
          orders.schema, Seq("bucket(8,o_orderkey)"))
        t2.append(orders.filter(col("o_orderkey") % 4 === 0))
        val cn = sqlCatalog(s, "gspjb", whDir)
        val pairs = Seq(
          "spark.sql.sources.v2.bucketing.enabled" -> "true",
          "spark.sql.adaptive.enabled" -> "false",
          "spark.sql.autoBroadcastJoinThreshold" -> "-1")
        val saved = pairs.map { case (k, _) => k -> s.conf.getOption(k) }
        pairs.foreach { case (k, v) => s.conf.set(k, v) }
        try {
          val j = s.table(s"$cn.lake.orders_b1")
            .join(s.table(s"$cn.lake.orders_b2")
              .select(col("o_orderkey"), col("o_totalprice").as("p2")),
              "o_orderkey")
            .groupBy(col("o_orderstatus"))
            .agg(count(lit(1)).as("n"),
              dsum(col("o_totalprice")).as("total"))
          val shuffles = j.queryExecution.executedPlan.collect {
            case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
          }.size
          // the bucket JOIN itself must be shuffle-free; the status
          // aggregate afterwards legitimately re-shuffles (status is
          // not the partition key) — so assert on the join subtree by
          // bounding total shuffles to the aggregate's own exchange
          require(shuffles <= 1,
            s"bucket SPJ inert: $shuffles shuffles in\n" +
              j.queryExecution.executedPlan)
          val rows = j.collect().toSeq
          s.createDataFrame(rows.asJava, j.schema)
            .orderBy(col("o_orderstatus"))
        } finally saved.foreach {
          case (k, Some(v)) => s.conf.set(k, v)
          case (k, None) => s.conf.unset(k)
        }
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders WHERE o_orderkey % 4 = 0
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // STORAGE-PARTITIONED JOIN, TRUNCATE FORM: two fact tables
    // truncate(100000, key)-partitioned on the join key — the
    // range-friendly sibling of the bucket form (width multiples stay
    // order-preserving, so the same layout also serves range pruning).
    // The width rides in the catalog's unary `truncate_<w>` V2
    // function (Spark SPJ admits only single-child transforms), and
    // the key join plans shuffle-free (asserted in-line; the status
    // aggregate afterwards legitimately re-shuffles).
    QueryDef("lake_spj_truncate_join",
      (s, d) => {
        val whDir = wh("lake_spj_truncate_join", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders")
        val t1 = LakehouseTable.create(cat, s, "lake", "orders_t1",
          orders.schema, Seq("truncate(100000,o_orderkey)"))
        t1.append(orders.filter(col("o_orderkey") % 2 === 0))
        val t2 = LakehouseTable.create(cat, s, "lake", "orders_t2",
          orders.schema, Seq("truncate(100000,o_orderkey)"))
        t2.append(orders.filter(col("o_orderkey") % 4 === 0))
        val cn = sqlCatalog(s, "gspjt", whDir)
        val pairs = Seq(
          "spark.sql.sources.v2.bucketing.enabled" -> "true",
          "spark.sql.adaptive.enabled" -> "false",
          "spark.sql.autoBroadcastJoinThreshold" -> "-1")
        val saved = pairs.map { case (k, _) => k -> s.conf.getOption(k) }
        pairs.foreach { case (k, v) => s.conf.set(k, v) }
        try {
          val j = s.table(s"$cn.lake.orders_t1")
            .join(s.table(s"$cn.lake.orders_t2")
              .select(col("o_orderkey"), col("o_totalprice").as("p2")),
              "o_orderkey")
            .groupBy(col("o_orderstatus"))
            .agg(count(lit(1)).as("n"),
              dsum(col("o_totalprice")).as("total"))
          val shuffles = j.queryExecution.executedPlan.collect {
            case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
          }.size
          // join shuffle-free; only the status aggregate may exchange
          require(shuffles <= 1,
            s"truncate SPJ inert: $shuffles shuffles in\n" +
              j.queryExecution.executedPlan)
          val rows = j.collect().toSeq
          s.createDataFrame(rows.asJava, j.schema)
            .orderBy(col("o_orderstatus"))
        } finally saved.foreach {
          case (k, Some(v)) => s.conf.set(k, v)
          case (k, None) => s.conf.unset(k)
        }
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders WHERE o_orderkey % 4 = 0
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // WRITE-TIME CLUSTERING (`write.sort-order` table property): every
    // append range-shuffles + sorts on the property columns, so files
    // carry tight disjoint key bounds from birth — stat skipping then
    // prunes APPENDS the way compact(sortBy) prunes rewrites. The gate
    // requires the pruning to actually engage (files dropped from a
    // quarter-range scan) before checking the aggregate.
    QueryDef("lake_sort_order",
      (s, d) => {
        val cat = new Snaplog(wh("lake_sort_order", d))
        val orders = t(s, d, "orders")
        val table = LakehouseTable.create(cat, s, "lake", "orders_so",
          orders.schema, properties = Map("write.sort-order" -> "o_orderkey"))
        table.append(orders.filter(col("o_orderkey") % 2 === 0).repartition(4))
        table.append(orders.filter(col("o_orderkey") % 2 === 1).repartition(4))
        val b = orders.agg(min(col("o_orderkey")), max(col("o_orderkey"))).head()
        val lo = b.getLong(0)
        val cut = lo + (b.getLong(1) - lo) / 4
        val rf = Map("o_orderkey" ->
          (Option.empty[Double], Some(cut.toDouble)))
        val total = cat.liveFiles("lake", "orders_so").size
        val kept = table.selectFiles(rangeFilter = rf).size
        require(kept > 0 && kept < total,
          s"sort-order clustering inert: quarter-range scan kept $kept of $total files")
        table.scan(rangeFilter = rf)
          .filter(col("o_orderkey") <= cut)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""WITH w AS (SELECT MIN(o_orderkey) +
            (MAX(o_orderkey) - MIN(o_orderkey)) // 4 AS cut FROM orders)
        SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders, w WHERE o_orderkey <= w.cut
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // PARTIAL COMPACTION (rewriteDataFiles): a CDC-shaped table — bulk
    // ingest, a small-file append tail, an outstanding equality
    // delete — bin-packs ONLY the tail. The bulk files must carry by
    // path, the delete must stay outstanding and keep applying to the
    // carried files, and the rewritten rows must come out post-delete
    // (all audited in-line); the aggregate then proves content is
    // byte-for-byte the deleted-applied table.
    QueryDef("lake_rewrite_files",
      (s, d) => {
        val cat = new Snaplog(wh("lake_rewrite_files", d))
        val orders = t(s, d, "orders")
        val tbl = LakehouseTable.create(cat, s, "lake", "orders_rw", orders.schema)
        tbl.append(orders.filter(col("o_orderkey") % 2 === 0)
          .repartitionByRange(3, col("o_orderkey")))            // bulk: 3 files
        (0 to 2).foreach(i => tbl.append(
          orders.filter(col("o_orderkey") % 2 === 1 && col("o_orderkey") % 3 === i)))
        tbl.deleteEq("o_orderkey",                               // outstanding
          orders.filter(col("o_orderkey") % 10 === 0).select("o_orderkey"))
        val before = cat.liveFiles("lake", "orders_rw")
        val bulk = before.sortBy(-_.sizeBytes).take(3).map(_.path).toSet
        val snap = tbl.rewriteDataFiles(f => !bulk(f.path))
        val after = cat.liveFiles("lake", "orders_rw")
        require(bulk.subsetOf(after.map(_.path).toSet),
          "bulk files must carry by path through the partial rewrite")
        require(after.size < before.size,
          s"tail must bin-pack: ${after.size} vs ${before.size}")
        require(snap.summary("rewritten-files").toInt == before.size - 3 &&
            snap.summary("carried-delete-entries").toInt == 1,
          s"unexpected rewrite summary: ${snap.summary}")
        require(cat.liveDeleteFiles("lake", "orders_rw")
            .exists(_.equalityKey.contains("o_orderkey")),
          "the equality delete must stay outstanding (carried, not retired)")
        tbl.scan()
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders WHERE o_orderkey % 10 <> 0
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // PARTITION EVOLUTION (updateSpec): half the events land
    // unpartitioned, the spec evolves to days(ts) metadata-only, the
    // other half lands under the new layout. A day-window query over
    // the MIXED table must stay exact (old files survive pruning and
    // filter row-level) while still pruning the new-spec files outside
    // the window — both audited in-line before the aggregate.
    QueryDef("lake_spec_evolution",
      (s, d) => {
        val whDir = wh("lake_spec_evolution", d)
        val cat = new Snaplog(whDir)
        val ev = events(s, d)
          .select("event_id", "ts", "user_id", "event_type", "value")
        val table = LakehouseTable.create(cat, s, "lake", "ev_evolve", ev.schema)
        table.append(ev.filter(col("event_id") % 2 === 0)) // pre-evolution
        table.updateSpec(Seq("days(ts)"))                  // metadata-only
        table.append(ev.filter(col("event_id") % 2 === 1)) // days(ts) layout
        val files = cat.liveFiles("lake", "ev_evolve")
        require(files.exists(_.partitionValues.contains("ts_day")) &&
            files.exists(!_.partitionValues.contains("ts_day")),
          "expected mixed spec coverage after evolution")
        val cn = sqlCatalog(s, "gsev", whDir)
        val minTs = ev.agg(min(col("ts"))).head().getTimestamp(0)
        val start = new java.sql.Timestamp(minTs.getTime + 2L * 86400000)
        val end = new java.sql.Timestamp(minTs.getTime + 4L * 86400000)
        val cond = s"ts >= TIMESTAMP '$start' AND ts < TIMESTAMP '$end'"
        val total = files.size
        val pruned = s.sql(s"SELECT * FROM $cn.lake.ev_evolve WHERE $cond")
          .queryExecution.sparkPlan
          .collect { case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan }
          .collect { case fs: org.apache.spark.sql.execution.datasources.v2.FileScan =>
            fs.fileIndex.inputFiles.length }.sum
        require(pruned > 0 && pruned < total,
          s"mixed-spec pruning inert: scanned $pruned of $total files " +
            "(old files must ALL survive, new-spec files outside the " +
            "window must drop)")
        s.sql(s"""SELECT event_type, COUNT(*) AS n,
            CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
          FROM $cn.lake.ev_evolve WHERE $cond
          GROUP BY event_type ORDER BY event_type""")
      },
      Some("""WITH w AS (SELECT MIN(ts) + INTERVAL 2 DAY AS lo,
            MIN(ts) + INTERVAL 4 DAY AS hi FROM events)
        SELECT event_type, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM events, w WHERE ts >= w.lo AND ts < w.hi
        GROUP BY event_type ORDER BY event_type""")),

    // add_files: metadata-only registration of the source parquet itself
    // (zero copy, reference main-ray.py:109-121), then scan.
    QueryDef("lake_add_files",
      (s, d) => {
        val cat = new Snaplog(wh("lake_add_files", d))
        val ev = eventsRaw(s, d)
        val table = LakehouseTable.create(cat, s, "lake", "events", ev.schema)
        table.addFiles(Seq(s"$d/events.parquet"))
        table.scan()
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("total_value"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // SQL path (S10): registered temp view queried via spark.sql.
    QueryDef("lake_sql_view",
      (s, d) => {
        val cat = new Snaplog(wh("lake_sql_view", d))
        val rep = Ingest.run(s, cat, "lake", "nation", s"$d/nation.parquet")
        rep.table.registerView("lake_sql_view_nation")
        s.sql("""SELECT n_regionkey, COUNT(*) AS n_nations,
            MIN(n_name) AS first_nation
          FROM lake_sql_view_nation GROUP BY n_regionkey ORDER BY n_regionkey""")
      },
      Some("""SELECT n_regionkey, COUNT(*) AS n_nations, MIN(n_name) AS first_nation
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""")),

    // Transactional multi-append: 3 batches → exactly ONE snapshot
    // (reference main-polars.py:165-186). Result proves both the data
    // completeness and the single-commit property.
    QueryDef("lake_txn_append",
      (s, d) => {
        val cat = new Snaplog(wh("lake_txn_append", d))
        val li = t(s, d, "lineitem")
        val batches = Seq(
          li.filter(col("l_orderkey") % 3 === 0),
          li.filter(col("l_orderkey") % 3 === 1),
          li.filter(col("l_orderkey") % 3 === 2))
        val table = LakehouseTable.create(cat, s, "lake", "li_txn", li.schema)
        table.appendTransactional(batches)
        val nSnaps = cat.snapshots("lake", "li_txn").size.toLong
        table.scan().agg(count(lit(1)).as("n_rows"))
          .withColumn("n_snapshots", lit(nSnaps))
          .select(col("n_snapshots"), col("n_rows"))
      },
      Some("SELECT 1 AS n_snapshots, COUNT(*) AS n_rows FROM lineitem")),

    // Snapshot history (S21): deterministic projection of the log after
    // append → append → overwrite. Timestamps/file counts excluded
    // (nondeterministic); ids, ops and record counts are exact.
    QueryDef("lake_snapshot_history",
      (s, d) => {
        val cat = new Snaplog(wh("lake_snapshot_history", d))
        val orders = t(s, d, "orders")
        val rep = Ingest.ingestDf(cat, "lake", "orders",
          orders.filter(col("o_orderkey") % 2 === 0))
        rep.table.append(orders.filter(col("o_orderkey") % 2 === 1))
        rep.table.overwrite(orders.filter(col("o_orderstatus") === "F"))
        rep.table.history
          .select(col("snapshot_id"), col("operation"), col("num_records"))
          .orderBy(col("snapshot_id"))
      },
      Some("""SELECT 1 AS snapshot_id, 'append' AS operation,
          (SELECT COUNT(*) FROM orders WHERE o_orderkey % 2 = 0) AS num_records
        UNION ALL SELECT 2, 'append',
          (SELECT COUNT(*) FROM orders WHERE o_orderkey % 2 = 1)
        UNION ALL SELECT 3, 'overwrite',
          (SELECT COUNT(*) FROM orders WHERE o_orderstatus = 'F')
        ORDER BY snapshot_id""")),

    // Compaction: 3 small-file appends rewritten into ceil(bytes/512MB)
    // files by a `replace` commit — data identical, layout consolidated.
    // THE lakehouse maintenance op at scale (small-files problem).
    // Copy-on-write row-level DELETE: table partitioned by status, delete
    // hits only the 'F' partition → only those files rewrite; the other
    // partitions' files carry over untouched into the delete snapshot.
    // The partial-rewrite claim itself is part of the result (rewrote_all
    // must be false) and the surviving rows must match DuckDB exactly.
    QueryDef("lake_delete_where",
      (s, d) => {
        val cat = new Snaplog(wh("lake_delete_where", d))
        val orders = t(s, d, "orders")
        val rep = Ingest.ingestDf(cat, "lake", "orders_del", orders,
          partitionColumns = Seq("o_orderstatus"))
        val before = cat.liveFiles("lake", "orders_del").map(_.path).toSet
        val snap = rep.table.delete(
          col("o_orderstatus") === "F" && col("o_totalprice") > 200000.0)
        val after = cat.liveFiles("lake", "orders_del").map(_.path).toSet
        val carried = before.intersect(after).size.toLong
        rep.table.scan()
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .withColumn("last_op", lit(snap.operation))
          .withColumn("rewrote_all", lit(carried == 0L))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
          'delete' AS last_op, FALSE AS rewrote_all
        FROM orders
        WHERE NOT (o_orderstatus = 'F' AND o_totalprice > 200000.0)
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // SQL (Derby-backed) catalog deployment: the reference's headline
    // variant stores catalog metadata in a relational DB
    // (main-polars-psql.py:149-154). Here the SAME lifecycle — create,
    // partitioned ingest, upsert, time travel — runs against
    // JdbcCatalog (snapshot rows behind a PK-CAS instead of a log
    // file), then reads back through the DSv2 SQL catalog pointed at
    // the JDBC store via its url option. One query exercises the whole
    // alternate deployment end-to-end under the DuckDB oracle.
    QueryDef("lake_jdbc_catalog",
      (s, d) => {
        val whDir = wh("lake_jdbc_catalog", d)
        // Unique per-invocation Derby path + catalog name: Spark caches
        // DSv2 catalog instances per session+name (initialize never
        // re-runs on conf change) and Derby caches booted databases per
        // path — a re-run in the same session after the scratch wipe
        // would otherwise alias BOTH onto stale state.
        val runId = java.util.UUID.randomUUID().toString.take(8)
        val url = s"jdbc:derby:$whDir/cat-$runId;create=true"
        val cat = new JdbcCatalog(url, s"$whDir/wh")
        val orders = t(s, d, "orders")
        val rep = Ingest.ingestDf(cat, "lake", "orders_jdbc", orders,
          partitionColumns = Seq("o_orderstatus"))
        val patch = orders.filter(col("o_orderkey") % 10 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 2)
        Upsert.upsertTable(rep.table, patch, Seq("o_orderkey"))
        // this instance's work is done (the SQL below resolves through
        // the session catalog's OWN backing); release its connection
        cat.close()
        val cn = s"gjdbc_$runId"
        s.conf.set(s"spark.sql.catalog.$cn",
          classOf[graft.sql.GraftSqlCatalog].getName)
        s.conf.set(s"spark.sql.catalog.$cn.warehouse", s"$whDir/wh")
        s.conf.set(s"spark.sql.catalog.$cn.url", url)
        s.sql(s"""
          SELECT cur.o_orderstatus, cur.n, cur.total, v1.total_v1
          FROM (SELECT o_orderstatus, COUNT(*) AS n,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
                FROM $cn.lake.orders_jdbc GROUP BY o_orderstatus) cur
          JOIN (SELECT o_orderstatus,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_v1
                FROM $cn.lake.orders_jdbc VERSION AS OF 1
                GROUP BY o_orderstatus) v1 USING (o_orderstatus)
          ORDER BY o_orderstatus""")
      },
      Some("""WITH up AS (SELECT o_orderkey, o_orderstatus,
            CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
                 ELSE o_totalprice END AS price
          FROM orders)
        SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total,
          (SELECT CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           FROM orders o WHERE o.o_orderstatus = up.o_orderstatus) AS total_v1
        FROM up GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Incremental aggregate maintenance (the materialized summary-table
    // pattern): a per-status rollup is maintained from CDC deltas —
    // after new data lands, scanIncremental reads ONLY the added files,
    // the delta aggregates (a delta-sized shuffle), and the summary
    // merges partials instead of re-aggregating the base table. At
    // 100 TB this is the difference between touching a day's files and
    // touching the table. Partials stay DECIMAL until the final cast so
    // merge order cannot perturb doubles; the oracle recomputes the
    // rollup from the full source, proving base + delta == whole.
    QueryDef("lake_incremental_agg",
      (s, d) => {
        val whDir = wh("lake_incremental_agg", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders")
        def aggOf(df: org.apache.spark.sql.DataFrame) = df
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).as("total_dec"))
        val base = LakehouseTable.create(cat, s, "lake", "orders_ia", orders.schema)
        base.append(orders.filter(col("o_orderkey") % 2 === 0)) // snapshot 1
        val summary = LakehouseTable.create(cat, s, "lake", "orders_ia_sum",
          aggOf(orders).schema)
        summary.overwrite(aggOf(base.scan()))
        // new data lands; the summary updates from the DELTA ONLY
        base.append(orders.filter(col("o_orderkey") % 2 === 1)) // snapshot 2
        val delta = base.scanIncremental(fromSnapshot = 1L)
        val merged = summary.scan().unionByName(aggOf(delta))
          .groupBy(col("o_orderstatus"))
          .agg(sum(col("n")).as("n"), sum(col("total_dec")).as("total_dec"))
        summary.overwrite(merged)
        summary.scan()
          .select(col("o_orderstatus"), col("n"),
            col("total_dec").cast("double").as("total"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Native SQL catalog (DSv2 TableCatalog): snaplog tables queried BY
    // NAME through spark.sql — the Spark-first form of the reference's
    // DuckDB-over-Iceberg SQL read path, replacing temp views. The one
    // query joins the current snapshot against a VERSION AS OF 1
    // time-travel read of the same table; files resolve from log
    // metadata, and Spark's own vectorized parquet DSv2 handles the
    // scan (pushdown/pruning audited in SqlCatalogSpec).
    QueryDef("lake_sql_catalog",
      (s, d) => {
        val whDir = wh("lake_sql_catalog", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders")
        val tbl = LakehouseTable.create(cat, s, "lake", "orders_sqlcat",
          orders.schema)
        tbl.append(orders.filter(col("o_orderkey") % 2 === 0)) // snapshot 1
        tbl.append(orders.filter(col("o_orderkey") % 2 === 1)) // snapshot 2
        val cn = sqlCatalog(s, "gsql", whDir)
        s.sql(s"""
          SELECT cur.o_orderstatus, cur.n, cur.total, v1.n_v1
          FROM (SELECT o_orderstatus, COUNT(*) AS n,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
                FROM $cn.lake.orders_sqlcat GROUP BY o_orderstatus) cur
          JOIN (SELECT o_orderstatus, COUNT(*) AS n_v1
                FROM $cn.lake.orders_sqlcat VERSION AS OF 1
                GROUP BY o_orderstatus) v1 USING (o_orderstatus)
          ORDER BY o_orderstatus""")
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
          COUNT(*) FILTER (WHERE o_orderkey % 2 = 0) AS n_v1
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // SQL write path: INSERT INTO through the DSv2 catalog stages
    // parquet via Spark's own parquet writers and registers it with ONE
    // conditional snapshot-log commit — SQL inserts get the same
    // atomicity/optimistic concurrency as the API write path. The
    // result proves both content (API half + SQL half == whole table)
    // and the single-append-snapshot property.
    QueryDef("lake_sql_insert",
      (s, d) => {
        val whDir = wh("lake_sql_insert", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders")
        val tbl = LakehouseTable.create(cat, s, "lake", "orders_ins", orders.schema)
        tbl.append(orders.filter(col("o_orderkey") % 2 === 0)) // snapshot 1 (API)
        val cn = sqlCatalog(s, "gins", whDir)
        orders.filter(col("o_orderkey") % 2 === 1)
          .createOrReplaceTempView("lake_sql_insert_src")
        s.sql(s"INSERT INTO $cn.lake.orders_ins SELECT * FROM lake_sql_insert_src")
        val snaps = cat.snapshots("lake", "orders_ins")
        s.sql(s"""SELECT o_orderstatus, COUNT(*) AS n,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          FROM $cn.lake.orders_ins GROUP BY o_orderstatus""")
          .withColumn("n_snapshots", lit(snaps.size.toLong))
          .withColumn("last_op", lit(snaps.last.operation))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
          2 AS n_snapshots, 'append' AS last_op
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Ref time travel through SQL: VERSION AS OF accepts tag/branch
    // NAMES, so a release pin ('v1') and a moving branch ('dev') are
    // both addressable from the ANSI surface — the Spark-first form of
    // Iceberg's ref-based time travel.
    QueryDef("lake_sql_ref_travel",
      (s, d) => {
        val whDir = wh("lake_sql_ref_travel", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders")
        val tbl = LakehouseTable.create(cat, s, "lake", "orders_ref", orders.schema)
        tbl.append(orders.filter(col("o_orderkey") % 2 === 0)) // snapshot 1
        tbl.tag("v1")
        tbl.append(orders.filter(col("o_orderkey") % 2 === 1)) // snapshot 2
        tbl.setBranch("dev", 2L)
        val cn = sqlCatalog(s, "gref", whDir)
        s.sql(s"""
          SELECT o_orderstatus, n_tag, total_tag, n_head
          FROM (SELECT o_orderstatus, COUNT(*) AS n_tag,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_tag
                FROM $cn.lake.orders_ref VERSION AS OF 'v1'
                GROUP BY o_orderstatus) tag
          JOIN (SELECT o_orderstatus, COUNT(*) AS n_head
                FROM $cn.lake.orders_ref VERSION AS OF 'dev'
                GROUP BY o_orderstatus) head USING (o_orderstatus)
          ORDER BY o_orderstatus""")
      },
      Some("""WITH tag AS (SELECT o_orderstatus, COUNT(*) AS n_tag,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_tag
          FROM orders WHERE o_orderkey % 2 = 0 GROUP BY o_orderstatus),
        head AS (SELECT o_orderstatus, COUNT(*) AS n_head
          FROM orders GROUP BY o_orderstatus)
        SELECT o_orderstatus, n_tag, total_tag, n_head
        FROM tag JOIN head USING (o_orderstatus) ORDER BY o_orderstatus""")),

    // Column RENAME via parquet field-id indirection: metadata-only
    // evolution (zero data movement). Half the table is written under
    // the OLD column name, the column renames, the other half lands
    // under the NEW name — and the aggregate over BOTH eras must
    // hash-match DuckDB over the source column, proving old files'
    // values resolve BY FIELD ID under the renamed label.
    QueryDef("lake_column_rename",
      (s, d) => {
        val whDir = wh("lake_column_rename", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders")
        val tbl = LakehouseTable.create(cat, s, "lake", "orders_ren", orders.schema)
        tbl.append(orders.filter(col("o_orderkey") % 2 === 0)) // old name era
        tbl.renameColumn("o_totalprice", "price")
        tbl.append(orders.filter(col("o_orderkey") % 2 === 1)
          .withColumnRenamed("o_totalprice", "price"))        // new name era
        val cn = sqlCatalog(s, "gren", whDir)
        s.sql(s"""SELECT o_orderstatus, COUNT(*) AS n,
            CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total_price
          FROM $cn.lake.orders_ren GROUP BY o_orderstatus
          ORDER BY o_orderstatus""")
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Snapshot rollback from SQL: a bad commit is undone by CALL
    // rollback_to_snapshot — a METADATA-ONLY overwrite commit re-listing
    // the target's live file set (zero data movement at any size), with
    // the bad commit still auditable via VERSION AS OF. The result joins
    // the post-rollback content (evens only) against the time-travel
    // audit read (everything), plus the commit-count evidence.
    QueryDef("lake_sql_rollback",
      (s, d) => {
        val whDir = wh("lake_sql_rollback", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders")
        val tbl = LakehouseTable.create(cat, s, "lake", "orders_rb", orders.schema)
        tbl.append(orders.filter(col("o_orderkey") % 2 === 0)) // snapshot 1
        tbl.append(orders.filter(col("o_orderkey") % 2 === 1)) // snapshot 2: "bad"
        val cn = sqlCatalog(s, "grb", whDir)
        s.sql(s"CALL $cn.system.rollback_to_snapshot('lake', 'orders_rb', 1)")
        val snaps = cat.snapshots("lake", "orders_rb")
        s.sql(s"""
          SELECT cur.o_orderstatus, cur.n, cur.total, aud.n_audit
          FROM (SELECT o_orderstatus, COUNT(*) AS n,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
                FROM $cn.lake.orders_rb GROUP BY o_orderstatus) cur
          JOIN (SELECT o_orderstatus, COUNT(*) AS n_audit
                FROM $cn.lake.orders_rb VERSION AS OF 2
                GROUP BY o_orderstatus) aud USING (o_orderstatus)""")
          .withColumn("n_snapshots", lit(snaps.size.toLong))
          .withColumn("last_op", lit(snaps.last.operation))
          .orderBy(col("o_orderstatus"))
      },
      Some("""WITH cur AS (SELECT o_orderstatus, COUNT(*) AS n,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          FROM orders WHERE o_orderkey % 2 = 0 GROUP BY o_orderstatus),
        aud AS (SELECT o_orderstatus, COUNT(*) AS n_audit
          FROM orders GROUP BY o_orderstatus)
        SELECT o_orderstatus, n, total, n_audit,
          3 AS n_snapshots, 'overwrite' AS last_op
        FROM cur JOIN aud USING (o_orderstatus) ORDER BY o_orderstatus""")),

    // Streaming READ of a lakehouse table (spark.readStream.table):
    // offsets are snapshot ids, so each micro-batch plans its file set
    // from log metadata alone — the Iceberg/Delta lakehouse-as-a-stream
    // pattern. The query proves EXACTLY-ONCE DELTA RESUME: run 1
    // streams the table's content (evens), a second commit lands, run 2
    // resumes from the checkpoint and appends ONLY the delta (odds) to
    // the sink. If resume re-read history the evens would double and
    // the oracle (one copy of every order) would hash-mismatch.
    QueryDef("stream_table_source",
      (s, d) => {
        val whDir = wh("stream_table_source", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders")
        val tbl = LakehouseTable.create(cat, s, "lake", "orders_tail", orders.schema)
        val cn = sqlCatalog(s, "gtail", whDir)
        val ckpt = scratchDir("stream_table_source_ck", d)
        val out = scratchDir("stream_table_source_out", d)
        def runOnce(): Unit = {
          val q = s.readStream.table(s"$cn.lake.orders_tail")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination(300000)
          q.exception.foreach(throw _)
        }
        tbl.append(orders.filter(col("o_orderkey") % 2 === 0)) // snapshot 1
        runOnce()                                              // initial content
        tbl.append(orders.filter(col("o_orderkey") % 2 === 1)) // snapshot 2
        runOnce()                                              // delta only
        s.read.schema(orders.schema).parquet(out)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // VIRGIN stream over a table whose checkpoint-folded initial
    // content carries an OUTSTANDING position-delete vector — the
    // refusal-turned-materialization: the source applies the batch
    // scan's MOR subtraction for the initial batch (into unregistered
    // staging files, dropped at stream stop) instead of demanding a
    // compact-first. A small checkpoint interval forces the auto-fold,
    // so the latest reset's live set includes the vector — exactly the
    // shape a long-lived CDC table presents to a new consumer. The
    // vector must still be OUTSTANDING after the run (the stream
    // materialized a copy; it never mutated the table) — claimed
    // in-result. A delta resume after a later append proves the
    // checkpoint continues normally past the materialized batch.
    QueryDef("stream_mor_initial",
      (s, d) => {
        val whDir = wh("stream_mor_initial", d)
        val cat = new Snaplog(whDir, checkpointInterval = 2)
        val orders = t(s, d, "orders")
        val tbl = LakehouseTable.create(cat, s, "lake", "orders_mi", orders.schema)
        val cn = sqlCatalog(s, "gmi", whDir)
        val ckpt = scratchDir("stream_mor_initial_ck", d)
        val out = scratchDir("stream_mor_initial_out", d)
        def runOnce(): Unit = {
          val q = s.readStream.table(s"$cn.lake.orders_mi")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination(300000)
          q.exception.foreach(throw _)
        }
        tbl.append(orders.filter(col("o_orderkey") % 2 === 0))  // snap 1
        tbl.deleteMor(col("o_orderkey") % 6 === 0)              // snap 2 + fold
        require(cat.snapshots("lake", "orders_mi")
            .exists(_.operation == Snaplog.OpCheckpoint),
          "fixture must fold so the initial content carries the vector")
        runOnce() // virgin: initial batch MATERIALIZES the subtraction
        val outstanding = cat.liveDeleteFiles("lake", "orders_mi").nonEmpty
        tbl.append(orders.filter(col("o_orderkey") % 2 === 1))  // delta
        runOnce() // checkpointed resume: odds only
        s.read.schema(orders.schema).parquet(out)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .withColumn("vector_outstanding", lit(outstanding))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
          TRUE AS vector_outstanding
        FROM orders WHERE o_orderkey % 6 <> 0
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Streaming tail ACROSS an equality delete (the refusal-turned-
    // delta): run 1 streams the evens, then a keyed delete feed and an
    // append of the odds land, run 2 resumes from the checkpoint —
    // admission crosses the delete commit (its keys touch only rows run
    // 1 already emitted) and emits exactly the odd delta. The sink then
    // holds every order once ('tail' leg); the table's own batch scan
    // nets the delete out ('net' leg) — both legs oracle-checked, so
    // skip-vs-subtract semantics are each pinned.
    QueryDef("stream_eqdelete_tail",
      (s, d) => {
        val whDir = wh("stream_eqdelete_tail", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders")
        val tbl = LakehouseTable.create(cat, s, "lake", "orders_eqtail", orders.schema)
        val cn = sqlCatalog(s, "geqt", whDir)
        val ckpt = scratchDir("stream_eqdelete_tail_ck", d)
        val out = scratchDir("stream_eqdelete_tail_out", d)
        def runOnce(): Unit = {
          val q = s.readStream.table(s"$cn.lake.orders_eqtail")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination(300000)
          q.exception.foreach(throw _)
        }
        tbl.append(orders.filter(col("o_orderkey") % 2 === 0))    // snap 1
        runOnce()                                                 // evens emitted
        tbl.deleteEq("o_orderkey",                                // snap 2
          orders.filter(col("o_orderkey") % 6 === 0).select("o_orderkey"))
        tbl.append(orders.filter(col("o_orderkey") % 2 === 1))    // snap 3
        runOnce()                                                 // odds only
        require(cat.liveDeleteFiles("lake", "orders_eqtail")
            .exists(_.equalityKey.contains("o_orderkey")),
          "the eq delete must still be outstanding (streamed across, not applied)")
        val agg = (df: DataFrame, leg: String) => df
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .withColumn("leg", lit(leg))
        agg(s.read.schema(orders.schema).parquet(out), "tail")
          .unionByName(agg(tbl.scan(), "net"))
          .orderBy(col("leg"), col("o_orderstatus"))
      },
      Some("""WITH tail AS (SELECT 'tail' AS leg, o_orderstatus, COUNT(*) AS n,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          FROM orders GROUP BY o_orderstatus),
        net AS (SELECT 'net' AS leg, o_orderstatus, COUNT(*) AS n,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          FROM orders WHERE o_orderkey % 6 <> 0 GROUP BY o_orderstatus)
        SELECT o_orderstatus, n, total, leg FROM tail
        UNION ALL SELECT o_orderstatus, n, total, leg FROM net
        ORDER BY leg, o_orderstatus""")),

    // Streaming CHANGE FEED (readStream.format("graft-changes")): run 1
    // streams the evens' inserts; an equality delete and an append of
    // the odds land; run 2 resumes from the checkpoint and must emit the
    // RETRACTIONS of rows run 1 already delivered (the append-only table
    // stream's documented blind spot) plus the odd inserts — no
    // duplicates across the restart (any re-emission doubles a count and
    // breaks the oracle).
    QueryDef("stream_changelog",
      (s, d) => {
        val whDir = wh("stream_changelog", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders")
        val tbl = LakehouseTable.create(cat, s, "lake", "orders_cf", orders.schema)
        val ckpt = scratchDir("stream_changelog_ck", d)
        val out = scratchDir("stream_changelog_out", d)
        def runOnce(): Unit = {
          val q = s.readStream.format("graft-changes")
            .option("warehouse", whDir).option("table", "lake.orders_cf")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination(300000)
          q.exception.foreach(throw _)
        }
        tbl.append(orders.filter(col("o_orderkey") % 2 === 0))   // snap 1
        runOnce()                                                // even inserts
        tbl.deleteEq("o_orderkey",                               // snap 2
          orders.filter(col("o_orderkey") % 6 === 0).select("o_orderkey"))
        tbl.append(orders.filter(col("o_orderkey") % 2 === 1))   // snap 3
        runOnce()                                                // retractions + odds
        s.read.schema(tbl.changesSchema).parquet(out)
          .groupBy(
            col(graft.table.LakehouseTable.ChangeTypeCol).as("change_type"),
            col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("change_type"), col("o_orderstatus"))
      },
      Some("""SELECT change_type, o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM (
          SELECT 'insert' AS change_type, o_orderstatus, o_totalprice
          FROM orders
          UNION ALL
          SELECT 'delete' AS change_type, o_orderstatus, o_totalprice
          FROM orders WHERE o_orderkey % 6 = 0
        ) ch
        GROUP BY change_type, o_orderstatus
        ORDER BY change_type, o_orderstatus""")),

    // END-TO-END CDC REPLICATION: the change feed drives a MERGE apply
    // into a replica table — run 1 replicates the initial content, CDC
    // lands on the source (keyed delete + re-append), run 2 resumes
    // from the checkpoint and applies ONLY the new changes (retraction
    // ordering via a per-change sequence: delete-before-insert within
    // a commit, commits by snapshot id). Done when the replica's scan
    // equals the source's visible state — which the oracle recomputes
    // independently.
    QueryDef("stream_cdc_replicate",
      (s, d) => {
        val whDir = wh("stream_cdc_replicate", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders")
        val src = LakehouseTable.create(cat, s, "lake", "orders_src", orders.schema)
        val dst = LakehouseTable.create(cat, s, "lake", "orders_dst", orders.schema)
        val ckpt = scratchDir("stream_cdc_replicate_ck", d)
        def replicateOnce(): Unit = {
          val q = s.readStream.format("graft-changes")
            .option("warehouse", whDir).option("table", "lake.orders_src")
            .load()
            .writeStream
            .foreachBatch { (batch: DataFrame, _: Long) =>
              val tc = graft.table.LakehouseTable.ChangeTypeCol
              val sc = graft.table.LakehouseTable.ChangeSnapshotCol
              // persist across the emptiness check and the apply: the
              // change-feed batch is a LAZY changelog plan (per-commit
              // scans + broadcast key builds), so without the cache the
              // isEmpty probe and applyChanges would each compute it
              // (round 18); change sets are window-sized by contract
              val changes = batch
                .withColumn("op",
                  when(col(tc) === "delete", lit("D")).otherwise(lit("U")))
                .withColumn("seq", col(sc) * 2 +
                  when(col(tc) === "insert", 1L).otherwise(0L))
                .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
              try {
                if (!changes.isEmpty)
                  Upsert.applyChanges(dst, changes, keys = Seq("o_orderkey"),
                    opCol = "op", tiebreak = Some("seq"))
              } finally changes.unpersist(false)
              ()
            }
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination(300000)
          q.exception.foreach(throw _)
        }
        src.append(orders.filter(col("o_orderkey") % 2 === 0))   // snap 1
        replicateOnce()                                          // initial
        src.deleteEq("o_orderkey",                               // snap 2
          orders.filter(col("o_orderkey") % 6 === 0).select("o_orderkey"))
        src.append(orders.filter(col("o_orderkey") % 2 === 1))   // snap 3
        replicateOnce()                                          // delta only
        // replica applies each change batch DELTA-SIZED: merge-on-read
        // commits only (eq-delete key file + batch data), and no later
        // commit ever rewrites or drops an earlier batch's data file
        locally {
          val snaps = cat.snapshots("lake", "orders_dst")
          assert(snaps.nonEmpty &&
            snaps.forall(_.operation == graft.catalog.Snaplog.OpEqDelete),
            s"replica must commit merge-on-read, got ${snaps.map(_.operation)}")
          snaps.foldLeft(Set.empty[String]) { (prior, snap) =>
            val live = cat.liveFiles("lake", "orders_dst", Some(snap.snapshotId))
              .map(_.path).toSet
            assert(prior.subsetOf(live),
              "replica merge commit rewrote or dropped a prior batch's data file")
            prior ++ snap.files.filterNot(_.deleteFile.contains(true)).map(_.path)
          }
        }
        dst.scan()
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders WHERE o_orderkey % 6 <> 0
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Incremental read across an in-window equality delete: the NET
    // delta — window adds (the odds) minus the keys a later in-window
    // delete matched, by the same replay-order rules a full scan uses.
    // The keyed-CDC tier composing with incremental consumption.
    QueryDef("lake_incremental_eqdelete",
      (s, d) => {
        val cat = new Snaplog(wh("lake_incremental_eqdelete", d))
        val orders = t(s, d, "orders")
        val tbl = LakehouseTable.create(cat, s, "lake", "orders_eqinc", orders.schema)
        tbl.append(orders.filter(col("o_orderkey") % 2 === 0))    // snap 1
        val from = tbl.currentSnapshotId
        tbl.append(orders.filter(col("o_orderkey") % 2 === 1))    // snap 2
        tbl.deleteEq("o_orderkey",                                // snap 3
          orders.filter(col("o_orderkey") % 3 === 0).select("o_orderkey"))
        tbl.scanIncremental(from)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders WHERE o_orderkey % 2 = 1 AND o_orderkey % 3 <> 0
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Merge-on-read SQL reads: a table with OUTSTANDING delete vectors
    // stays queryable by name — the DSv2 scan plans the same broadcast
    // anti-join subtraction the native scan uses (no forced compaction
    // between a cheap MOR delete and the SQL surface).
    QueryDef("lake_sql_mor_read",
      (s, d) => {
        val whDir = wh("lake_sql_mor_read", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders")
        val rep = Ingest.ingestDf(cat, "lake", "orders_morsql", orders)
        rep.table.deleteMor(
          col("o_orderstatus") === "F" && col("o_totalprice") > 200000.0)
        val nVectors = cat.liveDeleteFiles("lake", "orders_morsql").size.toLong
        val cn = sqlCatalog(s, "gmor", whDir)
        s.sql(s"""SELECT o_orderstatus, COUNT(*) AS n,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          FROM $cn.lake.orders_morsql GROUP BY o_orderstatus""")
          .withColumn("n_vectors", lit(nVectors))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
          1 AS n_vectors
        FROM orders
        WHERE NOT (o_orderstatus = 'F' AND o_totalprice > 200000.0)
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // SQL UPDATE + DELETE + MERGE INTO: Spark's row-level-operation
    // rewrite over the DSv2 catalog — FILE-GRANULAR group-based
    // copy-on-write, each statement one conditional commit. The table
    // lands as three files with disjoint o_orderkey ranges; the
    // selective UPDATE (doubles every 10th order's price below key
    // 5000) must CARRY the two out-of-range files unrewritten (the
    // result embeds the carried-file count as evidence). A translatable
    // SQL DELETE then stacks a merge-on-read position vector, and the
    // MERGE runs on the MOR-outstanding table — the rewrite sees
    // post-delete rows and its reset commit retires the vectors (also
    // embedded as evidence).
    QueryDef("lake_sql_update_merge",
      (s, d) => {
        val whDir = wh("lake_sql_update_merge", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders")
        val tbl = LakehouseTable.create(cat, s, "lake", "orders_upd", orders.schema)
        tbl.append(orders.filter(col("o_orderkey") <= 5000).coalesce(1))
        tbl.append(orders.filter(col("o_orderkey") > 5000 &&
          col("o_orderkey") <= 10000).coalesce(1))
        tbl.append(orders.filter(col("o_orderkey") > 10000).coalesce(1))
        val cn = sqlCatalog(s, "gupd", whDir)
        s.sql(s"""UPDATE $cn.lake.orders_upd
          SET o_totalprice = o_totalprice * 2
          WHERE o_orderkey % 10 = 0 AND o_orderkey <= 5000""")
        val carried = cat.snapshots("lake", "orders_upd").last.summary
          .getOrElse("carried-files", "?")
        s.sql(s"DELETE FROM $cn.lake.orders_upd WHERE o_totalprice < 5000.0")
        orders.filter(col("o_orderkey") % 10 === 1 &&
            col("o_totalprice") >= 5000.0)
          .withColumn("o_orderstatus", lit("U"))
          .unionByName(orders.filter(col("o_orderkey") % 10 === 2)
            .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
            .withColumn("o_orderstatus", lit("N")))
          .createOrReplaceTempView("lake_sql_merge_src")
        s.sql(s"""MERGE INTO $cn.lake.orders_upd t USING lake_sql_merge_src src
          ON t.o_orderkey = src.o_orderkey
          WHEN MATCHED THEN UPDATE SET t.o_orderstatus = src.o_orderstatus
          WHEN NOT MATCHED THEN INSERT *""")
        val engines = cat.snapshots("lake", "orders_upd")
          .flatMap(_.summary.get("engine")).mkString(",")
        val vecAfter = cat.liveDeleteFiles("lake", "orders_upd").size
        s.sql(s"""SELECT o_orderstatus, COUNT(*) AS n,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          FROM $cn.lake.orders_upd GROUP BY o_orderstatus""")
          .withColumn("evidence",
            lit(s"$engines,carried=$carried,vecAfter=$vecAfter"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""WITH upd AS (SELECT o_orderkey,
            CASE WHEN o_orderkey % 10 = 1 THEN 'U' ELSE o_orderstatus END AS st,
            CASE WHEN o_orderkey % 10 = 0 AND o_orderkey <= 5000
                 THEN o_totalprice * 2 ELSE o_totalprice END AS price
          FROM orders),
        surv AS (SELECT st, price FROM upd WHERE NOT (price < 5000.0)),
        ins AS (SELECT 'N' AS st, o_totalprice AS price
          FROM orders WHERE o_orderkey % 10 = 2),
        merged AS (SELECT * FROM surv UNION ALL SELECT * FROM ins)
        SELECT st AS o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total,
          'sql-update,sql-merge,carried=2,vecAfter=0' AS evidence
        FROM merged GROUP BY st ORDER BY st""")),

    // SQL DDL lifecycle: CREATE TABLE → INSERT INTO → CTAS → INSERT
    // OVERWRITE → DROP TABLE, entirely through spark.sql against the
    // DSv2 catalog. Each write is one conditional commit; CREATE/DROP
    // are metadata commits on the backing catalog.
    QueryDef("lake_sql_ddl",
      (s, d) => {
        val whDir = wh("lake_sql_ddl", d)
        val cat = new Snaplog(whDir)
        cat.createNamespace("lake")
        val cn = sqlCatalog(s, "gddl", whDir)
        t(s, d, "orders").createOrReplaceTempView("lake_sql_ddl_src")
        s.sql(s"""CREATE TABLE $cn.lake.ddl_orders
          (o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)""")
        s.sql(s"""INSERT INTO $cn.lake.ddl_orders
          SELECT o_orderkey, o_orderstatus, o_totalprice
          FROM lake_sql_ddl_src WHERE o_orderkey % 3 = 0""")
        s.sql(s"""CREATE TABLE $cn.lake.ddl_hot AS
          SELECT * FROM $cn.lake.ddl_orders WHERE o_totalprice > 150000.0""")
        s.sql(s"""INSERT OVERWRITE $cn.lake.ddl_hot
          SELECT o_orderkey, o_orderstatus, o_totalprice * 2
          FROM lake_sql_ddl_src
          WHERE o_orderkey % 3 = 0 AND o_totalprice > 150000.0""")
        s.sql(s"DROP TABLE $cn.lake.ddl_orders")
        // TRUNCATE: metadata-only overwrite commit (no data file touched)
        s.sql(s"CREATE TABLE $cn.lake.ddl_tmp AS SELECT * FROM $cn.lake.ddl_hot")
        s.sql(s"TRUNCATE TABLE $cn.lake.ddl_tmp")
        val truncated = s.sql(s"SELECT COUNT(*) FROM $cn.lake.ddl_tmp")
          .head().getLong(0)
        val engines = cat.snapshots("lake", "ddl_hot")
          .flatMap(_.summary.get("engine")).mkString(",")
        s.sql(s"""SELECT o_orderstatus, COUNT(*) AS n,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          FROM $cn.lake.ddl_hot GROUP BY o_orderstatus""")
          .withColumn("engines", lit(engines))
          .withColumn("dropped", lit(!cat.tableExists("lake", "ddl_orders")))
          .withColumn("truncated_rows", lit(truncated))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice * 2 AS DECIMAL(18,2))) AS DOUBLE) AS total,
          'sql-insert,sql-insert-overwrite' AS engines, TRUE AS dropped,
          CAST(0 AS BIGINT) AS truncated_rows
        FROM orders WHERE o_orderkey % 3 = 0 AND o_totalprice > 150000.0
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Iceberg-style SQL metadata relations: `t.snapshots`, `t.files`,
    // `t.refs` queryable by name — driver-computed from the snapshot
    // log, planned as local scans (metadata is metadata-sized; no data
    // file is ever opened to answer them).
    QueryDef("lake_sql_metadata",
      (s, d) => {
        val whDir = wh("lake_sql_metadata", d)
        val cat = new Snaplog(whDir)
        val orders3 = t(s, d, "orders")
          .filter(col("o_orderkey") % 3 === 0)
          .select("o_orderkey", "o_totalprice")
        val tbl = LakehouseTable.create(cat, s, "lake", "meta_t", orders3.schema)
        tbl.append(orders3.filter(col("o_orderkey") % 2 === 0).repartition(1))
        tbl.append(orders3.filter(col("o_orderkey") % 2 =!= 0).repartition(1))
        tbl.tag("v1", Some(1L))
        tbl.setBranch("main", 2L)
        val cn = sqlCatalog(s, "gmet", whDir)
        s.sql(s"""
          SELECT 'snapshot' AS kind, CAST(snapshot_id AS STRING) AS k,
              operation || '/' || CAST(committed_files AS STRING) || '/' ||
              CAST(committed_records AS STRING) AS v
            FROM $cn.lake.meta_t.snapshots
          UNION ALL
          SELECT 'files', content,
              CAST(COUNT(*) AS STRING) || '/' || CAST(SUM(row_count) AS STRING)
            FROM $cn.lake.meta_t.files GROUP BY content
          UNION ALL
          SELECT 'ref', name, type || '/' || CAST(snapshot_id AS STRING)
            FROM $cn.lake.meta_t.refs
          ORDER BY kind, k""")
      },
      Some("""WITH a AS (SELECT COUNT(*) AS n FROM orders WHERE o_orderkey % 6 = 0),
          b AS (SELECT COUNT(*) AS n FROM orders
                WHERE o_orderkey % 3 = 0 AND o_orderkey % 2 <> 0)
        SELECT * FROM (
          SELECT 'snapshot' AS kind, '1' AS k, 'append/1/' || CAST(a.n AS VARCHAR) AS v FROM a
          UNION ALL SELECT 'snapshot', '2', 'append/1/' || CAST(b.n AS VARCHAR) FROM b
          UNION ALL SELECT 'files', 'data',
            '2/' || CAST(a.n + b.n AS VARCHAR) FROM a, b
          UNION ALL SELECT 'ref', 'main', 'branch/2'
          UNION ALL SELECT 'ref', 'v1', 'tag/1'
        ) ORDER BY kind, k""")),

    // `.partitions` metadata relation: per-partition file/row counts
    // aggregated from the snapshot log alone — partition-level table
    // inspection (row distribution, small-file skew) with zero data
    // I/O at any table size.
    QueryDef("lake_sql_partitions",
      (s, d) => {
        val whDir = wh("lake_sql_partitions", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders").select("o_orderkey", "o_orderstatus")
        val tbl = LakehouseTable.create(cat, s, "lake", "part_t",
          orders.schema, Seq("o_orderstatus"))
        tbl.append(orders.coalesce(1)) // one file per partition value
        val cn = sqlCatalog(s, "gpart", whDir)
        s.sql(s"""SELECT partition, file_count, row_count
          FROM $cn.lake.part_t.partitions ORDER BY partition""")
      },
      Some("""SELECT 'o_orderstatus=' || o_orderstatus AS partition,
          CAST(1 AS BIGINT) AS file_count, COUNT(*) AS row_count
        FROM orders GROUP BY o_orderstatus ORDER BY partition""")),

    // Partitioned SQL writes: INSERT INTO / INSERT OVERWRITE on an
    // identity-partitioned table route through the V1 write bridge into
    // writeCommit's partitionBy layout — every file single-valued, its
    // partition tuple in the log, pruning preserved after a SQL insert.
    QueryDef("lake_sql_insert_partitioned",
      (s, d) => {
        val whDir = wh("lake_sql_insert_partitioned", d)
        val cat = new Snaplog(whDir)
        cat.createNamespace("lake")
        val cn = sqlCatalog(s, "gpin", whDir)
        t(s, d, "orders").createOrReplaceTempView("lake_sql_pins_src")
        s.sql(s"""CREATE TABLE $cn.lake.orders_part
          (o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)
          PARTITIONED BY (o_orderstatus)""")
        s.sql(s"""INSERT INTO $cn.lake.orders_part
          SELECT o_orderkey, o_orderstatus, o_totalprice
          FROM lake_sql_pins_src WHERE o_orderkey % 2 = 0""")
        s.sql(s"""INSERT OVERWRITE $cn.lake.orders_part
          SELECT o_orderkey, o_orderstatus, o_totalprice
          FROM lake_sql_pins_src WHERE o_orderkey % 2 = 1""")
        // every live file carries its identity-partition tuple
        val nParts = cat.liveFiles("lake", "orders_part")
          .flatMap(_.partitionValues.get("o_orderstatus")).distinct.size
        s.sql(s"""SELECT o_orderstatus, COUNT(*) AS n,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          FROM $cn.lake.orders_part GROUP BY o_orderstatus""")
          .withColumn("n_partitions", lit(nParts))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
          (SELECT COUNT(DISTINCT o_orderstatus) FROM orders
           WHERE o_orderkey % 2 = 1) AS n_partitions
        FROM orders WHERE o_orderkey % 2 = 1
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // SQL maintenance procedures: `CALL cat.system.compact/set_ref/
    // expire_snapshots/vacuum` — the full maintenance cycle from SQL,
    // each CALL bound to the same transactional op the native API runs.
    QueryDef("lake_sql_call",
      (s, d) => {
        val whDir = wh("lake_sql_call", d)
        val cat = new Snaplog(whDir)
        val orders3 = t(s, d, "orders").filter(col("o_orderkey") % 3 === 0)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        val tbl = LakehouseTable.create(cat, s, "lake", "call_t", orders3.schema)
        tbl.append(orders3.filter(col("o_orderkey") % 2 === 0).repartition(1))
        tbl.append(orders3.filter(col("o_orderkey") % 2 =!= 0).repartition(1))
        val cn = sqlCatalog(s, "gcal", whDir)
        val c = s.sql(s"CALL $cn.system.compact('lake', 'call_t', 'o_orderkey')")
          .collect()(0)
        s.sql(s"CALL $cn.system.set_ref('lake', 'call_t', 'gold', ${c.getLong(0)}, 'tag')")
        val e = s.sql(s"CALL $cn.system.expire_snapshots('lake', 'call_t', 1)")
          .collect()(0)
        val v = s.sql(s"CALL $cn.system.vacuum('lake', 'call_t', 0L)").collect()(0)
        s.sql(s"""SELECT o_orderstatus, COUNT(*) AS n,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          FROM $cn.lake.call_t VERSION AS OF 'gold' GROUP BY o_orderstatus""")
          .withColumn("live_files", lit(c.getInt(1)))
          .withColumn("expired", lit(e.getInt(0)))
          .withColumn("vacuumed_data", lit(v.getInt(1)))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
          1 AS live_files, 2 AS expired, 2 AS vacuumed_data
        FROM orders WHERE o_orderkey % 3 = 0
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // SQL row-level DELETE: `DELETE FROM … WHERE …` through the DSv2
    // catalog maps onto the merge-on-read tier — one pushdown scan, one
    // KB-scale position vector, a conditional commit; no data file
    // rewrites. The untouched-file claim + vector count ride in the
    // result and the survivors must match DuckDB exactly.
    QueryDef("lake_sql_delete",
      (s, d) => {
        val whDir = wh("lake_sql_delete", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders")
        val rep = Ingest.ingestDf(cat, "lake", "orders_sqldel", orders)
        val before = cat.liveFiles("lake", "orders_sqldel").map(_.path).toSet
        val cn = sqlCatalog(s, "gdel", whDir)
        s.sql(s"""DELETE FROM $cn.lake.orders_sqldel
          WHERE o_orderstatus = 'F' AND o_totalprice > 200000.0""")
        val after = cat.liveFiles("lake", "orders_sqldel").map(_.path).toSet
        val lastOp = cat.snapshots("lake", "orders_sqldel").last.operation
        val nVectors = cat.liveDeleteFiles("lake", "orders_sqldel").size.toLong
        s.sql(s"""SELECT o_orderstatus, COUNT(*) AS n,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          FROM $cn.lake.orders_sqldel GROUP BY o_orderstatus""")
          .withColumn("last_op", lit(lastOp))
          .withColumn("data_files_untouched", lit(before == after))
          .withColumn("n_vectors", lit(nVectors))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
          'mor_delete' AS last_op, TRUE AS data_files_untouched, 1 AS n_vectors
        FROM orders
        WHERE NOT (o_orderstatus = 'F' AND o_totalprice > 200000.0)
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Iceberg-v2 read-only metadata export (the reference's third-party
    // interop: DuckDB iceberg_scan over table metadata,
    // query_iceberg_duckdb.py:21-29). The query exports a 2-snapshot
    // partitioned table, then READS THE EXPORT BACK the way an external
    // engine would — version-hint → metadata.json → manifest list →
    // manifests → data files — and returns the walked structure; the
    // oracle recomputes every field from the source table. Data files
    // are referenced in place: export is metadata-only.
    QueryDef("lake_iceberg_export",
      (s, d) => {
        // wh() wipes the scratch dir — resolve it ONCE (a second call
        // would destroy the warehouse just built)
        val whDir = wh("lake_iceberg_export", d)
        val cat = new Snaplog(whDir)
        val nation = t(s, d, "nation")
        val rep = Ingest.ingestDf(cat, "lake", "nation_ice", nation,
          partitionColumns = Seq("n_regionkey"))
        rep.table.append(nation.filter(col("n_nationkey") < 5))
        val dest = Paths.get(whDir, "ice_export")
        IcebergExport.export(rep.table, dest)
        val rb = IcebergExport.readBack(dest)
        import s.implicits._
        Seq((rb.formatVersion, rb.nSchemaFields, rb.nSpecFields,
          rb.nSnapshots, rb.currentOperation, rb.totalRecords,
          rb.dataFilesExist))
          .toDF("format_version", "n_fields", "n_spec_fields",
            "n_snapshots", "current_op", "total_records", "files_exist")
      },
      Some("""SELECT 2 AS format_version, 3 AS n_fields,
          1 AS n_spec_fields, 2 AS n_snapshots, 'append' AS current_op,
          CAST((SELECT COUNT(*) FROM nation)
            + (SELECT COUNT(*) FROM nation WHERE n_nationkey < 5)
            AS BIGINT) AS total_records,
          TRUE AS files_exist""")),

    // Iceberg export under HIDDEN partitioning: a days(ts) events table
    // exports with a REAL `day` transform spec (typed epoch-day ints in
    // the manifest partition structs, per the v2 spec), then the tree
    // is imported back as a new table — spec fidelity and the scan are
    // both gated (the re-imported table must reproduce the source rows
    // and keep day-granular partition metadata).
    QueryDef("lake_iceberg_export_days",
      (s, d) => {
        val whDir = wh("lake_iceberg_export_days", d)
        val cat = new Snaplog(whDir)
        val ev = events(s, d)
          .select("event_id", "ts", "user_id", "event_type", "value")
        val rep = Ingest.ingestDf(cat, "lake", "events_ice", ev,
          partitionColumns = Seq("days(ts)"))
        val dest = Paths.get(whDir, "ice_export")
        IcebergExport.export(rep.table, dest)
        val rb = IcebergExport.readBack(dest)
        val imp = graft.interop.IcebergImport.register(
          cat, s, dest, "lake", "events_rt")
        val dayCount = cat.liveFiles("lake", "events_rt")
          .flatMap(_.partitionValues.get("ts_day")).distinct.size
        imp.table.scan()
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
          .withColumn("format_version", lit(rb.formatVersion))
          .withColumn("spec_days", lit(imp.partitionColumns == Seq("days(ts)")))
          .withColumn("multi_day", lit(dayCount > 1))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
          2 AS format_version, TRUE AS spec_days, TRUE AS multi_day
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // External Iceberg v2 READ (import): export a partitioned table's
    // metadata tree, then register it as a NEW table by walking
    // version-hint → metadata.json → Avro manifest-list → manifests —
    // the full interop loop in one query, with the imported table's
    // SCAN (metadata-only registration, zero data movement) gated
    // against DuckDB on the source rows. Partition pruning must work
    // immediately on the imported table (in-result file-count claim).
    QueryDef("lake_iceberg_import",
      (s, d) => {
        val whDir = wh("lake_iceberg_import", d)
        val cat = new Snaplog(whDir)
        val customer = t(s, d, "customer")
        val rep = Ingest.ingestDf(cat, "lake", "cust_ice", customer,
          partitionColumns = Seq("c_mktsegment"))
        val dest = Paths.get(whDir, "ice_tree")
        IcebergExport.export(rep.table, dest)
        val imp = graft.interop.IcebergImport.register(
          cat, s, dest, "lake", "cust_imported")
        val prunedFiles = imp.table.selectFiles(
          partitionFilter = Map("c_mktsegment" -> "BUILDING")).size
        val totalFiles = imp.dataFiles
        imp.table.scan(partitionFilter = Map("c_mktsegment" -> "BUILDING"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("total"))
          .withColumn("pruned_to_one_partition",
            lit(prunedFiles > 0 && prunedFiles < totalFiles))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, COUNT(*) AS n,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total,
          TRUE AS pruned_to_one_partition
        FROM customer WHERE c_mktsegment = 'BUILDING'
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // MOR interop round trip (round 13): a table carrying LIVE v2
    // merge-on-read state — an equality delete, a delta MERGE (one
    // commit: [eq-delete, data], whose own rows must survive their
    // delete), and a position-delete vector — exports WITHOUT
    // compacting as real v2 DELETE manifests (content=1, the vector
    // rewritten to the spec's (file_path, pos) shape, equality files
    // referenced in place with equality_ids, per-listing sequence
    // numbers), then re-imports as a NEW table whose first scan nets
    // out every delete. The DuckDB oracle recomputes the net rows from
    // the raw source — the whole delete-manifest loop is hash-gated.
    // At 100 TB this is importing a live Flink CDC Iceberg table:
    // metadata + predicate-sized delete files move, data stays put.
    QueryDef("lake_iceberg_import_mor",
      (s, d) => {
        val whDir = wh("lake_iceberg_import_mor", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders").select(
          col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        val rep = Ingest.ingestDf(cat, "lake", "orders_mor", orders,
          partitionColumns = Seq("o_orderpriority"))
        // eq delete: every 1-URGENT row to date disappears…
        rep.table.deleteEq("o_orderpriority", Seq("1-URGENT"))
        // …then a keyed MERGE re-adds keys < 100 AS urgent (2× price);
        // being listed after their own eq-delete key file, they survive
        rep.table.mergeDelta(Seq("o_orderkey"),
          orders.filter(col("o_orderkey") < 100)
            .withColumn("o_orderpriority", lit("1-URGENT"))
            .withColumn("o_totalprice", col("o_totalprice") * 2))
        // position vector across BOTH eras
        rep.table.deleteMor(col("o_orderkey") % 10 === 3)
        val dest = Paths.get(whDir, "ice_mor")
        val exp = IcebergExport.export(rep.table, dest)
        val rb = IcebergExport.readBack(dest)
        val imp = graft.interop.IcebergImport.register(
          cat, s, dest, "lake", "orders_mor_rt")
        imp.table.scan()
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .withColumn("exported_deletes", lit(exp.deleteFiles >= 3L &&
            rb.nPositionDeleteFiles == 1 && rb.nEqualityDeleteFiles == 2))
          .withColumn("imported_deletes", lit(imp.positionDeleteFiles == 1 &&
            imp.equalityDeleteFiles == 2))
          .orderBy(col("o_orderpriority"))
      },
      Some("""WITH final AS (
          SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
          WHERE o_orderkey >= 100 AND o_orderpriority <> '1-URGENT'
          UNION ALL
          SELECT o_orderkey, '1-URGENT' AS o_orderpriority,
            o_totalprice * 2 AS o_totalprice
          FROM orders WHERE o_orderkey < 100)
        SELECT o_orderpriority, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
          TRUE AS exported_deletes, TRUE AS imported_deletes
        FROM final WHERE o_orderkey % 10 <> 3
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // Live-tree adoption (round 14): a mirror registered from a foreign
    // Iceberg tree REFRESHES as the source advances — the source
    // appends an era and equality-deletes keys (refresh #1 lands one
    // metadata-only delta commit: new data files + the eq delete,
    // sequence-interleaved), then position-deletes rows (refresh #2
    // lands one merged vector referencing data files imported earlier),
    // and an unchanged source is a no-op (refresh #3). The mirror's
    // final scan hash-matches DuckDB recomputing the net content, with
    // every refresh-shape claim riding the result. At 100 TB this is
    // mirroring a live Flink CDC Iceberg table WITHOUT re-registering:
    // each sync moves metadata + predicate-sized delete files only.
    QueryDef("lake_iceberg_refresh",
      (s, d) => {
        val whDir = wh("lake_iceberg_refresh", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders").select(
          col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        // era 1 is the registered state; the source then lives on
        val src = Ingest.ingestDf(cat, "lake", "orders_live",
          orders.filter(col("o_orderkey") < 3000)).table
        val dest = Paths.get(whDir, "ice_live")
        IcebergExport.export(src, dest)
        graft.interop.IcebergImport.register(
          cat, s, dest, "lake", "orders_mirror")
        // source advance #1: append era 2, then eq-delete every key % 7
        src.append(orders.filter(col("o_orderkey") >= 3000))
        src.deleteEq("o_orderkey",
          orders.filter(col("o_orderkey") % 7 === 0).select("o_orderkey"))
        IcebergExport.export(src, dest)
        val r1 = graft.interop.IcebergImport.refresh(
          cat, s, "lake", "orders_mirror")
        // source advance #2: a position vector across both eras
        src.deleteMor(col("o_orderkey") % 10 === 3)
        IcebergExport.export(src, dest)
        val r2 = graft.interop.IcebergImport.refresh(
          cat, s, "lake", "orders_mirror")
        // unchanged source: refresh is an idempotent no-op
        val r3 = graft.interop.IcebergImport.refresh(
          cat, s, "lake", "orders_mirror")
        r2.table.scan()
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .withColumn("delta_refresh", lit(r1.snapshot.isDefined &&
            !r1.reset && r1.dataFilesAdded >= 1 &&
            r1.equalityDeleteFiles == 1 && r1.positionDeleteFiles == 0))
          .withColumn("vector_refresh", lit(r2.snapshot.isDefined &&
            !r2.reset && r2.dataFilesAdded == 0 &&
            r2.positionDeleteFiles == 1))
          .withColumn("noop_refresh", lit(r3.snapshot.isEmpty))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
          TRUE AS delta_refresh, TRUE AS vector_refresh, TRUE AS noop_refresh
        FROM orders
        WHERE o_orderkey % 7 <> 0 AND o_orderkey % 10 <> 3
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Refresh-time SCHEMA EVOLUTION adoption (round 15): the source
    // RENAMES and DROPS columns mid-life — the routine evolution any
    // actively-developed table hits within weeks. Both sides track
    // field ids, so an id-matched rename maps to graft's native
    // metadata-only rename (files written under the old name keep
    // serving values BY ID) and a vanished id maps to the native drop;
    // the mirror adopts with one metadata write and the sync proceeds,
    // where the reference's reader survives by re-reading latest
    // metadata per query (query_iceberg_duckdb.py:21-29). The oracle
    // reconstructs the post-evolution content from the flat source
    // under the NEW names — old-era rows must answer their original
    // values through the rename, proving id resolution, not name luck.
    QueryDef("lake_iceberg_refresh_evolve",
      (s, d) => {
        val whDir = wh("lake_iceberg_refresh_evolve", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
        val src = Ingest.ingestDf(cat, "lake", "orders_ev",
          orders.filter(col("o_orderkey") % 2 === 0)).table
        val dest = Paths.get(whDir, "ice_ev")
        IcebergExport.export(src, dest)
        graft.interop.IcebergImport.register(
          cat, s, dest, "lake", "orders_ev_mirror")
        // the source evolves: rename + drop (both metadata-only), then
        // appends a new era under the new shape
        src.renameColumn("o_totalprice", "price")
        src.dropColumn("o_custkey")
        src.append(orders.filter(col("o_orderkey") % 2 === 1)
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice").as("price")))
        IcebergExport.export(src, dest)
        val r = graft.interop.IcebergImport.refresh(
          cat, s, "lake", "orders_ev_mirror")
        val names = r.table.schema.fieldNames.toSeq
        r.table.scan()
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("price")).as("total_price"))
          .withColumn("adopted_rename", lit(names.contains("price") &&
            !names.contains("o_totalprice")))
          .withColumn("adopted_drop", lit(!names.contains("o_custkey")))
          .withColumn("delta_sync", lit(!r.reset && r.dataFilesAdded >= 1))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
          TRUE AS adopted_rename, TRUE AS adopted_drop, TRUE AS delta_sync
        FROM orders
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ANALYZE statistics tier (round 14): ONE distributed pass builds
    // per-column theta-sketch NDV (map-side sketching, driver union of
    // partition-count compact sketches — metadata-sized at any table
    // size), persisted as a puffin statistics file + property summary
    // the SQL scan reports through DSv2 SupportsReportStatistics. The
    // sketch is EXACT below its 4096 nominal entries, so the
    // low-cardinality columns here gate hash-exactly against
    // COUNT(DISTINCT); the flags assert the PLANNER actually sees the
    // log-exact row count and the NDV through the relation's stats —
    // at 100 TB this is what prices a join's build side correctly
    // before AQE ever runs.
    QueryDef("lake_analyze_stats",
      (s, d) => {
        val whDir = wh("lake_analyze_stats", d)
        val cat = new Snaplog(whDir)
        val cust = t(s, d, "customer")
        val tbl = Ingest.ingestDf(cat, "lake", "cust_stats", cust).table
        val summary = tbl.analyze(Seq("c_mktsegment", "c_nationkey"))
        val cn = sqlCatalog(s, "gstat", whDir)
        val st = s.sql(s"SELECT c_custkey, c_mktsegment, c_nationkey " +
            s"FROM $cn.lake.cust_stats").queryExecution.optimizedPlan
          .collectFirst {
            case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
              r.stats
          }
        val planExactRows = st.exists(_.rowCount.contains(BigInt(cust.count())))
        val planNdv = st.exists(_.attributeStats.toSeq.exists { case (a, cs) =>
          a.name == "c_mktsegment" &&
            cs.distinctCount.contains(BigInt(summary("c_mktsegment").ndv))
        })
        import s.implicits._
        summary.toSeq.sortBy(_._1).map { case (c, v) => (c, v.ndv) }
          .toDF("col_name", "ndv")
          .withColumn("plan_exact_rows", lit(planExactRows))
          .withColumn("plan_ndv", lit(planNdv))
          .orderBy(col("col_name"))
      },
      Some("""SELECT 'c_mktsegment' AS col_name,
          COUNT(DISTINCT c_mktsegment) AS ndv,
          TRUE AS plan_exact_rows, TRUE AS plan_ndv FROM customer
        UNION ALL
        SELECT 'c_nationkey', COUNT(DISTINCT c_nationkey), TRUE, TRUE
        FROM customer ORDER BY col_name""")),

    // Statistics INTEROP (round 14): the native stats file IS a spec
    // puffin of `apache-datasketches-theta-v1` blobs, so export
    // publishes it as the metadata `statistics` entry (field-id
    // addressed, `ndv` property per the Iceberg/Trino convention) and
    // a fresh import ADOPTS a foreign tree's statistics as the native
    // NDV tier — an adopted 100 TB table arrives with its planner
    // statistics intact, no re-ANALYZE pass over the data.
    QueryDef("lake_iceberg_stats",
      (s, d) => {
        val whDir = wh("lake_iceberg_stats", d)
        val cat = new Snaplog(whDir)
        val part = t(s, d, "part")
        val src = Ingest.ingestDf(cat, "lake", "part_stats", part).table
        src.analyze(Seq("p_brand", "p_size"))
        val dest = Paths.get(whDir, "ice_stats")
        IcebergExport.export(src, dest)
        graft.interop.IcebergImport.register(
          cat, s, dest, "lake", "part_stats_mirror")
        val adopted = graft.table.TableStats.fromProperties(
          cat.loadTable("lake", "part_stats_mirror").properties)
        import s.implicits._
        adopted.toSeq.sortBy(_._1).map { case (c, v) => (c, v.ndv) }
          .toDF("col_name", "ndv")
          .orderBy(col("col_name"))
      },
      Some("""SELECT 'p_brand' AS col_name,
          COUNT(DISTINCT p_brand) AS ndv FROM part
        UNION ALL
        SELECT 'p_size', COUNT(DISTINCT p_size) FROM part
        ORDER BY col_name""")),

    // STREAMING MIRROR of a live foreign Iceberg tree (round 14): the
    // table source's `refresh=true` option re-syncs an adopted mirror
    // in PER-SNAPSHOT mode before each trigger, so the foreign tree's
    // new snapshots land as NATIVE commits the stream then tails —
    // nobody calls refresh by hand. A source append becomes an
    // add_files batch; a source equality delete becomes a native
    // eq_delete boundary (skip semantics — the sink keeps both eras,
    // the MIRROR nets the delete). At 100 TB this is "tail a live
    // Flink CDC Iceberg table into a Spark pipeline" with one
    // driver-side metadata walk per trigger and zero data movement.
    QueryDef("stream_iceberg_mirror",
      (s, d) => {
        val whDir = wh("stream_iceberg_mirror", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders").select(
          col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        val src = Ingest.ingestDf(cat, "lake", "orders_feed",
          orders.filter(col("o_orderkey") % 2 === 0)).table
        val dest = Paths.get(whDir, "ice_feed")
        IcebergExport.export(src, dest)
        graft.interop.IcebergImport.register(
          cat, s, dest, "lake", "orders_feed_mirror")
        val cn = sqlCatalog(s, "gmir", whDir)
        val ckpt = scratchDir("stream_iceberg_mirror_ck", d)
        val out = scratchDir("stream_iceberg_mirror_out", d)
        def runOnce(): Unit = {
          val q = s.readStream.option("refresh", "true")
            .table(s"$cn.lake.orders_feed_mirror")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination(300000)
          q.exception.foreach(throw _)
        }
        runOnce() // the registered content (evens)
        // the SOURCE advances: odds append, then a key-valued delete —
        // only the stream's own refresh syncs the mirror
        src.append(orders.filter(col("o_orderkey") % 2 === 1))
        src.deleteEq("o_orderkey",
          orders.filter(col("o_orderkey") % 10 === 7).select("o_orderkey"))
        IcebergExport.export(src, dest)
        runOnce() // delta: odds stream, the delete is a native boundary
        val sinkRows = s.read.schema(src.schema).parquet(out).count()
        val mirror = LakehouseTable.load(cat, s, "lake", "orders_feed_mirror")
        val nativeDelete = cat.snapshots("lake", "orders_feed_mirror")
          .exists(_.operation == Snaplog.OpEqDelete)
        mirror.scan()
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .withColumn("streamed_both_eras", lit(sinkRows == orders.count()))
          .withColumn("native_delete_commit", lit(nativeDelete))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
          TRUE AS streamed_both_eras, TRUE AS native_delete_commit
        FROM orders WHERE o_orderkey % 10 <> 7
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // CDC REPLICATION OUT OF A LIVE FOREIGN TREE (round 14): the
    // change feed's refresh=true composes the whole interop stack —
    // a foreign Iceberg table advances (delete + append), the feed's
    // own per-snapshot refresh lands those as native commits, the
    // changelog turns them into insert/DELETE change rows (the
    // retractions the append-only table stream can only skip), and
    // applyChanges materializes an exact replica in a native table.
    // At 100 TB: replicate a live Flink CDC Iceberg table into any
    // downstream, retractions intact, metadata-walk-per-trigger,
    // no hand-rolled sync job.
    QueryDef("stream_mirror_cdc",
      (s, d) => {
        val whDir = wh("stream_mirror_cdc", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders").select(
          col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        val src = Ingest.ingestDf(cat, "lake", "orders_ext",
          orders.filter(col("o_orderkey") % 2 === 0)).table
        val dest = Paths.get(whDir, "ice_ext")
        IcebergExport.export(src, dest)
        graft.interop.IcebergImport.register(
          cat, s, dest, "lake", "orders_ext_mirror")
        val dst = LakehouseTable.create(
          cat, s, "lake", "orders_replica", src.schema)
        val ckpt = scratchDir("stream_mirror_cdc_ck", d)
        def replicateOnce(): Unit = {
          val q = s.readStream.format("graft-changes")
            .option("warehouse", whDir)
            .option("table", "lake.orders_ext_mirror")
            .option("refresh", "true")
            .load()
            .writeStream
            .foreachBatch { (batch: DataFrame, _: Long) =>
              val tc = graft.table.LakehouseTable.ChangeTypeCol
              val sc = graft.table.LakehouseTable.ChangeSnapshotCol
              // persist across the emptiness check and the apply: the
              // change-feed batch is a LAZY changelog plan (per-commit
              // scans + broadcast key builds), so without the cache the
              // isEmpty probe and applyChanges would each compute it
              // (round 18); change sets are window-sized by contract
              val changes = batch
                .withColumn("op",
                  when(col(tc) === "delete", lit("D")).otherwise(lit("U")))
                .withColumn("seq", col(sc) * 2 +
                  when(col(tc) === "insert", 1L).otherwise(0L))
                .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
              try {
                if (!changes.isEmpty)
                  Upsert.applyChanges(dst, changes, keys = Seq("o_orderkey"),
                    opCol = "op", tiebreak = Some("seq"))
              } finally changes.unpersist(false)
              ()
            }
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination(300000)
          q.exception.foreach(throw _)
        }
        replicateOnce() // the registered content (evens)
        // the FOREIGN source advances; only the stream's refresh syncs
        src.deleteEq("o_orderkey",
          orders.filter(col("o_orderkey") % 6 === 0).select("o_orderkey"))
        src.append(orders.filter(col("o_orderkey") % 2 === 1))
        IcebergExport.export(src, dest)
        replicateOnce() // delta: retraction + odds, applied exactly
        dst.scan()
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders WHERE o_orderkey % 6 <> 0
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // REST-CATALOG adoption (round 14) + LIVE publishing (round 15):
    // the modern Iceberg deployment serves table pointers over the
    // REST API while manifests/data stay on storage. A loopback
    // RestServe serves the NATIVE table LIVE — each load compares the
    // graft head to the last-exported watermark and re-exports on
    // demand, so a COMMIT AFTER PUBLISH is externally visible without
    // anyone calling export. registerFromRest adopts THROUGH the
    // catalog service (GET /v1/namespaces/{ns}/tables/{tbl} →
    // metadata-location); the stored import ref is the ENDPOINT, so
    // refresh re-fetches the catalog's CURRENT pointer and lands the
    // post-publish commits. At 100 TB this is fronting a continuously
    // written table with a catalog service (Polaris/Nessie/Tabular
    // style) whose readers always see the latest commit.
    QueryDef("lake_iceberg_rest_catalog",
      (s, d) => {
        val whDir = wh("lake_iceberg_rest_catalog", d)
        val cat = new Snaplog(whDir)
        val supplier = t(s, d, "supplier").select(
          col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
        val src = Ingest.ingestDf(cat, "lake", "supp_live",
          supplier.filter(col("s_suppkey") % 2 === 0)).table
        val dest = Paths.get(whDir, "ice_rest")
        // LIVE publish: no manual export anywhere in this query
        val srv = graft.interop.RestServe.startLive(
          Map(("ext", "supp_live") -> (src, dest)))
        try {
          graft.interop.IcebergImport.registerFromRest(cat, s,
            srv.endpoint, "ext", "supp_live", "lake", "supp_mirror")
          val ptrAtRegister = graft.interop.RestCatalog.loadTable(
            srv.endpoint, "ext", "supp_live").metadataLocation
          // COMMITS AFTER PUBLISH: the source lives on; the catalog's
          // pointer follows by itself on the next load
          src.append(supplier.filter(col("s_suppkey") % 2 === 1))
          src.deleteEq("s_suppkey",
            supplier.filter(col("s_suppkey") % 9 === 5).select("s_suppkey"))
          val r = graft.interop.IcebergImport.refresh(
            cat, s, "lake", "supp_mirror", perSnapshot = true)
          val ptrAfter = graft.interop.RestCatalog.loadTable(
            srv.endpoint, "ext", "supp_live").metadataLocation
          val restRef = cat.loadTable("lake", "supp_mirror").properties
            .get(graft.interop.IcebergImport.ImportedFromProp)
            .exists(_.startsWith(graft.interop.IcebergImport.RestPrefix))
          r.table.scan()
            .groupBy(col("s_nationkey"))
            .agg(count(lit(1)).as("n"), dsum(col("s_acctbal")).as("total"))
            .withColumn("rest_adopted", lit(restRef))
            .withColumn("live_refresh", lit(!r.reset && r.commits == 2))
            .withColumn("live_publish", lit(ptrAfter != ptrAtRegister))
            .orderBy(col("s_nationkey"))
        } finally srv.stop()
      },
      Some("""SELECT s_nationkey, COUNT(*) AS n,
          CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total,
          TRUE AS rest_adopted, TRUE AS live_refresh, TRUE AS live_publish
        FROM supplier WHERE s_suppkey % 9 <> 5
        GROUP BY s_nationkey ORDER BY s_nationkey""")),

    // REST-catalog WRITE half (round 17, VERDICT r16 #2): a foreign
    // engine CREATES a table and COMMITS through graft's catalog
    // server — knowing only the REST endpoint, never the snaplog
    // format. CREATE: the spec's CreateTableRequest (schema as Iceberg
    // JSON) lands a NATIVE graft table and the serving set grows live.
    // COMMIT: the writer stages its own parquet + a spec manifest list
    // and POSTs CommitTableRequest; `assert-ref-snapshot-id` rides the
    // snaplog's conditional-commit CAS (Some(0) = expect-empty), so a
    // STALE writer gets the spec's 409 and the table stays untouched,
    // while the re-read retry lands. The server walks the posted
    // manifests, footer-stats the files (so REST-committed files prune
    // like native ones), and lands ONE native append — which the live
    // publisher re-exports for every other REST reader. At 100 TB this
    // is a shared writable catalog fronting concurrent engines: CAS
    // per commit, metadata-sized server work (one footer read per new
    // file), data in place.
    QueryDef("lake_rest_commit",
      (s, d) => {
        val whDir = wh("lake_rest_commit", d)
        val cat = new Snaplog(whDir)
        val supplier = t(s, d, "supplier").select(
          col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
        val dest = Paths.get(whDir, "ice_w")
        val srv = graft.interop.RestServe.startLive(
          Map.empty[(String, String),
            (graft.table.LakehouseTable, java.nio.file.Path)],
          acceptCreates = Some(
            graft.interop.RestServe.CreateTarget(s, cat, dest)))
        try {
          // the FOREIGN writer creates the table through the server
          graft.interop.RestCatalog.createTable(
            srv.endpoint, "ext", "supp_w", supplier.schema)
          val restCreated = cat.tableExists("ext", "supp_w")
          // …stages even-key parquet and commits with expect-empty CAS
          val stage = Paths.get(whDir, "stage")
          supplier.filter(col("s_suppkey") % 2 === 0)
            .coalesce(1).write.parquet(stage.resolve("d0").toString)
          val evens = graft.table.FileStats.statAll(s,
            graft.table.FileStats.listParquet(stage.resolve("d0").toString),
            _ => Map.empty)
          graft.interop.RestCatalog.commitAppend(srv.endpoint,
            "ext", "supp_w", evens, stage.resolve("m0"), Some(0L))
          // stale expectation: the spec's 409, nothing commits
          supplier.filter(col("s_suppkey") % 2 === 1)
            .coalesce(1).write.parquet(stage.resolve("d1").toString)
          val odds = graft.table.FileStats.statAll(s,
            graft.table.FileStats.listParquet(stage.resolve("d1").toString),
            _ => Map.empty)
          val conflicted =
            try {
              graft.interop.RestCatalog.commitAppend(srv.endpoint,
                "ext", "supp_w", odds, stage.resolve("m1"), Some(0L))
              false
            } catch {
              case _: graft.catalog.CommitConflictException => true
            }
          val src = LakehouseTable.load(cat, s, "ext", "supp_w")
          val untouched = src.currentSnapshotId == 1L
          // re-read + retry: the append lands as one native commit
          graft.interop.RestCatalog.commitAppend(srv.endpoint,
            "ext", "supp_w", odds, stage.resolve("m2"),
            Some(src.currentSnapshotId))
          val head = cat.currentSnapshot("ext", "supp_w").get
          val restCommitted = head.operation == "append" &&
            head.summary.get("rest-commit").contains("true") &&
            head.files.forall(_.columnStats.nonEmpty)
          // the CDC writer's RETRACTION: an equality-delete commit
          // (%9==5 keys; s_suppkey = field id 1) lands as native MOR
          // state — the server maps equality_ids through the field
          // registry and registers the key file in place
          supplier.filter(col("s_suppkey") % 9 === 5).select("s_suppkey")
            .coalesce(1).write.parquet(stage.resolve("d2").toString)
          val dels = graft.table.FileStats.statAll(s,
            graft.table.FileStats.listParquet(stage.resolve("d2").toString),
            _ => Map.empty)
          graft.interop.RestCatalog.commitDelete(srv.endpoint,
            "ext", "supp_w", eqFiles = dels.map(f => (f, Seq(1))),
            stagingDir = stage.resolve("m3"),
            expectedSnapshotId = Some(src.currentSnapshotId))
          val delHead = cat.currentSnapshot("ext", "supp_w").get
          val restDeleted = delHead.operation == "eq_delete" &&
            delHead.files.head.equalityKey.contains("s_suppkey")
          src.scan()
            .groupBy(col("s_nationkey"))
            .agg(count(lit(1)).as("n"), dsum(col("s_acctbal")).as("total"))
            .withColumn("rest_created", lit(restCreated))
            .withColumn("rest_cas", lit(conflicted && untouched))
            .withColumn("rest_committed", lit(restCommitted))
            .withColumn("rest_deleted", lit(restDeleted))
            .orderBy(col("s_nationkey"))
        } finally srv.stop()
      },
      Some("""SELECT s_nationkey, COUNT(*) AS n,
          CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total,
          TRUE AS rest_created, TRUE AS rest_cas, TRUE AS rest_committed,
          TRUE AS rest_deleted
        FROM supplier WHERE s_suppkey % 9 <> 5
        GROUP BY s_nationkey ORDER BY s_nationkey""")),

    // Iceberg v3 ROW LINEAGE (round 15): a v3 tree assigns every row a
    // durable `_row_id` (snapshot-level `first-row-id` + per-file
    // inheritance, spec §row-lineage) — the ecosystem's
    // change-tracking substrate as engines move to v3. graft adopts
    // the assignment at register, CARRIES it through refresh (new
    // files take their inheritance ranges; old rows keep theirs), and
    // serves `_row_id` / `_last_updated_sequence_number` as computed
    // columns: first_row_id + file position, via the broadcast
    // file-count-sized lineage map — no stored per-row ids, row-id
    // arithmetic codegen'd on the scan. The oracle recomputes the
    // spec's assignment: era-1 rows occupy [0, n1), era-2 rows
    // (landed by refresh) [n1, n1+n2) — exact min/max/count per era.
    QueryDef("lake_iceberg_v3_lineage",
      (s, d) => {
        val whDir = wh("lake_iceberg_v3_lineage", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders").select(
          col("o_orderkey"), col("o_totalprice"))
        val era1 = orders.filter(col("o_orderkey") % 2 === 0)
        val era2 = orders.filter(col("o_orderkey") % 2 === 1)
        val src = Ingest.ingestDf(cat, "lake", "orders_lin", era1).table
        val dest = Paths.get(whDir, "ice_lin")
        IcebergExport.export(src, dest, formatVersion = 3)
        graft.interop.IcebergImport.register(
          cat, s, dest, "lake", "orders_lin_rt")
        src.append(era2)
        IcebergExport.export(src, dest, formatVersion = 3)
        graft.interop.IcebergImport.refresh(cat, s, "lake", "orders_lin_rt")
        LakehouseTable.load(cat, s, "lake", "orders_lin_rt").scanLineage()
          .withColumn("era",
            when(col("o_orderkey") % 2 === 0, 1).otherwise(2))
          .groupBy(col("era"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("_row_id")).as("distinct_ids"),
            min(col("_row_id")).as("min_row_id"),
            max(col("_row_id")).as("max_row_id"))
          .orderBy(col("era"))
      },
      Some("""WITH e1 AS (SELECT COUNT(*) AS c FROM orders WHERE o_orderkey % 2 = 0),
          e2 AS (SELECT COUNT(*) AS c FROM orders WHERE o_orderkey % 2 = 1)
        SELECT 1 AS era, e1.c AS n, e1.c AS distinct_ids,
            CAST(0 AS BIGINT) AS min_row_id, e1.c - 1 AS max_row_id FROM e1
        UNION ALL
        SELECT 2 AS era, e2.c AS n, e2.c AS distinct_ids,
            e1.c AS min_row_id, e1.c + e2.c - 1 AS max_row_id FROM e1, e2
        ORDER BY era""")),

    // NATIVE row lineage (round 16, VERDICT r15 #3): a v3-mode graft
    // table assigns Iceberg-v3 `first_row_id`/data-sequence lineage AT
    // COMMIT — `_row_id`/`_last_updated_sequence_number` serve on the
    // engine's OWN tables, not only imported mirrors. Shape: two
    // sorted single-file appends (ids = rank by key, oracle-
    // reconstructable via ROW_NUMBER), a MOR position delete (removes
    // rows WITHOUT renumbering survivors), a delete-then-reinsert
    // (fresh ids above the high-water mark, fresh sequence — new
    // content, new identity), a mid-lifecycle compaction (identity
    // materialized through the rewrite), and — round 17 — a MERGE
    // UPDATE through the pipeline upsert tier whose updated rows KEEP
    // their `_row_id` (the carried id is materialized into the merge's
    // files) while `_last_updated_sequence_number` bumps to the merge
    // commit — the v3 spec's update semantics end-to-end. The v3
    // export → re-import round-trip must serve identical ids
    // (`rt_ids`). At 100 TB the assignment is O(files-per-commit)
    // driver metadata; the scan-side id arithmetic is one broadcast
    // map + a codegen'd position add; the merge's id-carry probe is
    // bounds-pruned to the files overlapping the batch's keys.
    QueryDef("lake_v3_native_lineage",
      (s, d) => {
        val whDir = wh("lake_v3_native_lineage", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders").select(
          col("o_orderkey"), col("o_totalprice"))
        def oneSortedFile(df: DataFrame) =
          df.repartition(1).sortWithinPartitions("o_orderkey")
        val tbl = LakehouseTable.create(cat, s, "lake", "orders_nl",
          orders.schema,
          properties = Map(Snaplog.RowLineageProp -> "true"))
        tbl.append(oneSortedFile(orders.filter(col("o_orderkey") % 2 === 0)))
        tbl.append(oneSortedFile(orders.filter(col("o_orderkey") % 2 === 1)))
        // MOR update of the %9==4 keys: position-delete + re-insert
        tbl.deleteMor(col("o_orderkey") % 9 === 4)
        tbl.append(oneSortedFile(orders.filter(col("o_orderkey") % 9 === 4)
          .withColumn("o_totalprice", col("o_totalprice") * 2)))
        // COMPACTION preserves identity: the rewrite MATERIALIZES the
        // lineage columns into the new files (reserved v3 field ids),
        // so the aggregates below — and the oracle — are unchanged by
        // it, and the export leg publishes a materialized tree
        tbl.compact()
        // MERGE UPDATE preserves identity (round 17): the upsert of the
        // %9==7 keys carries each matched row's _row_id into the new
        // image (seq bumps to the merge commit, snapshot 6); unmatched
        // keys would draw fresh ids — here every key matches.
        graft.pipeline.Upsert.upsertTable(tbl,
          orders.filter(col("o_orderkey") % 9 === 7)
            .withColumn("o_totalprice", col("o_totalprice") * 3),
          Seq("o_orderkey"))
        val native = tbl.scanLineage()
        // round-trip: the exported v3 tree serves the SAME ids back
        val dest = Paths.get(whDir, "ice_nl")
        IcebergExport.export(tbl, dest, formatVersion = 3)
        graft.interop.IcebergImport.register(
          cat, s, dest, "lake", "orders_nl_rt")
        val mirror = LakehouseTable.load(cat, s, "lake", "orders_nl_rt")
          .scanLineage()
        // multiset equality in ONE pass per side (round 17, guide §2.4):
        // the former double exceptAll scanned each lineage read twice
        // (4 scans, 4 shuffles, 2 joins — 2.4 s warm at sf0.1); per-tuple
        // counts full-outer-joined is the same predicate (A ⊆ B ∧ B ⊆ A
        // over multisets ⇔ every tuple's multiplicity matches) for one
        // scan + one shuffle per side and one join (1.3 s warm).
        // PRECONDITION: (o_orderkey, _row_id) are non-null by contract —
        // the using-columns join is not null-safe, so identical
        // null-keyed tuples on both sides would report mismatch (the
        // safe direction; use <=> if this check is ever generalized).
        val rtOk = {
          val a = native.select("o_orderkey", "_row_id")
            .groupBy("o_orderkey", "_row_id").agg(count(lit(1)).as("__na"))
          val b = mirror.select("o_orderkey", "_row_id")
            .groupBy("o_orderkey", "_row_id").agg(count(lit(1)).as("__nb"))
          a.join(b, Seq("o_orderkey", "_row_id"), "full_outer")
            .filter(!(coalesce(col("__na"), lit(0L)) ===
              coalesce(col("__nb"), lit(0L))))
            .isEmpty
        }
        native
          .groupBy(col("_last_updated_sequence_number").as("seq"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("_row_id")).as("distinct_ids"),
            min(col("_row_id")).as("min_row_id"),
            max(col("_row_id")).as("max_row_id"),
            sum(col("_row_id")).as("sum_row_id"))
          .withColumn("rt_ids", lit(rtOk))
          .orderBy(col("seq"))
      },
      Some("""WITH e1 AS (SELECT o_orderkey,
            ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS rid
          FROM orders WHERE o_orderkey % 2 = 0),
        n1 AS (SELECT COUNT(*) AS c FROM e1),
        e2 AS (SELECT o_orderkey,
            (SELECT c FROM n1) + ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS rid
          FROM orders WHERE o_orderkey % 2 = 1),
        n2 AS (SELECT COUNT(*) AS c FROM e2),
        e3 AS (SELECT o_orderkey,
            (SELECT c FROM n1) + (SELECT c FROM n2) +
              ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS rid
          FROM orders WHERE o_orderkey % 9 = 4),
        live AS (
          SELECT 1 AS seq, rid FROM e1 WHERE o_orderkey % 9 NOT IN (4, 7)
          UNION ALL SELECT 2, rid FROM e2 WHERE o_orderkey % 9 NOT IN (4, 7)
          UNION ALL SELECT 4, rid FROM e3
          UNION ALL SELECT 6, rid FROM e1 WHERE o_orderkey % 9 = 7
          UNION ALL SELECT 6, rid FROM e2 WHERE o_orderkey % 9 = 7)
        SELECT CAST(seq AS BIGINT) AS seq, COUNT(*) AS n,
          COUNT(DISTINCT rid) AS distinct_ids,
          CAST(MIN(rid) AS BIGINT) AS min_row_id,
          CAST(MAX(rid) AS BIGINT) AS max_row_id,
          CAST(SUM(rid) AS BIGINT) AS sum_row_id,
          TRUE AS rt_ids
        FROM live GROUP BY seq ORDER BY seq""")),

    // LINEAGE-KEYED CHANGELOG (round 17, VERDICT r16 #3): CDC with
    // durable row identity — scanChangesLineage stamps `_row_id` /
    // `_last_updated_sequence_number` on every change row (the same
    // broadcast per-file lookup + codegen'd position add the lineage
    // scan uses — never an extra shuffle), and scanChangesKeyedByRowId
    // pairs a MERGE's delete+insert into update_preimage/postimage BY
    // ROW ID, no declared identifier columns anywhere: the postimage
    // carries its preimage's id (the round-17 merge carry), which IS
    // the pairing key. The oracle reconstructs the rank-derived ids
    // and the v3 sequence bump per image. At 100 TB the changelog is
    // commit-touch-set-sized and the pairing join is change-set-sized.
    QueryDef("lake_changelog_lineage",
      (s, d) => {
        val whDir = wh("lake_changelog_lineage", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders").select(
          col("o_orderkey"), col("o_totalprice"))
        val tbl = LakehouseTable.create(cat, s, "lake", "orders_cl",
          orders.schema,
          properties = Map(Snaplog.RowLineageProp -> "true"))
        tbl.append(orders.repartition(1)
          .sortWithinPartitions("o_orderkey")) // 1: ids = rank by key
        // MERGE update of the %7==3 keys: one commit, images pair by id
        graft.pipeline.Upsert.upsertTable(tbl,
          orders.filter(col("o_orderkey") % 7 === 3)
            .withColumn("o_totalprice", col("o_totalprice") * 3),
          Seq("o_orderkey"))                   // 2
        // plain retraction of the %7==5 keys: unpaired deletes
        tbl.deleteEq("o_orderkey",
          orders.filter(col("o_orderkey") % 7 === 5).select("o_orderkey")) // 3
        tbl.scanChangesKeyedByRowId(1L)
          .groupBy(col(LakehouseTable.ChangeTypeCol).as("change_type"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("_row_id")).as("distinct_ids"),
            min(col("_row_id")).as("min_rid"),
            max(col("_row_id")).as("max_rid"),
            sum(col("_row_id")).as("sum_rid"),
            max(col("_last_updated_sequence_number")).as("seq"))
          .orderBy(col("change_type"))
      },
      Some("""WITH e1 AS (SELECT o_orderkey,
            ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS rid
          FROM orders),
        ch AS (
          SELECT 'update_preimage' AS change_type, rid, 1 AS seq
            FROM e1 WHERE o_orderkey % 7 = 3
          UNION ALL SELECT 'update_postimage', rid, 2
            FROM e1 WHERE o_orderkey % 7 = 3
          UNION ALL SELECT 'delete', rid, 1
            FROM e1 WHERE o_orderkey % 7 = 5)
        SELECT change_type, COUNT(*) AS n, COUNT(DISTINCT rid) AS distinct_ids,
          CAST(MIN(rid) AS BIGINT) AS min_rid,
          CAST(MAX(rid) AS BIGINT) AS max_rid,
          CAST(SUM(rid) AS BIGINT) AS sum_rid,
          CAST(MAX(seq) AS BIGINT) AS seq
        FROM ch GROUP BY change_type ORDER BY change_type""")),

    // SQL surface of native row lineage (round 16): CALL
    // system.enable_row_lineage backfills a live table's history in
    // listing order (metadata-only at any table size), and the
    // `<table>.lineage` relation serves the content with
    // `_row_id`/`_last_updated_sequence_number` — the SQL-only user's
    // whole lineage lifecycle, no table-API call anywhere. The DuckDB
    // oracle reconstructs the listing-order assignment via ROW_NUMBER.
    QueryDef("lake_sql_lineage",
      (s, d) => {
        val whDir = wh("lake_sql_lineage", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders").select(
          col("o_orderkey"), col("o_totalprice"))
        def oneSortedFile(df: DataFrame) =
          df.repartition(1).sortWithinPartitions("o_orderkey")
        val tbl = LakehouseTable.create(cat, s, "lake", "orders_sl",
          orders.schema)
        tbl.append(oneSortedFile(orders.filter(col("o_orderkey") % 2 === 0)))
        tbl.append(oneSortedFile(orders.filter(col("o_orderkey") % 2 === 1)))
        val cn = sqlCatalog(s, "glin", whDir)
        val pr = s.sql(
          s"CALL $cn.system.enable_row_lineage('lake', 'orders_sl')").head()
        s.sql(
          s"""SELECT _last_updated_sequence_number AS seq, COUNT(*) AS n,
            MIN(_row_id) AS min_row_id, MAX(_row_id) AS max_row_id,
            SUM(_row_id) AS sum_row_id
          FROM $cn.lake.orders_sl.lineage
          GROUP BY _last_updated_sequence_number ORDER BY seq""")
          .withColumn("next_row_id", lit(pr.getLong(0)))
      },
      Some("""WITH e1 AS (SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS rid
          FROM orders WHERE o_orderkey % 2 = 0),
        n1 AS (SELECT COUNT(*) AS c FROM e1),
        e2 AS (SELECT (SELECT c FROM n1) +
            ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS rid
          FROM orders WHERE o_orderkey % 2 = 1),
        n2 AS (SELECT COUNT(*) AS c FROM e2),
        live AS (SELECT 1 AS seq, rid FROM e1
          UNION ALL SELECT 2, rid FROM e2)
        SELECT CAST(seq AS BIGINT) AS seq, COUNT(*) AS n,
          CAST(MIN(rid) AS BIGINT) AS min_row_id,
          CAST(MAX(rid) AS BIGINT) AS max_row_id,
          CAST(SUM(rid) AS BIGINT) AS sum_row_id,
          (SELECT c FROM n1) + (SELECT c FROM n2) AS next_row_id
        FROM live GROUP BY seq ORDER BY seq""")),

    // Iceberg v3 export with initial-default (round 13): a DEFAULTED
    // column exports WITHOUT the compact-first tax — era 1 predates the
    // column (v2 refuses: nothing in a v2 tree can tell a reader to
    // fill 7 instead of null), the v3 tree carries `initial-default`
    // and row-lineage bookkeeping, and the re-import serves the
    // default for era-1 rows and explicit values for era 2. The DuckDB
    // oracle reconstructs both eras from the flat source. At 100 TB
    // this is publishing a table to external readers right after an
    // ADD COLUMN DEFAULT instead of first rewriting every file.
    QueryDef("lake_iceberg_v3_defaults",
      (s, d) => {
        val whDir = wh("lake_iceberg_v3_defaults", d)
        val cat = new Snaplog(whDir)
        val ev = events(s, d).select(col("event_id"), col("user_id"),
          col("event_type"), col("value"))
        val era1 = ev.filter(col("event_id") % 2 === 0)
        val rep = Ingest.ingestDf(cat, "lake", "events_v3", era1)
        val tbl = rep.table
        val cn = sqlCatalog(s, "gv3d", whDir)
        s.sql(s"ALTER TABLE $cn.lake.events_v3 ADD COLUMN score INT DEFAULT 7")
        val era2 = ev.filter(col("event_id") % 2 === 1)
          .withColumn("score", (col("user_id") % 100).cast("int"))
        tbl.append(era2.select(tbl.schema.fieldNames.map(col).toSeq: _*))
        // v2 refuses uncompacted — the v3 option is the whole point
        val v2Refused =
          try { IcebergExport.export(tbl, Paths.get(whDir, "nope")); false }
          catch { case e: IllegalArgumentException =>
            e.getMessage.contains("initial-default") }
        val dest = Paths.get(whDir, "ice_v3")
        IcebergExport.export(tbl, dest, formatVersion = 3)
        val rb = IcebergExport.readBack(dest)
        val imp = graft.interop.IcebergImport.register(
          cat, s, dest, "lake", "events_v3_rt")
        imp.table.scan()
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("score")).as("score_sum"),
            dsum(col("value")).as("total"))
          .withColumn("v3_tree", lit(rb.formatVersion == 3 && v2Refused))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, COUNT(*) AS n,
          CAST(SUM(CASE WHEN event_id % 2 = 1
            THEN CAST(user_id % 100 AS BIGINT) ELSE 7 END) AS BIGINT)
            AS score_sum,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
          TRUE AS v3_tree
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // Iceberg v3 PUFFIN deletion vectors, both directions (round 14):
    // a table with an outstanding position vector exports as v3
    // WITHOUT compacting — the vector becomes a `deletion-vector-v1`
    // roaring-bitmap blob in a puffin file (one blob per referenced
    // data file, located by the v3 manifest columns 143/144/145) —
    // then the tree re-imports, the DV decodes back into a native
    // vector, and the scan nets the deletes exactly (DuckDB oracle).
    // A later append rides ABOVE the vector in sequence order and
    // survives untouched. At 100 TB this is publishing a curated
    // corpus with live takedown vectors to v3 readers (Iceberg 1.8+
    // defaults) with metadata + bitmap-sized I/O only.
    QueryDef("lake_iceberg_v3_dv",
      (s, d) => {
        val whDir = wh("lake_iceberg_v3_dv", d)
        val cat = new Snaplog(whDir)
        val customer = t(s, d, "customer").select(
          col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        val rep = Ingest.ingestDf(cat, "lake", "cust_dv",
          customer.filter(col("c_custkey") % 2 === 0))
        rep.table.deleteMor(col("c_custkey") % 9 === 4)
        // a second era lands AFTER the vector: higher sequence, untouched
        rep.table.append(customer.filter(col("c_custkey") % 2 === 1))
        val dest = Paths.get(whDir, "ice_dv")
        IcebergExport.export(rep.table, dest, formatVersion = 3)
        val rb = IcebergExport.readBack(dest)
        val imp = graft.interop.IcebergImport.register(
          cat, s, dest, "lake", "cust_dv_rt")
        imp.table.scan()
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("total"))
          .withColumn("dv_exported", lit(rb.formatVersion == 3 &&
            rb.nPositionDeleteFiles >= 1))
          .withColumn("dv_imported", lit(imp.positionDeleteFiles >= 1))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, COUNT(*) AS n,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total,
          TRUE AS dv_exported, TRUE AS dv_imported
        FROM customer
        WHERE c_custkey % 2 = 1 OR c_custkey % 9 <> 4
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // Inner WRITE-default (round 13): `evt.score` is added with a
    // write-side default — era 2, appended as a SUBSET struct (the
    // leaf omitted), lands the default; era 3 writes explicit values;
    // era 1 files predate the leaf and read NULL (there is NO inner
    // existence tier: Spark's readers fill missing columns at the top
    // level only — pinned in ColumnDefaultsSpec, refused honestly in
    // SQL). The DuckDB oracle reconstructs all three eras by the %3
    // split.
    QueryDef("lake_nested_default",
      (s, d) => {
        val whDir = wh("lake_nested_default", d)
        val cat = new Snaplog(whDir)
        val ev = events(s, d).select(col("event_id"), col("user_id"),
          col("event_type"), col("value"))
        def shaped(df: org.apache.spark.sql.DataFrame) = df
          .withColumn("evt", struct(col("event_type").as("t"),
            col("value").cast("decimal(18,2)").as("v")))
          .drop("event_type", "value")
        val era1 = shaped(ev.filter(col("event_id") % 3 === 0))
        val rep = Ingest.ingestDf(cat, "lake", "events_nd", era1)
        val tbl = rep.table
        tbl.addStructFieldDefaulted("evt.score",
          org.apache.spark.sql.types.IntegerType, Some("5"))
        // era 2: the SUBSET shape — leaf omitted, write default fills
        tbl.append(shaped(ev.filter(col("event_id") % 3 === 1)))
        // era 3: explicit values
        tbl.append(ev.filter(col("event_id") % 3 === 2)
          .withColumn("evt", struct(col("event_type").as("t"),
            col("value").cast("decimal(18,2)").as("v"),
            (col("user_id") % 100).cast("int").as("score")))
          .drop("event_type", "value"))
        tbl.scan()
          .groupBy(col("evt.t").as("event_type"))
          .agg(count(lit(1)).as("n"),
            count(col("evt.score")).as("scored"),
            sum(col("evt.score")).as("score_sum"),
            dsum(col("evt.v")).as("total"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, COUNT(*) AS n,
          COUNT(CASE WHEN event_id % 3 <> 0 THEN 1 END) AS scored,
          CAST(SUM(CASE WHEN event_id % 3 = 1 THEN 5
            WHEN event_id % 3 = 2 THEN CAST(user_id % 100 AS BIGINT)
            END) AS BIGINT) AS score_sum,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // Delete-dodging reads on a delete-bearing table: an equality
    // delete lands in ONE partition's key range; a filtered COUNT and a
    // row read over OTHER partitions stay on the free paths (metadata
    // aggregate / regular DSv2 scan) because delete-touch attribution
    // (position vectors by recorded path, equality deletes by key-bounds
    // overlap in replay order) proves the pruned file set dodges every
    // outstanding delete. The touched partition's aggregate subtracts
    // through the MOR relation — both legs DuckDB-oracled, and the
    // plan-shape claims (metadata-answered / MOR-scanned) ride the
    // result. At 100 TB this is last month's dashboard staying free
    // while this week's CDC deletes are pending elsewhere.
    QueryDef("lake_mor_dodge",
      (s, d) => {
        val whDir = wh("lake_mor_dodge", d)
        val cat = new Snaplog(whDir)
        val orders = t(s, d, "orders")
        // truncate(4000, key) partitions give each partition a DISJOINT
        // key range — files in bucket >= 1 carry o_orderkey bounds
        // >= 4000, provably disjoint from the deleted keys (< 100)
        val rep = Ingest.ingestDf(cat, "lake", "orders_dodge", orders,
          partitionColumns = Seq("truncate(4000,o_orderkey)"))
        rep.table.deleteEq("o_orderkey",
          orders.filter(col("o_orderkey") < 100).select("o_orderkey"))
        require(cat.liveDeleteFiles("lake", "orders_dodge").nonEmpty)
        val cn = sqlCatalog(s, "gmd", whDir)
        // key window over untouched buckets: COUNT from metadata (the
        // aligned truncate window is transform-exact AND delete-dodging)
        val dodge = s.sql(s"""SELECT COUNT(*) AS n FROM $cn.lake.orders_dodge
          WHERE o_orderkey >= 4000 AND o_orderkey < 8000""")
        val dodgeMeta = dodge.queryExecution.sparkPlan.toString
          .contains("LocalTableScan")
        // same window, row read: regular DSv2 scan (BatchScan), no MOR
        val rowRead = s.sql(s"""SELECT o_orderkey FROM $cn.lake.orders_dodge
          WHERE o_orderkey >= 4000 AND o_orderkey < 8000""")
        val rowDsv2 = rowRead.queryExecution.sparkPlan.toString.contains("BatchScan")
        // the touched low bucket: subtraction runs, result nets deletes
        val touched = s.sql(s"""SELECT COUNT(*) AS n,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          FROM $cn.lake.orders_dodge WHERE o_orderkey < 4000""")
        val touchedMor = !touched.queryExecution.sparkPlan.toString
          .contains("LocalTableScan")
        import s.implicits._
        Seq((dodge.head().getLong(0), touched.head().getLong(0),
          touched.head().getDouble(1), dodgeMeta && rowDsv2 && touchedMor))
          .toDF("n_untouched", "n_touched", "total_touched", "plans_split")
      },
      Some("""SELECT
          (SELECT COUNT(*) FROM orders
             WHERE o_orderkey >= 4000 AND o_orderkey < 8000) AS n_untouched,
          (SELECT COUNT(*) FROM orders
             WHERE o_orderkey < 4000 AND o_orderkey >= 100) AS n_touched,
          (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             FROM orders
             WHERE o_orderkey < 4000 AND o_orderkey >= 100) AS total_touched,
          TRUE AS plans_split""")),

    // NESTED columns in a managed table: events re-shaped with a struct
    // (evt.type, evt.value), a map (attrs['user']) and an array
    // (vals[0..1]) column, written through the managed path (partitioned
    // by days(ts), zstd, field-ids on the top level), scanned back and
    // aggregated over EXTRACTED nested fields — the DuckDB oracle
    // computes the same aggregate from the raw flat columns, so the
    // whole nested round trip (write → log → scan → extraction) is
    // hash-gated. STRUCT-LEAF file stats (Iceberg's per-leaf metrics)
    // record bounds under dotted keys ("evt.type", "evt.v") and a
    // pushed struct-leaf predicate with no matching leaf range drops
    // every file before planning — claimed in-result alongside the
    // days(ts) transform pruning. List/map leaves stay stat-free by
    // design (an element bound is no row-predicate bound).
    QueryDef("lake_nested_types",
      (s, d) => {
        val whDir = wh("lake_nested_types", d)
        val cat = new Snaplog(whDir)
        val ev = events(s, d)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
          .withColumn("evt", struct(
            col("event_type").as("type"),
            col("value").cast("decimal(18,2)").as("v")))
          .withColumn("attrs", map(lit("user"), col("user_id").cast("string")))
          .withColumn("vals", array(col("value"), col("value") * 2))
        val rep = Ingest.ingestDf(cat, "lake", "events_nested", ev,
          partitionColumns = Seq("days(ts)"))
        val tbl = rep.table
        // flat rename BESIDE the nested columns (round 12): the table
        // flips to read-by-id, files written under `user_id` answer as
        // `uid`, and the nested roots keep resolving in both plan
        // shapes (id-matched full reads, name-fallback pruned reads) —
        // the uid_users aggregate below hash-gates all of it
        tbl.renameColumn("user_id", "uid")
        // transform pruning lives alongside nested columns: a one-day
        // window keeps strictly fewer files than the table holds
        val all = cat.liveFiles("lake", "events_nested")
        val probeDay = all.flatMap(_.partitionValues.get("ts_day")).min
        val kept = all.count(_.partitionValues.get("ts_day").contains(probeDay))
        // struct-leaf metrics (round 12): every file's log entry holds
        // bounds for the struct leaves, and a pushed leaf predicate
        // outside every leaf range prunes the SQL scan to ZERO files
        val leafStats = all.nonEmpty && all.forall(_.columnStats.exists(st =>
          st.contains("evt.type") && st.contains("evt.v")))
        val cn = sqlCatalog(s, "gnesttp", whDir)
        val leafScanned = s.sql(s"SELECT event_id FROM $cn.lake.events_nested " +
            "WHERE evt.type = 'zz_no_such_type'")
          .queryExecution.sparkPlan
          .collect { case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan }
          .collect { case fs: org.apache.spark.sql.execution.datasources.v2.FileScan =>
            fs.fileIndex.inputFiles.length }.sum
        tbl.scan()
          .groupBy(col("evt.type").as("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("evt.v")).cast("double").as("total"),
            sum(element_at(col("vals"), 2)
              .cast("decimal(18,2)")).cast("double").as("doubled"),
            countDistinct(element_at(col("attrs"), "user")).as("users"),
            countDistinct(col("uid")).as("uid_users"))
          .withColumn("pruned", lit(kept > 0 && kept < all.size))
          .withColumn("leaf_stats", lit(leafStats))
          .withColumn("leaf_pruned", lit(leafScanned == 0))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
          CAST(SUM(CAST(value * 2 AS DECIMAL(18,2))) AS DOUBLE) AS doubled,
          COUNT(DISTINCT CAST(user_id AS VARCHAR)) AS users,
          COUNT(DISTINCT user_id) AS uid_users,
          TRUE AS pruned, TRUE AS leaf_stats, TRUE AS leaf_pruned
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // Inner-struct evolution (round 12): Iceberg's `ADD COLUMN
    // parent.child` + struct-leaf widening, both driven through SQL
    // ALTER. Era-1 files predate the leaf and null-fill by NAME in
    // every plan shape; era-2 lands int values; the leaf then widens
    // int→bigint and era-2's narrow-written values read back wide
    // (parquet column readers are per-leaf — same value-preserving
    // promotion as a flat widen). The DuckDB oracle rebuilds the same
    // aggregate from the raw flat columns with the era split inlined,
    // so the whole lifecycle (write → ALTER → write → ALTER → scan →
    // extraction) is hash-gated. Metadata-only at any table size: no
    // data moves at either ALTER.
    QueryDef("lake_nested_evolution",
      (s, d) => {
        val whDir = wh("lake_nested_evolution", d)
        val cat = new Snaplog(whDir)
        val ev = events(s, d).select(col("event_id"), col("user_id"),
          col("event_type"), col("value"))
        val era1 = ev.filter(col("event_id") % 2 === 0)
          .withColumn("evt", struct(col("event_type").as("t"),
            col("value").cast("decimal(18,2)").as("v")))
          .drop("event_type", "value")
        val rep = Ingest.ingestDf(cat, "lake", "events_evo", era1)
        val tbl = rep.table
        val cn = sqlCatalog(s, "gnestevo", whDir)
        s.sql(s"ALTER TABLE $cn.lake.events_evo ADD COLUMN evt.score INT")
        val era2 = ev.filter(col("event_id") % 2 === 1)
          .withColumn("evt", struct(col("event_type").as("t"),
            col("value").cast("decimal(18,2)").as("v"),
            (col("user_id") % 100).cast("int").as("score")))
          .drop("event_type", "value")
        tbl.append(era2.select(tbl.schema.fieldNames.map(col).toSeq: _*))
        s.sql(s"ALTER TABLE $cn.lake.events_evo " +
          "ALTER COLUMN evt.score TYPE BIGINT")
        tbl.scan()
          .groupBy(col("evt.t").as("event_type"))
          .agg(count(lit(1)).as("n"),
            count(col("evt.score")).as("scored"),
            sum(col("evt.score")).as("score_sum"),
            sum(col("evt.v")).cast("double").as("total"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, COUNT(*) AS n,
          COUNT(CASE WHEN event_id % 2 = 1 THEN 1 END) AS scored,
          CAST(SUM(CASE WHEN event_id % 2 = 1
            THEN CAST(user_id % 100 AS BIGINT) END) AS BIGINT) AS score_sum,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // INNER struct-field RENAME (round 13): era 1 writes `evt.v`; the
    // SQL ALTER renames it to `evt.amount` — metadata-only, by parquet
    // field-id indirection one level down (the stored schema flips to
    // inner-by-id; era-1 files keep serving the renamed leaf's values
    // in BOTH plan shapes). Era 2 appends under the new name, a
    // filtered aggregate over the renamed leaf spans both eras, and
    // the DuckDB oracle recomputes everything from the flat source —
    // the whole rename lifecycle is hash-gated. An inner DROP of a
    // second leaf rides the same gate. At 100 TB: zero rewrite for a
    // rename that name-resolution systems pay a full table rewrite for.
    QueryDef("lake_nested_rename",
      (s, d) => {
        val whDir = wh("lake_nested_rename", d)
        val cat = new Snaplog(whDir)
        val ev = events(s, d).select(col("event_id"), col("user_id"),
          col("event_type"), col("value"))
        val era1 = ev.filter(col("event_id") % 2 === 0)
          .withColumn("evt", struct(col("event_type").as("t"),
            col("value").cast("decimal(18,2)").as("v"),
            (col("user_id") % 100).cast("int").as("aux")))
          .drop("event_type", "value")
        val rep = Ingest.ingestDf(cat, "lake", "events_ren", era1)
        val tbl = rep.table
        val era1Paths = cat.liveFiles("lake", "events_ren").map(_.path).toSet
        val cn = sqlCatalog(s, "gnestren", whDir)
        s.sql(s"ALTER TABLE $cn.lake.events_ren RENAME COLUMN evt.v TO amount")
        s.sql(s"ALTER TABLE $cn.lake.events_ren DROP COLUMN evt.aux")
        // metadata-only: the rename+drop moved no data
        val unmoved = cat.liveFiles("lake", "events_ren").map(_.path).toSet == era1Paths
        val era2 = ev.filter(col("event_id") % 2 === 1)
          .withColumn("evt", struct(col("event_type").as("t"),
            col("value").cast("decimal(18,2)").as("amount")))
          .drop("event_type", "value")
        tbl.append(era2.select(tbl.schema.fieldNames.map(col).toSeq: _*))
        val reloaded = LakehouseTable.load(cat, s, "lake", "events_ren")
        reloaded.scan()
          .filter(col("evt.amount") >= 0) // pruned-read plan shape
          .groupBy(col("evt.t").as("event_type"))
          .agg(count(lit(1)).as("n"),
            dsum(col("evt.amount")).as("total"))
          .withColumn("rename_metadata_only", lit(unmoved))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
          TRUE AS rename_metadata_only
        FROM events WHERE CAST(value AS DECIMAL(18,2)) >= 0
        GROUP BY event_type ORDER BY event_type""")),

    // LIST/MAP INTERIOR rename (round 15, VERDICT r14 #7): renaming a
    // struct member INSIDE an array — the one evolution interior-id
    // stamping (round 14) existed for but reads previously refused.
    // Metadata-only (file paths unchanged, claimed in-result); the
    // table flips to interior-by-id reads, requesting full interior
    // subtrees with ids attached because Spark's nested pruning drops
    // interior id metadata (the FieldEvolutionSpec pin). Era 1 files
    // carry the OLD member name and serve values by id; era 2 lands
    // under the new name. The DuckDB oracle reconstructs the exploded
    // array (each source row contributes v and 2v elements) — a
    // silently-nulled old era would zero half the sum and hash-fail.
    QueryDef("lake_interior_rename",
      (s, d) => {
        val whDir = wh("lake_interior_rename", d)
        val cat = new Snaplog(whDir)
        val ev = events(s, d).select(col("event_id"), col("event_type"),
          col("value"))
        def withArr(df: org.apache.spark.sql.DataFrame, member: String) =
          df.withColumn("arr", array(
            struct(col("value").cast("decimal(18,2)").as(member)),
            struct((col("value") * 2).cast("decimal(18,2)").as(member))))
            .drop("value")
        val era1 = withArr(ev.filter(col("event_id") % 2 === 0), "v")
        val tbl = Ingest.ingestDf(cat, "lake", "events_arr", era1).table
        val era1Paths = cat.liveFiles("lake", "events_arr").map(_.path).toSet
        tbl.renameInteriorField("arr.element.v", "amount")
        val unmoved =
          cat.liveFiles("lake", "events_arr").map(_.path).toSet == era1Paths
        val era2 = withArr(ev.filter(col("event_id") % 2 === 1), "amount")
        tbl.append(era2.select(tbl.schema.fieldNames.map(col).toSeq: _*))
        LakehouseTable.load(cat, s, "lake", "events_arr").scan()
          .select(col("event_type"), explode(col("arr")).as("x"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("x.amount")).as("total"))
          .withColumn("rename_metadata_only", lit(unmoved))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, 2 * COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,2)) +
                   CAST(value * 2 AS DECIMAL(18,2))) AS DOUBLE) AS total,
          TRUE AS rename_metadata_only
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // Column DEFAULT values (round 12, Iceberg v3 initial/write-default
    // semantics): era 1 predates the column and answers the EXISTENCE
    // default from the parquet readers' missing-column fill (ZERO data
    // movement at the ALTER — claimed in-result by unchanged file
    // paths); era 2 writes explicit values; SET DEFAULT then rebinds
    // only the WRITE side and era 3, appended WITHOUT the column,
    // takes the new write default while era 1 keeps the existence one.
    // The DuckDB oracle reconstructs all three eras from the flat
    // source with the same %3 split, so the whole lifecycle
    // (write → ALTER DEFAULT → write → SET DEFAULT → write → scan) is
    // hash-gated.
    QueryDef("lake_column_defaults",
      (s, d) => {
        val whDir = wh("lake_column_defaults", d)
        val cat = new Snaplog(whDir)
        val ev = events(s, d).select(col("event_id"), col("user_id"),
          col("event_type"), col("value"))
        val era1 = ev.filter(col("event_id") % 3 === 0)
        val rep = Ingest.ingestDf(cat, "lake", "events_dflt", era1)
        val tbl = rep.table
        val before = cat.liveFiles("lake", "events_dflt").map(_.path).toSet
        val cn = sqlCatalog(s, "gdflttp", whDir)
        s.sql(s"ALTER TABLE $cn.lake.events_dflt " +
          "ADD COLUMN segment STRING DEFAULT 'legacy'")
        val after = cat.liveFiles("lake", "events_dflt").map(_.path).toSet
        val era2 = ev.filter(col("event_id") % 3 === 1)
          .withColumn("segment",
            when(col("value") >= 50.0, lit("hot")).otherwise(lit("warm")))
        tbl.append(era2.select(tbl.schema.fieldNames.map(col).toSeq: _*))
        s.sql(s"ALTER TABLE $cn.lake.events_dflt " +
          "ALTER COLUMN segment SET DEFAULT 'backfill'")
        val era3 = ev.filter(col("event_id") % 3 === 2)
        tbl.append(era3) // column omitted → the NEW write default
        tbl.scan()
          .groupBy(col("segment"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("users"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
          .withColumn("metadata_only", lit(before == after && before.nonEmpty))
          .orderBy(col("segment"))
      },
      Some("""SELECT CASE WHEN event_id % 3 = 0 THEN 'legacy'
            WHEN event_id % 3 = 2 THEN 'backfill'
            WHEN value >= 50.0 THEN 'hot' ELSE 'warm' END AS segment,
          COUNT(*) AS n, COUNT(DISTINCT user_id) AS users,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
          TRUE AS metadata_only
        FROM events GROUP BY 1 ORDER BY 1""")),

    // Auto schema evolution on write (round 12, Delta-mergeSchema
    // analogue): a drifting batch appends through ONE appendEvolve
    // call that widens score int→bigint (era-2 values exceed int
    // range, proving the read-time promotion is live), adds a lang
    // column (era-1 rows null) and grows the struct a new leaf evt.v
    // (era-1 rows null) — no coordinated DDL, every underlying safety
    // gate still armed. The DuckDB oracle rebuilds the aggregate from
    // the flat source with the same era split, hash-gating the whole
    // drift lifecycle. In-result claims pin the evolved shape.
    QueryDef("lake_schema_merge",
      (s, d) => {
        val whDir = wh("lake_schema_merge", d)
        val cat = new Snaplog(whDir)
        val ev = events(s, d).select(col("event_id"), col("user_id"),
          col("event_type"), col("value"))
        val era1 = ev.filter(col("event_id") % 2 === 0)
          .withColumn("score", (col("user_id") % 100).cast("int"))
          .withColumn("evt", struct(col("event_type").as("t")))
          .drop("event_type")
        val rep = Ingest.ingestDf(cat, "lake", "events_drift", era1)
        val tbl = rep.table
        val era2 = ev.filter(col("event_id") % 2 === 1)
          .withColumn("score", col("user_id") % 100 + lit(3000000000L))
          .withColumn("lang",
            when(col("value") >= 50.0, lit("en")).otherwise(lit("xx")))
          .withColumn("evt", struct(col("event_type").as("t"),
            col("value").cast("decimal(18,2)").as("v")))
          .drop("event_type")
        tbl.appendEvolve(era2)
        val widened = tbl.schema("score").dataType ==
          org.apache.spark.sql.types.LongType
        val leafAdded = graft.types.SchemaInfer.innerType(
          tbl.schema, Seq("evt", "v")).isDefined
        tbl.scan()
          .groupBy(col("evt.t").as("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("score")).as("score_sum"),
            count(col("lang")).as("langs"),
            sum(col("evt.v")).cast("double").as("total_v"))
          .withColumn("widened", lit(widened))
          .withColumn("leaf_added", lit(leafAdded))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, COUNT(*) AS n,
          CAST(SUM(CASE WHEN event_id % 2 = 0 THEN CAST(user_id % 100 AS BIGINT)
            ELSE CAST(user_id % 100 AS BIGINT) + 3000000000 END) AS BIGINT)
            AS score_sum,
          COUNT(CASE WHEN event_id % 2 = 1 THEN 1 END) AS langs,
          CAST(SUM(CASE WHEN event_id % 2 = 1
            THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS total_v,
          TRUE AS widened, TRUE AS leaf_added
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // Iceberg-spec murmur3 bucket interop: a supplier table partitioned
    // by mbucket(8,s_suppkey) exports a REAL `bucket[8]` spec (the spec
    // mandates murmur3_x86_32, which mbucket computes — Appendix-B
    // vectors pinned in SnaplogSpec), external readers can prune on the
    // stored indexes, and the tree re-imports as a foreign bucket table
    // with its spec and pruning intact — the interop loop the reference
    // runs via DuckDB's iceberg_scan (query_iceberg_duckdb.py:21-29),
    // previously lossy for bucket layouts (xxhash64 exports as void).
    // In-result claims: the metadata declares bucket[8] (not void), the
    // re-import carries mbucket(8,s_suppkey), and an equality probe
    // prunes to strictly fewer files than the table holds.
    QueryDef("lake_iceberg_bucket",
      (s, d) => {
        val whDir = wh("lake_iceberg_bucket", d)
        val cat = new Snaplog(whDir)
        val supplier = t(s, d, "supplier")
        val rep = Ingest.ingestDf(cat, "lake", "supp_mb", supplier,
          partitionColumns = Seq("mbucket(8,s_suppkey)"))
        val dest = Paths.get(whDir, "ice_tree")
        IcebergExport.export(rep.table, dest)
        val metaText = {
          val metaDir = dest.resolve("metadata")
          Files.readString(Files.list(metaDir).iterator.asScala
            .filter(_.getFileName.toString.endsWith(".metadata.json")).toSeq.head)
        }
        val realBucketSpec = metaText.contains("bucket[8]") &&
          !metaText.contains("\"void\"")
        val imp = graft.interop.IcebergImport.register(
          cat, s, dest, "lake", "supp_mb_imp")
        val specRoundTrips = imp.partitionColumns == Seq("mbucket(8,s_suppkey)")
        // equality probe prunes on the imported metadata immediately
        import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Literal}
        val fields = graft.table.PartitionTransforms.parseAll(imp.partitionColumns)
        val keyAttr = AttributeReference("s_suppkey",
          imp.schema("s_suppkey").dataType)()
        val probe: Any = imp.schema("s_suppkey").dataType match {
          case org.apache.spark.sql.types.LongType => 1L
          case _ => 1
        }
        val all = cat.liveFiles("lake", "supp_mb_imp")
        val kept = all.filter(f => graft.table.PartitionTransforms.mayMatch(
          f, EqualTo(keyAttr, Literal(probe)), fields))
        imp.table.scan()
          .groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n"), dsum(col("s_acctbal")).as("total"))
          .withColumn("real_bucket_spec", lit(realBucketSpec))
          .withColumn("spec_round_trips", lit(specRoundTrips))
          .withColumn("bucket_pruned",
            lit(kept.nonEmpty && kept.size < all.size))
          .orderBy(col("s_nationkey"))
      },
      Some("""SELECT s_nationkey, COUNT(*) AS n,
          CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total,
          TRUE AS real_bucket_spec, TRUE AS spec_round_trips,
          TRUE AS bucket_pruned
        FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""")),

    // Merge-on-read row-level DELETE: same predicate as the COW variant
    // but NO data file rewrites — the commit adds one position-delete
    // vector and scans subtract it with a broadcast anti-join. The
    // untouched-file-set claim and the vector count are part of the
    // result; surviving rows must still match DuckDB exactly. At 100 TB
    // this is the cheap path for scattered-predicate deletes; compact()
    // materializes vectors when read amplification matters.
    QueryDef("lake_delete_mor",
      (s, d) => {
        val cat = new Snaplog(wh("lake_delete_mor", d))
        val orders = t(s, d, "orders")
        val rep = Ingest.ingestDf(cat, "lake", "orders_mor", orders,
          partitionColumns = Seq("o_orderstatus"))
        val before = cat.liveFiles("lake", "orders_mor").map(_.path).toSet
        val snap = rep.table.deleteMor(
          col("o_orderstatus") === "F" && col("o_totalprice") > 200000.0)
        val after = cat.liveFiles("lake", "orders_mor").map(_.path).toSet
        val nVectors = cat.liveDeleteFiles("lake", "orders_mor").size.toLong
        rep.table.scan()
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .withColumn("last_op", lit(snap.operation))
          .withColumn("data_files_untouched", lit(before == after))
          .withColumn("n_vectors", lit(nVectors))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
          'mor_delete' AS last_op, TRUE AS data_files_untouched,
          1 AS n_vectors
        FROM orders
        WHERE NOT (o_orderstatus = 'F' AND o_totalprice > 200000.0)
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    QueryDef("lake_compaction",
      (s, d) => {
        val cat = new Snaplog(wh("lake_compaction", d))
        val orders = t(s, d, "orders")
        val table = LakehouseTable.create(cat, s, "lake", "orders_compact",
          orders.schema)
        (0 until 3).foreach(i =>
          table.append(orders.filter(col("o_orderkey") % 3 === i)))
        val filesBefore = cat.liveFiles("lake", "orders_compact").size.toLong
        table.compact()
        val filesAfter = cat.liveFiles("lake", "orders_compact").size.toLong
        val lastOp = cat.snapshots("lake", "orders_compact").last.operation
        table.scan()
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .withColumn("files_after", lit(filesAfter))
          .withColumn("compacted", lit(filesBefore > filesAfter))
          .withColumn("last_op", lit(lastOp))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
          1 AS files_after, TRUE AS compacted, 'replace' AS last_op
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Snapshot expiration + vacuum: history truncated to the last 2
    // snapshots (base overwrite + append), orphaned data files of the
    // expired snapshot physically deleted; the live result is unchanged.
    QueryDef("lake_expire_vacuum",
      (s, d) => {
        val cat = new Snaplog(wh("lake_expire_vacuum", d))
        val orders = t(s, d, "orders")
        val table = LakehouseTable.create(cat, s, "lake", "orders_exp",
          orders.schema)
        table.append(orders)
        table.overwrite(orders.filter(col("o_orderstatus") === "F"))
        table.append(orders.filter(col("o_orderstatus") === "O"))
        val kept = cat.expireSnapshots("lake", "orders_exp", keepLast = 2)
        val deleted = cat.vacuum("lake", "orders_exp", graceMs = 0)
        table.scan()
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .withColumn("n_snapshots", lit(kept.size.toLong))
          .withColumn("vacuumed_any", lit(deleted.nonEmpty))
          .orderBy(col("o_orderstatus"))
      },
      Some("""WITH merged AS (
          SELECT * FROM orders WHERE o_orderstatus = 'F'
          UNION ALL SELECT * FROM orders WHERE o_orderstatus = 'O')
        SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
          2 AS n_snapshots, TRUE AS vacuumed_any
        FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Additive schema evolution: append → add nullable column → append
    // with the column filled. Old files scan as null (read-schema
    // reconciliation) — no rewrite of existing data.
    QueryDef("lake_schema_evolution",
      (s, d) => {
        val cat = new Snaplog(wh("lake_schema_evolution", d))
        val nation = t(s, d, "nation")
        val table = LakehouseTable.create(cat, s, "lake", "nation_evo",
          nation.schema)
        table.append(nation.filter(col("n_nationkey") < 13))
        table.addColumn("n_name_len", org.apache.spark.sql.types.IntegerType)
        table.append(nation.filter(col("n_nationkey") >= 13)
          .withColumn("n_name_len", length(col("n_name")).cast("int")))
        table.scan()
          .groupBy(col("n_regionkey"))
          .agg(count(lit(1)).as("n"),
            count(col("n_name_len")).as("n_filled"),
            sum(col("n_name_len")).as("len_sum"))
          .orderBy(col("n_regionkey"))
      },
      Some("""WITH evo AS (SELECT n_regionkey,
          CASE WHEN n_nationkey >= 13 THEN length(n_name) END AS n_name_len
          FROM nation)
        SELECT n_regionkey, COUNT(*) AS n, COUNT(n_name_len) AS n_filled,
          CAST(SUM(n_name_len) AS BIGINT) AS len_sum
        FROM evo GROUP BY n_regionkey ORDER BY n_regionkey"""))
  )
}
