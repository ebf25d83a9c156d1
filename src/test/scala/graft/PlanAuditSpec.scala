package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Plan-quality audits: the properties that make these queries scale —
  * filters reaching the parquet scan, pruned read schemas, broadcast
  * dimension joins, metadata partition pruning, no cartesian products —
  * asserted on the actual physical plans so perf regressions fail CI,
  * not just benchmarks. */
class PlanAuditSpec extends SparkSpec {

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf)

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter_projection: predicates push down to the parquet scan") {
    val plan = physical(q("filter_projection"))
    assert(plan.contains("PushedFilters:"), plan.take(500))
    assert(plan.contains("EqualTo(l_returnflag,R)"),
      "equality filter must reach the scan")
    // (the PushedFilters list renders truncated at 100 chars)
    assert(plan.contains("GreaterThan(l_quantity,"),
      "range filter must reach the scan")
  }

  test("filter_projection: read schema pruned to referenced columns") {
    val plan = physical(q("filter_projection"))
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_extendedprice"),
      s"unreferenced column read: $readSchema")
    assert(readSchema.contains("l_quantity"))
  }

  test("q03: small dimension joins broadcast, no cartesian product") {
    val plan = physical(q("q03_shipping_priority"))
    assert(plan.contains("BroadcastHashJoin"), "customer join must broadcast")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q05: star joins broadcast all four dimensions") {
    val plan = physical(q("q05_local_supplier_volume"))
    val n = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(n >= 4, s"expected >=4 broadcast joins, got $n")
  }

  test("TPC-H extras: dimensions broadcast, no cartesian products") {
    // q19's OR-of-ANDs and q21's collapsed double correlation are the
    // shapes most at risk of degrading to a cartesian / per-row probe.
    for (name <- Seq("q02_min_cost_supplier", "q07_nation_trade",
        "q09_product_profit", "q16_supplier_counts",
        "q19_disjunctive_revenue", "q21_sole_fault")) {
      val plan = physical(q(name))
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian")
      assert(plan.contains("BroadcastHashJoin"), s"$name lost its broadcasts")
    }
  }

  test("round-4 additions: broadcasts kept, no cartesian products") {
    // text_tfidf's 1-row N and feature_binning's 1-row [min,max] must
    // plan as broadcast nested-loop over a single row, never a shuffled
    // cartesian; dedup_incremental's fingerprint join must hash.
    for (name <- Seq("text_tfidf", "feature_binning", "dedup_incremental",
        "embedding_centroids", "skew_salted_agg")) {
      val plan = physical(q(name))
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian")
    }
    assert(physical(q("feature_binning")).contains("BroadcastNestedLoopJoin")
      || physical(q("feature_binning")).contains("BroadcastHashJoin"),
      "min/max row must broadcast")
  }

  test("skew_salted_agg: both aggregation stages combine map-side") {
    val plan = physical(q("skew_salted_agg"))
    val n = "HashAggregate".r.findAllIn(plan).length
    // two logical stages × (partial + final) — at least 4 hash aggregates,
    // and the salted stage must shuffle on (event_type, salt), not on
    // event_type alone
    assert(n >= 4, s"expected >=4 HashAggregates, got $n:\n$plan")
    // the salt (pmod of the distinct key) must be part of the stage-1
    // grouping so the distinct state splits 16 ways
    assert(plan.contains("pmod(user_id"), "salted key missing from the plan")
  }

  test("runtime bloom filter injects might_contain on the fact side of a selective shuffle join") {
    // The scale lever for big-big joins with a selective build side:
    // Catalyst's InjectRuntimeFilter plants a bloom filter from the
    // selective side into the fact scan, cutting shuffle volume before
    // the join. Default thresholds (10GB application side) are sized for
    // clusters; lowering them here proves the engine's plans are
    // eligible — production tuning is config, not code.
    // broadcast must be off: when the build side is broadcastable by
    // size (always true at unit-test scale, never at the target scale)
    // the rule correctly skips — a BHJ needs no bloom filter
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set(keys(0), "0")
    spark.conf.set(keys(1), "true")
    spark.conf.set(keys(2), "-1")
    try {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val sel = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_totalprice") > 400000)
      val joined = li.hint("merge")
        .join(sel.hint("merge"), li("l_orderkey") === sel("o_orderkey"))
        .groupBy(col("o_orderstatus")).count()
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n${plan.take(2000)}")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("q02: correlated min is a single window pass, not a self-join probe") {
    val plan = physical(q("q02_min_cost_supplier"))
    assert(plan.contains("Window"), "per-part min must plan as a window")
  }

  test("q13: outer join preserves zero-order customers in the plan") {
    val plan = physical(q("q13_customer_distribution"))
    assert(plan.contains("LeftOuter") || plan.contains("RightOuter"),
      s"expected an outer join: ${plan.take(800)}")
  }

  test("lake partition pruning never hands Spark other partitions' files") {
    val files = q("lake_partition_pruning").inputFiles
    assert(files.nonEmpty)
    assert(files.forall(_.contains("__p_l_returnflag=R")),
      files.mkString("\n"))
  }

  test("dedup pipelines never plan a cartesian product") {
    Seq("dedup_minhash", "dedup_simhash", "dedup_ngram").foreach { name =>
      val plan = physical(q(name))
      assert(!plan.contains("CartesianProduct"), s"$name plans a cross join")
    }
  }

  test("aggregations use partial (map-side) aggregation") {
    val plan = physical(q("q01_pricing_summary"))
    assert("HashAggregate".r.findAllIn(plan).length >= 2,
      "expected partial+final aggregate pair")
  }

  test("q04 correlated EXISTS plans as a semi join, not a per-row subquery") {
    val plan = physical(q("q04_order_priority"))
    assert(plan.contains("LeftSemi"), plan.take(800))
    assert(!plan.contains("CartesianProduct"))
  }

  test("ann queries never plan a cartesian product (bucket/list equi-joins)") {
    Seq("ann_lsh", "ann_ivf").foreach { name =>
      val plan = physical(q(name))
      assert(!plan.contains("CartesianProduct"), s"$name plans a cross join")
    }
  }

  test("exact-twin and containment queries keep the scale plan shapes") {
    // the degenerate parameterizations must ride the SAME bucket/list/
    // posting equi-join plans as the production tiers — exactness must
    // come from the parameters, never from a fallback cross join
    Seq("ann_lsh_exact", "ann_ivf_exact", "dedup_containment_exact")
      .foreach { name =>
        val plan = physical(q(name))
        assert(!plan.contains("CartesianProduct"), s"$name plans a cross join")
      }
  }

  test("merge-on-read upsert commit cost is batch-sized in the plan") {
    // the gate's own in-result assertions prove carried-by-path; here
    // the SCAN side: reading the merged table must still pushdown and
    // never plan a cartesian around the eq-delete anti-joins
    val plan = physical(q("lake_upsert_merge"))
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "eq-delete subtraction must broadcast the key set")
  }

  test("bucketed join is co-located: sort-merge joins straight over buckets, zero shuffles") {
    val plan = physical(q("bucketed_colocated_join"))
    assert(plan.contains("SortMergeJoin"), plan.take(800))
    val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!joinPart.contains("Exchange hashpartitioning"),
      "bucketed sides must not re-shuffle on the join key")
    // any sorts below the join must be bucket-local (global=false) —
    // cheap in-memory per-bucket ordering, never a range shuffle
    "Sort \\[[^\\]]+\\], (true|false)".r.findAllMatchIn(joinPart).foreach { m =>
      assert(m.group(1) == "false", s"global sort in bucketed join: ${m.matched}")
    }
    assert(plan.contains("Bucketed: true"), "scan must be bucket-aware")
  }

  test("stat-based file skipping prunes non-matching files from metadata") {
    val pruned = q("lake_file_skipping")
    // the table was written as 4 range-partitioned files; a 2000-key
    // range must skip at least one of them purely from log stats
    val all = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(pruned.inputFiles.length < 4,
      s"expected pruning below 4 files, scanned ${pruned.inputFiles.length}")
    // correctness unaffected: result equals the plain filter
    val expected = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderkey").between(1000, 3000)).count()
    assert(pruned.agg(sum(col("n"))).head().getLong(0) === expected)
    assert(expected < all)
  }

  test("incremental read scans only the delta rows (snapshot 1 never touched)") {
    // the query ingests key%3==0 as snapshot 1 then appends %3==1, %3==2:
    // the incremental row count must equal the two appended subsets only
    val inc = q("lake_incremental_read")
    val expected = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderkey") % 3 =!= 0).count()
    assert(inc.agg(sum(col("n"))).head().getLong(0) === expected)
    assert(inc.inputFiles.nonEmpty)
  }

  test("imported-MOR scan: delete subtraction is broadcast anti-joins, never a shuffle of the data side") {
    import java.nio.file.Files
    import spark.implicits._
    val cat = new graft.catalog.Snaplog(
      Files.createTempDirectory("graft-audit-mor").toString)
    val df = Seq((1, "A", 10), (2, "A", 20), (3, "B", 30), (4, "C", 40))
      .toDF("id", "grp", "v")
    val tbl = graft.table.LakehouseTable.create(cat, spark, "ns", "am", df.schema)
    tbl.append(df)
    tbl.deleteEq("grp", Seq("A"))
    tbl.mergeDelta(Seq("id"), Seq((5, "A", 50)).toDF("id", "grp", "v"))
    tbl.deleteMor($"id" === 4)
    val dest = Files.createTempDirectory("graft-audit-mor-ice")
    graft.interop.IcebergExport.export(tbl, dest)
    val imp = graft.interop.IcebergImport.register(
      cat, spark, dest, "ns", "am_rt")
    val plan = physical(imp.table.scan())
    // two equality-delete KEY SETS (grp, id) + one position vector:
    // eq subtraction folds each key set into ONE broadcast outer join
    // against a key→max-delete-position map (round 17 — O(key sets)
    // joins at any outstanding-delete depth), the vector stays a
    // broadcast anti-join; the data side never shuffles, which is what
    // survives at 100 TB
    val anti = "BroadcastHashJoin .*LeftAnti".r.findAllIn(plan).length
    assert(anti >= 1, s"expected >=1 broadcast anti-join (position " +
      s"vector), got $anti in:\n" + plan.take(2000))
    val outer = "BroadcastHashJoin .*LeftOuter".r.findAllIn(plan).length
    assert(outer >= 2, s"expected >=2 broadcast outer joins (one per " +
      s"eq key set), got $outer in:\n" + plan.take(2000))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("SortMergeJoin"),
      "delete subtraction must never sort-merge (would shuffle the data side)")
    // and the result is the net content: grp=A rows 1,2 eq-deleted,
    // id=4 position-deleted, the merge's own id=5 (grp=A, listed after
    // its delete) survives
    assert(imp.table.scan().select("id").collect()
      .map(_.getInt(0)).sorted.toSeq == Seq(3, 5), "net rows wrong")
  }

  test("refreshed-mirror scan keeps the broadcast anti-join shape (per-snapshot replay)") {
    import java.nio.file.Files
    import spark.implicits._
    val cat = new graft.catalog.Snaplog(
      Files.createTempDirectory("graft-audit-refresh").toString)
    val df = Seq((1, "A", 10), (2, "A", 20), (3, "B", 30), (4, "C", 40))
      .toDF("id", "grp", "v")
    val tbl = graft.table.LakehouseTable.create(cat, spark, "ns", "ar", df.schema)
    tbl.append(df)
    val dest = Files.createTempDirectory("graft-audit-refresh-ice")
    graft.interop.IcebergExport.export(tbl, dest)
    graft.interop.IcebergImport.register(cat, spark, dest, "ns", "ar_rt")
    // the SOURCE advances with delete-bearing commits; the refreshed
    // mirror must plan the same subtraction shape register produces
    tbl.deleteEq("grp", Seq("A"))
    tbl.deleteMor($"id" === 4)
    graft.interop.IcebergExport.export(tbl, dest)
    val r = graft.interop.IcebergImport.refresh(
      cat, spark, "ns", "ar_rt", perSnapshot = true)
    assert(r.commits == 2 && !r.reset, r.toString)
    val plan = physical(r.table.scan())
    // eq delete → one broadcast outer join (key→max-position map),
    // position vector → broadcast anti-join; data side unshuffled
    val anti = "BroadcastHashJoin .*LeftAnti".r.findAllIn(plan).length
    assert(anti >= 1, s"expected >=1 broadcast anti-join (position " +
      s"vector), got $anti in:\n" + plan.take(2000))
    val outer = "BroadcastHashJoin .*LeftOuter".r.findAllIn(plan).length
    assert(outer >= 1, s"expected >=1 broadcast outer join (eq key " +
      s"set), got $outer in:\n" + plan.take(2000))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("SortMergeJoin"),
      "refreshed delete subtraction must never shuffle the data side")
    assert(r.table.scan().select("id").collect()
      .map(_.getInt(0)).sorted.toSeq == Seq(3), "net rows wrong")
  }

  test("lake_analyze_stats gate: planner sees exact rows and NDV") {
    val rows = q("lake_analyze_stats").collect()
    assert(rows.length == 2)
    // the in-gate plan probes passed: Spark's relation stats carried
    // the log-exact row count and the ANALYZE NDV
    assert(rows.forall(_.getBoolean(2)), "plan_exact_rows flag false")
    assert(rows.forall(_.getBoolean(3)), "plan_ndv flag false")
    // NDV exact below sketch capacity: matches COUNT(DISTINCT)
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    val expect = Map(
      "c_mktsegment" -> cust.select("c_mktsegment").distinct().count(),
      "c_nationkey" -> cust.select("c_nationkey").distinct().count())
    rows.foreach(r => assert(r.getLong(1) == expect(r.getString(0)),
      s"${r.getString(0)} NDV ${r.getLong(1)} != ${expect(r.getString(0))}"))
  }

  test("lake_iceberg_stats gate: adopted NDV matches COUNT(DISTINCT)") {
    val rows = q("lake_iceberg_stats").collect()
    assert(rows.length == 2)
    val part = spark.read.parquet(s"$sf/part.parquet")
    val expect = Map(
      "p_brand" -> part.select("p_brand").distinct().count(),
      "p_size" -> part.select("p_size").distinct().count())
    rows.foreach(r => assert(r.getLong(1) == expect(r.getString(0)),
      s"${r.getString(0)} NDV ${r.getLong(1)} != ${expect(r.getString(0))}"))
  }

  test("scanLineage plans scale-shaped: broadcast file-map join, no cartesian, one data scan") {
    // the lineage read = data scan + ONE broadcast join against the
    // file-count-sized (first_row_id, seq) map — never a shuffle of
    // the data side, never a cartesian; the 100 TB contract
    import java.nio.file.Files
    import graft.catalog.Snaplog
    import graft.table.LakehouseTable
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-lin-plan").toString
    val cat = new Snaplog(wh)
    val tbl = LakehouseTable.create(cat, spark, "ns", "lp",
      Seq((1, "a")).toDF("id", "s").schema,
      properties = Map(Snaplog.RowLineageProp -> "true"))
    tbl.append((1 to 100).map(i => (i, s"v$i")).toDF("id", "s"))
    tbl.append((101 to 200).map(i => (i, s"v$i")).toDF("id", "s"))
    val plan = physical(tbl.scanLineage())
    assert(plan.contains("BroadcastHashJoin"),
      s"the file-map join must broadcast:\n${plan.take(800)}")
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"),
      "the metadata-sized map must never shuffle the data side")
    // after a materializing compaction the plan is even simpler — the
    // ids come from the files; still no cartesian/shuffle
    tbl.compact()
    val plan2 = physical(tbl.scanLineage())
    assert(!plan2.contains("CartesianProduct") &&
      !plan2.contains("SortMergeJoin"), plan2.take(800))
  }

  test("lineage changelog and row-id pairing keep the scale plan shapes") {
    // scanChangesLineage = the changelog's own legs plus the same
    // broadcast file-map stamp the lineage scan uses; the row-id
    // pairing adds ONE change-set-sized join. Neither may plan a
    // cartesian or shuffle the data side of the id stamp.
    import java.nio.file.Files
    import graft.catalog.Snaplog
    import graft.table.LakehouseTable
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-lincl-plan").toString
    val cat = new Snaplog(wh)
    val tbl = LakehouseTable.create(cat, spark, "ns", "lcp",
      Seq((1, "a")).toDF("id", "s").schema,
      properties = Map(Snaplog.RowLineageProp -> "true"))
    tbl.append((1 to 100).map(i => (i, s"v$i")).toDF("id", "s"))
    graft.pipeline.Upsert.upsertTable(tbl,
      (1 to 10).map(i => (i * 7, s"u$i")).toDF("id", "s"), Seq("id"))
    val plan = physical(tbl.scanChangesLineage(0L))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    val paired = physical(tbl.scanChangesKeyedByRowId(0L))
    assert(!paired.contains("CartesianProduct"), paired.take(800))
    assert(plan.contains("BroadcastHashJoin"),
      s"the lineage stamp must broadcast the file map:\n${plan.take(800)}")
  }
}
