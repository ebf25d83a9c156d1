package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.Snaplog
import graft.sql.{GraftSqlCatalog, GraftStreamableParquetScan}
import graft.table.LakehouseTable

/** Runtime file pruning (the DSv2 dynamic-partition-pruning analogue,
  * Iceberg's SparkScan runtime filtering): at execution Spark hands the
  * batch read scan the EXACT join-key value set of the dim side, and
  * partition-provably-miss files drop before tasks launch. */
class RuntimePruneSpec extends SparkSpec {
  import spark.implicits._

  private def pruned(key: String): Option[(Int, Int)] =
    Option(GraftStreamableParquetScan.pruneLog.get(key))

  private def facts(n: Int) =
    (1 to n).map(i => (i.toLong, s"g${i % 8}", i * 10)).toDF("id", "grp", "x")

  private def setup(name: String, partition: Seq[String]): String = {
    val wh = Files.createTempDirectory(s"graft-rp-$name").toString
    val cat = new Snaplog(wh)
    val t = LakehouseTable.create(cat, spark, "ns", name,
      facts(1).schema, partition)
    t.append(facts(400))
    val cn = s"grp_$name"
    spark.conf.set(s"spark.sql.catalog.$cn", classOf[GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cn.warehouse", wh)
    cn
  }

  // the dim side needs a SELECTIVE predicate surviving optimization for
  // Spark to plan DPP — a local relation's filter constant-folds away
  // (ConvertToLocalRelation), so dims are parquet-backed like real ones
  private def fileDim(name: String,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val dir = Files.createTempDirectory(s"graft-rp-dim-$name").toString
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def dimKeep(name: String, rows: (String, String)*)
      : org.apache.spark.sql.DataFrame =
    fileDim(name, rows.toDF("grp", "tag")).filter($"tag" === "keep")

  test("identity partitions prune at runtime from a dim-filtered join") {
    val cn = setup("ident", Seq("grp"))
    GraftStreamableParquetScan.pruneLog.remove("ns.ident")
    val dim = dimKeep("ident", ("g1", "keep"), ("g3", "keep"), ("g5", "drop"))
    val j = spark.table(s"$cn.ns.ident").join(dim, "grp")
    val rows = j.collect()
    assert(rows.length == 100) // 400 rows, 2 of 8 groups survive
    val (total, kept) = pruned("ns.ident").getOrElse(
      fail("runtime filter never reached the scan — DPP not planned"))
    assert(kept < total, s"no files pruned: $kept/$total")
  }

  test("bucket partitions prune at runtime through the writer's transform") {
    val cn = setup("bkt", Seq("bucket(4,id)"))
    GraftStreamableParquetScan.pruneLog.remove("ns.bkt")
    val dim = fileDim("bkt", Seq((7L, "keep"), (11L, "keep"), (2L, "drop"))
      .toDF("id", "tag")).filter($"tag" === "keep")
    val j = spark.table(s"$cn.ns.bkt").join(dim, "id")
    assert(j.collect().map(_.getAs[Long]("id")).sorted.toSeq == Seq(7L, 11L))
    pruned("ns.bkt") match {
      case Some((total, kept)) =>
        // 7 and 11 may land in the same or different buckets of 4 —
        // at least the complement buckets must drop
        assert(kept < total, s"no files pruned: $kept/$total")
      case None => fail("runtime filter never reached the scan")
    }
  }

  test("mbucket partitions prune at runtime through the spec murmur3 transform") {
    // MBucketField.ofCatalyst evaluates the same IcebergBucketExpr the
    // write path records, so runtime IN values from the dim side drop
    // non-matching murmur3 buckets before tasks launch
    val cn = setup("mbkt", Seq("mbucket(4,id)"))
    GraftStreamableParquetScan.pruneLog.remove("ns.mbkt")
    val dim = fileDim("mbkt", Seq((7L, "keep"), (11L, "keep"), (2L, "drop"))
      .toDF("id", "tag")).filter($"tag" === "keep")
    val j = spark.table(s"$cn.ns.mbkt").join(dim, "id")
    assert(j.collect().map(_.getAs[Long]("id")).sorted.toSeq == Seq(7L, 11L))
    pruned("ns.mbkt") match {
      case Some((total, kept)) =>
        assert(kept < total, s"no files pruned: $kept/$total")
      case None => fail("runtime filter never reached the scan")
    }
  }

  test("days-transform partitions prune at runtime on the timestamp key") {
    // the runtime IN values are catalyst micros; mayMatch re-runs the
    // writer's epoch-day arithmetic on each literal, so a days(ts)
    // table prunes to the dim's days — the as-of/event-lookup shape
    val wh = Files.createTempDirectory("graft-rp-days").toString
    val cat = new Snaplog(wh)
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    val rows = (0 until 200).map { i =>
      (new java.sql.Timestamp(base.getTime + i.toLong * 3600 * 1000), i)
    }.toDF("ts", "x") // ~8.3 days of hourly rows
    val t = LakehouseTable.create(cat, spark, "ns", "days", rows.schema,
      Seq("days(ts)"))
    t.append(rows)
    spark.conf.set("spark.sql.catalog.grp_days", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.grp_days.warehouse", wh)
    GraftStreamableParquetScan.pruneLog.remove("ns.days")
    val dim = fileDim("days", Seq(
      (java.sql.Timestamp.valueOf("2024-03-02 05:00:00"), "keep"),
      (java.sql.Timestamp.valueOf("2024-03-04 07:00:00"), "keep"),
      (java.sql.Timestamp.valueOf("2024-03-08 01:00:00"), "drop"))
      .toDF("ts", "tag")).filter($"tag" === "keep")
    val j = spark.table("grp_days.ns.days").join(dim, "ts")
    assert(j.collect().map(_.getAs[Int]("x")).sorted.toSeq == Seq(29, 79))
    val (total, kept) = pruned("ns.days").getOrElse(
      fail("runtime filter never reached the scan"))
    assert(kept < total, s"no files pruned: $kept/$total")
  }

  test("truncate-transform partitions prune at runtime on the source key") {
    val cn = setup("trunc", Seq("truncate(100,id)"))
    GraftStreamableParquetScan.pruneLog.remove("ns.trunc")
    val dim = fileDim("trunc", Seq((7L, "keep"), (350L, "keep"), (50L, "drop"))
      .toDF("id", "tag")).filter($"tag" === "keep")
    val j = spark.table(s"$cn.ns.trunc").join(dim, "id")
    assert(j.collect().map(_.getAs[Long]("id")).sorted.toSeq == Seq(7L, 350L))
    val (total, kept) = pruned("ns.trunc").getOrElse(
      fail("runtime filter never reached the scan"))
    // candidates land in truncate buckets 0 and 300 — the other width-100
    // ranges of 1..400 must drop
    assert(kept < total, s"no files pruned: $kept/$total")
  }

  test("runtime pruning composes with an active SPJ report") {
    // both join sides identity-partitioned and SPJ-enabled; the runtime
    // filter from the dim side may empty key groups — Spark pads
    // missing partition values with empty partitions, results exact
    val cn = setup("spjmix", Seq("grp"))
    val wh2 = Files.createTempDirectory("graft-rp-spjmix2").toString
    val cat2 = new Snaplog(wh2)
    val t2 = LakehouseTable.create(cat2, spark, "ns", "spjmix2",
      facts(1).schema, Seq("grp"))
    t2.append(facts(80))
    spark.conf.set("spark.sql.catalog.grp_mix2", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.grp_mix2.warehouse", wh2)
    val k = "spark.sql.sources.v2.bucketing.enabled"
    val saved = spark.conf.getOption(k)
    spark.conf.set(k, "true")
    try {
      val dim = dimKeep("spjmix", ("g2", "keep"), ("g7", "drop"))
      val j = spark.table(s"$cn.ns.spjmix")
        .join(spark.table("grp_mix2.ns.spjmix2"), "grp")
        .join(dim, "grp")
      assert(j.count() == 50L * 10L) // g2: 50 rows left side, 10 right
    } finally saved match {
      case Some(v) => spark.conf.set(k, v)
      case None => spark.conf.unset(k)
    }
  }

  test("a non-partition join key never prunes (conservative keep-all)") {
    val cn = setup("nokey", Seq("grp"))
    GraftStreamableParquetScan.pruneLog.remove("ns.nokey")
    val dim = fileDim("nokey", Seq((5L, "keep"), (9L, "drop")).toDF("id", "tag"))
      .filter($"tag" === "keep")
    val j = spark.table(s"$cn.ns.nokey").join(dim, "id")
    assert(j.count() == 1)
    // either DPP was never planned (id is not a filter attribute) or
    // the filter kept everything — wrong in both directions otherwise
    pruned("ns.nokey").foreach { case (total, kept) =>
      assert(kept == total, s"pruned on a non-partition key: $kept/$total")
    }
  }
}
