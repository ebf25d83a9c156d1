package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions.{col, concat, lit}

import graft.catalog.Snaplog
import graft.interop.{IcebergExport, IcebergImport, Puffin}
import graft.sql.GraftSqlCatalog
import graft.table.{LakehouseTable, TableStats}

/** The ANALYZE statistics tier: theta-sketch NDV collection, the
  * scan-side planner report (exact rowCount + column stats), vacuum
  * retention of the stats file, and the Iceberg statistics-file
  * export/import round trip. */
class TableStatsSpec extends SparkSpec {
  import spark.implicits._

  private def fixture() = Seq(
    (1L, "A", "x", java.sql.Date.valueOf("2024-01-01")),
    (2L, "A", "y", java.sql.Date.valueOf("2024-01-02")),
    (3L, "B", "x", java.sql.Date.valueOf("2024-01-03")),
    (4L, "B", "y", java.sql.Date.valueOf("2024-01-04")),
    (5L, "C", "x", java.sql.Date.valueOf("2024-01-05"))
  ).toDF("id", "grp", "tag", "d")

  test("analyze: exact NDV below sketch capacity, summary persisted") {
    val wh = Files.createTempDirectory("graft-stats").toString
    val cat = new Snaplog(wh)
    val tbl = LakehouseTable.create(cat, spark, "ns", "t", fixture().schema)
    tbl.append(fixture())
    val summary = tbl.analyze()
    assert(summary("id").ndv == 5)
    assert(summary("grp").ndv == 3)
    assert(summary("tag").ndv == 2)
    assert(summary("d").ndv == 5)
    // string lengths tracked in bytes
    assert(summary("grp").avgLen.contains(1L))
    assert(summary("grp").maxLen.contains(1L))
    // persisted: properties round-trip through the codec
    val props = cat.loadTable("ns", "t").properties
    assert(props(TableStats.SnapshotProp) == tbl.currentSnapshotId.toString)
    val decoded = TableStats.fromProperties(props)
    assert(decoded == summary)
    // the puffin file exists and carries one theta blob per column,
    // ndv as a property — and the sketch bytes THEMSELVES estimate to
    // the same value (a property-less reader recovers it)
    val statsPath = Paths.get(props(TableStats.PathProp))
    assert(Files.isRegularFile(statsPath))
    val blobs = Puffin.readFooter(statsPath)
    assert(blobs.size == 4 && blobs.forall(_.tpe == Puffin.ThetaV1))
    blobs.foreach { b =>
      val est = TableStats.estimate(
        Puffin.readBlobBytes(statsPath, b.offset, b.length))
      assert(b.properties("ndv").toLong == est)
    }
    // blob field-ids are the registry ids (1..4 for a fresh table)
    assert(blobs.flatMap(_.fields).sorted == Seq(1, 2, 3, 4))
  }

  test("analyze: MOR-subtracted content, column selection, refusals") {
    val wh = Files.createTempDirectory("graft-stats2").toString
    val cat = new Snaplog(wh)
    val tbl = LakehouseTable.create(cat, spark, "ns", "t", fixture().schema)
    tbl.append(fixture())
    tbl.deleteMor(col("grp") === "C")
    // NDV sees the NET content: grp C is deleted
    val summary = tbl.analyze(Seq("grp", "id"))
    assert(summary("grp").ndv == 2)
    assert(summary("id").ndv == 4)
    assert(summary.keySet == Set("grp", "id"))
    intercept[IllegalArgumentException](tbl.analyze(Seq("nope")))
    val empty = LakehouseTable.create(cat, spark, "ns", "e", fixture().schema)
    intercept[IllegalStateException](empty.analyze())
  }

  test("vacuum keeps the current stats file, collects superseded ones") {
    val wh = Files.createTempDirectory("graft-stats3").toString
    val cat = new Snaplog(wh)
    val tbl = LakehouseTable.create(cat, spark, "ns", "t", fixture().schema)
    tbl.append(fixture())
    tbl.analyze(Seq("grp"))
    val first = Paths.get(cat.loadTable("ns", "t").properties(TableStats.PathProp))
    tbl.analyze(Seq("grp", "tag"))
    val second = Paths.get(cat.loadTable("ns", "t").properties(TableStats.PathProp))
    assert(first != second)
    cat.vacuum("ns", "t", graceMs = 0L)
    assert(!Files.exists(first), "superseded stats file should be collected")
    assert(Files.exists(second), "current stats file must survive vacuum")
  }

  test("SQL scan reports exact rowCount, NDV, bounds and null counts") {
    val wh = Files.createTempDirectory("graft-stats4").toString
    val cat = new Snaplog(wh)
    val tbl = LakehouseTable.create(cat, spark, "ns", "t", fixture().schema,
      Seq("grp"))
    tbl.append(fixture())
    tbl.analyze()
    spark.conf.set("spark.sql.catalog.gstats", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gstats.warehouse", wh)
    def relStats(sql: String) = {
      val rel = spark.sql(sql).queryExecution.optimizedPlan.collectFirst {
        case r: DataSourceV2ScanRelation => r
      }.getOrElse(fail(s"no V2 scan relation in: $sql"))
      rel.stats
    }
    val st = relStats("SELECT id, grp, d FROM gstats.ns.t")
    assert(st.rowCount.contains(BigInt(5)), s"rowCount ${st.rowCount}")
    assert(st.sizeInBytes > 0)
    val byName = st.attributeStats.toSeq.map { case (a, cs) => a.name -> cs }.toMap
    assert(byName("id").distinctCount.contains(BigInt(5)))
    assert(byName("grp").distinctCount.contains(BigInt(3)))
    assert(byName("id").nullCount.contains(BigInt(0)))
    // long bounds surface as catalyst values
    assert(byName("id").min.contains(1L) && byName("id").max.contains(5L))
    // date bounds are epoch-day ints internally
    assert(byName("d").min.contains(19723) && byName("d").max.contains(19727))
    // PRUNED scan reports the pruned magnitude, not the table's
    val pruned = relStats("SELECT id FROM gstats.ns.t WHERE grp = 'A'")
    assert(pruned.rowCount.contains(BigInt(2)), s"pruned ${pruned.rowCount}")
  }

  test("statistics export/import: the puffin round-trips as NDV") {
    val wh = Files.createTempDirectory("graft-stats5").toString
    val cat = new Snaplog(wh)
    val tbl = LakehouseTable.create(cat, spark, "ns", "src", fixture().schema)
    tbl.append(fixture())
    tbl.analyze(Seq("id", "grp"))
    val out = Files.createTempDirectory("graft-stats5-ice")
    IcebergExport.export(tbl, out)
    // exported metadata declares the statistics file; stats properties
    // (warehouse-local path) never leak into exported properties
    val metaDir = out.resolve("metadata")
    val metaFile = graft.util.Fs.walkList(metaDir)
      .filter(_.getFileName.toString.endsWith(".metadata.json"))
      .maxBy(_.getFileName.toString)
    val metaTxt = Files.readString(metaFile)
    assert(metaTxt.contains("\"statistics\""))
    assert(metaTxt.contains("apache-datasketches-theta-v1"))
    assert(!metaTxt.contains(TableStats.PathProp))
    // a fresh import adopts the NDV tier
    val cat2 = new Snaplog(Files.createTempDirectory("graft-stats5-wh2").toString)
    IcebergImport.register(cat2, spark, out, "ns", "dst")
    val adopted = TableStats.fromProperties(cat2.loadTable("ns", "dst").properties)
    assert(adopted("id").ndv == 5)
    assert(adopted("grp").ndv == 3)
    // and the adopted table's SQL scan reports it to the planner
    spark.conf.set("spark.sql.catalog.gstats2", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gstats2.warehouse", cat2.warehouse)
    val rel = spark.sql("SELECT grp FROM gstats2.ns.dst").queryExecution
      .optimizedPlan.collectFirst { case r: DataSourceV2ScanRelation => r }.get
    val ndv = rel.stats.attributeStats.toSeq
      .collectFirst { case (a, cs) if a.name == "grp" => cs.distinctCount }.flatten
    assert(ndv.contains(BigInt(3)))
  }

  test("CBO consumes the reported stats: filter selectivity shrinks estimates") {
    val wh = Files.createTempDirectory("graft-stats-cbo").toString
    val cat = new Snaplog(wh)
    val tbl = LakehouseTable.create(cat, spark, "ns", "t", fixture().schema)
    tbl.append(fixture())
    tbl.analyze()
    spark.conf.set("spark.sql.catalog.gcbo", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcbo.warehouse", wh)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      // range estimation from the reported min/max/NDV: id <= 2 over
      // ids 1..5 must estimate well below the full 5 rows — the
      // estimate CBO prices join sides with at 100 TB
      val st = spark.sql("SELECT * FROM gcbo.ns.t WHERE id <= 2")
        .queryExecution.optimizedPlan.stats
      assert(st.rowCount.isDefined, "CBO lost the row count through Filter")
      assert(st.rowCount.get >= BigInt(1) && st.rowCount.get <= BigInt(3),
        s"expected a selectivity-shrunk estimate, got ${st.rowCount}")
    } finally spark.conf.unset("spark.sql.cbo.enabled")
  }

  test("histograms: equi-height bins price skewed ranges, round-trip, SQL CALL") {
    val wh = Files.createTempDirectory("graft-stats-hist").toString
    val cat = new Snaplog(wh)
    // skewed: 90 rows in [0,9], 10 rows at 100..1000 — a uniform
    // [min,max] spread would price x >= 100 at ~90% of rows
    val df = (0 until 100).map { i =>
      if (i < 90) (i.toLong, (i % 10).toLong)
      else (i.toLong, ((i - 89) * 100).toLong)
    }.toDF("id", "x")
    val tbl = LakehouseTable.create(cat, spark, "ns", "t", df.schema)
    tbl.append(df)
    val summary = tbl.analyze(Seq("x"), histogramColumns = Seq("x"),
      numBins = 10)
    val hist = summary("x").hist.getOrElse(fail("no histogram computed"))
    assert(hist.size == 10)
    assert(hist.head.lo == 0.0 && hist.last.hi == 1000.0)
    // persists: the decoded property summary carries the same bins
    val decoded = TableStats.fromProperties(cat.loadTable("ns", "t").properties)
    assert(decoded("x").hist.contains(hist))
    // CBO range estimation follows the DISTRIBUTION, not the spread
    spark.conf.set("spark.sql.catalog.ghist", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.ghist.warehouse", wh)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val st = spark.sql("SELECT * FROM ghist.ns.t WHERE x >= 100")
        .queryExecution.optimizedPlan.stats
      assert(st.rowCount.isDefined)
      assert(st.rowCount.get <= BigInt(40),
        s"histogram should price the skewed tail well under the uniform " +
          s"~90-row estimate, got ${st.rowCount}")
    } finally spark.conf.unset("spark.sql.cbo.enabled")
    // the SQL procedure takes histogram_columns
    val out = spark.sql(
      "CALL ghist.system.analyze_table('ns', 't', 'id,x', 'x', false)").head()
    assert(out.getInt(1) == 2)
    assert(TableStats.fromProperties(cat.loadTable("ns", "t").properties)
      .get("x").exists(_.hist.exists(_.size == 64)))
    // refusals: unknown column, unordered type, not-analyzed column
    intercept[IllegalArgumentException](
      tbl.analyze(Seq("x"), histogramColumns = Seq("ghost")))
    intercept[IllegalArgumentException](
      tbl.analyze(Seq("id"), histogramColumns = Seq("x")))
    // a PRUNED scan does NOT report the table-wide histogram: the bin
    // boundaries describe the whole table's distribution, not the kept
    // partitions' — CBO range estimates over pruned scans would
    // misprice. NDV (capped at the pruned row count) still reports.
    import scala.jdk.CollectionConverters._
    val pdf = (0 until 100).map(i => (i.toLong, if (i < 90) "A" else "B",
      (if (i < 90) i % 10 else (i - 89) * 100).toLong)).toDF("id", "p", "x")
    val pt = LakehouseTable.create(cat, spark, "ns", "tp", pdf.schema, Seq("p"))
    pt.append(pdf)
    pt.analyze(Seq("x"), histogramColumns = Seq("x"), numBins = 10)
    def xStats(sql: String) = spark.sql(sql).queryExecution.optimizedPlan
      .collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
      }.get.scan
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics().columnStats().asScala
      .collectFirst { case (k, v) if k.describe == "x" => v }.get
    assert(xStats("SELECT * FROM ghist.ns.tp").histogram.isPresent,
      "unpruned scan reports the histogram")
    val pruned = xStats("SELECT * FROM ghist.ns.tp WHERE p = 'A'")
    assert(!pruned.histogram.isPresent,
      "partition-pruned scan must not report the table-wide histogram")
    assert(pruned.distinctCount.isPresent,
      "NDV still reports on the pruned scan")
  }

  test("reported sizes pick the broadcast side at plan time (no hint, no AQE)") {
    val wh = Files.createTempDirectory("graft-stats-bcast").toString
    val cat = new Snaplog(wh)
    // small dim: 5 rows; big fact: 5000 rows — the threshold sits
    // between the two REPORTED sizes (rows × row-width), so the
    // planner's choice proves the scan statistics, not a default
    val dim = fixture()
    val fact = spark.range(5000).selectExpr("id AS fk",
      "CAST(id % 5 + 1 AS BIGINT) AS did", "id * 2 AS v")
    LakehouseTable.create(cat, spark, "ns", "dim", dim.schema).append(dim)
    LakehouseTable.create(cat, spark, "ns", "fact", fact.schema).append(fact)
    spark.conf.set("spark.sql.catalog.gbc", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gbc.warehouse", wh)
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set(keys(0), "4096") // dim ~45B*5, fact ~24B*5000
    spark.conf.set(keys(1), "false")
    try {
      val plan = spark.sql(
        """SELECT f.fk, d.grp FROM gbc.ns.fact f
           JOIN gbc.ns.dim d ON f.did = d.id""")
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"dim under threshold must broadcast at PLAN time:\n${plan.take(1500)}")
      // and the broadcast side is the dim (the build side exchange
      // wraps the dim scan, not the fact scan)
      val bcastIdx = plan.indexOf("BroadcastExchange")
      assert(bcastIdx >= 0 && plan.indexOf("dim", bcastIdx) >= 0)
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("ANALYZE avgLen corrects the reported row width for wide strings") {
    val wh = Files.createTempDirectory("graft-stats-width").toString
    val cat = new Snaplog(wh)
    // 500 rows of ~1 KB strings: defaultSize prices the table at
    // 500 × 28 B ≈ 14 KB (under a 100 KB threshold → spurious
    // broadcast of a ~0.5 MB build side); the ANALYZE avgLen prices it
    // at 500 × ~1032 B ≈ 516 KB → over threshold
    val wide = spark.range(500).selectExpr("id", "repeat('x', 1024) AS s")
    val fact = spark.range(50000).selectExpr("id AS fk", "id % 500 AS did")
    val wtbl = LakehouseTable.create(cat, spark, "ns", "wide", wide.schema)
    wtbl.append(wide)
    LakehouseTable.create(cat, spark, "ns", "fact", fact.schema).append(fact)
    spark.conf.set("spark.sql.catalog.gsw", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsw.warehouse", wh)
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set(keys(0), "102400")
    spark.conf.set(keys(1), "false")
    val q = """SELECT f.fk, w.s FROM gsw.ns.fact f
               JOIN gsw.ns.wide w ON f.did = w.id"""
    try {
      // without stats the constant-width guess under-prices → broadcast
      assert(spark.sql(q).queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "precondition: defaultSize width must under-price the wide table")
      // ANALYZE folds the real string width into the reported size
      wtbl.analyze(Seq("id", "s"))
      val after = spark.sql(q).queryExecution.executedPlan.toString
      assert(!after.contains("BroadcastHashJoin") &&
        after.contains("SortMergeJoin"),
        s"avgLen-corrected size must exceed the threshold:\n${after.take(1500)}")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("incremental analyze: delta-only sketch union, guards, no-op") {
    val wh = Files.createTempDirectory("graft-stats-inc").toString
    val cat = new Snaplog(wh)
    val tbl = LakehouseTable.create(cat, spark, "ns", "t", fixture().schema)
    tbl.append(fixture())
    tbl.analyze(Seq("id", "grp", "tag"))
    // append a disjoint era, then increment: NDV lands exactly where a
    // full analyze would (exact below sketch capacity)
    tbl.append(fixture().withColumn("id", $"id" + 10)
      .withColumn("grp", concat($"grp", lit("2"))))
    val inc = tbl.analyzeIncremental()
    assert(inc("id").ndv == 10)
    assert(inc("grp").ndv == 6) // A,B,C + A2,B2,C2
    assert(inc("tag").ndv == 2) // overlap dedups through the union
    assert(inc("grp").nn.contains(10L))
    // the DELTA pass read only the second era's files
    val deltaFiles = tbl.scanIncremental(1L).inputFiles
    assert(deltaFiles.nonEmpty && deltaFiles.forall(_.contains("snap-2")),
      deltaFiles.mkString(","))
    // watermark advanced; an immediate re-run is a no-op
    val props = cat.loadTable("ns", "t").properties
    assert(props(TableStats.SnapshotProp) == "2")
    assert(tbl.analyzeIncremental() == inc)
    // vacuum collects the superseded full-analyze puffin
    cat.vacuum("ns", "t", graceMs = 0L)
    assert(Files.isRegularFile(java.nio.file.Paths.get(
      cat.loadTable("ns", "t").properties(TableStats.PathProp))))
    // a delete in the window refuses (sketches cannot subtract)…
    tbl.deleteMor($"id" === 3)
    val e = intercept[IllegalArgumentException](tbl.analyzeIncremental())
    assert(e.getMessage.contains("full analyze()"))
    // …and a full analyze over the MOR-subtracted content recovers
    val full = tbl.analyze(Seq("id"))
    assert(full("id").ndv == 9)
    // after that, incremental works again over pure appends — and old
    // outstanding deletes stay sound (they precede the new files)
    tbl.append(fixture().withColumn("id", $"id" + 20))
    assert(tbl.analyzeIncremental()("id").ndv == 14)
    // SQL: the incremental flag continues the stored column set
    spark.conf.set("spark.sql.catalog.ginc", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.ginc.warehouse", wh)
    tbl.append(fixture().withColumn("id", $"id" + 30))
    val out = spark.sql(
      "CALL ginc.system.analyze_table('ns', 't', '', '', true)").head()
    assert(out.getLong(0) == tbl.currentSnapshotId)
    assert(TableStats.fromProperties(cat.loadTable("ns", "t").properties)
      .apply("id").ndv == 19)
  }

  test("import adopts nearest-ANCESTOR statistics when the source kept appending") {
    val wh = Files.createTempDirectory("graft-stats-anc").toString
    val cat = new Snaplog(wh)
    val src = LakehouseTable.create(cat, spark, "ns", "src", fixture().schema)
    src.append(fixture())
    src.analyze(Seq("grp")) // stats pin snapshot 1
    src.append(fixture().withColumn("id", $"id" + 10)) // source lives on
    val out = Files.createTempDirectory("graft-stats-anc-ice")
    IcebergExport.export(src, out)
    val cat2 = new Snaplog(Files.createTempDirectory("graft-stats-anc2").toString)
    IcebergImport.register(cat2, spark, out, "ns", "dst")
    // the statistics entry names snapshot 1, not the imported current —
    // the ancestor walk still adopts it (ANALYZE-stale semantics)
    val adopted = TableStats.fromProperties(cat2.loadTable("ns", "dst").properties)
    assert(adopted("grp").ndv == 3)
    // ...but the adoption is PROVENANCE-MARKED: the imported content
    // holds rows the foreign ANALYZE never sketched, so incremental
    // analyze must refuse (a sketch union from this watermark would
    // leave the gap rows permanently uncounted) until a full pass
    assert(cat2.loadTable("ns", "dst").properties
      .contains(TableStats.AdoptedAncestorProp))
    val dst = LakehouseTable.load(cat2, spark, "ns", "dst")
    val e = intercept[IllegalStateException](dst.analyzeIncremental())
    assert(e.getMessage.contains("full analyze"), e.getMessage)
    // a full analyze closes the gap and clears the marker
    val full = dst.analyze(Seq("grp"))
    assert(full("grp").ndv == 3)
    assert(!cat2.loadTable("ns", "dst").properties
      .contains(TableStats.AdoptedAncestorProp))
    dst.append(fixture().withColumn("id", $"id" + 100))
    assert(dst.analyzeIncremental()("grp").ndv == 3) // increments again
  }

  test("CALL analyze_table(incremental) DEGRADES to a full pass on ancestor-adopted stats") {
    // round 16 (VERDICT r15 #6): operators script the incremental CALL;
    // where the native analyzeIncremental refuses on the adoption
    // marker (gap rows never sketched), the procedure runs the full
    // pass instead — which clears the marker — rather than erroring
    // the pipeline. The native API stays strict (tested above).
    val wh = Files.createTempDirectory("graft-stats-deg").toString
    val cat = new Snaplog(wh)
    val src = LakehouseTable.create(cat, spark, "ns", "dsrc", fixture().schema)
    src.append(fixture())
    src.analyze(Seq("grp"))
    src.append(fixture().withColumn("id", $"id" + 10))
    val out = Files.createTempDirectory("graft-stats-deg-ice")
    IcebergExport.export(src, out)
    val wh2 = Files.createTempDirectory("graft-stats-deg2").toString
    val cat2 = new Snaplog(wh2)
    IcebergImport.register(cat2, spark, out, "ns", "ddst")
    assert(cat2.loadTable("ns", "ddst").properties
      .contains(TableStats.AdoptedAncestorProp))
    spark.conf.set("spark.sql.catalog.gdeg",
      classOf[graft.sql.GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdeg.warehouse", wh2)
    val outRow = spark.sql(
      "CALL gdeg.system.analyze_table('ns', 'ddst', '', '', true)").head()
    assert(outRow.getInt(1) >= 1, outRow.toString) // columns analyzed
    // the degrade ran the FULL pass: marker cleared, stats cover the
    // whole imported content (8 ids, 3 groups)
    val props = cat2.loadTable("ns", "ddst").properties
    assert(!props.contains(TableStats.AdoptedAncestorProp))
    assert(TableStats.fromProperties(props)("id").ndv >= 7)
    // and the NEXT incremental call is a genuine increment again
    val dst = LakehouseTable.load(cat2, spark, "ns", "ddst")
    dst.append(fixture().withColumn("id", $"id" + 100))
    val out2 = spark.sql(
      "CALL gdeg.system.analyze_table('ns', 'ddst', '', '', true)").head()
    assert(out2.getLong(0) == dst.currentSnapshotId)
    assert(TableStats.fromProperties(cat2.loadTable("ns", "ddst")
      .properties)("id").ndv >= 11)
  }

  test("stats tier runs unchanged on the JDBC catalog backend") {
    val dir = Files.createTempDirectory("graft-stats-jdbc").toString
    val cat = new graft.catalog.JdbcCatalog(
      s"jdbc:derby:$dir/cat;create=true", s"$dir/wh")
    val tbl = LakehouseTable.create(cat, spark, "ns", "t", fixture().schema)
    tbl.append(fixture())
    val s1 = tbl.analyze(Seq("id", "grp"))
    assert(s1("id").ndv == 5 && s1("grp").ndv == 3)
    assert(TableStats.fromProperties(cat.loadTable("ns", "t").properties) == s1)
    tbl.append(fixture().withColumn("id", $"id" + 10))
    assert(tbl.analyzeIncremental()("id").ndv == 10)
    // the stats file lives under the JDBC catalog's warehouse and
    // survives its vacuum
    cat.vacuum("ns", "t", graceMs = 0L)
    assert(Files.isRegularFile(java.nio.file.Paths.get(
      cat.loadTable("ns", "t").properties(TableStats.PathProp))))
  }

  test("refresh adopts the source's fresh statistics") {
    val wh = Files.createTempDirectory("graft-stats6").toString
    val cat = new Snaplog(wh)
    val src = LakehouseTable.create(cat, spark, "ns", "src", fixture().schema)
    src.append(fixture())
    val out = Files.createTempDirectory("graft-stats6-ice")
    IcebergExport.export(src, out)
    val cat2 = new Snaplog(Files.createTempDirectory("graft-stats6-wh2").toString)
    IcebergImport.register(cat2, spark, out, "ns", "mirror")
    // no stats at register time (source never analyzed)
    assert(TableStats.fromProperties(
      cat2.loadTable("ns", "mirror").properties).isEmpty)
    // source advances AND analyzes; re-export carries the stats entry
    src.append(fixture().withColumn("id", $"id" + 10))
    src.analyze(Seq("id"))
    IcebergExport.export(src, out)
    IcebergImport.refresh(cat2, spark, "ns", "mirror", Some(out))
    val adopted = TableStats.fromProperties(
      cat2.loadTable("ns", "mirror").properties)
    assert(adopted("id").ndv == 10)
  }
}
