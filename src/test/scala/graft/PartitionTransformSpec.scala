package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.Snaplog
import graft.sql.GraftSqlCatalog
import graft.table.{BucketField, DaysField, HoursField, IdentityField, LakehouseTable, MonthsField, PartitionTransforms, TruncateField, YearsField}

/** Hidden partitioning: days()/bucket() transform specs — parse and
  * validation, write-path layout (transformed tuples in the log, source
  * column untouched in the data), scan-side conservative pruning, and
  * the write/prune agreement the whole feature hangs on. */
class PartitionTransformSpec extends SparkSpec {

  test("spec strings parse and validate") {
    assert(PartitionTransforms.parse("grp") == IdentityField("grp"))
    assert(PartitionTransforms.parse("days(ts)") == DaysField("ts"))
    assert(PartitionTransforms.parse("day(ts)") == DaysField("ts"))
    assert(PartitionTransforms.parse("hours(ts)") == HoursField("ts"))
    assert(PartitionTransforms.parse("months(ts)") == MonthsField("ts"))
    assert(PartitionTransforms.parse("years(ts)") == YearsField("ts"))
    assert(PartitionTransforms.parse("bucket(16,id)") == BucketField(16, "id"))
    assert(PartitionTransforms.parse("bucket( 8 , user_id )") == BucketField(8, "user_id"))
    assert(PartitionTransforms.parse("truncate(3,s)") == TruncateField(3, "s"))

    val sch = StructType(Seq(
      StructField("id", LongType), StructField("ts", TimestampType),
      StructField("s", StringType), StructField("v", DoubleType),
      StructField("arr", ArrayType(LongType)), StructField("d", DateType)))
    PartitionTransforms.validate(sch,
      Seq("days(ts)", "hours(ts)", "months(d)", "years(d)", "bucket(4,id)",
        "truncate(2,s)"))
    intercept[IllegalArgumentException] { // days of a non-temporal column
      PartitionTransforms.validate(sch, Seq("days(id)"))
    }
    intercept[IllegalArgumentException] { // hours needs a timestamp, not a date
      PartitionTransforms.validate(sch, Seq("hours(d)"))
    }
    PartitionTransforms.validate(sch, Seq("truncate(10,id)")) // integral ok
    intercept[IllegalArgumentException] { // truncate needs string/integral
      PartitionTransforms.validate(sch, Seq("truncate(2,v)"))
    }
    intercept[IllegalArgumentException] { // bucket of a nested type
      PartitionTransforms.validate(sch, Seq("bucket(4,arr)"))
    }
    intercept[IllegalArgumentException] { // unknown source column
      PartitionTransforms.validate(sch, Seq("days(nope)"))
    }
    intercept[IllegalArgumentException] { // derived name collides
      PartitionTransforms.validate(
        sch.add(StructField("ts_day", StringType)), Seq("days(ts)"))
    }
  }

  test("time/truncate transforms: write values and literal pruning agree") {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, GreaterThan, Literal}
    val wh = Files.createTempDirectory("graft-ptx2").toString
    val cat = new Snaplog(wh)
    val ev = queries.Common.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value").limit(500)
    val t = LakehouseTable.create(cat, spark, "lake", "ev3", ev.schema,
      partitionColumns = Seq("months(ts)", "hours(ts)", "truncate(2,event_type)"))
    t.append(ev)
    val files = cat.liveFiles("lake", "ev3")
    assert(files.nonEmpty)
    assert(files.forall(f => f.partitionValues.contains("ts_month") &&
      f.partitionValues.contains("ts_hour") &&
      f.partitionValues.contains("event_type_trunc")))
    // fixture is Jan 2024 → epoch month 648, epoch year 54
    assert(files.forall(_.partitionValues("ts_month") == "648"),
      s"months: ${files.map(_.partitionValues("ts_month")).distinct}")
    assert(t.scan().count() == ev.count())

    val fields = PartitionTransforms.parseAll(
      Seq("months(ts)", "hours(ts)", "truncate(2,event_type)"))
    val tsAttr = AttributeReference("ts", TimestampType)()
    val etAttr = AttributeReference("event_type", StringType)()
    files.foreach { f =>
      val row = spark.read.parquet(f.path).select(col("ts"), col("event_type")).head()
      val micros = row.getTimestamp(0).getTime * 1000L +
        (row.getTimestamp(0).getNanos / 1000) % 1000
      val own = org.apache.spark.sql.catalyst.expressions.And(
        EqualTo(tsAttr, Literal(micros, TimestampType)),
        EqualTo(etAttr, Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(row.getString(1)),
          StringType)))
      assert(PartitionTransforms.mayMatch(f, own, fields),
        s"file pruned by its own row's literals: ${f.partitionValues}")
    }
    // a 1999 timestamp prunes every file on the month index (and via >)
    val far = Literal(
      java.time.Instant.parse("1999-01-01T00:00:00Z").toEpochMilli * 1000L,
      TimestampType)
    assert(files.forall(f => !PartitionTransforms.mayMatch(f,
      EqualTo(tsAttr, far), fields)))
    // ts < 1999 prunes all (stored month 648 > month(1999))
    assert(files.forall(f => !PartitionTransforms.mayMatch(f,
      org.apache.spark.sql.catalyst.expressions.LessThan(tsAttr, far), fields)))
    // ts > 1999 keeps all
    assert(files.forall(f => PartitionTransforms.mayMatch(f,
      GreaterThan(tsAttr, far), fields)))
    // a prefix no event_type starts with prunes via truncate
    val noSuch = Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString("zz_nothing"), StringType)
    assert(files.forall(f => !PartitionTransforms.mayMatch(f,
      EqualTo(etAttr, noSuch), fields)))
  }

  test("transform write expressions are timezone-independent and exact at extreme range") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.Row
    // rows far outside the double-exact range (|micros| > 2^53) plus a
    // modern row, evaluated under THREE session timezones: the stored
    // layout value must equal ofCatalyst's prune-side index every time
    val instants = Seq(
      java.time.Instant.parse("1600-01-07T13:00:00Z"),
      java.time.Instant.parse("2404-06-01T01:30:00Z"),
      java.time.Instant.parse("2024-01-15T07:45:00Z"))
    val schema = StructType(Seq(StructField("ts", TimestampType)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(instants.map(i =>
        Row(java.sql.Timestamp.from(i))): _*), schema)
    val fields = Seq(DaysField("ts"), HoursField("ts"), MonthsField("ts"),
      YearsField("ts"))
    val original = spark.conf.get("spark.sql.session.timeZone")
    try {
      for (tz <- Seq("UTC", "America/New_York", "Asia/Kolkata")) {
        spark.conf.set("spark.sql.session.timeZone", tz)
        val got = df.select(fields.map(pf =>
          pf.expr(col("ts"), TimestampType).as(pf.fieldName)): _*).collect()
        instants.zip(got).foreach { case (inst, row) =>
          val micros = inst.getEpochSecond * 1000000L + inst.getNano / 1000L
          fields.zipWithIndex.foreach { case (pf, i) =>
            val expect = pf.ofCatalyst(Literal(micros, TimestampType))
            assert(expect.contains(row.getString(i)),
              s"$tz ${pf.spec} of $inst: wrote ${row.getString(i)}, prune side $expect")
          }
        }
      }
      // date + NTZ sources are wall-clock: same agreement under a shifted tz
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val d = java.time.LocalDate.of(2024, 3, 10)
      val dRow = spark.createDataFrame(
        java.util.Arrays.asList(Row(java.sql.Date.valueOf(d))),
        StructType(Seq(StructField("d", DateType))))
        .select(DaysField("d").expr(col("d"), DateType)).head()
      assert(dRow.getString(0) == d.toEpochDay.toString)
    } finally spark.conf.set("spark.sql.session.timeZone", original)
  }

  test("integral truncate: write/prune agreement, ordered range pruning, consumed windows") {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, GreaterThanOrEqual, LessThan, Literal}
    import org.apache.spark.sql.Row
    val tf = TruncateField(10, "k")
    // write expr vs prune-side ofCatalyst, bit-for-bit — including the
    // wrap-range bucket within W of Long.MinValue, where plain long
    // subtraction would overflow
    val vals = Seq(-25L, -20L, -1L, 0L, 9L, 10L, 123L,
      Long.MaxValue, Long.MinValue, Long.MinValue + 7L)
    val df = spark.createDataFrame(
      java.util.Arrays.asList(vals.map(Row(_)): _*),
      StructType(Seq(StructField("k", LongType))))
    val got = df.select(tf.expr(col("k"), LongType)).collect().map(_.getString(0))
    vals.zip(got).foreach { case (v, s) =>
      assert(tf.ofCatalyst(Literal(v, LongType)).contains(s),
        s"truncate(10) of $v: wrote $s, prune side ${tf.ofCatalyst(Literal(v, LongType))}")
    }
    assert(got(vals.indexOf(-25L)) == "-30")
    assert(got(vals.indexOf(123L)) == "120")
    assert(got(vals.indexOf(Long.MinValue)) == "-9223372036854775810")
    // the wrap bucket still ORDERS below every other bucket (BigInt cmp)
    assert(tf.cmp("-9223372036854775810", "-30").contains(-1))
    assert(tf.atUnitStart(Literal(120L, LongType)))
    assert(!tf.atUnitStart(Literal(123L, LongType)))
    // string literals never license range pruning on truncate
    assert(!tf.orderedFor(Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString("ab"), StringType)))
    assert(tf.orderedFor(Literal(5L, LongType)))

    // table-level: range predicates prune files at truncate granularity
    val wh = Files.createTempDirectory("graft-ptxtrunc").toString
    val cat = new Snaplog(wh)
    val src = spark.createDataFrame(
      java.util.Arrays.asList((0L until 100L).map(i => Row(i, s"r$i")): _*),
      StructType(Seq(StructField("k", LongType), StructField("s", StringType))))
    val t = LakehouseTable.create(cat, spark, "lake", "tr", src.schema,
      partitionColumns = Seq("truncate(10,k)"))
    t.append(src)
    val files = cat.liveFiles("lake", "tr")
    assert(files.map(_.partitionValues("k_trunc")).distinct.size == 10)
    val fields = PartitionTransforms.parseAll(Seq("truncate(10,k)"))
    val kAttr = AttributeReference("k", LongType)()
    // k >= 50 prunes buckets 0..40, keeps 50..90
    val kept = files.filter(f => PartitionTransforms.mayMatch(f,
      GreaterThanOrEqual(kAttr, Literal(50L, LongType)), fields))
    assert(kept.map(_.partitionValues("k_trunc")).map(_.toLong).forall(_ >= 50L))
    assert(kept.nonEmpty && kept.size < files.size)
    // k < 30 with an aligned bound excludes bucket 30 itself
    val keptLt = files.filter(f => PartitionTransforms.mayMatch(f,
      LessThan(kAttr, Literal(30L, LongType)), fields))
    assert(keptLt.map(_.partitionValues("k_trunc")).map(_.toLong).toSet ==
      Set(0L, 10L, 20L))
    // aligned half-open window is transform-EXACT (consumable)
    val window = org.apache.spark.sql.catalyst.expressions.And(
      GreaterThanOrEqual(kAttr, Literal(20L, LongType)),
      LessThan(kAttr, Literal(40L, LongType)))
    assert(PartitionTransforms.rangeExact(window, fields, files))
    // misaligned bound is not
    assert(!PartitionTransforms.rangeExact(
      GreaterThanOrEqual(kAttr, Literal(25L, LongType)), fields, files))
    // scan stays row-exact either way
    assert(t.scan().filter(col("k") >= 20 && col("k") < 40).count() == 20L)
  }

  test("native write records transformed tuples; source column stays in data") {
    val wh = Files.createTempDirectory("graft-ptx").toString
    val cat = new Snaplog(wh)
    val ev = queries.Common.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val t = LakehouseTable.create(cat, spark, "lake", "ev", ev.schema,
      partitionColumns = Seq("days(ts)", "bucket(4,user_id)"))
    t.append(ev)

    val files = cat.liveFiles("lake", "ev")
    assert(files.nonEmpty)
    // every file records BOTH transformed values, keyed by field name
    assert(files.forall(f => f.partitionValues.contains("ts_day") &&
      f.partitionValues.contains("user_id_bucket")))
    // bucket values are inside [0, 4)
    assert(files.forall(f =>
      (0L until 4L).contains(f.partitionValues("user_id_bucket").toLong)))
    // the data files still carry the raw source columns, full fidelity
    val back = t.scan()
    assert(back.columns.toSet == ev.columns.toSet)
    assert(back.count() == ev.count())
    assert(back.agg(sum(col("user_id"))).head().getLong(0) ==
      ev.agg(sum(col("user_id"))).head().getLong(0))

    // write/prune agreement on REAL data: for every file, a row sampled
    // from it must never be pruned by its own literals (days + bucket)
    val fields = PartitionTransforms.parseAll(Seq("days(ts)", "bucket(4,user_id)"))
      .filterNot(_.isInstanceOf[IdentityField])
    files.foreach { f =>
      val row = spark.read.parquet(f.path)
        .select(col("ts"), col("user_id")).head()
      val tsLit = org.apache.spark.sql.catalyst.expressions.Literal(
        row.getTimestamp(0).getTime * 1000L +
          (row.getTimestamp(0).getNanos / 1000) % 1000, TimestampType)
      val uidLit = org.apache.spark.sql.catalyst.expressions.Literal(
        row.getLong(1), LongType)
      val tsAttr = org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "ts", TimestampType)()
      val uidAttr = org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "user_id", LongType)()
      val eq = org.apache.spark.sql.catalyst.expressions.And(
        org.apache.spark.sql.catalyst.expressions.EqualTo(tsAttr, tsLit),
        org.apache.spark.sql.catalyst.expressions.EqualTo(uidAttr, uidLit))
      assert(PartitionTransforms.mayMatch(f, eq, fields),
        s"file ${f.path} pruned by its own row's literals")
    }
    // and a day far outside the data must prune EVERY file
    val farAttr = org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "ts", TimestampType)()
    val farLit = org.apache.spark.sql.catalyst.expressions.Literal(
      java.time.Instant.parse("1999-01-01T00:00:00Z").toEpochMilli * 1000L,
      TimestampType)
    val farEq = org.apache.spark.sql.catalyst.expressions.EqualTo(farAttr, farLit)
    assert(files.forall(f => !PartitionTransforms.mayMatch(f, farEq, fields)))
  }

  test("SQL hidden partitioning end-to-end: create, insert, pruned scan") {
    val wh = Files.createTempDirectory("graft-ptxsql").toString
    val cat = new Snaplog(wh)
    cat.createNamespace("ns")
    spark.conf.set("spark.sql.catalog.gptx", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gptx.warehouse", wh)

    spark.sql("""CREATE TABLE gptx.ns.ev
      (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE)
      PARTITIONED BY (days(ts), bucket(4, user_id))""")
    assert(cat.loadTable("ns", "ev").partitionColumns ==
      Seq("days(ts)", "bucket(4,user_id)"))

    queries.Common.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      .createOrReplaceTempView("ptx_src")
    spark.sql("INSERT INTO gptx.ns.ev SELECT * FROM ptx_src")

    val files = cat.liveFiles("ns", "ev")
    val nDays = files.map(_.partitionValues("ts_day")).distinct.size
    assert(nDays > 1, s"fixture should span multiple days, got $nDays")

    import org.apache.spark.sql.execution.datasources.v2.{BatchScanExec, FileScan}
    def scanned(sql: String): Int = {
      val plan = spark.sql(sql).queryExecution.sparkPlan
      plan.collect { case b: BatchScanExec => b.scan }
        .collect { case fs: FileScan => fs.fileIndex.inputFiles.length }.sum
    }

    // day-range scan prunes files the transform proves non-matching
    val minTs = spark.sql("SELECT MIN(ts) FROM ptx_src").head().getTimestamp(0)
    // use a real 2-day window inside the data
    val startDay = new java.sql.Timestamp(minTs.getTime + 2L * 86400000)
    val endDay = new java.sql.Timestamp(minTs.getTime + 4L * 86400000)
    val cond = s"ts >= TIMESTAMP '$startDay' AND ts < TIMESTAMP '$endDay'"
    val q = spark.sql(s"SELECT COUNT(*) AS n FROM gptx.ns.ev WHERE $cond")
    val expected = spark.sql(
      s"SELECT COUNT(*) AS n FROM ptx_src WHERE $cond").head().getLong(0)
    assert(expected > 0)
    assert(q.head().getLong(0) == expected)
    val dayScanned = scanned(s"SELECT * FROM gptx.ns.ev WHERE $cond")
    // ~30 days of data, 2-day window (+ boundary-day conservatism):
    // well under a quarter of the files must survive
    assert(dayScanned > 0 && dayScanned < files.size / 2,
      s"day-range scan should prune: scanned $dayScanned of ${files.size}")

    // bucket equality prunes to ~1/4 of the files (4 buckets)
    val someUser = spark.sql("SELECT user_id FROM ptx_src LIMIT 1").head().getLong(0)
    val bScanned = scanned(s"SELECT * FROM gptx.ns.ev WHERE user_id = $someUser")
    assert(bScanned > 0 && bScanned < files.size / 2,
      s"bucket scan should prune: $bScanned of ${files.size}")
    val bn = spark.sql(s"SELECT * FROM gptx.ns.ev WHERE user_id = $someUser").count()
    val bExpected = spark.sql(
      s"SELECT COUNT(*) FROM ptx_src WHERE user_id = $someUser").head().getLong(0)
    assert(bn == bExpected)

    // the full transform family round-trips through SQL CREATE
    spark.sql("""CREATE TABLE gptx.ns.all_t
      (id BIGINT, ts TIMESTAMP, s STRING)
      PARTITIONED BY (years(ts), months(ts), hours(ts), truncate(3, s))""")
    assert(cat.loadTable("ns", "all_t").partitionColumns ==
      Seq("years(ts)", "months(ts)", "hours(ts)", "truncate(3,s)"))
    // the Iceberg-spec murmur3 bucket creates, writes and prunes via SQL
    spark.sql("""CREATE TABLE gptx.ns.mb_t (id BIGINT, v STRING)
      PARTITIONED BY (mbucket(4, id))""")
    assert(cat.loadTable("ns", "mb_t").partitionColumns == Seq("mbucket(4,id)"))
    spark.sql("INSERT INTO gptx.ns.mb_t SELECT id, CAST(id AS STRING) FROM range(1, 65)")
    val mbScanned = scanned("SELECT * FROM gptx.ns.mb_t WHERE id = 7")
    val mbTotal = cat.liveFiles("ns", "mb_t").size
    assert(mbScanned > 0 && mbScanned < mbTotal,
      s"mbucket scan should prune: $mbScanned of $mbTotal")
    assert(spark.sql("SELECT * FROM gptx.ns.mb_t WHERE id = 7").count() == 1)
    // unknown transforms still refuse at CREATE
    intercept[Exception] {
      spark.sql("CREATE TABLE gptx.ns.h (id BIGINT) PARTITIONED BY (zorder(id))")
    }
    // DESCRIBE shows the transform spec ("# Partitioning" section with
    // one Part row per transform)
    val desc = spark.sql("DESCRIBE TABLE gptx.ns.ev").collect()
      .map(_.getString(0))
    assert(desc.contains("# Partitioning") && desc.contains("Part 1"))
  }

  test("day-aligned window filters are transform-exact: consumed filters + metadata COUNT") {
    val wh = Files.createTempDirectory("graft-ptxexact").toString
    val cat = new Snaplog(wh)
    cat.createNamespace("ns")
    spark.conf.set("spark.sql.catalog.gptxe", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gptxe.warehouse", wh)
    spark.sql("""CREATE TABLE gptxe.ns.ev (id BIGINT, ts TIMESTAMP)
      PARTITIONED BY (days(ts))""")
    // boundary rows on purpose: lo is INCLUSIVE, hi EXCLUSIVE
    spark.sql("""INSERT INTO gptxe.ns.ev VALUES
      (1, TIMESTAMP '2024-01-01 00:00:00'),
      (2, TIMESTAMP '2024-01-01 23:59:59.999999'),
      (3, TIMESTAMP '2024-01-02 00:00:00'),
      (4, TIMESTAMP '2024-01-03 05:00:00')""")
    val window = "ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-01-02 00:00:00'"
    // metadata-only COUNT under the aligned day window
    val c = spark.sql(s"SELECT COUNT(*) FROM gptxe.ns.ev WHERE $window")
    assert(c.queryExecution.sparkPlan.toString.contains("LocalTableScan"),
      s"aligned day-window COUNT should answer from metadata:\n${c.queryExecution.sparkPlan}")
    assert(c.head().getLong(0) == 2L)
    // the consumed filter is pruning-only and must still be row-exact
    assert(spark.sql(s"SELECT id FROM gptxe.ns.ev WHERE $window ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // a misaligned endpoint declines: real scan, still correct
    val mis = spark.sql("SELECT COUNT(*) FROM gptxe.ns.ev " +
      "WHERE ts >= TIMESTAMP '2024-01-01 00:00:01' AND ts < TIMESTAMP '2024-01-02 00:00:00'")
    assert(!mis.queryExecution.sparkPlan.toString.contains("LocalTableScan"))
    assert(mis.head().getLong(0) == 1L)
    // null source values go to the sentinel partition and KILL exactness
    spark.sql("INSERT INTO gptxe.ns.ev VALUES (9, CAST(NULL AS TIMESTAMP))")
    val afterNull = spark.sql(s"SELECT COUNT(*) FROM gptxe.ns.ev WHERE $window")
    assert(!afterNull.queryExecution.sparkPlan.toString.contains("LocalTableScan"),
      "a sentinel-bearing table must decline transform-exact answers")
    assert(afterNull.head().getLong(0) == 2L)
    assert(spark.sql(s"SELECT id FROM gptxe.ns.ev WHERE $window ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("COW UPDATE on a days-partitioned table carries other days' files") {
    val wh = Files.createTempDirectory("graft-ptxcow").toString
    val cat = new Snaplog(wh)
    cat.createNamespace("ns")
    spark.conf.set("spark.sql.catalog.gptxcow", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gptxcow.warehouse", wh)
    spark.sql("""CREATE TABLE gptxcow.ns.ev (id BIGINT, ts TIMESTAMP, v DOUBLE)
      PARTITIONED BY (days(ts))""")
    spark.sql("""INSERT INTO gptxcow.ns.ev VALUES
      (1, TIMESTAMP '2024-01-01 10:00:00', 1.0),
      (2, TIMESTAMP '2024-01-02 10:00:00', 2.0),
      (3, TIMESTAMP '2024-01-03 10:00:00', 3.0)""")
    val before = cat.liveFiles("ns", "ev")
    assert(before.map(_.partitionValues("ts_day")).distinct.size == 3)
    // group filter `ts < 2024-01-02` proves days 2 and 3 rowless: their
    // files must carry by path, only day 1's file rewrites
    spark.sql("UPDATE gptxcow.ns.ev SET v = v * 10 " +
      "WHERE ts < TIMESTAMP '2024-01-02 00:00:00'")
    val last = cat.snapshots("ns", "ev").last
    assert(last.summary.get("rewritten-files").exists(_.toInt <= 1) &&
      last.summary.get("carried-files").exists(_.toInt >= 2),
      s"expected file-granular COW via transform pruning: ${last.summary}")
    val after = cat.liveFiles("ns", "ev").map(_.path).toSet
    val carried = before.filter(f => after(f.path))
    assert(carried.size >= 2, s"days 2/3 must survive by path: $carried")
    assert(spark.sql("SELECT SUM(v) FROM gptxcow.ns.ev").head().getDouble(0)
      == 10.0 + 2.0 + 3.0)
  }

  test("runtime group filtering prunes unmatched days under join-shaped MERGE") {
    val wh = Files.createTempDirectory("graft-ptxrt").toString
    val cat = new Snaplog(wh)
    cat.createNamespace("ns")
    spark.conf.set("spark.sql.catalog.gptxrt", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gptxrt.warehouse", wh)
    spark.sql("""CREATE TABLE gptxrt.ns.ev (id BIGINT, ts TIMESTAMP, v DOUBLE)
      PARTITIONED BY (days(ts))""")
    spark.sql("""INSERT INTO gptxrt.ns.ev VALUES
      (1, TIMESTAMP '2024-01-01 10:00:00', 1.0),
      (2, TIMESTAMP '2024-01-02 10:00:00', 2.0),
      (3, TIMESTAMP '2024-01-03 10:00:00', 3.0)""")
    val before = cat.liveFiles("ns", "ev")
    assert(before.map(_.partitionValues("ts_day")).distinct.size == 3)
    // the ON condition references only the join key — STATIC pruning
    // sees nothing; the runtime value set (matched ts values) must
    // prune days 2 and 3 through the days() transform
    spark.sql("SELECT CAST(1 AS BIGINT) AS id, CAST(10.0 AS DOUBLE) AS v")
      .createOrReplaceTempView("ptxrt_src")
    spark.sql("""MERGE INTO gptxrt.ns.ev t USING ptxrt_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET t.v = s.v""")
    val sum = cat.snapshots("ns", "ev").last.summary
    assert(sum.get("carried-files").exists(_.toInt >= 2),
      s"days 2/3 must carry via runtime transform filtering: $sum")
    val after = cat.liveFiles("ns", "ev").map(_.path).toSet
    val otherDays = before.filter(_.partitionValues("ts_day") != "19723").map(_.path)
    assert(otherDays.forall(after), "unmatched days' files must survive by path")
    assert(spark.sql("SELECT id, v FROM gptxrt.ns.ev ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 10.0), (2L, 2.0), (3L, 3.0)))
  }

  test("transform-partitioned tables refuse identity-only surfaces loudly") {
    val wh = Files.createTempDirectory("graft-ptxref").toString
    val cat = new Snaplog(wh)
    val ev = queries.Common.events(spark, sf)
      .select("event_id", "ts", "user_id", "value").limit(100)
    val t = LakehouseTable.create(cat, spark, "lake", "ev2", ev.schema,
      partitionColumns = Seq("days(ts)"))
    t.append(ev)
    // renaming/dropping a transform SOURCE column is refused
    intercept[IllegalArgumentException] { t.renameColumn("ts", "ts2") }
    intercept[IllegalArgumentException] { t.dropColumn("ts") }
  }

  test("dynamic partition overwrite replaces only the days the patch covers") {
    val wh = Files.createTempDirectory("graft-ptxdpo").toString
    val cat = new Snaplog(wh)
    cat.createNamespace("ns")
    spark.conf.set("spark.sql.catalog.gptxdpo", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gptxdpo.warehouse", wh)
    spark.sql("""CREATE TABLE gptxdpo.ns.ev (id BIGINT, ts TIMESTAMP, v DOUBLE)
      PARTITIONED BY (days(ts))""")
    spark.sql("""INSERT INTO gptxdpo.ns.ev VALUES
      (1, TIMESTAMP '2024-01-01 10:00:00', 1.0),
      (2, TIMESTAMP '2024-01-02 10:00:00', 2.0),
      (3, TIMESTAMP '2024-01-03 10:00:00', 3.0)""")
    val t = LakehouseTable.load(cat, spark, "ns", "ev")
    val before = cat.liveFiles("ns", "ev")
    assert(before.map(_.partitionValues("ts_day")).distinct.size == 3)
    // the daily re-run: day 2 recomputed (two rows now), other days kept
    val patch = spark.sql("""SELECT * FROM VALUES
      (CAST(20 AS BIGINT), TIMESTAMP '2024-01-02 09:00:00', CAST(20.0 AS DOUBLE)),
      (CAST(21 AS BIGINT), TIMESTAMP '2024-01-02 11:00:00', CAST(21.0 AS DOUBLE))
      AS p(id, ts, v)""")
    val snap = t.overwritePartitions(patch)
    assert(snap.summary("replaced-partitions") == "1")
    val after = cat.liveFiles("ns", "ev")
    // untouched days' files survive BY PATH (no rewrite)
    val beforeOther = before.filter(_.partitionValues("ts_day") != "19724").map(_.path).toSet
    val afterPaths = after.map(_.path).toSet
    assert(beforeOther.subsetOf(afterPaths),
      s"untouched days must carry by path: $beforeOther vs $afterPaths")
    // day 2's old file is gone, new rows present
    assert(spark.sql("SELECT id FROM gptxdpo.ns.ev ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 3L, 20L, 21L))
  }
}
