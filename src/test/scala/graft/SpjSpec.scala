package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.catalog.Snaplog
import graft.sql.GraftSqlCatalog
import graft.table.LakehouseTable

/** Storage-partitioned joins: identity-partitioned graft tables report
  * KeyGroupedPartitioning, so joins/aggregations clustered on the
  * partition key plan WITHOUT a shuffle. */
class SpjSpec extends SparkSpec {
  import spark.implicits._

  private def df(n: Int, tag: String) =
    (1 to n).map(i => (i, s"g${i % 4}", s"$tag$i")).toDF("id", "grp", "payload")

  private def setup(name: String): String = {
    val wh = Files.createTempDirectory(s"graft-spj-$name").toString
    val cat = new Snaplog(wh)
    val a = LakehouseTable.create(cat, spark, "ns", "a", df(1, "x").schema, Seq("grp"))
    val b = LakehouseTable.create(cat, spark, "ns", "b", df(1, "x").schema, Seq("grp"))
    a.append(df(40, "a"))
    b.append(df(20, "b"))
    val cn = s"gspj_$name"
    spark.conf.set(s"spark.sql.catalog.$cn", classOf[GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cn.warehouse", wh)
    cn
  }

  private def withSpjConf[A](body: => A): A = {
    val pairs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def shuffles(q: org.apache.spark.sql.DataFrame): Int =
    q.queryExecution.executedPlan.collect { case s: ShuffleExchangeExec => s }.size

  test("co-partitioned join on the partition key plans with zero shuffles") {
    val cn = setup("join")
    withSpjConf {
      val j = spark.table(s"$cn.ns.a").join(spark.table(s"$cn.ns.b"), "grp")
      assert(shuffles(j) == 0, j.queryExecution.executedPlan.toString)
      assert(j.count() == (1 to 40).map(i =>
        (1 to 20).count(k => k % 4 == i % 4)).sum)
    }
  }

  test("aggregation clustered by the partition key plans with zero shuffles") {
    val cn = setup("agg")
    withSpjConf {
      val g = spark.table(s"$cn.ns.a").groupBy("grp").agg(count(lit(1)).as("n"))
      assert(shuffles(g) == 0, g.queryExecution.executedPlan.toString)
      assert(g.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
        Map("g0" -> 10L, "g1" -> 10L, "g2" -> 10L, "g3" -> 10L))
    }
  }

  test("identity SPJ join reports ordering: zero sorts AND zero shuffles") {
    // each key-grouped partition carries exactly one key tuple, so the
    // scan reports ascending ordering on the key (SupportsReportOrdering)
    // and the sort-merge join drops BOTH SortExecs, not just exchanges
    val cn = setup("ord")
    withSpjConf {
      val j = spark.table(s"$cn.ns.a").join(spark.table(s"$cn.ns.b"), "grp")
      assert(shuffles(j) == 0, j.queryExecution.executedPlan.toString)
      val sorts = j.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s
      }.size
      assert(sorts == 0,
        s"SPJ join still sorts:\n${j.queryExecution.executedPlan}")
      assert(j.count() == (1 to 40).map(i =>
        (1 to 20).count(k => k % 4 == i % 4)).sum)
    }
  }

  test("ordering report survives column pruning of the key") {
    // the ordering rule resolves refs against the PRUNED scan output
    // strictly — a projection that drops the partition key must not
    // fail analysis (the report withdraws to the surviving subset)
    val cn = setup("ordprune")
    withSpjConf {
      val only = spark.table(s"$cn.ns.a").select("payload")
      assert(only.count() == 40)
      val agg = spark.table(s"$cn.ns.a").groupBy("id").count()
      assert(agg.count() == 40)
    }
  }

  test("bucket-partitioned join on the bucket source column plans without shuffles") {
    val wh = Files.createTempDirectory("graft-spj-bucket").toString
    val cat = new Snaplog(wh)
    val a = LakehouseTable.create(cat, spark, "ns", "ba", df(1, "x").schema,
      Seq("bucket(8,id)"))
    val b = LakehouseTable.create(cat, spark, "ns", "bb", df(1, "x").schema,
      Seq("bucket(8,id)"))
    a.append(df(64, "a"))
    b.append(df(32, "b"))
    spark.conf.set("spark.sql.catalog.gspjb", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gspjb.warehouse", wh)
    withSpjConf {
      val j = spark.table("gspjb.ns.ba").select($"id", $"payload".as("pa"))
        .join(spark.table("gspjb.ns.bb").select($"id", $"payload".as("pb")), "id")
      assert(shuffles(j) == 0, j.queryExecution.executedPlan.toString)
      assert(j.count() == 32) // ids 1..32 exist on both sides
    }
  }

  test("mbucket-partitioned join on the source column plans without shuffles") {
    // the Iceberg-spec murmur3 bucket rides SPJ as a count-per-name
    // unary function family (mbucket_<n>, GraftMBucketUnbound) — two
    // mbucket(8,id) tables must key-group-join shuffle-free, and the
    // V2 function must agree with the write path's recorded indexes
    val wh = Files.createTempDirectory("graft-spj-mbucket").toString
    val cat = new Snaplog(wh)
    val a = LakehouseTable.create(cat, spark, "ns", "ma", df(1, "x").schema,
      Seq("mbucket(8,id)"))
    val b = LakehouseTable.create(cat, spark, "ns", "mb", df(1, "x").schema,
      Seq("mbucket(8,id)"))
    a.append(df(64, "a"))
    b.append(df(32, "b"))
    spark.conf.set("spark.sql.catalog.gspjmb", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gspjmb.warehouse", wh)
    withSpjConf {
      val j = spark.table("gspjmb.ns.ma").select($"id", $"payload".as("pa"))
        .join(spark.table("gspjmb.ns.mb").select($"id", $"payload".as("pb")), "id")
      assert(shuffles(j) == 0, j.queryExecution.executedPlan.toString)
      assert(j.count() == 32)
    }
    // v2 function vs write path: the bound mbucket_8 computes exactly
    // the recorded layout index for every row of every file
    val fn = new graft.sql.GraftMBucketUnbound(8)
      .bind(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.IntegerType))))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer]]
    cat.liveFiles("ns", "ma").foreach { f =>
      val stored = f.partitionValues("id_mbucket").toInt
      spark.read.parquet(f.path).select("id").collect().foreach { r =>
        val row = org.apache.spark.sql.catalyst.InternalRow(r.getInt(0))
        assert(fn.produceResult(row).intValue() == stored)
      }
    }
    // encoding-typed canonical names: int and long MATCH (the spec
    // hashes ints widened to long — compatible partitionings), string
    // differs, counts differ
    def canon(n: Int, dt: org.apache.spark.sql.types.DataType) =
      new graft.sql.GraftMBucketUnbound(n).bind(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("c", dt)))).canonicalName()
    assert(canon(8, org.apache.spark.sql.types.IntegerType) ==
      canon(8, org.apache.spark.sql.types.LongType))
    assert(canon(8, org.apache.spark.sql.types.IntegerType) !=
      canon(8, org.apache.spark.sql.types.StringType))
    assert(canon(8, org.apache.spark.sql.types.IntegerType) !=
      canon(4, org.apache.spark.sql.types.IntegerType))
  }

  test("days-partitioned join on the timestamp column plans without shuffles") {
    import java.sql.Timestamp
    val wh = Files.createTempDirectory("graft-spj-days").toString
    val cat = new Snaplog(wh)
    def ev(n: Int, tag: String) = (1 to n).map(i =>
      (i, Timestamp.valueOf(f"2024-03-${1 + (i % 5)}%02d 0$tag:00:00"), s"$tag$i"))
      .toDF("id", "ts", "payload")
    val a = LakehouseTable.create(cat, spark, "ns", "da", ev(1, "1").schema, Seq("days(ts)"))
    val b = LakehouseTable.create(cat, spark, "ns", "db", ev(1, "1").schema, Seq("days(ts)"))
    a.append(ev(20, "1"))
    b.append(ev(20, "2")) // same days, different times — day-join matches
    spark.conf.set("spark.sql.catalog.gspjd", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gspjd.warehouse", wh)
    withSpjConf {
      val l = spark.table("gspjd.ns.da")
        .select(to_date($"ts").as("day"), $"payload".as("pa"), $"ts")
      val r = spark.table("gspjd.ns.db")
        .select(to_date($"ts").as("day2"), $"payload".as("pb"), $"ts".as("ts2"))
      // days(ts) co-locates equal ts values (same instant ⊆ same day),
      // so even a ts-grouped aggregate legitimately plans shuffle-free —
      // and must still produce exact groups
      val byTs = spark.table("gspjd.ns.da").groupBy($"ts")
        .agg(count(lit(1)).as("n"))
      assert(shuffles(byTs) == 0, byTs.queryExecution.executedPlan.toString)
      assert(byTs.collect().map(_.getLong(1)).toSeq == Seq.fill(5)(4L))
      // co-partitioned join on ts: both sides report days(ts), Spark
      // accepts the compatible transform — zero shuffles
      val j = spark.table("gspjd.ns.da").as("x")
        .join(spark.table("gspjd.ns.db").as("y"), $"x.ts" === $"y.ts")
      assert(shuffles(j) == 0, j.queryExecution.executedPlan.toString)
      assert(j.count() == 0) // different hours: no equal instants
      // and a day-equality join via the derived date matches rows: do it
      // as a correctness-only check (derived-column joins re-shuffle)
      val dayJoin = spark.table("gspjd.ns.da")
        .select(to_date($"ts").as("d"), $"id".as("ia"))
        .join(spark.table("gspjd.ns.db")
          .select(to_date($"ts").as("d"), $"id".as("ib")), "d")
      assert(dayJoin.count() == 80) // 5 days × 4 rows × 4 rows
    }
  }

  test("truncate-partitioned join on the source column plans without shuffles") {
    val wh = Files.createTempDirectory("graft-spj-trunc").toString
    val cat = new Snaplog(wh)
    val a = LakehouseTable.create(cat, spark, "ns", "ta", df(1, "x").schema,
      Seq("truncate(10,id)"))
    val b = LakehouseTable.create(cat, spark, "ns", "tb", df(1, "x").schema,
      Seq("truncate(10,id)"))
    a.append(df(40, "a"))
    b.append(df(20, "b"))
    spark.conf.set("spark.sql.catalog.gspjt", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gspjt.warehouse", wh)
    withSpjConf {
      val j = spark.table("gspjt.ns.ta").select($"id", $"payload".as("pa"))
        .join(spark.table("gspjt.ns.tb").select($"id", $"payload".as("pb")), "id")
      assert(shuffles(j) == 0, j.queryExecution.executedPlan.toString)
      assert(j.count() == 20) // ids 1..20 exist on both sides
      // id-grouped aggregate also co-locates (equal ids ⊆ same width-10
      // range) — shuffle-free and exact
      val g = spark.table("gspjt.ns.ta").groupBy("id").agg(count(lit(1)).as("n"))
      assert(shuffles(g) == 0, g.queryExecution.executedPlan.toString)
      assert(g.count() == 40 && g.collect().forall(_.getLong(1) == 1L))
    }
    // STRING truncate co-locates too: prefix keys ride as strings
    val sa = LakehouseTable.create(cat, spark, "ns", "sa", df(1, "x").schema,
      Seq("truncate(2,grp)"))
    val sb = LakehouseTable.create(cat, spark, "ns", "sb", df(1, "x").schema,
      Seq("truncate(2,grp)"))
    sa.append(df(16, "a"))
    sb.append(df(8, "b"))
    withSpjConf {
      val j = spark.table("gspjt.ns.sa").select($"grp", $"id".as("ia"))
        .join(spark.table("gspjt.ns.sb").select($"grp", $"id".as("ib")), "grp")
      assert(shuffles(j) == 0, j.queryExecution.executedPlan.toString)
      assert(j.count() == (1 to 16).map(i =>
        (1 to 8).count(k => k % 4 == i % 4)).sum)
    }
  }

  test("v2 truncate function agrees with the write-path transform") {
    import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, Literal}
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
    val boundI = new graft.sql.GraftTruncateUnbound(10)
      .bind(StructType(Seq(StructField("v", LongType))))
      .asInstanceOf[graft.sql.GraftTruncateBound]
    val tf = graft.table.TruncateField(10, "id")
    Seq(0L, 7L, 10L, 99L, -1L, -10L, -11L).foreach { v =>
      val viaFn = boundI
        .produceResult(new GenericInternalRow(Array[Any](v))).toString
      assert(tf.ofCatalyst(Literal(v)).contains(viaFn),
        s"truncate($v): function $viaFn vs write ${tf.ofCatalyst(Literal(v))}")
    }
    val boundS = new graft.sql.GraftTruncateUnbound(2)
      .bind(StructType(Seq(StructField("v", StringType))))
      .asInstanceOf[graft.sql.GraftTruncateBound]
    val ts = graft.table.TruncateField(2, "grp")
    Seq("", "a", "ab", "abcd", "日本語テキスト").foreach { v =>
      val viaFn = boundS.produceResult(new GenericInternalRow(
        Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString(v))))
        .toString
      assert(ts.ofCatalyst(Literal(v)).contains(viaFn),
        s"truncate('$v'): function $viaFn vs write ${ts.ofCatalyst(Literal(v))}")
    }
    // typed canonical names: INT and BIGINT buckets must not match,
    // nor may two truncate widths (or types)
    val bi = graft.sql.GraftBucketUnbound.bind(StructType(Seq(
      StructField("n", IntegerType), StructField("v", IntegerType))))
    val bl = graft.sql.GraftBucketUnbound.bind(StructType(Seq(
      StructField("n", IntegerType), StructField("v", LongType))))
    assert(bi.canonicalName() != bl.canonicalName())
    val t5 = new graft.sql.GraftTruncateUnbound(5)
      .bind(StructType(Seq(StructField("v", LongType))))
    assert(t5.canonicalName() != boundI.canonicalName())
    assert(boundS.canonicalName() != boundI.canonicalName())
  }

  test("v2 bucket function agrees with the write-path transform") {
    import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, Literal}
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val bound = graft.sql.GraftBucketUnbound.bind(StructType(Seq(
      StructField("n", IntegerType), StructField("v", IntegerType))))
      .asInstanceOf[graft.sql.GraftBucketBound]
    val bf = graft.table.BucketField(8, "id")
    (Seq(0, 1, 5, 42, -7, Int.MaxValue)).foreach { v =>
      val viaFn = bound.produceResult(
        new GenericInternalRow(Array[Any](8, v))).toString
      assert(bf.ofCatalyst(Literal(v)).contains(viaFn),
        s"bucket($v): function $viaFn vs write ${bf.ofCatalyst(Literal(v))}")
    }
    assert(bound.produceResult(
      new GenericInternalRow(Array[Any](8, null))) == null)
  }

  test("mixed-spec coverage withdraws the report but stays correct") {
    val wh = Files.createTempDirectory("graft-spj-mixed").toString
    val cat = new Snaplog(wh)
    val t = LakehouseTable.create(cat, spark, "ns", "m", df(1, "x").schema)
    t.append(df(8, "x"))          // unpartitioned
    t.updateSpec(Seq("grp"))
    t.append(df(8, "y"))          // identity grp
    spark.conf.set("spark.sql.catalog.gspjm", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gspjm.warehouse", wh)
    withSpjConf {
      val g = spark.table("gspjm.ns.m").groupBy("grp").agg(count(lit(1)).as("n"))
      assert(shuffles(g) > 0) // fell back: no exact key report possible
      assert(g.collect().map(_.getLong(1)).sum == 16)
    }
  }

  test("SPJ conf composes with runtime-filtered DML (MERGE) unchanged") {
    val wh = Files.createTempDirectory("graft-spj-dml").toString
    val cat = new Snaplog(wh)
    val t = LakehouseTable.create(cat, spark, "ns", "dml", df(1, "x").schema, Seq("grp"))
    t.append(df(12, "x"))
    spark.conf.set("spark.sql.catalog.gspjq", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gspjq.warehouse", wh)
    withSpjConf {
      // join-shaped MERGE: runtime group filtering + keyed scan planning
      // must not disturb row-level DML results
      df(4, "m").createOrReplaceTempView("spj_merge_src")
      spark.sql("""MERGE INTO gspjq.ns.dml tgt
        USING spj_merge_src src ON tgt.id = src.id
        WHEN MATCHED THEN UPDATE SET payload = src.payload
        WHEN NOT MATCHED THEN INSERT *""")
      val rows = spark.table("gspjq.ns.dml")
        .select("id", "payload").collect()
        .map(r => r.getInt(0) -> r.getString(1)).toMap
      assert(rows.size == 12)
      assert((1 to 4).forall(i => rows(i) == s"m$i"))
      assert((5 to 12).forall(i => rows(i) == s"x$i"))
    }
  }

  test("null partition values group-join correctly") {
    val wh = Files.createTempDirectory("graft-spj-null").toString
    val cat = new Snaplog(wh)
    val nullable = Seq((1, "g1", "p"), (2, null, "q"), (3, null, "r"))
      .toDF("id", "grp", "payload")
    val a = LakehouseTable.create(cat, spark, "ns", "na", nullable.schema, Seq("grp"))
    a.append(nullable)
    spark.conf.set("spark.sql.catalog.gspjn", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gspjn.warehouse", wh)
    withSpjConf {
      val g = spark.table("gspjn.ns.na").groupBy("grp").agg(count(lit(1)).as("n"))
      assert(shuffles(g) == 0, g.queryExecution.executedPlan.toString)
      assert(g.collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap ==
        Map(Some("g1") -> 1L, None -> 2L))
    }
  }
}
