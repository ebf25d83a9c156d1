package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{IntegerType, StringType}

import graft.catalog.{JdbcCatalog, Snaplog}
import graft.sql.GraftSqlCatalog
import graft.table.LakehouseTable

/** Column DEFAULT values (Iceberg v3 initial/write-default semantics):
  * metadata-only adds where rows predating the column answer the
  * existence default — not null — in every plan shape, write defaults
  * fill rows written without the column, SET/DROP DEFAULT edits only
  * the write side, and Iceberg v2 export refuses until compaction
  * makes every file physically carry the column. */
class ColumnDefaultsSpec extends SparkSpec {
  import spark.implicits._

  private def fixture() = Seq(
    (1, "A", 10), (2, "A", 20), (3, "B", 30), (4, "C", 40)
  ).toDF("id", "group", "value")

  test("existence default fills pre-add rows; write default fills omitted columns") {
    val wh = Files.createTempDirectory("graft-dflt").toString
    val cat = new Snaplog(wh)
    val tbl = LakehouseTable.create(cat, spark, "ns", "d", fixture().schema)
    tbl.append(fixture())
    val preAdd = tbl.currentSnapshotId
    val filesBefore = cat.liveFiles("ns", "d").map(_.path).toSet
    tbl.addColumn("segment", StringType, "'legacy'")
    tbl.addColumn("prio", IntegerType, "5")
    // metadata-only: not a single file moved
    assert(cat.liveFiles("ns", "d").map(_.path).toSet == filesBefore)
    // pre-add rows answer the DEFAULT, not null — projected, filtered,
    // aggregated
    assert(tbl.scan().select("segment", "prio").collect()
      .forall(r => r.getString(0) == "legacy" && r.getInt(1) == 5))
    assert(tbl.scan().filter(col("segment") === "legacy").count() == 4)
    assert(tbl.scan().filter(col("segment").isNull).count() == 0)
    // era 2: explicit values; era 3: column omitted → WRITE default
    tbl.append(fixture().withColumn("id", $"id" + 10)
      .withColumn("segment", lit("hot")).withColumn("prio", lit(9)))
    tbl.append(fixture().withColumn("id", $"id" + 20))
    val got = tbl.scan().groupBy("segment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("legacy" -> 8L, "hot" -> 4L), got.toString)
    // explicit null stays null (a default is not a NOT NULL constraint)
    tbl.append(fixture().withColumn("id", $"id" + 30)
      .withColumn("segment", lit(null).cast(StringType))
      .withColumn("prio", lit(null).cast(IntegerType)))
    assert(tbl.scan().filter(col("segment").isNull).count() == 4)
    // time travel to the pre-add snapshot reads the current schema like
    // any graft time travel — and serves the default, consistently
    assert(tbl.scan(asOf = Some(preAdd)).select("segment").collect()
      .forall(_.getString(0) == "legacy"))
    // SET DEFAULT changes only FUTURE omitted writes; DROP ends them
    tbl.setColumnDefault("segment", Some("'warm'"))
    tbl.append(fixture().withColumn("id", $"id" + 40))
    assert(tbl.scan().filter(col("segment") === "warm").count() == 4)
    assert(tbl.scan().filter(col("segment") === "legacy").count() == 8,
      "pre-add rows must keep the EXISTENCE default across SET DEFAULT")
    tbl.setColumnDefault("segment", None)
    tbl.append(fixture().withColumn("id", $"id" + 50))
    assert(tbl.scan().filter(col("segment").isNull).count() == 8)
    // a non-constant / non-coercible default refuses loudly
    assert(intercept[Exception](
      tbl.addColumn("bad", IntegerType, "rand()")).getMessage.nonEmpty)
    assert(intercept[Exception](
      tbl.addColumn("bad2", IntegerType, "'abc'")).getMessage.nonEmpty)
    assert(!tbl.schema.fieldNames.contains("bad") &&
      !tbl.schema.fieldNames.contains("bad2"))
    // a RENAME flips the table to read-BY-ID: the missing-column
    // existence fill must keep working in id-matched plans too (the
    // defaulted column's id is absent from pre-add files either way)
    tbl.renameColumn("group", "grp")
    assert(tbl.scan().filter($"id" <= 4).select("segment", "grp").collect()
      .forall(r => r.getString(0) == "legacy" && r.getString(1) != null))
    assert(tbl.scan().filter($"segment" === "legacy").count() == 8)
  }

  test("defaults hold through SQL, MOR subtraction and the JDBC backend") {
    val wh = Files.createTempDirectory("graft-dfltsql").toString
    val cat = new Snaplog(wh)
    val tbl = LakehouseTable.create(cat, spark, "ns", "ds", fixture().schema)
    tbl.append(fixture())
    spark.conf.set("spark.sql.catalog.gdflt", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdflt.warehouse", wh)
    // the DEFAULT clause rides ALTER (previously it would have been
    // rejected — the catalog now declares SUPPORT_COLUMN_DEFAULT_VALUE)
    spark.sql("ALTER TABLE gdflt.ns.ds ADD COLUMN segment STRING DEFAULT 'legacy'")
    assert(spark.sql("SELECT segment FROM gdflt.ns.ds").collect()
      .forall(_.getString(0) == "legacy"))
    assert(spark.sql(
      "SELECT COUNT(*) FROM gdflt.ns.ds WHERE segment = 'legacy'")
      .head().getLong(0) == 4)
    // INSERT omitting the column resolves the write default in the
    // analyzer; the DEFAULT keyword resolves too
    spark.sql("INSERT INTO gdflt.ns.ds (id, group, value) VALUES (11, 'D', 50)")
    spark.sql("INSERT INTO gdflt.ns.ds VALUES (12, 'D', 60, DEFAULT)")
    spark.sql("INSERT INTO gdflt.ns.ds VALUES (13, 'E', 70, 'hot')")
    assert(spark.sql(
      "SELECT COUNT(*) FROM gdflt.ns.ds WHERE segment = 'legacy'")
      .head().getLong(0) == 6)
    // SET/DROP DEFAULT from SQL
    spark.sql("ALTER TABLE gdflt.ns.ds ALTER COLUMN segment SET DEFAULT 'warm'")
    spark.sql("INSERT INTO gdflt.ns.ds (id, group, value) VALUES (14, 'E', 80)")
    assert(spark.sql(
      "SELECT COUNT(*) FROM gdflt.ns.ds WHERE segment = 'warm'")
      .head().getLong(0) == 1)
    spark.sql("ALTER TABLE gdflt.ns.ds ALTER COLUMN segment DROP DEFAULT")
    spark.sql("INSERT INTO gdflt.ns.ds (id, group, value) VALUES (15, 'E', 90)")
    assert(spark.sql(
      "SELECT COUNT(*) FROM gdflt.ns.ds WHERE segment IS NULL")
      .head().getLong(0) == 1)
    // MOR: an outstanding equality delete subtracts; survivors keep
    // answering the default through the SQL relation
    tbl.deleteEq("id", Seq(1, 11))
    assert(spark.sql(
      "SELECT COUNT(*) FROM gdflt.ns.ds WHERE segment = 'legacy'")
      .head().getLong(0) == 4)
    assert(tbl.scan().filter(col("segment") === "legacy").count() == 4)
    // JDBC catalog backend round-trips the default metadata
    val dir = Files.createTempDirectory("graft-dfltjdbc")
    val jcat = new JdbcCatalog(s"jdbc:derby:$dir/cat;create=true", s"$dir/wh")
    val jt = LakehouseTable.create(jcat, spark, "ns", "dj", fixture().schema)
    jt.append(fixture())
    jt.addColumn("segment", StringType, "'legacy'")
    val reloaded = LakehouseTable.load(jcat, spark, "ns", "dj")
    assert(reloaded.scan().select("segment").collect()
      .forall(_.getString(0) == "legacy"))
    jt.append(fixture().withColumn("id", $"id" + 10))
    assert(reloaded.scan().filter(col("segment") === "legacy").count() == 8)
  }

  test("CREATE TABLE with DEFAULT columns; COW UPDATE on nested fields") {
    val wh = Files.createTempDirectory("graft-dfltct").toString
    spark.conf.set("spark.sql.catalog.gdfct", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdfct.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdfct.ns")
    // CREATE-time defaults ride Spark's column→schema-metadata encoding
    // into the stored schema; omitted-column INSERTs resolve them
    spark.sql(
      "CREATE TABLE gdfct.ns.ct (id INT, seg STRING DEFAULT 'fresh', n INT DEFAULT 7)")
    spark.sql("INSERT INTO gdfct.ns.ct (id) VALUES (1)")
    spark.sql("INSERT INTO gdfct.ns.ct VALUES (2, 'hot', 9)")
    val rows = spark.sql("SELECT id, seg, n FROM gdfct.ns.ct ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
    assert(rows == Seq((1, "fresh", 7), (2, "hot", 9)))
    // COW UPDATE assigning a struct LEAF rewrites whole rows through
    // the group-replacement contract — nested assignment lands, the
    // struct's other leaf and sibling rows survive
    val cat = new Snaplog(wh)
    import org.apache.spark.sql.functions.struct
    val df = Seq((1, "a", 10), (2, "b", 20)).toDF("id", "tag", "v")
      .withColumn("p", struct(col("tag").as("t"), col("v").as("x")))
    val tbl = LakehouseTable.create(cat, spark, "ns", "nu", df.schema)
    tbl.append(df)
    spark.sql("UPDATE gdfct.ns.nu SET p.x = 99 WHERE id = 1")
    val got = spark.sql("SELECT id, p.t, p.x FROM gdfct.ns.nu ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
    assert(got == Seq((1, "a", 99), (2, "b", 20)))
  }

  test("Iceberg v2 export refuses existence defaults until files carry the column") {
    val wh = Files.createTempDirectory("graft-dfltexp").toString
    val cat = new Snaplog(wh)
    val tbl = LakehouseTable.create(cat, spark, "ns", "de", fixture().schema)
    tbl.append(fixture())
    tbl.addColumn("segment", StringType, "'legacy'")
    val dest = Files.createTempDirectory("graft-dfltexp-out")
    val e = intercept[IllegalArgumentException](
      graft.interop.IcebergExport.export(tbl, dest))
    assert(e.getMessage.contains("initial-default"), e.getMessage)
    // compaction rewrites every file to physically carry the column —
    // the export unblocks and the exported values ARE the defaults
    tbl.compact()
    val rep = graft.interop.IcebergExport.export(tbl, dest)
    assert(rep.dataFiles > 0)
    val back = graft.interop.IcebergImport.register(
      cat, spark, dest, "ns", "de_back")
    assert(back.table.scan().select("segment").collect()
      .forall(_.getString(0) == "legacy"))
  }

  test("inner defaults: readers never fill nested EXISTS_DEFAULT (pinned); write-default fills omitted leaves") {
    import org.apache.spark.sql.functions.{col, struct => sstruct}
    import org.apache.spark.sql.types._
    // ---- THE REASON inner existence defaults refuse: Spark's parquet
    // reader fills EXISTS_DEFAULT for missing TOP-LEVEL columns only.
    // Write a struct{a} file, read with struct{a, b(EXISTS_DEFAULT=42)}:
    // b MUST come back null — if a Spark upgrade ever starts filling
    // it, this pin flags that the refusal can be lifted.
    val dir = Files.createTempDirectory("graft-inner-exists")
    spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(org.apache.spark.sql.Row(7))),
      StructType(Seq(StructField("props", StructType(Seq(
        StructField("a", IntegerType)))))))
      .write.mode("overwrite").parquet(dir.toString)
    val defaulted = graft.types.ColumnDefaults.foldedField(
      "b", IntegerType, "42")
    val rs = StructType(Seq(StructField("props", StructType(Seq(
      StructField("a", IntegerType), defaulted)))))
    val read = spark.read.schema(rs).parquet(dir.toString)
      .select(col("props.b")).collect()
    assert(read.forall(_.isNullAt(0)),
      "Spark now fills NESTED existence defaults — revisit the inner-" +
        "default refusal (it can become a real existence tier)")

    // ---- the WRITE-side half works: omitted leaves fill the default
    val cat = new Snaplog(Files.createTempDirectory("graft-inner-wd").toString)
    import spark.implicits._
    val base = Seq((1, "A", 10), (2, "B", 20)).toDF("id", "g", "v")
      .withColumn("evt", sstruct($"g".as("t"), $"v".as("amount")))
      .drop("g", "v")
    val tbl = LakehouseTable.create(cat, spark, "ns", "iwd", base.schema)
    tbl.append(base) // era 1 predates the leaf entirely
    tbl.addStructFieldDefaulted("evt.score", IntegerType, Some("5"))
    // era 2 OMITS the leaf: subset-struct append fills the write default
    tbl.append(base.withColumn("id", $"id" + 10))
    // era 3 carries it explicitly
    tbl.append(base.withColumn("id", $"id" + 20)
      .withColumn("evt", sstruct($"evt.t".as("t"),
        $"evt.amount".as("amount"),
        ($"id" * 2).cast(IntegerType).as("score"))))
    val rows = tbl.scan().select($"id", $"evt.score").collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) -1 else r.getInt(1))).sorted
    assert(rows.toSeq == Seq(
      (1, -1), (2, -1),        // era 1: files predate the leaf → null
      (11, 5), (12, 5),        // era 2: write default
      (21, 42), (22, 44)),     // era 3: explicit
      rows.mkString(", "))
    // SQL: inner ADD COLUMN with DEFAULT refuses with guidance
    val wh2 = cat.warehouse
    spark.conf.set("spark.sql.catalog.ginnerdef",
      classOf[graft.sql.GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.ginnerdef.warehouse", wh2)
    val e = intercept[Exception](spark.sql(
      "ALTER TABLE ginnerdef.ns.iwd ADD COLUMN evt.extra INT DEFAULT 9"))
    assert(e.getMessage.contains("top level only") ||
      e.getMessage.contains("addStructFieldDefaulted"), e.getMessage)
  }
}
