package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.catalog.{JdbcCatalog, Snaplog}
import graft.sql.GraftSqlCatalog
import graft.table.LakehouseTable
import graft.types.FieldIds

/** Column RENAME / DROP via parquet field-id indirection: metadata-only
  * evolution, values served by id across the rename, no resurrection
  * after drop+re-add, loud eligibility gates. */
class FieldEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def fixture() = Seq(
    (1, "A", 1.5f, 10), (2, "A", 2.5f, 20),
    (3, "B", 3.5f, 30), (4, "C", 4.5f, 40)
  ).toDF("id", "group", "value1", "value2")

  test("managed writes stamp field ids from birth") {
    val cat = new Snaplog(Files.createTempDirectory("graft-fid").toString)
    val tbl = LakehouseTable.create(cat, spark, "ns", "w", fixture().schema)
    assert(cat.loadTable("ns", "w").properties.get(FieldIds.RegistryProp)
      .contains("id:1,group:2,value1:3,value2:4"))
    tbl.append(fixture())
    val paths = cat.liveFiles("ns", "w").map(_.path)
    assert(paths.nonEmpty &&
      paths.forall(FieldIds.fileCarriesIds(spark, _)),
      "every managed data file must carry parquet field ids")
    // the stored schema stays id-FREE until an evolution flips it
    assert(!FieldIds.hasIds(cat.loadTable("ns", "w").schema))
  }

  test("rename keeps serving values written under the old name") {
    val cat = new Snaplog(Files.createTempDirectory("graft-fidrn").toString)
    val tbl = LakehouseTable.create(cat, spark, "ns", "r", fixture().schema)
    tbl.append(fixture())                                   // snapshot 1: old name
    tbl.renameColumn("value2", "score")
    assert(tbl.schema.fieldNames.toSeq == Seq("id", "group", "value1", "score"))
    // OLD files answer under the NEW name — by id, not by name
    assert(tbl.scan().select("score").collect().map(_.getInt(0)).sorted.toSeq ==
      Seq(10, 20, 30, 40))
    assert(tbl.scan().filter(col("score") > 25).count() == 2)
    // new writes land under the new name; both eras read as one table
    tbl.append(fixture().withColumnRenamed("value2", "score")
      .withColumn("id", $"id" + 10))
    assert(tbl.scan().select("score").count() == 8)
    // time travel reads the pre-rename snapshot with the CURRENT schema
    assert(tbl.scan(asOf = Some(1L)).select("score")
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(10, 20, 30, 40))
    // upsert-style rewrite through writeCommit keeps working
    tbl.overwrite(tbl.scan().filter(col("score") <= 20))
    assert(tbl.scan().count() == 4)
    // rename back also works (ids are stable, names are labels)
    tbl.renameColumn("score", "value2")
    assert(tbl.scan().select("value2").count() == 4)
  }

  test("drop then re-add under the same name never resurrects old data") {
    val cat = new Snaplog(Files.createTempDirectory("graft-fiddrop").toString)
    val tbl = LakehouseTable.create(cat, spark, "ns", "d", fixture().schema)
    tbl.append(fixture())
    tbl.dropColumn("value2")
    assert(tbl.schema.fieldNames.toSeq == Seq("id", "group", "value1"))
    assert(tbl.scan().columns.toSeq == Seq("id", "group", "value1"))
    // re-add the SAME name: fresh field id → old files hold no such id
    tbl.addColumn("value2", org.apache.spark.sql.types.IntegerType)
    val rows = tbl.scan().select("id", "value2").collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .toMap
    assert(rows.values.forall(_.isEmpty),
      s"dropped data must NOT resurrect, got $rows")
    // new writes carry the re-added column
    tbl.append(fixture().withColumn("id", $"id" + 10))
    val rows2 = tbl.scan().filter(col("id") > 10).select("value2")
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(rows2 == Seq(10, 20, 30, 40))
  }

  test("eligibility gates: partition columns, foreign files, id-less files") {
    val cat = new Snaplog(Files.createTempDirectory("graft-fidgate").toString)
    val tbl = LakehouseTable.create(cat, spark, "ns", "g",
      fixture().schema, Seq("group"))
    tbl.append(fixture())
    // partition column rename/drop refuses
    intercept[IllegalArgumentException] { tbl.renameColumn("group", "grp") }
    intercept[IllegalArgumentException] { tbl.dropColumn("group") }
    // non-partition rename on the partitioned table is fine
    tbl.renameColumn("value2", "v2")
    assert(tbl.scan(partitionFilter = Map("group" -> "A"))
      .select("v2").collect().map(_.getInt(0)).sorted.toSeq == Seq(10, 20))

    // a table with FOREIGN files (add_files) refuses until compaction
    val foreignDir = Files.createTempDirectory("graft-fidforeign")
    fixture().coalesce(1).write.mode("overwrite").parquet(foreignDir.toString)
    val ext = LakehouseTable.create(cat, spark, "ns", "x", fixture().schema)
    ext.addFiles(graft.table.FileStats.listParquet(foreignDir.toString))
    val e = intercept[IllegalArgumentException] { ext.renameColumn("value2", "v2") }
    assert(e.getMessage.contains("outside the managed data dir"))
    // compact() rewrites everything managed + id-bearing → eligible
    ext.compact()
    val e2 = intercept[IllegalArgumentException] { ext.renameColumn("value2", "v2") }
    assert(e2.getMessage.contains("foreign history") ||
      e2.getMessage.contains("outside the managed data dir"))
    // the foreign-file HISTORY still blocks (time travel would read it);
    // expiring it clears the last gate
    cat.expireSnapshots("ns", "x", keepLast = 1)
    ext.renameColumn("value2", "v2")
    assert(ext.scan().select("v2").collect().map(_.getInt(0)).sorted.toSeq ==
      Seq(10, 20, 30, 40))
  }

  test("SQL: rename/drop, reads, inserts and COW UPDATE on the evolved table") {
    val wh = Files.createTempDirectory("graft-fidsql").toString
    val cat = new Snaplog(wh)
    LakehouseTable.create(cat, spark, "ns", "s", fixture().schema)
      .append(fixture())
    spark.conf.set("spark.sql.catalog.gfid", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfid.warehouse", wh)
    spark.sql("ALTER TABLE gfid.ns.s RENAME COLUMN value2 TO score")
    assert(spark.sql("SELECT SUM(score) FROM gfid.ns.s").head().getLong(0) == 100)
    // pushdown on the renamed column still filters correctly (residual
    // evaluation happens on id-resolved values)
    assert(spark.sql("SELECT id FROM gfid.ns.s WHERE score = 30 ")
      .head().getInt(0) == 3)
    spark.sql("INSERT INTO gfid.ns.s VALUES (9, 'D', 9.5, 90)")
    assert(spark.sql("SELECT SUM(score) FROM gfid.ns.s").head().getLong(0) == 190)
    // row-level COW on the id-bearing schema
    spark.sql("UPDATE gfid.ns.s SET score = score + 1 WHERE id = 1")
    assert(spark.sql("SELECT score FROM gfid.ns.s WHERE id = 1").head().getInt(0) == 11)
    assert(spark.sql("SELECT SUM(score) FROM gfid.ns.s").head().getLong(0) == 191)
    spark.sql("ALTER TABLE gfid.ns.s DROP COLUMN value1")
    assert(spark.sql("SELECT * FROM gfid.ns.s").columns.toSeq ==
      Seq("id", "group", "score"))
    // IF EXISTS on a missing column is a silent no-op, not an error
    spark.sql("ALTER TABLE gfid.ns.s DROP COLUMN IF EXISTS never_there")
    assert(spark.sql("SELECT * FROM gfid.ns.s").columns.toSeq ==
      Seq("id", "group", "score"))
  }

  test("COW UPDATE rewrites files id-stamped before any evolution") {
    val wh = Files.createTempDirectory("graft-fidcow").toString
    val cat = new Snaplog(wh)
    LakehouseTable.create(cat, spark, "ns", "c", fixture().schema)
      .append(fixture())
    spark.conf.set("spark.sql.catalog.gfidc", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfidc.warehouse", wh)
    // the rewrite happens while the table is still name-matched — its
    // output files must carry ids anyway, or this rename would refuse
    spark.sql("UPDATE gfidc.ns.c SET value2 = value2 + 1 WHERE id <= 2")
    assert(cat.liveFiles("ns", "c").map(_.path)
      .forall(FieldIds.fileCarriesIds(spark, _)),
      "COW-rewritten files must carry field ids")
    LakehouseTable.load(cat, spark, "ns", "c").renameColumn("value2", "v2")
    assert(spark.sql("SELECT SUM(v2) FROM gfidc.ns.c").head().getLong(0) == 102)
  }

  test("a mixed ALTER with one illegal change applies nothing") {
    val wh = Files.createTempDirectory("graft-fidmix").toString
    val cat = new Snaplog(wh)
    LakehouseTable.create(cat, spark, "ns", "m", fixture().schema, Seq("group"))
      .append(fixture())
    spark.conf.set("spark.sql.catalog.gfidm", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfidm.warehouse", wh)
    // dropping a data column AND a partition column: the statement must
    // fail WHOLE — value1 stays
    intercept[Exception] {
      spark.sql("ALTER TABLE gfidm.ns.m DROP COLUMNS (value1, group)")
    }
    assert(cat.loadTable("ns", "m").schema.fieldNames.toSeq ==
      Seq("id", "group", "value1", "value2"))
    // engine bookkeeping properties refuse from SQL (corrupting the
    // registry would remap ids under every reader)
    intercept[Exception] {
      spark.sql("ALTER TABLE gfidm.ns.m SET TBLPROPERTIES ('graft.field-ids' = 'x:9')")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gfidm.ns.m UNSET TBLPROPERTIES ('graft.last-field-id')")
    }
    assert(cat.loadTable("ns", "m").properties(FieldIds.RegistryProp) ==
      "id:1,group:2,value1:3,value2:4")
  }

  test("rename works on the JDBC catalog backend") {
    val dir = Files.createTempDirectory("graft-fidjdbc")
    val cat = new JdbcCatalog(s"jdbc:derby:$dir/cat;create=true", s"$dir/wh")
    val tbl = LakehouseTable.create(cat, spark, "ns", "j", fixture().schema)
    tbl.append(fixture())
    tbl.renameColumn("value1", "weight")
    assert(tbl.scan().select("weight").collect().map(_.getFloat(0)).sorted.toSeq ==
      Seq(1.5f, 2.5f, 3.5f, 4.5f))
    tbl.append(fixture().withColumnRenamed("value1", "weight"))
    assert(tbl.scan().count() == 8)
  }
}
