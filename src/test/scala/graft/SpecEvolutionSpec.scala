package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.catalog.Snaplog
import graft.sql.GraftSqlCatalog
import graft.table.LakehouseTable

/** Partition evolution ([[LakehouseTable.updateSpec]]) composing with
  * the rest of the engine: mixed-coverage reads stay exact on every
  * path (native, SQL, transform predicates), layout-attributing
  * operations refuse mixed tables loudly, and compaction restores
  * uniformity. */
class SpecEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(d: Int): Timestamp = Timestamp.valueOf(f"2024-03-$d%02d 10:00:00")

  private def fixture(ids: Int*) =
    ids.map(i => (i, s"g${i % 2}", ts(1 + (i % 4)), i * 1.5))
      .toDF("id", "grp", "ts", "v")

  private def fresh(name: String): (String, LakehouseTable) = {
    val wh = Files.createTempDirectory(s"graft-pev-$name").toString
    (wh, LakehouseTable.create(
      new Snaplog(wh), spark, "ns", name, fixture(1).schema))
  }

  test("evolve to days(ts): SQL day-window reads stay exact over mixed files") {
    val (wh, t) = fresh("days")
    t.append(fixture(1 to 8: _*))           // old spec (none)
    t.updateSpec(Seq("days(ts)"))
    t.append(fixture(9 to 16: _*))          // new spec: days(ts)
    val files = t.catalog.liveFiles("ns", "days")
    assert(files.exists(!_.partitionValues.contains("ts_day")) &&
      files.exists(_.partitionValues.contains("ts_day")))
    spark.conf.set("spark.sql.catalog.gpev", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gpev.warehouse", wh)
    // day-window filter: old files carry no ts_day — they must survive
    // pruning and filter row-level; result equals the predicate's truth
    val got = spark.sql(
      """SELECT id FROM gpev.ns.days
         WHERE ts >= TIMESTAMP '2024-03-02 00:00:00'
           AND ts <  TIMESTAMP '2024-03-03 00:00:00'
         ORDER BY id""").collect().map(_.getInt(0)).toSeq
    val exp = (1 to 16).filter(i => 1 + (i % 4) == 2)
    assert(got == exp)
    // the day-window COUNT must NOT be answered from metadata alone
    // while coverage is mixed (the forall gate declines) — value check
    val n = spark.sql(
      """SELECT COUNT(*) AS n FROM gpev.ns.days
         WHERE ts >= TIMESTAMP '2024-03-02 00:00:00'
           AND ts <  TIMESTAMP '2024-03-03 00:00:00'""")
      .collect().head.getLong(0)
    assert(n == exp.size.toLong)
  }

  test("partition overwrite and export refuse mixed coverage; compact unblocks") {
    val (_, t) = fresh("refuse")
    t.append(fixture(1, 2, 3, 4))
    t.updateSpec(Seq("grp"))
    t.append(fixture(5, 6))
    val ow = intercept[IllegalArgumentException](
      t.overwritePartitions(fixture(7, 8)))
    assert(ow.getMessage.contains("partition values"))
    val ex = intercept[IllegalArgumentException](
      graft.interop.IcebergExport.export(
        t, Files.createTempDirectory("graft-pev-ice")))
    assert(ex.getMessage.contains("predate the current partition spec"))
    t.compact()
    // both operations now work on the uniform table
    t.overwritePartitions(fixture(7, 8))
    val rep = graft.interop.IcebergExport.export(
      t, Files.createTempDirectory("graft-pev-ice2"))
    assert(rep.dataFiles > 0)
  }

  test("scan(partitionFilter) on a mixed transform field refuses with guidance") {
    val (_, t) = fresh("tfield")
    t.append(fixture(1, 2))
    t.updateSpec(Seq("days(ts)"))
    t.append(fixture(3, 4))
    val e = intercept[IllegalArgumentException](
      t.scan(partitionFilter = Map("ts_day" -> "19784")).collect())
    assert(e.getMessage.contains("compact"))
    // uniform coverage (fresh filter on covered identity column) fine
    assert(t.scan().count() == 4)
  }

  test("CALL update_partition_spec evolves via SQL, composite spec parses") {
    val (wh, t) = fresh("proc")
    t.append(fixture(1, 2, 3, 4))
    spark.conf.set("spark.sql.catalog.gpevp", classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gpevp.warehouse", wh)
    val res = spark.sql(
      "CALL gpevp.system.update_partition_spec('ns', 'proc', 'days(ts),bucket(4,id)')")
      .collect().head.getString(0)
    assert(res == "days(ts),bucket(4,id)")
    assert(t.partitionColumns == Seq("days(ts)", "bucket(4,id)"))
    t.append(fixture(5, 6))
    val newer = t.catalog.liveFiles("ns", "proc")
      .filter(_.partitionValues.contains("ts_day"))
    assert(newer.nonEmpty && newer.forall(_.partitionValues.contains("id_bucket")))
  }

  test("JDBC backend persists the evolved spec") {
    val dir = Files.createTempDirectory("graft-pev-jdbc")
    val cat = new graft.catalog.JdbcCatalog(
      s"jdbc:derby:$dir/cat;create=true", s"$dir/wh")
    val t = LakehouseTable.create(cat, spark, "ns", "j", fixture(1).schema)
    t.append(fixture(1, 2))
    t.updateSpec(Seq("days(ts)"))
    assert(cat.loadTable("ns", "j").partitionColumns == Seq("days(ts)"))
    t.append(fixture(3, 4))
    assert(cat.liveFiles("ns", "j")
      .exists(_.partitionValues.contains("ts_day")))
  }
}
