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

  test("re-parameterized transform reusing a derived field name refuses") {
    val (_, t) = fresh("reparam")
    t.updateSpec(Seq("bucket(4,id)"))
    // empty table: no file recorded id_bucket yet — re-parameterization
    // is still safe and allowed
    t.updateSpec(Seq("bucket(8,id)"))
    t.append(fixture(1 to 8: _*))
    // live files now record bucket(8) indexes under id_bucket: a width
    // change would consume them as bucket(4) values and mis-prune
    val e = intercept[IllegalArgumentException](
      t.updateSpec(Seq("bucket(4,id)")))
    assert(e.getMessage.contains("id_bucket") &&
      e.getMessage.contains("expireSnapshots"))
    // same hazard for truncate width
    val (_, t2) = fresh("reparam2")
    t2.updateSpec(Seq("truncate(2,grp)"))
    t2.append(fixture(1, 2, 3))
    val e2 = intercept[IllegalArgumentException](
      t2.updateSpec(Seq("truncate(3,grp)")))
    assert(e2.getMessage.contains("grp_trunc"))
    // different derived names are fine: days(ts) -> hours(ts) is a new
    // field; identity <-> transform moves are unaffected
    t2.updateSpec(Seq("days(ts)"))
    t2.append(fixture(4, 5))
    t2.updateSpec(Seq("hours(ts)"))
    t2.append(fixture(6, 7))
    assert(t2.scan().count() == 7)
    // unchanged parameterization (reorder / re-add of the identical
    // spec string) passes
    t.updateSpec(Seq("bucket(8,id)", "days(ts)"))
    t.append(fixture(9, 10))
    assert(t.scan().count() == 10)
    // history, not just live files, is the hazard surface: a COW
    // overwrite that drops the old files does NOT unblock while the
    // snapshots remain time-travelable
    val (_, t3) = fresh("reparam3")
    t3.updateSpec(Seq("bucket(4,id)"))
    t3.append(fixture(1, 2))
    t3.overwrite(fixture(3, 4))
    t3.compact()
    val e3 = intercept[IllegalArgumentException](
      t3.updateSpec(Seq("bucket(8,id)")))
    assert(e3.getMessage.contains("id_bucket"))
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
