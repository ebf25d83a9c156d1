package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.Snaplog
import graft.table.LakehouseTable

/** Partial compaction ([[LakehouseTable.rewriteDataFiles]]): selected
  * files rewrite through full MOR application, everything else carries
  * by path with delete layering intact. */
class RewriteDataFilesSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(ids: Int*) =
    ids.map(i => (i, s"g${i % 2}", i * 1.5)).toDF("id", "grp", "v")

  private def fresh(name: String): LakehouseTable = {
    val wh = Files.createTempDirectory(s"graft-rw-$name").toString
    LakehouseTable.create(new Snaplog(wh), spark, "ns", name, fixture(1).schema)
  }

  test("small-file tail bin-packs; big files carry by path; content unchanged") {
    val t = fresh("binpack")
    t.append(fixture(1 to 40: _*))                 // one "big" file batch
    (41 to 44).foreach(i => t.append(fixture(i)))  // 4 tiny commits
    val before = t.catalog.liveFiles("ns", "binpack")
    val bigPaths = before.sortBy(-_.sizeBytes).take(1).map(_.path).toSet
    val smallCut = before.map(_.sizeBytes).max // everything below the max
    val snap = t.rewriteSmallFiles(smallerThanBytes = smallCut)
    val after = t.catalog.liveFiles("ns", "binpack")
    assert(after.size < before.size)
    assert(bigPaths.subsetOf(after.map(_.path).toSet), "big file must carry by path")
    assert(snap.summary("rewritten-files").toInt == before.size - bigPaths.size)
    assert(t.scan().collect().map(_.getInt(0)).sorted.toSeq == (1 to 44))
  }

  test("delete layering survives a partial rewrite") {
    val t = fresh("layer")
    t.append(fixture(1, 2))            // 1 — file A (stays un-selected)
    t.append(fixture(3, 4))            // 2 — file B (will rewrite)
    t.deleteEq("id", Seq(2, 4))        // 3 — applies to A and B
    t.append(fixture(2))               // 4 — re-insert of key 2 (file C)
    val before = t.catalog.liveFiles("ns", "layer")
    val bPath = before.find(f => f.columnStats.exists(
      _.get("id").exists(_.min == "3"))).map(_.path)
    // rewrite ONLY file B: its deleted row 4 materializes away
    val snap = t.rewriteDataFiles(f => bPath.contains(f.path))
    assert(snap.summary("carried-delete-entries").toInt == 1)
    // A's deleted row 2 must STILL be subtracted by the carried delete;
    // the re-insert of 2 (after the delete) must still be visible
    assert(t.scan().collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
    // the delete is still outstanding (carried, not retired)
    assert(t.catalog.liveDeleteFiles("ns", "layer").nonEmpty)
    // rewritten content is post-delete: full compact changes nothing
    t.compact()
    assert(t.scan().collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
  }

  test("position vectors: selected files materialize, carried files keep subtracting") {
    val t = fresh("pos")
    t.append(fixture(1, 2))   // file A
    t.append(fixture(3, 4))   // file B
    t.deleteMor(col("id").isin(2, 4)) // vector spans A and B
    val bPath = t.catalog.liveFiles("ns", "pos").find(f =>
      f.columnStats.exists(_.get("id").exists(_.min == "3"))).map(_.path)
    t.rewriteDataFiles(f => bPath.contains(f.path))
    assert(t.scan().collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 3))
  }

  test("changelog treats the partial rewrite as a content no-op") {
    val t = fresh("cl")
    t.append(fixture(1, 2)) // 1
    t.append(fixture(3))    // 2
    t.rewriteSmallFiles(Long.MaxValue) // 3 — rewrites everything selected
    t.append(fixture(4))    // 4
    val types = t.scanChanges(2L)
      .select(LakehouseTable.ChangeSnapshotCol, LakehouseTable.ChangeTypeCol)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(types == Seq((4L, LakehouseTable.ChangeInsert)))
  }

  test("old-spec migration rewrites only pre-evolution files") {
    val t = fresh("mig")
    t.append(fixture(1, 2))
    t.updateSpec(Seq("grp"))
    t.append(fixture(3, 4))
    val newSpecPaths = t.catalog.liveFiles("ns", "mig")
      .filter(_.partitionValues.contains("grp")).map(_.path).toSet
    val snap = t.rewriteOldSpecFiles()
    val after = t.catalog.liveFiles("ns", "mig")
    assert(newSpecPaths.subsetOf(after.map(_.path).toSet))
    assert(after.forall(_.partitionValues.contains("grp")),
      "migration must restore full spec coverage")
    assert(snap.summary("rewritten-files").toInt > 0)
    // empty selection now: no commit
    val cur = t.currentSnapshotId
    t.rewriteOldSpecFiles()
    assert(t.currentSnapshotId == cur)
  }

  test("partial rewrite of a days(ts) table keeps the transform layout") {
    import java.sql.Timestamp
    val wh = Files.createTempDirectory("graft-rw-days").toString
    val ev = (1 to 12).map(i =>
      (i, Timestamp.valueOf(f"2024-03-${1 + (i % 3)}%02d 10:00:00"), i * 1.5))
      .toDF("id", "ts", "v")
    val t = LakehouseTable.create(new Snaplog(wh), spark, "ns", "rwd",
      ev.schema, Seq("days(ts)"))
    (1 to 4).foreach(i => t.append(ev.filter($"id" % 4 === i % 4)))
    val before = t.catalog.liveFiles("ns", "rwd").size
    t.rewriteSmallFiles(Long.MaxValue) // bin-pack everything
    val after = t.catalog.liveFiles("ns", "rwd")
    assert(after.size < before)
    // rewritten files still record the transform tuple, so day pruning
    // keeps working and the content is unchanged
    assert(after.forall(_.partitionValues.contains("ts_day")))
    assert(after.flatMap(_.partitionValues.get("ts_day")).distinct.size == 3)
    assert(t.scan().collect().map(_.getInt(0)).sorted.toSeq == (1 to 12))
  }

  test("SQL procedure rewrites the small tail") {
    val t = fresh("proc")
    t.append(fixture(1 to 30: _*))
    (31 to 33).foreach(i => t.append(fixture(i)))
    val wh = t.catalog.asInstanceOf[Snaplog].warehouse
    spark.conf.set("spark.sql.catalog.grwp", classOf[graft.sql.GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.grwp.warehouse", wh)
    val res = spark.sql(
      s"CALL grwp.system.rewrite_data_files('ns', 'proc', ${Long.MaxValue}L)")
      .collect().head
    assert(res.getInt(1) > 0) // rewritten_files
    assert(t.scan().count() == 33)
  }

  test("a row-lineage table's partial rewrite materializes ids — selected files keep identity") {
    val wh = Files.createTempDirectory("graft-rw-lin").toString
    val cat = new Snaplog(wh)
    val t = LakehouseTable.create(cat, spark, "ns", "rlin",
      fixture(1).schema,
      properties = Map(graft.catalog.Snaplog.RowLineageProp -> "true"))
    t.append(fixture(1 to 30: _*))                // one big file
    (31 to 34).foreach(i => t.append(fixture(i))) // 4 tiny commits
    def lin() = t.scanLineage().select("id", "_row_id").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val before = lin()
    t.rewriteDataFiles(select = _.rowCount <= 1) // the tiny tail only
    assert(lin() == before,
      "the partial rewrite must not renumber the rewritten tail")
    // rewritten entries are marked, the carried big file keeps its
    // assignment
    val cur = cat.currentSnapshot("ns", "rlin").get.files
      .filterNot(_.deleteFile.contains(true))
    assert(cur.exists(_.lineageInFile.contains(true)) &&
      cur.exists(_.firstRowId.isDefined))
  }
}
