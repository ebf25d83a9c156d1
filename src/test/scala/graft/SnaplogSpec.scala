package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.{Catalog, JdbcCatalog, Snaplog}
import graft.pipeline.Upsert
import graft.table.LakehouseTable
import graft.types.SchemaInfer

/** Contract tests for the table-format layer + upsert semantics, using
  * the reference's canonical 4-column fixture (FIXTURES.md §1). Runs
  * against EVERY [[Catalog]] implementation (see the concrete suites at
  * the bottom) — catalog pluggability is the reference's whole
  * deployment story (SQLite vs PostgreSQL catalogs behind one API). */
abstract class CatalogContractSpec extends SparkSpec {
  import spark.implicits._

  def freshCatalog(checkpointInterval: Int = 100): Catalog

  /** Overwrite the OLDEST persisted snapshot row with invalid JSON —
    * used to PROVE commits and current-state planning never
    * deserialize history below the latest reset commit. */
  def corruptOldestSnapshotRow(cat: Catalog, ns: String, t: String): Unit

  private def fixture() = Seq(
    (1, "A", 1.5f, 10), (2, "A", 2.5f, 20),
    (3, "B", 3.5f, 30), (4, "C", 4.5f, 40)
  ).toDF("id", "group", "value1", "value2")

  test("create/load/list tables and namespaces") {
    val cat = freshCatalog()
    val df = fixture()
    LakehouseTable.create(cat, spark, "ns1", "t1", df.schema, Seq("group"))
    assert(cat.namespaceExists("ns1"))
    assert(cat.tableExists("ns1", "t1"))
    assert(cat.listTables("ns1") == Seq("t1"))
    val meta = cat.loadTable("ns1", "t1")
    assert(meta.partitionColumns == Seq("group"))
    assert(meta.schema.fieldNames.toSeq == Seq("id", "group", "value1", "value2"))
    // idempotent create (reference create-and-catch main-polars.py:144-148)
    LakehouseTable.create(cat, spark, "ns1", "t1", df.schema, Seq("group"))
    assert(cat.listTables("ns1") == Seq("t1"))
  }

  test("rollback restores an earlier snapshot's content metadata-only") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "rb", fixture().schema)
    tbl.append(fixture())                                  // snapshot 1
    tbl.append(fixture().withColumn("id", $"id" + 10))     // snapshot 2
    val filesAt1 = cat.liveFiles("ns", "rb", Some(1L)).map(_.path).toSet
    val snap = tbl.rollbackTo(1L)
    // metadata-only: the restore commit re-lists snapshot 1's files BY
    // PATH — no new data files written
    assert(snap.operation == "overwrite" &&
      snap.summary.get("rollback-to").contains("1"))
    assert(cat.liveFiles("ns", "rb").map(_.path).toSet == filesAt1)
    assert(tbl.scan().select("id").collect().map(_.getInt(0)).sorted.toSeq ==
      Seq(1, 2, 3, 4))
    // the rolled-back-over history stays time-travelable
    assert(tbl.scan(asOf = Some(2L)).count() == 8)
    // writes continue normally on top of the restore
    tbl.append(fixture().withColumn("id", $"id" + 20))
    assert(tbl.scan().count() == 8)
    // unknown target and WAP-staged target refuse
    intercept[IllegalArgumentException] { tbl.rollbackTo(99L) }
    tbl.appendToBranch("wip", fixture().withColumn("id", $"id" + 30))
    val stagedId = cat.refs("ns", "rb")("wip").snapshotId
    intercept[IllegalArgumentException] { tbl.rollbackTo(stagedId) }
    // a target with outstanding MOR vectors refuses (rollback would
    // resurrect its deleted rows)
    val t2 = LakehouseTable.create(cat, spark, "ns", "rbm", fixture().schema)
    t2.append(fixture())
    t2.deleteMor($"id" === 2)
    val morId = t2.currentSnapshotId
    t2.compact()
    intercept[IllegalArgumentException] { t2.rollbackTo(morId) }
    assert(t2.rollbackTo(t2.currentSnapshotId).files.nonEmpty)
  }

  test("table properties merge and unset metadata-only") {
    val cat = freshCatalog()
    LakehouseTable.create(cat, spark, "ns", "props", fixture().schema,
      properties = Map("write.target-file-size-bytes" -> "536870912"))
    cat.updateProperties("ns", "props",
      Map("owner.team" -> "ingest", "comment" -> "v1"), Seq.empty)
    // engine bookkeeping (the field-id registry) rides alongside user
    // properties — exclude it from the user-facing comparison
    def userProps() = cat.loadTable("ns", "props").properties
      .view.filterKeys(!_.startsWith("graft.")).toMap
    assert(userProps() ==
      Map("write.target-file-size-bytes" -> "536870912",
        "owner.team" -> "ingest", "comment" -> "v1"))
    // set wins over existing; unset drops after merge
    cat.updateProperties("ns", "props", Map("comment" -> "v2"),
      Seq("owner.team", "never-existed"))
    assert(userProps() ==
      Map("write.target-file-size-bytes" -> "536870912", "comment" -> "v2"))
  }

  test("append → scan round-trips rows and keeps partition column") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "t", fixture().schema, Seq("group"))
    val snap = tbl.append(fixture())
    assert(snap.operation == "append")
    assert(snap.files.map(_.rowCount).sum == 4)
    assert(snap.files.forall(_.partitionValues.contains("group")))
    val got = tbl.scan().orderBy("id").collect()
    assert(got.map(_.getAs[Int]("id")).toSeq == Seq(1, 2, 3, 4))
    assert(got.map(_.getAs[String]("group")).toSeq == Seq("A", "A", "B", "C"))
  }

  test("metadata partition pruning reads only matching files") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "t", fixture().schema, Seq("group"))
    tbl.append(fixture())
    val pruned = tbl.scan(partitionFilter = Map("group" -> "A"))
    assert(pruned.inputFiles.length < tbl.scan().inputFiles.length)
    assert(pruned.select("id").as[Int].collect().sorted.toSeq == Seq(1, 2))
  }

  test("transactional multi-append commits exactly one snapshot") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "t", fixture().schema)
    tbl.appendTransactional(Seq(fixture(), fixture(), fixture()))
    assert(cat.snapshots("ns", "t").size == 1)
    assert(tbl.scan().count() == 12)
  }

  test("overwrite resets live set; history keeps all snapshots") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "t", fixture().schema)
    tbl.append(fixture())
    tbl.overwrite(fixture().filter($"group" === "A"))
    assert(tbl.scan().count() == 2)
    val hist = tbl.history.orderBy("snapshot_id").collect()
    assert(hist.map(_.getAs[String]("operation")).toSeq == Seq("append", "overwrite"))
    assert(hist.map(_.getAs[Long]("num_records")).toSeq == Seq(4L, 2L))
  }

  test("time travel reads the file set of an old snapshot") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "t", fixture().schema)
    tbl.append(fixture())
    tbl.append(fixture().withColumn("id", $"id" + 100))
    assert(tbl.scan(asOf = Some(1L)).count() == 4)
    assert(tbl.scan().count() == 8)
    tbl.overwrite(fixture().limit(1))
    assert(tbl.scan(asOf = Some(2L)).count() == 8)
    assert(tbl.scan().count() == 1)
  }

  test("copy-on-write delete rewrites only affected files") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "t", fixture().schema, Seq("group"))
    tbl.append(fixture())
    val before = cat.liveFiles("ns", "t").map(_.path).toSet
    val snap = tbl.delete($"group" === "A" && $"value2" === 10)
    assert(snap.operation == "delete")
    assert(snap.summary("deleted-rows") == "1")
    val after = cat.liveFiles("ns", "t").map(_.path).toSet
    // B and C partition files carry over byte-identical; only A rewrote
    assert(before.intersect(after).nonEmpty)
    assert(tbl.scan().count() == 3)
    assert(tbl.scan().filter($"group" === "A").count() == 1)
    // time travel still sees the pre-delete snapshot
    assert(tbl.scan(asOf = Some(1L)).count() == 4)
  }

  test("delete with no matches is a recorded no-op") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "t", fixture().schema)
    tbl.append(fixture())
    val before = cat.liveFiles("ns", "t").map(_.path).toSet
    val snap = tbl.delete($"value2" > 1000)
    assert(snap.summary("deleted-rows") == "0")
    assert(cat.liveFiles("ns", "t").map(_.path).toSet == before)
    assert(tbl.scan().count() == 4)
  }

  test("add_files registers pre-existing parquet without copying") {
    val cat = freshCatalog()
    val dir = Files.createTempDirectory("graft-ext")
    val ext = s"$dir/ext.parquet"
    fixture().coalesce(1).write.parquet(ext)
    val tbl = LakehouseTable.create(cat, spark, "ns", "t", fixture().schema)
    import scala.jdk.CollectionConverters._
    val parquetFiles = Files.list(java.nio.file.Paths.get(ext)).iterator().asScala
      .map(_.toString).filter(_.endsWith(".parquet")).toSeq
    val snaps = tbl.addFiles(parquetFiles)
    assert(snaps.head.operation == "add_files")
    assert(tbl.scan().count() == 4)
  }

  test("upsert: new rows win per key, others unchanged (upsert.py:100-112 fixture)") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "t", fixture().schema, Seq("group"))
    tbl.append(fixture())
    val patch = Seq((2, "A", 99.9f, 222), (5, "D", 5.5f, 50))
      .toDF("id", "group", "value1", "value2")
    Upsert.upsertTable(tbl, patch, Seq("id"))
    val got = tbl.scan().orderBy("id").collect()
    assert(got.length == 5)
    assert(got.find(_.getInt(0) == 2).get.getInt(3) == 222)   // replaced
    assert(got.find(_.getInt(0) == 1).get.getInt(3) == 10)    // untouched
    assert(got.find(_.getInt(0) == 5).get.getString(1) == "D") // inserted
  }

  test("upsert is idempotent (same patch twice ≡ once)") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "t", fixture().schema)
    tbl.append(fixture())
    val patch = Seq((2, "A", 99.9f, 222)).toDF("id", "group", "value1", "value2")
    Upsert.upsertTable(tbl, patch, Seq("id"))
    val once = tbl.scan().orderBy("id").collect().toSeq
    Upsert.upsertTable(tbl, patch, Seq("id"))
    val twice = tbl.scan().orderBy("id").collect().toSeq
    assert(once == twice)
  }

  test("upsert tiebreak picks highest within incoming batch") {
    val incoming = Seq((1, "A", 1.0f, 1), (1, "A", 2.0f, 7), (2, "B", 3.0f, 3))
      .toDF("id", "group", "value1", "value2")
    val deduped = Upsert.dedupIncoming(incoming, Seq("id"), tiebreak = Some("value2"))
      .orderBy("id").collect()
    assert(deduped.length == 2)
    assert(deduped.head.getInt(3) == 7)
  }

  test("schema inference: reference 3-way policy + fallback") {
    val in = StructType(Seq(
      StructField("a", ShortType), StructField("b", LongType),
      StructField("c", FloatType), StructField("d", DoubleType),
      StructField("e", StringType), StructField("f", TimestampType),
      StructField("g", ArrayType(FloatType))))
    val out = SchemaInfer.referencePolicy(in)
    assert(out.fields.map(_.dataType).toSeq == Seq(IntegerType, LongType,
      FloatType, DoubleType, StringType, StringType, StringType))
  }

  test("incremental read returns exactly the post-snapshot delta; resets rejected") {
    val cat = freshCatalog()
    val df1 = spark.range(0, 10).toDF("id")
    val df2 = spark.range(10, 15).toDF("id")
    val df3 = spark.range(15, 18).toDF("id")
    val table = LakehouseTable.create(cat, spark, "ns", "incr", df1.schema)
    table.append(df1)
    table.append(df2)
    table.append(df3)
    assert(table.scanIncremental(1L).select("id").collect().map(_.getLong(0)).sorted
      === (10L until 18L).toArray)
    assert(table.scanIncremental(1L, Some(2L)).count() === 5)
    assert(table.scanIncremental(3L).count() === 0) // empty delta
    table.overwrite(df1)
    intercept[IllegalArgumentException] { table.scanIncremental(2L) }
  }

  test("applyChanges: one snapshot applies deletes, updates, inserts atomically") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "t", fixture().schema)
    tbl.append(fixture())
    val nSnaps = tbl.history.count()
    val changes = Seq(
      (1, "A", 0.0f, 0, "D"),     // delete id 1
      (2, "A", 9.9f, 99, "U"),    // update id 2
      (5, "D", 5.5f, 50, "I")     // insert id 5
    ).toDF("id", "group", "value1", "value2", "op")
    Upsert.applyChanges(tbl, changes, Seq("id"))
    assert(tbl.history.count() == nSnaps + 1) // the whole feed = ONE commit
    val got = tbl.scan().orderBy("id")
      .collect().map(r => (r.getAs[Int]("id"), r.getAs[Int]("value2"))).toSeq
    assert(got == Seq((2, 99), (3, 30), (4, 40), (5, 50)))
  }

  test("applyChanges: winning op per key decides delete vs upsert; null op upserts") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "t", fixture().schema)
    tbl.append(fixture())
    val changes = Seq(
      (1, "A", 1.1f, 11, Some("U"), 1),  // id 1: upsert at seq 1 …
      (1, "A", 0.0f, 0, Some("D"), 2),   //   … then delete at seq 2 → deleted
      (2, "A", 0.0f, 0, Some("D"), 1),   // id 2: delete at seq 1 …
      (2, "A", 2.2f, 22, Some("U"), 2),  //   … then upsert at seq 2 → lives
      (5, "D", 5.5f, 50, None, 1)        // id 5: null op → plain upsert
    ).toDF("id", "group", "value1", "value2", "op", "seq")
    Upsert.applyChanges(tbl, changes, Seq("id"), tiebreak = Some("seq"))
    val got = tbl.scan().orderBy("id")
      .collect().map(r => (r.getAs[Int]("id"), r.getAs[Int]("value2"))).toSeq
    assert(got == Seq((2, 22), (3, 30), (4, 40), (5, 50)))
  }

  test("overwritePartitions replaces a null partition instead of duplicating it") {
    val cat = freshCatalog()
    val df = Seq((1, Some("A"), 10), (2, None, 20), (3, None, 30))
      .toDF("id", "group", "value2")
    val tbl = LakehouseTable.create(cat, spark, "ns", "t", df.schema, Seq("group"))
    tbl.append(df)
    // patch the null partition; group=A must carry, old null files must not
    tbl.overwritePartitions(Seq((9, None: Option[String], 90))
      .toDF("id", "group", "value2"))
    val rows = tbl.scan().orderBy("id")
      .collect().map(r => (r.getAs[Int]("id"), r.getAs[Int]("value2"))).toSeq
    assert(rows == Seq((1, 10), (9, 90)))
    val nullFiles = cat.liveFiles("ns", "t")
      .filter(_.partitionValues.get("group").contains(Snaplog.HiveDefaultPartition))
    assert(nullFiles.nonEmpty)
  }

  test("overwritePartitions refuses files it cannot attribute to a partition") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "t", fixture().schema, Seq("group"))
    val dir = Files.createTempDirectory("graft-ext2")
    fixture().coalesce(1).write.parquet(s"$dir/ext.parquet")
    import scala.jdk.CollectionConverters._
    val parquetFiles = Files.list(java.nio.file.Paths.get(s"$dir/ext.parquet"))
      .iterator().asScala.map(_.toString).filter(_.endsWith(".parquet")).toSeq
    tbl.addFiles(parquetFiles) // registered with no partitionValues
    intercept[IllegalArgumentException] {
      tbl.overwritePartitions(Seq((9, "A", 9.5f, 90)).toDF("id", "group", "value1", "value2"))
    }
  }

  test("expireSnapshots folds the streaming high-water mark forward") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "t", fixture().schema)
    cat.commit("ns", "t", Snaplog.OpAppend, Seq.empty,
      Map(Snaplog.StreamBatchKey -> "7"))
    tbl.overwrite(fixture()) // reset base so expiration is legal
    assert(tbl.maxSummaryValue(Snaplog.StreamBatchKey).contains(7L))
    cat.expireSnapshots("ns", "t", keepLast = 1)
    // the dropped snapshot carried the mark; it must survive expiration
    assert(tbl.maxSummaryValue(Snaplog.StreamBatchKey).contains(7L))
  }

  test("overwritePartitions rewrites only touched partitions, carries the rest by path") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "t", fixture().schema, Seq("group"))
    tbl.append(fixture())
    val before = cat.liveFiles("ns", "t")
      .filterNot(_.partitionValues.get("group").contains("A"))
      .map(_.path).toSet
    tbl.overwritePartitions(Seq((9, "A", 9.5f, 90)).toDF("id", "group", "value1", "value2"))
    val after = cat.liveFiles("ns", "t")
    // B and C files are the SAME files (no rewrite); A is replaced
    assert(after.filterNot(_.partitionValues.get("group").contains("A"))
      .map(_.path).toSet == before)
    val rows = tbl.scan().orderBy("id")
      .collect().map(r => (r.getAs[Int]("id"), r.getAs[String]("group"))).toSeq
    assert(rows == Seq((3, "B"), (4, "C"), (9, "A")))
    intercept[IllegalArgumentException] {
      val unpart = LakehouseTable.create(cat, spark, "ns", "u", fixture().schema)
      unpart.overwritePartitions(fixture())
    }
  }

  test("refs: tags immutable, branches retarget, expiration refuses orphaned refs") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "t", fixture().schema)
    tbl.append(fixture())                      // snap 1
    tbl.tag("v1")
    tbl.overwrite(fixture().filter($"id" > 2)) // snap 2
    tbl.setBranch("dev", 2L)
    assert(tbl.scanRef("v1").count() == 4)
    assert(tbl.scanRef("dev").count() == 2)
    // tags cannot be re-pointed; branches can
    intercept[IllegalArgumentException] { cat.setRef("ns", "t", "v1", 2L) }
    tbl.setBranch("dev", 1L)
    assert(tbl.scanRef("dev").count() == 4)
    // unknown refs and refs to unknown snapshots fail loudly
    intercept[IllegalArgumentException] { tbl.scanRef("nope") }
    intercept[IllegalArgumentException] { cat.setRef("ns", "t", "x", 99L) }
    // expiring history out from under a ref is refused until it's dropped
    intercept[IllegalArgumentException] { cat.expireSnapshots("ns", "t", 1) }
    cat.dropRef("ns", "t", "v1")
    cat.setRef("ns", "t", "dev", 2L)
    assert(cat.expireSnapshots("ns", "t", 1).map(_.snapshotId) == Seq(2L))
  }

  test("deleteMor with outstanding equality deletes: one pass, exact summary, visible-only vector") {
    // round 18: positions come from the MOR-applied assembly, so the
    // summary counts only VISIBLE matches (no second count scan) and
    // rows an outstanding eq delete already removed never re-record
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "dm1", fixture().schema)
    tbl.append(fixture())              // 1: ids 1..4 (value2 10..40)
    tbl.deleteEq("id", Seq(3, 4))      // 2: eq-deletes ids 3,4
    tbl.append(fixture().filter($"id" === 4)) // 3: re-insert id 4 (survives)
    // vector delete matches value2 >= 20 → raw rows 2,3,4(old),4(new);
    // visible matches are 2 and the re-inserted 4 only
    val snap = tbl.deleteMor($"value2" >= 20)
    assert(snap.summary("deleted-rows") == "2")
    val vecs = cat.liveDeleteFiles("ns", "dm1").filter(_.equalityKey.isEmpty)
    assert(vecs.map(_.rowCount).sum == 2,
      "vector must record only MOR-visible matches")
    assert(tbl.scan().collect().map(_.getInt(0)).toSeq == Seq(1))
    // re-delete: nothing visible matches any more
    assert(tbl.deleteMor($"value2" >= 20).summary("deleted-rows") == "0")
    assert(tbl.scan().collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("merge-on-read delete: data files untouched, compact materializes") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "t", fixture().schema, Seq("group"))
    tbl.append(fixture())
    val before = cat.liveFiles("ns", "t").map(_.path).toSet
    val snap = tbl.deleteMor($"value2" >= 30)
    assert(snap.operation == "mor_delete")
    assert(snap.summary("deleted-rows") == "2")
    // NOT a rewrite: the data file set is byte-identical
    assert(cat.liveFiles("ns", "t").map(_.path).toSet == before)
    assert(cat.liveDeleteFiles("ns", "t").size == 1)
    assert(tbl.scan().collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
    // time travel before the delete still sees everything
    assert(tbl.scan(asOf = Some(1L)).count() == 4)
    // re-deleting already-deleted rows records nothing twice
    assert(tbl.deleteMor($"value2" >= 30).summary("deleted-rows") == "0")
    // compaction (a reset commit) materializes and retires the vector
    tbl.compact()
    assert(cat.liveDeleteFiles("ns", "t").isEmpty)
    assert(tbl.scan().collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
  }

  test("cow delete after mor delete materializes — no resurrection") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "t", fixture().schema)
    tbl.append(fixture())
    tbl.deleteMor($"id" === 1)
    // the COW delete resets the live set; the MOR-deleted row must not
    // come back through carried files
    val snap = tbl.delete($"id" === 4)
    assert(snap.summary("materialized-mor") == "true")
    // the summary count rides the rewrite's own job (round 18,
    // Dataset.observe) and counts VISIBLE matches exactly — row 1 is
    // already MOR-deleted and must not inflate it; and the observe
    // aggregate must sit below the !condition filter (a pushed-down
    // filter would zero it)
    assert(snap.summary("deleted-rows") == "1")
    assert(cat.liveDeleteFiles("ns", "t").isEmpty)
    assert(tbl.scan().collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 3))
  }

  test("racing committers serialize: every snapshot lands, ids stay dense") {
    val cat = freshCatalog()
    LakehouseTable.create(cat, spark, "ns", "race", fixture().schema)
    val perThread = 20
    val threads = (1 to 4).map { i =>
      new Thread(() => {
        (1 to perThread).foreach { j =>
          cat.commit("ns", "race", Snaplog.OpAppend, Seq.empty,
            Map("writer" -> s"$i", "n" -> s"$j"))
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val snaps = cat.snapshots("ns", "race")
    assert(snaps.size == 4 * perThread)
    // dense monotonic ids and a consistent parent chain — no lost update
    assert(snaps.map(_.snapshotId) == (1L to 4L * perThread))
    assert(snaps.map(_.parentId) == (0L until 4L * perThread).map(i =>
      if (i == 0) None else Some(i)))
  }

  test("conditional commit fails with CommitConflictException on a stale base") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "cas", fixture().schema)
    tbl.append(fixture()) // snapshot 1
    // a writer that read snapshot 1 commits fine…
    cat.commit("ns", "cas", Snaplog.OpAppend, Seq.empty,
      expectedSnapshotId = Some(1L)) // snapshot 2
    // …but a writer still holding base=1 now conflicts instead of clobbering
    intercept[graft.catalog.CommitConflictException] {
      cat.commit("ns", "cas", Snaplog.OpOverwrite, Seq.empty,
        expectedSnapshotId = Some(1L))
    }
    assert(cat.snapshots("ns", "cas").size == 2)
  }

  test("time-based expiration keeps young snapshots and honors retainLast") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "t", fixture().schema)
    tbl.append(fixture())          // snapshot 1 (old)
    tbl.overwrite(fixture())       // snapshot 2 (reset base)
    tbl.append(fixture())          // snapshot 3
    val cut = cat.snapshots("ns", "t").find(_.snapshotId == 2L).get.timestampMs
    // everything from snapshot 2 on is "young": only snapshot 1 expires
    val kept = cat.expireSnapshotsOlderThan("ns", "t", olderThanMs = cut)
    assert(kept.map(_.snapshotId) == Seq(2L, 3L))
    // a cutoff in the future would drop everything — retainLast floors it
    val kept2 = cat.expireSnapshotsOlderThan("ns", "t",
      olderThanMs = System.currentTimeMillis() + 1000000L, retainLast = 2)
    assert(kept2.map(_.snapshotId) == Seq(2L, 3L))
    assert(tbl.scan().count() == 8)
  }

  test("write.distribution-mode clusters partitioned writes") {
    val cat = freshCatalog()
    // default mode: caller's partitioning stands — 4 input tasks × 3
    // partition values can fan out past 3 files
    val wide = fixture().repartition(4)
    val none = LakehouseTable.create(cat, spark, "ns", "dmn",
      fixture().schema, Seq("group"))
    none.append(wide)
    val noneFiles = cat.liveFiles("ns", "dmn").size
    // hash mode: each partition tuple lands in ONE task — exactly one
    // file per partition value regardless of input task count
    val hash = LakehouseTable.create(cat, spark, "ns", "dmh",
      fixture().schema, Seq("group"))
    cat.updateProperties("ns", "dmh",
      Map("write.distribution-mode" -> "hash"), Seq.empty)
    hash.append(wide)
    assert(cat.liveFiles("ns", "dmh").size == 3,
      s"hash mode must write one file per partition value, " +
        s"got ${cat.liveFiles("ns", "dmh").size} (default mode: $noneFiles)")
    assert(hash.scan().count() == 4)
    // range mode composes with write.sort-order and stays exact
    val range = LakehouseTable.create(cat, spark, "ns", "dmr",
      fixture().schema, Seq("group"))
    cat.updateProperties("ns", "dmr",
      Map("write.distribution-mode" -> "range",
        "write.sort-order" -> "id"), Seq.empty)
    range.append(wide)
    assert(range.scan().count() == 4)
    assert(range.scan().select("id").collect().map(_.getInt(0)).sorted
      .toSeq == Seq(1, 2, 3, 4))
    // unknown mode refuses loudly at write time
    val bad = LakehouseTable.create(cat, spark, "ns", "dmb",
      fixture().schema, Seq("group"))
    cat.updateProperties("ns", "dmb",
      Map("write.distribution-mode" -> "shuffle"), Seq.empty)
    intercept[IllegalArgumentException](bad.append(wide))
  }

  test("partition statistics file: per-partition counts, spec field ids") {
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    import org.json4s._
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "ps",
      fixture().schema, Seq("group"))
    tbl.append(fixture())
    val dest = Files.createTempDirectory("graft-ice-ps")
    graft.interop.IcebergExport.export(tbl, dest)
    val meta = org.json4s.jackson.JsonMethods.parse(Files.readString(
      graft.util.Fs.walkList(dest.resolve("metadata"))
        .filter(_.getFileName.toString.endsWith(".metadata.json"))
        .maxBy(_.getFileName.toString)))
    val entry = (meta \ "partition-statistics").asInstanceOf[JArray].arr.head
    assert((entry \ "snapshot-id").extract[Long] == 1L)
    val p = (entry \ "statistics-path").extract[String]
    assert((entry \ "file-size-in-bytes").extract[Long] ==
      Files.size(java.nio.file.Paths.get(p)))
    // the file is ONE typed parquet of per-partition counts
    val rows = spark.read.parquet(p)
      .selectExpr("partition.group AS g", "spec_id", "data_record_count",
        "data_file_count", "total_data_file_size_in_bytes")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(rows == Seq(("A", 0, 2L), ("B", 0, 1L), ("C", 0, 1L)), s"got $rows")
    // spec field ids are stamped (partition struct inner ids 1000+)
    assert(graft.types.FieldIds.fileCarriesIds(spark, p))
    // unpartitioned tables emit no partition-statistics entry
    val u = LakehouseTable.create(cat, spark, "ns", "psu", fixture().schema)
    u.append(fixture())
    val destU = Files.createTempDirectory("graft-ice-psu")
    graft.interop.IcebergExport.export(u, destU)
    val metaU = org.json4s.jackson.JsonMethods.parse(Files.readString(
      graft.util.Fs.walkList(destU.resolve("metadata"))
        .filter(_.getFileName.toString.endsWith(".metadata.json"))
        .maxBy(_.getFileName.toString)))
    assert((metaU \ "partition-statistics") == JNothing)
  }

  test("sort order round-trips: write.sort-order exports, import adopts") {
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    import org.json4s._
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "so", fixture().schema)
    cat.updateProperties("ns", "so",
      Map("write.sort-order" -> "group,id"), Seq.empty)
    tbl.append(fixture())
    val dest = Files.createTempDirectory("graft-ice-so")
    graft.interop.IcebergExport.export(tbl, dest)
    val metaFile = graft.util.Fs.walkList(dest.resolve("metadata"))
      .filter(_.getFileName.toString.endsWith(".metadata.json"))
      .maxBy(_.getFileName.toString)
    val meta = org.json4s.jackson.JsonMethods.parse(Files.readString(metaFile))
    assert((meta \ "default-sort-order-id").extract[Int] == 1)
    val orders = (meta \ "sort-orders").asInstanceOf[JArray].arr
    val declared = orders.find(o => (o \ "order-id").extract[Int] == 1).get
    val fs = (declared \ "fields").asInstanceOf[JArray].arr
    assert(fs.map(f => ((f \ "source-id").extract[Int],
      (f \ "transform").extract[String], (f \ "direction").extract[String],
      (f \ "null-order").extract[String])) ==
      List((2, "identity", "asc", "nulls-first"),
        (1, "identity", "asc", "nulls-first")),
      org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(declared)))
    // import adopts the exact-expressible order as write.sort-order
    val imp = graft.interop.IcebergImport.register(
      cat, spark, dest, "ns", "so_rt")
    assert(cat.loadTable("ns", "so_rt").properties
      .get("write.sort-order").contains("group,id"))
    assert(imp.table.scan().count() == 4)
    // a stale property naming a dropped/unknown column degrades to the
    // unsorted order instead of exporting a dangling source-id
    cat.updateProperties("ns", "so",
      Map("write.sort-order" -> "group,ghost"), Seq.empty)
    val dest2 = Files.createTempDirectory("graft-ice-so2")
    graft.interop.IcebergExport.export(tbl, dest2)
    val meta2 = org.json4s.jackson.JsonMethods.parse(Files.readString(
      graft.util.Fs.walkList(dest2.resolve("metadata"))
        .filter(_.getFileName.toString.endsWith(".metadata.json"))
        .maxBy(_.getFileName.toString)))
    assert((meta2 \ "default-sort-order-id").extract[Int] == 0)
  }

  test("iceberg export emits a walkable v2 metadata tree") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "t", fixture().schema, Seq("group"))
    tbl.append(fixture())
    tbl.append(fixture().withColumn("id", $"id" + 10))
    val dest = Files.createTempDirectory("graft-ice")
    val rep = graft.interop.IcebergExport.export(tbl, dest)
    assert(rep.manifests == 2) // one per snapshot
    // walk it back like a third-party reader
    val rb = graft.interop.IcebergExport.readBack(dest)
    assert(rb.formatVersion == 2)
    assert(rb.nSchemaFields == 4 && rb.nSpecFields == 1)
    assert(rb.nSnapshots == 2 && rb.currentOperation == "append")
    assert(rb.totalRecords == 8)
    assert(rb.dataFilesExist) // metadata-only: files referenced in place
    // manifests are real Avro containers, not JSON with avro names
    import scala.jdk.CollectionConverters._
    val listFiles = Files.list(dest.resolve("metadata")).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(listFiles.exists(_.endsWith(".manifest-list.avro")))
    val firstAvro = dest.resolve("metadata").resolve(
      listFiles.filter(_.endsWith(".avro")).min)
    val magic = Files.readAllBytes(firstAvro).take(4)
    assert(magic.sameElements("Obj".getBytes :+ 1.toByte),
      "avro container magic Obj\\x01 expected")
    // an export with OUTSTANDING delete vectors emits a REAL v2 delete
    // manifest (round 13): the vector rewrites to the spec's
    // (file_path, pos) shape, and the tree round-trips through import
    // with the subtraction intact — no compact-first tax
    tbl.deleteMor($"id" === 1)
    val dMor = Files.createTempDirectory("graft-ice2")
    val repMor = graft.interop.IcebergExport.export(tbl, dMor)
    assert(repMor.deleteFiles == 1L)
    val rbMor = graft.interop.IcebergExport.readBack(dMor)
    assert(rbMor.nPositionDeleteFiles == 1 && rbMor.deleteRecords == 1)
    assert(rbMor.totalRecords == 8) // gross data rows; the delete nets 1
    val impMor = graft.interop.IcebergImport.register(
      cat, spark, dMor, "ns", "t_mor_rt")
    assert(impMor.positionDeleteFiles == 1)
    assert(impMor.table.scan().count() == 7)
    assert(impMor.table.scan().filter($"id" === 1).count() == 0)
    tbl.compact()
    val rb2 = graft.interop.IcebergExport.readBack {
      val d2 = Files.createTempDirectory("graft-ice3")
      graft.interop.IcebergExport.export(tbl, d2); d2
    }
    assert(rb2.totalRecords == 7)
    // the vector-window snapshot now EXPORTS (with its delete
    // manifest): all four of append/append/mor_delete/replace appear,
    // and the CURRENT window is clean after compaction
    assert(tbl.catalog.snapshots(tbl.namespace, tbl.name).size == 4)
    assert(rb2.nSnapshots == 4,
      s"delete-bearing history must export now, got ${rb2.nSnapshots}")
    assert(rb2.nPositionDeleteFiles == 0 && rb2.nEqualityDeleteFiles == 0)
  }

  test("iceberg MOR interop: equality deletes round-trip; foreign delete tree imports") {
    // ---- leg 1: graft-written MOR state exports as v2 delete manifests
    // and re-imports with the subtraction intact. The mergeDelta commit
    // is the hard ordering case: ONE commit listing [eq-delete, data],
    // where the batch's own rows must SURVIVE the delete (they carry a
    // higher per-listing sequence in the export).
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "mor1", fixture().schema)
    tbl.append(fixture()) // ids 1..4
    tbl.mergeDelta(Seq("id"), Seq(
      (3, "B", 9.5f, 99), (5, "E", 5.5f, 50)
    ).toDF("id", "group", "value1", "value2")) // upsert 3, insert 5
    tbl.deleteEq("group", Seq("A")) // drops ids 1, 2
    val expected = tbl.scan().select("id", "value2").collect()
      .map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
    assert(expected == Seq((3, 99), (4, 40), (5, 50)))
    val dest = Files.createTempDirectory("graft-mor-rt")
    val rep = graft.interop.IcebergExport.export(tbl, dest)
    assert(rep.deleteFiles == 2L, s"two eq-delete files, got ${rep.deleteFiles}")
    val rb = graft.interop.IcebergExport.readBack(dest)
    assert(rb.nEqualityDeleteFiles == 2 && rb.nPositionDeleteFiles == 0)
    val imp = graft.interop.IcebergImport.register(cat, spark, dest, "ns", "mor1_rt")
    assert(imp.equalityDeleteFiles == 2)
    assert(imp.table.scan().select("id", "value2").collect()
      .map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq == expected)
    // time-travel history also exported: snapshot 2 (post-merge) nets
    // the upsert but not the later group delete
    assert(rb.nSnapshots == 3)

    // ---- leg 2: a FOREIGN-shaped tree — delete file recording
    // PyIceberg-style file:// URIs and a `pos` column, with entry
    // sequence numbers left null (inherited from the manifest list) —
    // imports with the position subtracted. Forged against the export
    // tree of a clean table, the shapes a real writer emits.
    val t2 = LakehouseTable.create(cat, spark, "ns", "mor2", fixture().schema)
    t2.append(fixture())
    val dest2 = Files.createTempDirectory("graft-mor-foreign")
    graft.interop.IcebergExport.export(t2, dest2)
    val metaDir = dest2.resolve("metadata")
    import scala.jdk.CollectionConverters._
    // the single data file, as the manifest records it (plain path)
    val dataPath = cat.liveFiles("ns", "mor2").head.path
    // forge a position-delete parquet: URI-form path + `pos`, the
    // PyIceberg/Java writer shape (row 0 = id 1 after the sorted write)
    val delDir = dest2.resolve("deletes")
    Files.createDirectories(delDir)
    spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row("file://" + dataPath, 0L)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("file_path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("pos",
          org.apache.spark.sql.types.LongType))))
      .repartition(1).write.mode("overwrite").parquet(delDir.resolve("pd").toString)
    val posFile = graft.table.FileStats.listParquet(delDir.resolve("pd").toString).head
    // forge the delete manifest (entry sequence_number NULL → inherits)
    val entrySchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int","field-id":0},
        |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
        |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
        |{"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |{"name":"content","type":"int","field-id":134},
        |{"name":"file_path","type":"string","field-id":100},
        |{"name":"file_format","type":"string","field-id":101},
        |{"name":"partition","type":{"type":"record","name":"r102","fields":[]},"field-id":102},
        |{"name":"record_count","type":"long","field-id":103},
        |{"name":"file_size_in_bytes","type":"long","field-id":104}
        |]},"field-id":2}]}""".stripMargin)
    val dfRec = new org.apache.avro.generic.GenericData.Record(
      entrySchema.getField("data_file").schema())
    dfRec.put("content", 1) // POSITION DELETES
    dfRec.put("file_path", "file://" + posFile)
    dfRec.put("file_format", "PARQUET")
    dfRec.put("partition", new org.apache.avro.generic.GenericData.Record(
      entrySchema.getField("data_file").schema().getField("partition").schema()))
    dfRec.put("record_count", 1L)
    dfRec.put("file_size_in_bytes", Files.size(java.nio.file.Paths.get(posFile)))
    val entry = new org.apache.avro.generic.GenericData.Record(entrySchema)
    entry.put("status", 1)
    entry.put("snapshot_id", 1L)
    entry.put("sequence_number", null) // inherit from the manifest list
    entry.put("file_sequence_number", null)
    entry.put("data_file", dfRec)
    val delManifest = metaDir.resolve("manifest-foreign-deletes.avro")
    locally {
      val w = new org.apache.avro.file.DataFileWriter(
        new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](entrySchema))
      w.setMeta("format-version", "2"); w.setMeta("content", "deletes")
      w.create(entrySchema, delManifest.toFile)
      try w.append(entry) finally w.close()
    }
    // splice the delete manifest into the manifest list with a HIGHER
    // sequence than the data manifest
    val hint = Files.readString(metaDir.resolve("version-hint.text")).trim
    val metaJson = Files.readString(metaDir.resolve(s"v$hint.metadata.json"))
    val listPath = java.nio.file.Paths.get(
      """"manifest-list" : "([^"]+)"""".r.findFirstMatchIn(metaJson).get.group(1))
    val listRecs = {
      val r = new org.apache.avro.file.DataFileReader(listPath.toFile,
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      try r.iterator.asScala.toVector finally r.close()
    }
    val mfSchema = listRecs.head.getSchema
    val delMf = new org.apache.avro.generic.GenericData.Record(mfSchema)
    delMf.put("manifest_path", delManifest.toString)
    delMf.put("manifest_length", Files.size(delManifest))
    delMf.put("partition_spec_id", 0)
    delMf.put("content", 1)
    delMf.put("sequence_number", 99L) // inherited by the null-seq entry
    delMf.put("min_sequence_number", 99L)
    delMf.put("added_snapshot_id", 1L)
    delMf.put("added_files_count", 1)
    delMf.put("existing_files_count", 0)
    delMf.put("deleted_files_count", 0)
    delMf.put("added_rows_count", 1L)
    delMf.put("existing_rows_count", 0L)
    delMf.put("deleted_rows_count", 0L)
    locally {
      val w = new org.apache.avro.file.DataFileWriter(
        new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](mfSchema))
      w.create(mfSchema, listPath.toFile)
      try { listRecs.foreach(w.append); w.append(delMf) } finally w.close()
    }
    val imp2 = graft.interop.IcebergImport.register(
      cat, spark, dest2, "ns", "mor2_rt")
    assert(imp2.positionDeleteFiles == 1)
    assert(imp2.table.scan().count() == 3)
    // exactly the row at position 0 of the data file is gone
    val gone = spark.read.parquet(dataPath)
      .select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("_metadata.row_index").as("ri"))
      .filter($"ri" === 0L).collect().head.getInt(0)
    assert(imp2.table.scan().filter($"id" === gone).count() == 0)
  }

  test("iceberg import: PARTITION-SCOPED foreign equality delete re-expresses as a composite key") {
    // A Flink-style eq delete written under the DATA spec with a
    // non-null identity partition applies only within that partition.
    // graft re-expresses it as keys x the partition literal — forge the
    // tree by splicing a scoped delete manifest into an export.
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "psc",
      fixture().schema, Seq("group"))
    tbl.append(fixture()) // (1,A,10) (2,A,20) (3,B,30) (4,C,40) by value2
    val dest = Files.createTempDirectory("graft-psc")
    graft.interop.IcebergExport.export(tbl, dest)
    val metaDir = dest.resolve("metadata")
    import scala.jdk.CollectionConverters._
    // forge the eq-delete parquet: keys value2 IN (20, 30)
    val delDir = dest.resolve("deletes"); Files.createDirectories(delDir)
    Seq(20, 30).toDF("value2").repartition(1)
      .write.mode("overwrite").parquet(delDir.resolve("eq").toString)
    val eqFile = graft.table.FileStats.listParquet(delDir.resolve("eq").toString).head
    // delete manifest under the DATA spec (spec-id 0, identity(group)),
    // partition = "A", equality_ids = [4] (value2's id)
    val entrySchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int","field-id":0},
        |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
        |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
        |{"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |{"name":"content","type":"int","field-id":134},
        |{"name":"file_path","type":"string","field-id":100},
        |{"name":"file_format","type":"string","field-id":101},
        |{"name":"partition","type":{"type":"record","name":"r102","fields":[
        |{"name":"group","type":["null","string"],"default":null,"field-id":1000}
        |]},"field-id":102},
        |{"name":"record_count","type":"long","field-id":103},
        |{"name":"file_size_in_bytes","type":"long","field-id":104},
        |{"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null,"field-id":135}
        |]},"field-id":2}]}""".stripMargin)
    val part = new org.apache.avro.generic.GenericData.Record(
      entrySchema.getField("data_file").schema().getField("partition").schema())
    part.put("group", "A")
    val dfRec = new org.apache.avro.generic.GenericData.Record(
      entrySchema.getField("data_file").schema())
    dfRec.put("content", 2) // EQUALITY DELETES
    dfRec.put("file_path", eqFile)
    dfRec.put("file_format", "PARQUET")
    dfRec.put("partition", part)
    dfRec.put("record_count", 2L)
    dfRec.put("file_size_in_bytes", Files.size(java.nio.file.Paths.get(eqFile)))
    dfRec.put("equality_ids", java.util.Arrays.asList(Integer.valueOf(4)))
    val entry = new org.apache.avro.generic.GenericData.Record(entrySchema)
    entry.put("status", 1); entry.put("snapshot_id", 1L)
    entry.put("sequence_number", 99L); entry.put("file_sequence_number", 99L)
    entry.put("data_file", dfRec)
    val delManifest = metaDir.resolve("manifest-scoped-deletes.avro")
    locally {
      val w = new org.apache.avro.file.DataFileWriter(
        new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](entrySchema))
      w.create(entrySchema, delManifest.toFile)
      try w.append(entry) finally w.close()
    }
    // splice into the manifest list
    val hint = Files.readString(metaDir.resolve("version-hint.text")).trim
    val metaJson = Files.readString(metaDir.resolve(s"v$hint.metadata.json"))
    val listPath = java.nio.file.Paths.get(
      """"manifest-list" : "([^"]+)"""".r.findFirstMatchIn(metaJson).get.group(1))
    val listRecs = {
      val r = new org.apache.avro.file.DataFileReader(listPath.toFile,
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      try r.iterator.asScala.toVector finally r.close()
    }
    val mfSchema = listRecs.head.getSchema
    val delMf = new org.apache.avro.generic.GenericData.Record(mfSchema)
    delMf.put("manifest_path", delManifest.toString)
    delMf.put("manifest_length", Files.size(delManifest))
    delMf.put("partition_spec_id", 0) // the DATA spec — scoped delete
    delMf.put("content", 1)
    delMf.put("sequence_number", 99L); delMf.put("min_sequence_number", 99L)
    delMf.put("added_snapshot_id", 1L); delMf.put("added_files_count", 1)
    delMf.put("existing_files_count", 0); delMf.put("deleted_files_count", 0)
    delMf.put("added_rows_count", 2L); delMf.put("existing_rows_count", 0L)
    delMf.put("deleted_rows_count", 0L)
    locally {
      val w = new org.apache.avro.file.DataFileWriter(
        new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](mfSchema))
      w.create(mfSchema, listPath.toFile)
      try { listRecs.foreach(w.append); w.append(delMf) } finally w.close()
    }
    val imp = graft.interop.IcebergImport.register(cat, spark, dest, "ns", "psc_rt")
    assert(imp.equalityDeleteFiles == 1)
    // (2,A,20) deleted — in scope AND keyed; (3,B,30) SURVIVES: its key
    // matches but its partition is outside the scope
    assert(imp.table.scan().select("id").collect()
      .map(_.getInt(0)).sorted.toSeq == Seq(1, 3, 4),
      "partition-scoped equality delete must not leak outside its partition")
    // the rewritten delete entry is a composite key
    val eqEntry = cat.liveDeleteFiles("ns", "psc_rt").head
    assert(eqEntry.equalityKey.contains("value2,group"), s"$eqEntry")
  }

  /** Forge a one-entry DELETE manifest and splice it into an export
    * tree's manifest list — the shape a foreign Flink/Spark writer
    * leaves. `partFieldsJson` declares the r102 partition struct fields
    * (empty for an unpartitioned delete spec); `partValues` sets them. */
  private def spliceDeleteManifest(dest: java.nio.file.Path,
      partFieldsJson: String, content: Int, filePath: String,
      records: Long, eqIds: Seq[Int], partValues: Map[String, Any],
      seq: Long, specId: Int = 0): Unit = {
    import scala.jdk.CollectionConverters._
    val metaDir = dest.resolve("metadata")
    val entrySchema = new org.apache.avro.Schema.Parser().parse(
      s"""{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int","field-id":0},
        |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
        |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
        |{"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |{"name":"content","type":"int","field-id":134},
        |{"name":"file_path","type":"string","field-id":100},
        |{"name":"file_format","type":"string","field-id":101},
        |{"name":"partition","type":{"type":"record","name":"r102","fields":[
        |$partFieldsJson
        |]},"field-id":102},
        |{"name":"record_count","type":"long","field-id":103},
        |{"name":"file_size_in_bytes","type":"long","field-id":104},
        |{"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null,"field-id":135}
        |]},"field-id":2}]}""".stripMargin)
    val part = new org.apache.avro.generic.GenericData.Record(
      entrySchema.getField("data_file").schema().getField("partition").schema())
    partValues.foreach { case (k, v) => part.put(k, v) }
    val dfRec = new org.apache.avro.generic.GenericData.Record(
      entrySchema.getField("data_file").schema())
    dfRec.put("content", content)
    dfRec.put("file_path", filePath)
    dfRec.put("file_format", "PARQUET")
    dfRec.put("partition", part)
    dfRec.put("record_count", records)
    dfRec.put("file_size_in_bytes",
      Files.size(java.nio.file.Paths.get(filePath)))
    dfRec.put("equality_ids",
      if (eqIds.isEmpty) null
      else java.util.Arrays.asList(eqIds.map(Integer.valueOf(_)): _*))
    val entry = new org.apache.avro.generic.GenericData.Record(entrySchema)
    entry.put("status", 1); entry.put("snapshot_id", 1L)
    entry.put("sequence_number", seq); entry.put("file_sequence_number", seq)
    entry.put("data_file", dfRec)
    val delManifest = metaDir.resolve(
      s"manifest-forged-${java.util.UUID.randomUUID().toString.take(8)}-deletes.avro")
    locally {
      val w = new org.apache.avro.file.DataFileWriter(
        new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](entrySchema))
      w.setMeta("format-version", "2"); w.setMeta("content", "deletes")
      w.create(entrySchema, delManifest.toFile)
      try w.append(entry) finally w.close()
    }
    val hint = Files.readString(metaDir.resolve("version-hint.text")).trim
    val metaJson = Files.readString(metaDir.resolve(s"v$hint.metadata.json"))
    val listPath = java.nio.file.Paths.get(
      """"manifest-list" : "([^"]+)"""".r.findFirstMatchIn(metaJson).get.group(1))
    val listRecs = {
      val r = new org.apache.avro.file.DataFileReader(listPath.toFile,
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      try r.iterator.asScala.toVector finally r.close()
    }
    val mfSchema = listRecs.head.getSchema
    val delMf = new org.apache.avro.generic.GenericData.Record(mfSchema)
    delMf.put("manifest_path", delManifest.toString)
    delMf.put("manifest_length", Files.size(delManifest))
    delMf.put("partition_spec_id", specId)
    delMf.put("content", 1)
    delMf.put("sequence_number", seq); delMf.put("min_sequence_number", seq)
    delMf.put("added_snapshot_id", 1L); delMf.put("added_files_count", 1)
    delMf.put("existing_files_count", 0); delMf.put("deleted_files_count", 0)
    delMf.put("added_rows_count", records); delMf.put("existing_rows_count", 0L)
    delMf.put("deleted_rows_count", 0L)
    locally {
      val w = new org.apache.avro.file.DataFileWriter(
        new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](mfSchema))
      w.create(mfSchema, listPath.toFile)
      try { listRecs.foreach(w.append); w.append(delMf) } finally w.close()
    }
  }

  test("iceberg export excludes WAP-staged commits instead of crashing on them") {
    // a staged branch commit is unpublished: it must neither appear in
    // the exported history nor be looked up in the sequence maps (which
    // are keyed over the WAP-filtered snapshot list)
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "wexp", fixture().schema)
    tbl.append(fixture())
    tbl.appendToBranch("audit", fixture().withColumn("id", $"id" + 10))
    val dest = Files.createTempDirectory("graft-wexp")
    graft.interop.IcebergExport.export(tbl, dest)
    val rb = graft.interop.IcebergExport.readBack(dest)
    assert(rb.nSnapshots == 1,
      "staged WAP commit must not publish into the exported history")
    assert(rb.totalRecords == 4L)
    val imp = graft.interop.IcebergImport.register(
      cat, spark, dest, "ns", "wexp_rt")
    assert(imp.table.scan().count() == 4)
  }

  test("iceberg import: scoped eq delete whose KEY is the partition column restricts rows to the partition") {
    // A spec-legal delete row whose key value differs from the file's
    // partition value matches nothing in Iceberg (the delete applies
    // only within its partition). The import must FILTER such rows out
    // of the rewritten delete, not widen the match to other partitions.
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "ovl",
      fixture().schema, Seq("group"))
    tbl.append(fixture()) // ids 1,2 in A; 3 in B; 4 in C
    val dest = Files.createTempDirectory("graft-ovl")
    graft.interop.IcebergExport.export(tbl, dest)
    // eq delete KEYED ON group, rows "A" and "B", scoped to group="A"
    val delDir = dest.resolve("deletes"); Files.createDirectories(delDir)
    Seq("A", "B").toDF("group").repartition(1)
      .write.mode("overwrite").parquet(delDir.resolve("eq").toString)
    val eqFile = graft.table.FileStats.listParquet(
      delDir.resolve("eq").toString).head
    spliceDeleteManifest(dest,
      """{"name":"group","type":["null","string"],"default":null,"field-id":1000}""",
      content = 2, filePath = eqFile, records = 2L,
      eqIds = Seq(2), partValues = Map("group" -> "A"), seq = 99L)
    val imp = graft.interop.IcebergImport.register(
      cat, spark, dest, "ns", "ovl_rt")
    // only group=A rows delete; the out-of-partition "B" key row is
    // spec-dead and must NOT delete id 3
    assert(imp.table.scan().select("id").collect()
      .map(_.getInt(0)).sorted.toSeq == Seq(3, 4),
      "an out-of-partition key row must not delete other partitions' rows")
    // the rewritten file dropped the spec-dead row
    val eqEntry = cat.liveDeleteFiles("ns", "ovl_rt").head
    assert(eqEntry.rowCount == 1L, s"$eqEntry")
  }

  test("iceberg import: timestamp identity-partition scope converts MICROS exactly") {
    // Real writers store identity-timestamp partition values as micros
    // since epoch; a naive long->timestamp cast reads SECONDS and the
    // scoped delete silently matches nothing (rows resurrect).
    val t1 = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z"))
    val t2 = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-02T00:00:00Z"))
    val df = Seq((1, t1, 10), (2, t2, 20), (3, t1, 30))
      .toDF("id", "ts", "v")
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "tsc", df.schema, Seq("ts"))
    tbl.append(df)
    val dest = Files.createTempDirectory("graft-tsc")
    graft.interop.IcebergExport.export(tbl, dest)
    // eq delete on id IN (1, 2), scoped to partition ts = t1 (micros)
    val delDir = dest.resolve("deletes"); Files.createDirectories(delDir)
    Seq(1, 2).toDF("id").repartition(1)
      .write.mode("overwrite").parquet(delDir.resolve("eq").toString)
    val eqFile = graft.table.FileStats.listParquet(
      delDir.resolve("eq").toString).head
    val micros = java.time.Instant.parse("2024-01-01T00:00:00Z")
      .getEpochSecond * 1000000L
    spliceDeleteManifest(dest,
      """{"name":"ts","type":["null",{"type":"long","logicalType":"timestamp-micros"}],"default":null,"field-id":1000}""",
      content = 2, filePath = eqFile, records = 2L,
      eqIds = Seq(1), partValues = Map("ts" -> java.lang.Long.valueOf(micros)),
      seq = 99L)
    val imp = graft.interop.IcebergImport.register(
      cat, spark, dest, "ns", "tsc_rt")
    // id=1 (in the t1 partition, keyed) deletes; id=2 is keyed but its
    // partition is t2 — survives; id=3 is in t1 but unkeyed — survives
    assert(imp.table.scan().select("id").collect()
      .map(_.getInt(0)).sorted.toSeq == Seq(2, 3),
      "micros scope literal must match the partition's rows exactly")
  }

  test("iceberg refresh: additive delta, reset on source rewrite, honest refusals") {
    val cat = freshCatalog()
    val src = LakehouseTable.create(cat, spark, "ns", "livesrc", fixture().schema)
    src.append(fixture())
    val dest = Files.createTempDirectory("graft-refresh")
    graft.interop.IcebergExport.export(src, dest)
    val imp = graft.interop.IcebergImport.register(
      cat, spark, dest, "ns", "mirror")
    assert(imp.table.scan().count() == 4)
    // -- additive: source appends + eq-deletes, mirror refreshes to match
    src.append(fixture().withColumn("id", $"id" + 10))
    src.deleteEq("group", Seq("C"))
    graft.interop.IcebergExport.export(src, dest)
    val r1 = graft.interop.IcebergImport.refresh(cat, spark, "ns", "mirror")
    assert(r1.snapshot.isDefined && !r1.reset)
    assert(r1.dataFilesAdded >= 1 && r1.equalityDeleteFiles == 1)
    assert(r1.table.scan().select("id").collect().map(_.getInt(0)).sorted.toSeq
      == Seq(1, 2, 3, 11, 12, 13), "mirror must net the source's eq delete")
    // watermark advanced and persists
    assert(cat.loadTable("ns", "mirror").properties
      .get(graft.interop.IcebergImport.ImportedSnapshotProp)
      .contains(src.currentSnapshotId.toString))
    // -- no-op: unchanged source
    val r2 = graft.interop.IcebergImport.refresh(cat, spark, "ns", "mirror")
    assert(r2.snapshot.isEmpty && r2.dataFilesAdded == 0)
    // -- reset: the source compacts (every file rewritten) — one replace
    // commit re-lists the current state; content is unchanged
    src.compact()
    graft.interop.IcebergExport.export(src, dest)
    val r3 = graft.interop.IcebergImport.refresh(cat, spark, "ns", "mirror")
    assert(r3.snapshot.isDefined && r3.reset)
    assert(r3.table.scan().select("id").collect().map(_.getInt(0)).sorted.toSeq
      == Seq(1, 2, 3, 11, 12, 13))
    assert(r3.snapshot.get.operation == Snaplog.OpReplace)
    // -- reset REFUSES when the mirror advanced natively since the sync
    // (the reset would silently discard the native rows)
    r3.table.append(fixture().withColumn("id", $"id" + 100))
    src.deleteMor($"id" === 1)
    src.compact() // another rewrite → refresh needs a reset again
    graft.interop.IcebergExport.export(src, dest)
    val e = intercept[IllegalArgumentException](
      graft.interop.IcebergImport.refresh(cat, spark, "ns", "mirror"))
    assert(e.getMessage.contains("native commits"), e.getMessage)
    // -- non-imported table refuses
    val e2 = intercept[IllegalArgumentException](
      graft.interop.IcebergImport.refresh(cat, spark, "ns", "livesrc"))
    assert(e2.getMessage.contains("not imported"), e2.getMessage)
  }

  test("iceberg v3: outstanding position vectors export as puffin DVs and re-import") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "dv3", fixture().schema)
    tbl.append(fixture())
    tbl.deleteMor($"id" === 2)
    // a later era rides ABOVE the vector (higher sequence, untouched)
    tbl.append(fixture().withColumn("id", $"id" + 10))
    val dest = Files.createTempDirectory("graft-dv3")
    graft.interop.IcebergExport.export(tbl, dest, formatVersion = 3)
    val rb = graft.interop.IcebergExport.readBack(dest)
    assert(rb.formatVersion == 3)
    assert(rb.nPositionDeleteFiles == 1, s"$rb")
    assert(rb.deleteRecords == 1L, "DV record_count is the blob cardinality")
    // the delete payload on disk is a PUFFIN file, not parquet
    import scala.jdk.CollectionConverters._
    val delFiles = scala.util.Using.resource(
      Files.list(dest.resolve("deletes")))(_.iterator().asScala.toVector)
    assert(delFiles.exists(_.getFileName.toString.endsWith(".puffin")),
      delFiles.mkString(", "))
    val imp = graft.interop.IcebergImport.register(cat, spark, dest, "ns", "dv3_rt")
    assert(imp.positionDeleteFiles == 1)
    assert(imp.table.scan().select("id").collect().map(_.getInt(0)).sorted.toSeq
      == Seq(1, 3, 4, 11, 12, 13, 14),
      "the DV must decode back into exactly the deleted position")
  }

  test("iceberg refresh perSnapshot: one NATIVE commit per source snapshot") {
    val cat = freshCatalog()
    val src = LakehouseTable.create(cat, spark, "ns", "pssrc", fixture().schema)
    src.append(fixture())
    val dest = Files.createTempDirectory("graft-refresh-ps")
    graft.interop.IcebergExport.export(src, dest)
    graft.interop.IcebergImport.register(cat, spark, dest, "ns", "psmirror")
    val syncAfterRegister = cat.currentSnapshot("ns", "psmirror").get.snapshotId
    // three DISTINCT source commits: append, equality delete, position
    // vector — per-snapshot replay must land them as three native
    // commits with the matching ops, not one folded add_files
    src.append(fixture().withColumn("id", $"id" + 10))
    src.deleteEq("group", Seq("C"))
    src.deleteMor($"id" === 1)
    graft.interop.IcebergExport.export(src, dest)
    val r = graft.interop.IcebergImport.refresh(
      cat, spark, "ns", "psmirror", perSnapshot = true)
    assert(!r.reset && r.commits == 3, r.toString)
    assert(r.dataFilesAdded >= 1 && r.equalityDeleteFiles == 1 &&
      r.positionDeleteFiles == 1, r.toString)
    val ops = cat.snapshots("ns", "psmirror")
      .filter(_.snapshotId > syncAfterRegister).map(_.operation)
    assert(ops == Seq(Snaplog.OpAddFiles, Snaplog.OpEqDelete,
      Snaplog.OpMorDelete), ops.toString)
    // content nets exactly like the source
    val mirror = r.table
    assert(mirror.scan().select("id").collect().map(_.getInt(0)).sorted.toSeq
      == src.scan().select("id").collect().map(_.getInt(0)).sorted.toSeq)
    // the refreshed window is CHANGELOG-readable — native shapes, so
    // the import-guard has nothing to refuse (the folded delta's mixed
    // commit would refuse here)
    val changes = mirror.scanChanges(fromSnapshot = syncAfterRegister)
    val byType = changes.groupBy(LakehouseTable.ChangeTypeCol).count()
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(byType.getOrElse("insert", 0L) >= 4, byType.toString)
    assert(byType.getOrElse("delete", 0L) >= 2, byType.toString)
    // idempotent: unchanged source is a zero-commit no-op
    val r2 = graft.interop.IcebergImport.refresh(
      cat, spark, "ns", "psmirror", perSnapshot = true)
    assert(r2.snapshot.isEmpty && r2.commits == 0)
    // watermark persisted at the source head
    assert(cat.loadTable("ns", "psmirror").properties
      .get(graft.interop.IcebergImport.ImportedSnapshotProp)
      .contains(src.currentSnapshotId.toString))
    // a source rewrite degrades to the delta path's single reset
    src.compact()
    graft.interop.IcebergExport.export(src, dest)
    val r3 = graft.interop.IcebergImport.refresh(
      cat, spark, "ns", "psmirror", perSnapshot = true)
    assert(r3.reset && r3.snapshot.get.operation == Snaplog.OpReplace)
    assert(r3.table.scan().select("id").collect().map(_.getInt(0)).sorted.toSeq
      == src.scan().select("id").collect().map(_.getInt(0)).sorted.toSeq)
  }

  test("iceberg refresh perSnapshot: a v3 source's puffin DV lands as a native mor_delete") {
    val cat = freshCatalog()
    val src = LakehouseTable.create(cat, spark, "ns", "dvsrc", fixture().schema)
    src.append(fixture())
    val dest = Files.createTempDirectory("graft-refresh-dv")
    graft.interop.IcebergExport.export(src, dest, formatVersion = 3)
    graft.interop.IcebergImport.register(cat, spark, dest, "ns", "dvmirror")
    // the source's new position vector exports as a puffin deletion
    // vector (v3 mandates DVs); the per-snapshot refresh must decode it
    // and land it as a NATIVE mor_delete commit
    src.deleteMor($"id" === 2)
    graft.interop.IcebergExport.export(src, dest, formatVersion = 3)
    val r = graft.interop.IcebergImport.refresh(
      cat, spark, "ns", "dvmirror", perSnapshot = true)
    assert(!r.reset && r.commits == 1 && r.positionDeleteFiles == 1, r.toString)
    assert(r.snapshot.get.operation == Snaplog.OpMorDelete)
    assert(r.table.scan().select("id").collect().map(_.getInt(0)).sorted.toSeq
      == src.scan().select("id").collect().map(_.getInt(0)).sorted.toSeq)
  }

  test("iceberg refresh: appended source columns ADOPT in place; reshaping refuses") {
    val cat = freshCatalog()
    val src = LakehouseTable.create(cat, spark, "ns", "evsrc", fixture().schema)
    src.append(fixture())
    val dest = Files.createTempDirectory("graft-refresh-ev")
    graft.interop.IcebergExport.export(src, dest)
    graft.interop.IcebergImport.register(cat, spark, dest, "ns", "evmirror")
    // the routine live-CDC evolution: source ADD COLUMN, then new data
    // carrying values — the mirror adopts the appended column and syncs
    src.addColumn("extra", IntegerType)
    src.append(fixture().withColumn("id", $"id" + 10)
      .withColumn("extra", lit(1)))
    graft.interop.IcebergExport.export(src, dest)
    val r = graft.interop.IcebergImport.refresh(cat, spark, "ns", "evmirror")
    assert(!r.reset && r.dataFilesAdded >= 1, r.toString)
    assert(r.table.schema.fieldNames.contains("extra"),
      "the mirror schema must have adopted the appended column")
    val got = r.table.scan().select("id", "extra").collect()
      .map(x => (x.getInt(0), if (x.isNullAt(1)) -1 else x.getInt(1)))
      .sorted.toSeq
    assert(got == Seq(1 -> -1, 2 -> -1, 3 -> -1, 4 -> -1,
      11 -> 1, 12 -> 1, 13 -> 1, 14 -> 1),
      s"old era null, new era valued: $got")
    // the mirror's registry advanced with the source's
    assert(cat.loadTable("ns", "evmirror").properties
      .get(graft.types.FieldIds.RegistryProp)
      .exists(_.contains("extra:")), "registry must carry the new column")
    // a legal WIDENING (int → bigint) adopts too — metadata-only, old
    // narrow files widen at read time
    src.widenColumn("extra", LongType)
    src.append(fixture().withColumn("id", $"id" + 20)
      .withColumn("extra", lit(2L)))
    graft.interop.IcebergExport.export(src, dest)
    val rw = graft.interop.IcebergImport.refresh(cat, spark, "ns", "evmirror")
    assert(!rw.reset && rw.table.schema("extra").dataType == LongType,
      rw.toString)
    assert(rw.table.scan().agg(org.apache.spark.sql.functions.sum($"extra"))
      .collect().head.getLong(0) == 4 * 1 + 4 * 2)
    // RESHAPING (an int → string retype, forged at the raw catalog
    // layer — no graft op can produce it) still refuses loudly
    val ms = cat.loadTable("ns", "evsrc")
    cat.updateSchema("ns", "evsrc", StructType(ms.schema.fields.map(f =>
      if (f.name == "extra") f.copy(dataType = StringType) else f)))
    val src2 = LakehouseTable.load(cat, spark, "ns", "evsrc")
    src2.append(fixture().withColumn("id", $"id" + 30)
      .withColumn("extra", lit("oops")))
    graft.interop.IcebergExport.export(src2, dest)
    val e = intercept[IllegalArgumentException](
      graft.interop.IcebergImport.refresh(cat, spark, "ns", "evmirror"))
    assert(e.getMessage.contains("re-register"), e.getMessage)
  }

  test("iceberg refresh: id-matched source renames and drops ADOPT in place") {
    val cat = freshCatalog()
    val src = LakehouseTable.create(cat, spark, "ns", "rnsrc", fixture().schema)
    src.append(fixture())
    val dest = Files.createTempDirectory("graft-refresh-rn")
    graft.interop.IcebergExport.export(src, dest)
    graft.interop.IcebergImport.register(cat, spark, dest, "ns", "rnmirror")
    // source RENAMES value2 -> amount (metadata-only, id kept) and
    // appends a new era under the new name
    src.renameColumn("value2", "amount")
    src.append(fixture().withColumnRenamed("value2", "amount")
      .withColumn("id", $"id" + 10))
    graft.interop.IcebergExport.export(src, dest)
    val r = graft.interop.IcebergImport.refresh(cat, spark, "ns", "rnmirror")
    assert(!r.reset && r.dataFilesAdded >= 1, r.toString)
    assert(r.table.schema.fieldNames.contains("amount") &&
      !r.table.schema.fieldNames.contains("value2"),
      r.table.schema.simpleString)
    // OLD-era values serve under the NEW name (read-by-id), both eras
    val got = r.table.scan().select("id", "amount").collect()
      .map(x => (x.getInt(0), x.getInt(1))).sorted.toSeq
    assert(got == Seq(1 -> 10, 2 -> 20, 3 -> 30, 4 -> 40,
      11 -> 10, 12 -> 20, 13 -> 30, 14 -> 40), s"$got")
    // the old name is freed, exactly as a native rename records it
    assert(graft.types.FieldIds.namesSet(
      cat.loadTable("ns", "rnmirror").properties,
      graft.types.FieldIds.FreedNamesProp)("value2"))
    // source DROPS a column; the mirror drops it too, metadata-only
    src.dropColumn("value1")
    src.append(Seq((21, "X", 1), (22, "Y", 2)).toDF("id", "group", "amount"))
    graft.interop.IcebergExport.export(src, dest)
    val r2 = graft.interop.IcebergImport.refresh(cat, spark, "ns", "rnmirror")
    assert(!r2.reset, r2.toString)
    assert(r2.table.schema.fieldNames.toSeq == Seq("id", "group", "amount"),
      r2.table.schema.simpleString)
    assert(r2.table.scan().count() == 10)
    // a pruned projection over all three eras still answers by id
    val amtSum = r2.table.scan()
      .agg(org.apache.spark.sql.functions.sum($"amount")).collect().head
    assert(!amtSum.isNullAt(0) && amtSum.getLong(0) == 203L, amtSum.toString)
    // mirror registry advanced to the source's exactly
    assert(cat.loadTable("ns", "rnmirror").properties
      .get(graft.types.FieldIds.RegistryProp) ==
      cat.loadTable("ns", "rnsrc").properties
        .get(graft.types.FieldIds.RegistryProp))
    // DROP + RE-ADD under the same name: decomposes as drop + append
    // with a FRESH id — old values must not resurrect, and the reused
    // name turns stats-unsafe
    src.dropColumn("amount")
    src.addColumn("amount", IntegerType)
    src.append(Seq((31, "Z", 7)).toDF("id", "group", "amount"))
    graft.interop.IcebergExport.export(src, dest)
    val r3 = graft.interop.IcebergImport.refresh(cat, spark, "ns", "rnmirror")
    assert(!r3.reset, r3.toString)
    val byId = r3.table.scan().select("id", "amount").collect()
      .map(x => x.getInt(0) -> (if (x.isNullAt(1)) -1 else x.getInt(1))).toMap
    assert(byId(31) == 7 && byId(1) == -1 && byId(11) == -1 && byId(21) == -1,
      s"old values must not resurrect under a re-added name: $byId")
    assert(graft.types.FieldIds.namesSet(
      cat.loadTable("ns", "rnmirror").properties,
      graft.types.FieldIds.StatsUnsafeProp)("amount"))
  }

  test("iceberg refresh: struct-chain + interior renames and widenings ADOPT") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType, StructField, StructType}
    val cat = freshCatalog()
    val schema0 = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("s", StructType(Seq(
        StructField("x", IntegerType),
        StructField("y", StringType))), nullable = true),
      StructField("arr", ArrayType(StructType(Seq(
        StructField("v", IntegerType)))), nullable = true),
      StructField("val2", IntegerType, nullable = true)))
    val src = LakehouseTable.create(cat, spark, "ns", "nsrc", schema0)
    src.append(spark.createDataFrame(java.util.List.of(
      Row(1, Row(5, "a"), Seq(Row(10), Row(11)), 100),
      Row(2, Row(6, "b"), Seq(Row(20)), 200)), schema0))
    val dest = Files.createTempDirectory("graft-refresh-nested")
    graft.interop.IcebergExport.export(src, dest)
    graft.interop.IcebergImport.register(cat, spark, dest, "ns", "nmirror")
    // the source evolves one level down, all metadata-only: an inner
    // struct-member rename, a list-interior member rename, a widening
    src.renameStructField("s.x", "xx")
    src.renameInteriorField("arr.element.v", "amount")
    src.widenColumn("val2", LongType)
    val schema1 = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("s", StructType(Seq(
        StructField("xx", IntegerType),
        StructField("y", StringType))), nullable = true),
      StructField("arr", ArrayType(StructType(Seq(
        StructField("amount", IntegerType)))), nullable = true),
      StructField("val2", LongType, nullable = true)))
    src.append(spark.createDataFrame(java.util.List.of(
      Row(3, Row(7, "c"), Seq(Row(30)), 300L)), schema1))
    graft.interop.IcebergExport.export(src, dest)
    val r = graft.interop.IcebergImport.refresh(cat, spark, "ns", "nmirror")
    assert(!r.reset && r.dataFilesAdded >= 1, r.toString)
    // old era answers under the NEW nested names, in PRUNED plans
    val got = r.table.scan()
      .select($"id", $"s.xx", $"arr.amount", $"val2").orderBy("id").collect()
    assert(got.map(_.getInt(1)).toSeq == Seq(5, 6, 7), got.toSeq.toString)
    assert(got.map(_.getSeq[Int](2)).toSeq ==
      Seq(Seq(10, 11), Seq(20), Seq(30)), got.toSeq.toString)
    assert(got.map(_.getLong(3)).toSeq == Seq(100L, 200L, 300L),
      got.toSeq.toString)
    // the interior rename flipped the mirror to interior-by-id reads
    assert(cat.loadTable("ns", "nmirror").properties
      .get(graft.types.FieldIds.InteriorByIdProp).contains("true"))
  }

  test("iceberg refresh: a vanished NESTED member id adopts as a member DROP") {
    // round 16 (ADVICE r15): the classifier discarded the vanished id
    // but never removed the member from the stored schema, so the
    // shape comparison refused an advertised routine evolution — every
    // subsequent refresh of the mirror broke. Now the member leaves
    // the schema like a native inner drop.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
    val cat = freshCatalog()
    val schema0 = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("s", StructType(Seq(
        StructField("x", IntegerType),
        StructField("y", StringType),
        StructField("z", IntegerType))), nullable = true)))
    val src = LakehouseTable.create(cat, spark, "ns", "ndsrc", schema0)
    src.append(spark.createDataFrame(java.util.List.of(
      Row(1, Row(5, "a", 50)), Row(2, Row(6, "b", 60))), schema0))
    val dest = Files.createTempDirectory("graft-refresh-ndrop")
    graft.interop.IcebergExport.export(src, dest)
    graft.interop.IcebergImport.register(cat, spark, dest, "ns", "ndmirror")
    // the source DROPS s.y and RENAMES s.x -> xx in one evolution,
    // then appends an era under the new shape
    src.dropStructField("s.y")
    src.renameStructField("s.x", "xx")
    val schema1 = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("s", StructType(Seq(
        StructField("xx", IntegerType),
        StructField("z", IntegerType))), nullable = true)))
    src.append(spark.createDataFrame(java.util.List.of(
      Row(3, Row(7, 70))), schema1))
    graft.interop.IcebergExport.export(src, dest)
    val r = graft.interop.IcebergImport.refresh(cat, spark, "ns", "ndmirror")
    assert(!r.reset && r.dataFilesAdded >= 1, r.toString)
    assert(r.table.schema.fields.find(_.name == "s").get.dataType
      .asInstanceOf[StructType].fieldNames.toSeq == Seq("xx", "z"),
      r.table.schema.simpleString)
    // both eras answer under the adopted shape; the dropped member is
    // gone, the renamed one serves old values by id
    val got = r.table.scan().select($"id", $"s.xx", $"s.z")
      .orderBy("id").collect()
    assert(got.map(_.getInt(1)).toSeq == Seq(5, 6, 7), got.toSeq.toString)
    assert(got.map(_.getInt(2)).toSeq == Seq(50, 60, 70), got.toSeq.toString)
    // the dropped key is freed on the mirror, like a native inner drop
    assert(graft.types.FieldIds.namesSet(
      cat.loadTable("ns", "ndmirror").properties,
      graft.types.FieldIds.FreedNamesProp)("s.y"))
    // and the NEXT refresh is a clean no-op — the r15 defect broke
    // every subsequent refresh here
    val r2 = graft.interop.IcebergImport.refresh(cat, spark, "ns", "ndmirror")
    assert(!r2.reset && r2.dataFilesAdded == 0, r2.toString)
  }

  test("iceberg v3 row lineage: _row_id / _last_updated_sequence_number on adopted trees") {
    val cat = freshCatalog()
    val src = LakehouseTable.create(cat, spark, "ns", "lin", fixture().schema)
    src.append(fixture()) // era 1 → row ids [0, 4)
    val dest = Files.createTempDirectory("graft-lin")
    graft.interop.IcebergExport.export(src, dest, formatVersion = 3)
    val imp = graft.interop.IcebergImport.register(
      cat, spark, dest, "ns", "lin_rt")
    val l1 = imp.table.scanLineage()
      .select("id", "_row_id", "_last_updated_sequence_number").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(l1.map(_._2).sorted.toSeq == Seq(0L, 1L, 2L, 3L), l1.toSeq.toString)
    val era1Assign = l1.map(x => x._1 -> x._2).toMap
    // era 2 lands via REFRESH: new rows continue at 4, era-1 rows KEEP
    // their assignment (lineage is durable, not recomputed)
    src.append(fixture().withColumn("id", $"id" + 10))
    graft.interop.IcebergExport.export(src, dest, formatVersion = 3)
    graft.interop.IcebergImport.refresh(cat, spark, "ns", "lin_rt")
    val tbl = LakehouseTable.load(cat, spark, "ns", "lin_rt")
    val l2 = tbl.scanLineage().select("id", "_row_id").collect()
      .map(r => r.getInt(0) -> r.getLong(1))
    assert(l2.length == 8 && l2.map(_._2).toSet == (0L to 7L).toSet,
      l2.toSeq.toString)
    assert(l2.filter(_._1 <= 4).toMap == era1Assign,
      "era-1 rows must keep their register-time ids through refresh")
    // row ids are STABLE under deletes: survivors keep their numbers
    // (position subtraction removes rows without renumbering)
    val dropped = era1Assign(2)
    tbl.deleteMor($"id" === 2)
    val l3 = tbl.scanLineage().select("id", "_row_id").collect()
      .map(r => r.getInt(0) -> r.getLong(1))
    assert(l3.length == 7 && !l3.map(_._2).contains(dropped) &&
      l3.filter(_._1 <= 4).toMap == (era1Assign - 2), l3.toSeq.toString)
    // a natively appended file carries no assignment → lineage refuses
    // loudly (scan() still serves the content)
    tbl.append(fixture().withColumn("id", $"id" + 100))
    val e = intercept[IllegalArgumentException](tbl.scanLineage())
    assert(e.getMessage.contains("row-lineage"), e.getMessage)
    assert(tbl.scan().count() == 11)
    // ROUND TRIP: re-exporting the mirror publishes the adopted
    // assignments EXPLICITLY (first_row_id per entry) and allocates the
    // native rows ABOVE them — a re-import serves the same ids for
    // adopted rows and fresh non-colliding ids for the native era
    val dest2 = Files.createTempDirectory("graft-lin-rt")
    graft.interop.IcebergExport.export(tbl, dest2, formatVersion = 3)
    val imp2 = graft.interop.IcebergImport.register(
      cat, spark, dest2, "ns", "lin_rt2")
    val l4 = imp2.table.scanLineage().select("id", "_row_id").collect()
      .map(r => r.getInt(0) -> r.getLong(1))
    assert(l4.length == 11, l4.toSeq.toString)
    assert(l4.filter(_._1 <= 14).toMap == l3.toMap,
      s"adopted rows must keep their ids through a re-export round " +
        s"trip: ${l4.toSeq} vs ${l3.toSeq}")
    assert(l4.filter(_._1 > 100).map(_._2).toSet == Set(8L, 9L, 10L, 11L),
      s"native rows allocate above every adopted assignment: ${l4.toSeq}")
    // round 16: that v3 export PERSISTED the native rows' assignment
    // into the mirror's own log (ADVICE: no re-derivation drift) — the
    // previously-refusing scanLineage now serves, ids matching what
    // the export published
    val l5 = tbl.scanLineage().select("id", "_row_id").collect()
      .map(r => r.getInt(0) -> r.getLong(1))
    assert(l5.toMap == l4.toMap,
      s"the export must stamp the same ids it published: ${l5.toSeq}")
  }

  test("native row lineage: commit-time assignment, MOR-update stability, backfill, export round trip") {
    val cat = freshCatalog()
    // v3-mode from birth: the property makes every commit assign
    val tbl = LakehouseTable.create(cat, spark, "ns", "nlin",
      fixture().schema,
      properties = Map(Snaplog.RowLineageProp -> "true"))
    tbl.append(fixture())                                    // seq 1
    tbl.append(fixture().withColumn("id", $"id" + 10))       // seq 2
    def lineage(t: LakehouseTable) = t.scanLineage()
      .select("id", "_row_id", "_last_updated_sequence_number").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val l1 = lineage(tbl)
    assert(l1.map(_._2).toSet == (0L to 7L).toSet, l1.toSeq.toString)
    assert(l1.filter(_._1 <= 4).map(_._2).toSet == (0L to 3L).toSet,
      "commit 1's files take the first range")
    assert(l1.filter(_._1 <= 4).forall(_._3 == 1L) &&
      l1.filter(_._1 > 4).forall(_._3 == 2L),
      s"sequence = committing snapshot: ${l1.toSeq}")
    val assign1 = l1.map(x => x._1 -> x._2).toMap
    // MOR UPDATE of id=2: position-delete + re-insert — survivors keep
    // their ids (no renumbering), the re-inserted row takes a FRESH id
    // above the high-water mark and the new commit's sequence
    tbl.deleteMor($"id" === 2)                               // seq 3
    tbl.append(Seq((2, "A", 9.9f, 99))
      .toDF("id", "group", "value1", "value2"))              // seq 4
    val l2 = lineage(tbl)
    assert(l2.length == 8, l2.toSeq.toString)
    val updated = l2.find(_._1 == 2).get
    assert(updated._2 == 8L && updated._3 == 4L,
      s"the re-inserted row must take a fresh id + sequence: $updated")
    assert(l2.filter(_._1 != 2).map(x => x._1 -> x._2).toMap ==
      (assign1 - 2), "survivors keep their ids through the MOR update")
    // v3 export → re-import: the mirror serves IDENTICAL row ids.
    // (Sequence NUMBERS legitimately renumber: the export assigns each
    // manifest listing a distinct global sequence — load-bearing for
    // its strictly-lower-sequence equality-delete ordering — while
    // native lineage uses the committing snapshot id; both orderings
    // agree on which write is newer.)
    val dest = Files.createTempDirectory("graft-nlin-rt")
    graft.interop.IcebergExport.export(tbl, dest, formatVersion = 3)
    val imp = graft.interop.IcebergImport.register(
      cat, spark, dest, "ns", "nlin_rt")
    assert(lineage(imp.table).map(x => x._1 -> x._2).toSet ==
      l2.map(x => x._1 -> x._2).toSet,
      "the exported tree must round-trip the native row-id assignment")
    // ordering agreement: the one MOR-updated row is the newest under
    // BOTH numberings
    assert(lineage(imp.table).maxBy(_._3)._1 == 2)
    // COMPACTION preserves identity (round 16, the v3 spec's carry
    // mechanism): the rewrite MATERIALIZES _row_id /
    // _last_updated_sequence_number into the new files — ids AND
    // sequences unchanged, the vector retired, entries marked
    tbl.compact()
    assert(lineage(tbl).toSet == l2.toSet,
      "compaction must not renumber or re-sequence surviving rows")
    val compacted = cat.currentSnapshot("ns", "nlin").get.files
      .filterNot(_.deleteFile.contains(true))
    assert(compacted.nonEmpty &&
      compacted.forall(_.lineageInFile.contains(true)))
    assert(compacted.forall(_.firstRowId.isEmpty))
    // a materialized tree round-trips through v3 export → import: the
    // mirror probes the physical column and serves identical lineage
    val dest2 = Files.createTempDirectory("graft-nlin-rt2")
    graft.interop.IcebergExport.export(tbl, dest2, formatVersion = 3)
    val imp2 = graft.interop.IcebergImport.register(
      cat, spark, dest2, "ns", "nlin_rt2")
    assert(lineage(imp2.table).toSet == l2.toSet,
      "materialized lineage must round-trip exactly, sequences included")
    // the plain scan never sees the carried physical columns
    assert(tbl.scan().columns.toSeq == fixture().schema.fieldNames.toSeq)
    // post-compaction commits keep allocating above the high-water mark
    tbl.append(Seq((99, "Z", 0.5f, 7))
      .toDF("id", "group", "value1", "value2"))
    val after = lineage(tbl)
    assert(after.find(_._1 == 99).get._2 == 9L,
      s"post-compaction append must continue above the mark: " +
        s"${after.toSeq.sortBy(_._2)}")
    // COW DELETE preserves survivor identity: the touched files'
    // survivors rewrite materialized, untouched files carry
    val preDelete = tbl.currentSnapshotId
    tbl.delete($"id" === 11)
    val afterDel = lineage(tbl)
    assert(afterDel.toSet == after.filterNot(_._1 == 11).toSet,
      s"COW-delete survivors must keep their ids: " +
        s"${afterDel.toSeq.sortBy(_._2)} vs ${after.toSeq.sortBy(_._2)}")
    // TIME TRAVEL serves lineage as of any snapshot — the deleted
    // row's id is back at the pre-delete snapshot, same assignment
    val travelled = tbl.scanLineage(asOf = Some(preDelete))
      .select("id", "_row_id", "_last_updated_sequence_number").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(travelled.toSet == after.toSet,
      s"time-travelled lineage must match the historical assignment")
    // BACKFILL: a plain table enables lineage mid-life — history gets
    // listing-order ids, later commits continue above them
    val t2 = LakehouseTable.create(cat, spark, "ns", "nlin2",
      fixture().schema)
    t2.append(fixture())
    t2.append(fixture().withColumn("id", $"id" + 10))
    val refuse = intercept[IllegalArgumentException](t2.scanLineage())
    assert(refuse.getMessage.contains("row-lineage"), refuse.getMessage)
    t2.enableRowLineage()
    val b1 = lineage(t2)
    assert(b1.map(_._2).toSet == (0L to 7L).toSet, b1.toSeq.toString)
    assert(b1.filter(_._1 <= 4).map(_._2).toSet == (0L to 3L).toSet,
      "backfill assigns in listing order")
    t2.append(fixture().withColumn("id", $"id" + 20))
    val b2 = lineage(t2)
    assert(b2.map(_._2).toSet == (0L to 11L).toSet,
      s"post-backfill commits continue above the backfilled range: " +
        s"${b2.toSeq}")
    assert(b2.filter(_._1 > 20).forall(_._3 == 3L), b2.toSeq.toString)
    // idempotent
    t2.enableRowLineage()
    assert(lineage(t2).toSet == b2.toSet)
  }

  test("native row lineage: ids survive expiration (next-row-id carries) and rollback") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "nlex",
      fixture().schema,
      properties = Map(Snaplog.RowLineageProp -> "true"))
    tbl.append(fixture())                               // ids 0..3
    tbl.overwrite(fixture().withColumn("id", $"id" + 10)) // ids 4..7 (reset)
    cat.expireSnapshots("ns", "nlex", 1)
    // the dropped history's high-water mark carried: new rows never
    // reuse the expired ids 0..3
    tbl.append(fixture().withColumn("id", $"id" + 20))  // must be 8..11
    val l = tbl.scanLineage().select("id", "_row_id").collect()
      .map(r => r.getInt(0) -> r.getLong(1))
    assert(l.map(_._2).toSet == (4L to 11L).toSet,
      s"expired ids must never be reused: ${l.toSeq}")
    // rollback re-lists assigned entries verbatim — no renumbering,
    // and the next append still allocates above the high-water mark
    val preRollback = tbl.currentSnapshotId
    tbl.append(fixture().withColumn("id", $"id" + 30))  // ids 12..15
    tbl.rollbackTo(preRollback)
    val lr = tbl.scanLineage().select("id", "_row_id").collect()
      .map(r => r.getInt(0) -> r.getLong(1))
    assert(lr.toMap == l.toMap, s"rollback must not renumber: ${lr.toSeq}")
    tbl.append(fixture().withColumn("id", $"id" + 40))
    val lf = tbl.scanLineage().select("id", "_row_id").collect()
      .map(r => r.getInt(0) -> r.getLong(1))
    assert(lf.filter(_._1 > 40).map(_._2).toSet == (16L to 19L).toSet,
      s"post-rollback ids allocate above the rolled-back era: ${lf.toSeq}")
  }

  test("lineage reads serve foreign id-less files under field-id-read sessions") {
    // round 17 regression: the lineage read requests the reserved-id
    // physical columns; with spark.sql.parquet.fieldId.read.enabled on
    // (sticky — any evolved-table read in the session sets it), a file
    // carrying NO ids at all (add_files / REST commit of foreign
    // parquet) REFUSED instead of name-matching and null-filling.
    val cat = freshCatalog()
    val dir = Files.createTempDirectory("graft-lin-ext")
    fixture().coalesce(1).write.parquet(s"$dir/ext.parquet")
    val tbl = LakehouseTable.create(cat, spark, "ns", "linext",
      fixture().schema,
      properties = Map(Snaplog.RowLineageProp -> "true"))
    val prior = spark.conf.getOption(graft.types.FieldIds.ReadConf)
    spark.conf.set(graft.types.FieldIds.ReadConf, "true")
    try {
      tbl.addFiles(graft.table.FileStats.listParquet(s"$dir/ext.parquet"))
      val l = tbl.scanLineage().select("id", "_row_id").collect()
        .map(r => r.getInt(0) -> r.getLong(1))
      assert(l.length == 4 && l.map(_._2).distinct.length == 4,
        l.toSeq.toString)
    } finally prior match {
      case Some(v) => spark.conf.set(graft.types.FieldIds.ReadConf, v)
      case None => spark.conf.unset(graft.types.FieldIds.ReadConf)
    }
  }

  test("row lineage reserves _row_id at EVERY enable path, not just enableRowLineage") {
    val cat = freshCatalog()
    val clash = fixture().withColumn("_row_id", $"id".cast("long"))
    // creation-time property path (round 17, ADVICE): a table created
    // WITH graft.row-lineage=true and a user _row_id column would give
    // the lineage read duplicate/ambiguous columns — refuse up front
    val e1 = intercept[IllegalArgumentException](
      LakehouseTable.create(cat, spark, "ns", "nlres", clash.schema,
        properties = Map(Snaplog.RowLineageProp -> "true")))
    assert(e1.getMessage.contains("_row_id"), e1.getMessage)
    // late property flip through updateProperties refuses the same way
    LakehouseTable.create(cat, spark, "ns", "nlres2", clash.schema)
    val e2 = intercept[IllegalArgumentException](
      cat.updateProperties("ns", "nlres2",
        Map(Snaplog.RowLineageProp -> "true"), Seq.empty))
    assert(e2.getMessage.contains("_row_id"), e2.getMessage)
    // without the property the clashing column is ordinary user data
    assert(cat.tableExists("ns", "nlres2"))
  }

  test("re-export skips rewriting unchanged prior-snapshot manifests") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "stab",
      fixture().schema)
    tbl.append(fixture())
    tbl.append(fixture().withColumn("id", $"id" + 10))
    val dest = Files.createTempDirectory("graft-stab")
    graft.interop.IcebergExport.export(tbl, dest)
    val meta = dest.resolve("metadata")
    val m1 = meta.resolve("manifest-1.avro")
    val list1 = meta.resolve("snap-1.manifest-list.avro")
    val (t1, tl1) = (Files.getLastModifiedTime(m1),
      Files.getLastModifiedTime(list1))
    Thread.sleep(15)
    tbl.append(fixture().withColumn("id", $"id" + 20))
    graft.interop.IcebergExport.export(tbl, dest)
    // prior snapshots' manifests derive from append-only log content —
    // the fingerprint skip must leave them byte-untouched (live REST
    // serving re-exports per commit; O(new commits), not O(history))
    assert(Files.getLastModifiedTime(m1) == t1,
      "unchanged prior manifest must not rewrite")
    assert(Files.getLastModifiedTime(list1) == tl1,
      "unchanged prior manifest list must not rewrite")
    assert(Files.exists(meta.resolve("manifest-3.avro")),
      "the new snapshot's manifest must land")
    assert(Files.readString(meta.resolve("version-hint.text")).trim == "3")
    // a schema evolution CHANGES prior manifests (they embed the
    // current schema) — the skip must not survive it
    tbl.renameColumn("value2", "amount")
    graft.interop.IcebergExport.export(tbl, dest)
    assert(Files.getLastModifiedTime(m1) != t1,
      "a schema change must rewrite prior manifests")
  }

  test("changelog refuses to cross an imported-MOR commit, works from it") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "clm", fixture().schema)
    tbl.append(fixture())
    tbl.deleteEq("group", Seq("A"))
    val dest = Files.createTempDirectory("graft-clm")
    graft.interop.IcebergExport.export(tbl, dest)
    val imp = graft.interop.IcebergImport.register(cat, spark, dest, "ns", "clm_rt")
    // crossing the import commit would emit the GROSS rows as inserts
    val e = intercept[IllegalArgumentException](imp.table.scanChanges(0L))
    assert(e.getMessage.contains("import"), e.getMessage)
    // starting AT the import snapshot: later changes stream exactly
    val importSnap = imp.snapshot.snapshotId
    imp.table.append(fixture().withColumn("id", $"id" + 10))
    val ch = imp.table.scanChanges(importSnap).collect()
    assert(ch.length == 4 && ch.forall(_.getAs[String]("_change_type") == "insert"))
  }

  test("iceberg v3 export: defaulted columns round-trip UNCOMPACTED") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "v3d", fixture().schema)
    tbl.append(fixture()) // era 1 predates the column
    tbl.addColumnsDefaulted(Seq(("score", org.apache.spark.sql.types.IntegerType,
      Some("7"))))
    tbl.append(fixture().withColumn("id", $"id" + 10)
      .withColumn("score", $"value2" * 2)) // era 2: explicit values
    // v2 refuses while era-1 files lack the column physically
    val e = intercept[IllegalArgumentException] {
      graft.interop.IcebergExport.export(tbl,
        Files.createTempDirectory("graft-v3d-v2"))
    }
    assert(e.getMessage.contains("initial-default"), e.getMessage)
    // v3 expresses it: export uncompacted, walk back, re-import
    val dest = Files.createTempDirectory("graft-v3d")
    graft.interop.IcebergExport.export(tbl, dest, formatVersion = 3)
    val rb = graft.interop.IcebergExport.readBack(dest)
    assert(rb.formatVersion == 3 && rb.totalRecords == 8)
    val metaText = {
      import scala.jdk.CollectionConverters._
      Files.readString(Files.list(dest.resolve("metadata")).iterator().asScala
        .filter(_.toString.endsWith(".metadata.json")).toSeq.head)
    }.replaceAll("\\s", "")
    assert(metaText.contains("\"initial-default\":7") &&
      metaText.contains("\"next-row-id\""), metaText)
    val imp = graft.interop.IcebergImport.register(cat, spark, dest, "ns", "v3d_rt")
    // era-1 rows answer the existence default, era-2 their values
    assert(imp.table.scan().filter($"id" <= 4).select("score")
      .collect().map(_.getInt(0)).toSeq.forall(_ == 7))
    assert(imp.table.scan().filter($"id" > 10).select("score")
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(20, 40, 60, 80))
    // the imported WRITE default carries too: an appended batch without
    // the column takes it
    imp.table.append(fixture().withColumn("id", $"id" + 20))
    assert(imp.table.scan().filter($"id" > 20).select("score")
      .collect().map(_.getInt(0)).forall(_ == 7))
    // v3 + outstanding position vectors: exports as a puffin DV
    // (round 14 — the pre-r14 refusal is lifted)
    tbl.deleteMor($"id" === 1)
    val dPos = Files.createTempDirectory("graft-v3d-pos")
    graft.interop.IcebergExport.export(tbl, dPos, formatVersion = 3)
    val rbPos = graft.interop.IcebergExport.readBack(dPos)
    assert(rbPos.nPositionDeleteFiles == 1 && rbPos.deleteRecords == 1L,
      s"$rbPos")
    // …while v2 still expresses the vector as a parquet delete file
    val d2 = Files.createTempDirectory("graft-v3d-v2pos")
    val eV2 = intercept[IllegalArgumentException] {
      graft.interop.IcebergExport.export(tbl, d2)
    }
    assert(eV2.getMessage.contains("initial-default"),
      "v2 defaults gate still holds: " + eV2.getMessage)
  }

  test("iceberg export/import carries transform partition specs (days + truncate; bucket → void)") {
    val cat = freshCatalog()
    def tsOf(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    val df = Seq(
      (1L, tsOf("2024-01-01T10:00:00Z"), 105L, "x"),
      (2L, tsOf("2024-01-02T11:00:00Z"), 117L, "y"),
      (3L, tsOf("2024-01-03T12:00:00Z"), 123L, "z")
    ).toDF("id", "ts", "k", "v")
    val tbl = LakehouseTable.create(cat, spark, "ns", "tr", df.schema,
      Seq("days(ts)", "truncate(10,k)", "bucket(4,id)"))
    tbl.append(df)
    val dest = Files.createTempDirectory("graft-icetx")
    graft.interop.IcebergExport.export(tbl, dest)

    // metadata.json declares the REAL transforms (bucket as void — our
    // xxhash64 buckets are not Iceberg murmur3 buckets)
    import scala.jdk.CollectionConverters._
    val metaFile = Files.list(dest.resolve("metadata")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".metadata.json")).toSeq.head
    val metaText = Files.readString(metaFile)
    assert(metaText.contains("\"transform\" : \"day\"") ||
      metaText.contains("\"transform\":\"day\""), metaText)
    assert(metaText.contains("truncate[10]"))
    assert(metaText.contains("\"void\""))
    assert(!metaText.contains("bucket[4]"))

    // the manifest partition struct carries TYPED transform values:
    // day as epoch-day int, truncate as long, bucket as null
    val manifest = Files.list(dest.resolve("metadata")).iterator().asScala
      .filter(_.getFileName.toString.startsWith("manifest-")).toSeq.head
    val r = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
      manifest.toFile, new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    val parts = try r.iterator.asScala.toSeq.map(_
      .get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
      .get("partition").asInstanceOf[org.apache.avro.generic.GenericRecord]) finally r.close()
    assert(parts.nonEmpty)
    val days = parts.map(_.get("ts_day").asInstanceOf[Integer].intValue()).toSet
    assert(days == Set(19723, 19724, 19725), s"epoch days: $days")
    assert(parts.map(_.get("k_trunc").asInstanceOf[java.lang.Long].longValue()).toSet
      == Set(100L, 110L, 120L))
    assert(parts.forall(_.get("id_bucket") == null))

    // readBack walks it; import round-trips the day+truncate spec
    // (void/bucket dropped) with pruning intact
    val rb = graft.interop.IcebergExport.readBack(dest)
    assert(rb.nSpecFields == 3 && rb.totalRecords == 3)
    val rep = graft.interop.IcebergImport.register(cat, spark, dest, "ns", "tr_imp")
    assert(rep.partitionColumns == Seq("days(ts)", "truncate(10,k)"))
    val imp = LakehouseTable.load(cat, spark, "ns", "tr_imp")
    assert(imp.scan().orderBy("id").collect().toSeq ==
      tbl.scan().orderBy("id").collect().toSeq)
    cat.liveFiles("ns", "tr_imp").foreach { f =>
      assert(f.partitionValues.contains("ts_day") &&
        f.partitionValues.contains("k_trunc") &&
        !f.partitionValues.contains("id_bucket"), f.partitionValues.toString)
    }
    // transform pruning works on the imported metadata immediately
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Literal}
    val fields = graft.table.PartitionTransforms.parseAll(rep.partitionColumns)
    val tsAttr = AttributeReference("ts", TimestampType)()
    val jan2 = Literal(
      java.time.Instant.parse("2024-01-02T11:00:00Z").toEpochMilli * 1000L,
      TimestampType)
    val kept = cat.liveFiles("ns", "tr_imp").filter(f =>
      graft.table.PartitionTransforms.mayMatch(f, EqualTo(tsAttr, jan2), fields))
    assert(kept.size < cat.liveFiles("ns", "tr_imp").size && kept.nonEmpty)
  }

  test("managed writes scope their session confs; foreign writes see the user's") {
    val cat = freshCatalog()
    import graft.types.FieldIds
    val tsKey = "spark.sql.parquet.outputTimestampType"
    val savedTs = spark.conf.getOption(tsKey)
    val savedIds = spark.conf.getOption(FieldIds.WriteConf)
    try {
      // the user pins INT96 session-wide before any managed write
      spark.conf.set(tsKey, "INT96")
      val tbl = LakehouseTable.create(cat, spark, "ns", "confscope",
        fixture().schema, Seq("group"))
      tbl.append(fixture())
      // managed write done — the session still carries the USER's value
      assert(spark.conf.get(tsKey) == "INT96")
      // a plain parquet write BETWEEN two managed writes honors it:
      // the timestamp lands as INT96, not graft's scoped micros
      val dir = Files.createTempDirectory("plain-ts")
      Seq(("a", java.sql.Timestamp.valueOf("2024-01-02 03:04:05")))
        .toDF("k", "ts").coalesce(1)
        .write.mode("overwrite").parquet(dir.toString)
      val plainFile = graft.table.FileStats.listParquet(dir.toString).head
      def tsPhysical(path: String): String = {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(path),
          spark.sparkContext.hadoopConfiguration)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getFooter.getFileMetaData.getSchema
          .getType(Seq("ts"): _*).asPrimitiveType().getPrimitiveTypeName.toString
        finally r.close()
      }
      assert(tsPhysical(plainFile) == "INT96",
        "foreign write must inherit the user's conf, not graft's")
      // while the MANAGED write ignores the user's INT96 (scoped micros:
      // footer stats + Iceberg-v2-legal files regardless of session)
      val df2 = Seq((9, java.sql.Timestamp.valueOf("2024-03-04 05:06:07")))
        .toDF("id", "ts")
      val t2 = LakehouseTable.create(cat, spark, "ns", "confscope_ts",
        df2.schema, Seq.empty)
      t2.append(df2)
      val managedFile = cat.liveFiles("ns", "confscope_ts").head.path
      assert(tsPhysical(managedFile) == "INT64")
      assert(spark.conf.get(tsKey) == "INT96") // still the user's
      assert(spark.conf.getOption(FieldIds.WriteConf) == savedIds)
    } finally {
      savedTs.fold(spark.conf.unset(tsKey))(spark.conf.set(tsKey, _))
      savedIds.fold(spark.conf.unset(FieldIds.WriteConf))(
        spark.conf.set(FieldIds.WriteConf, _))
    }
  }

  test("nested struct/map/array columns: write, scan, stat-decline, interop, gated evolution") {
    val cat = freshCatalog()
    import org.apache.spark.sql.functions.{map => smap, array => sarr, struct => sstruct, lit => slit}
    val base = fixture()
    val df = base
      .withColumn("props", sstruct($"group".as("g"), $"value2".as("v2")))
      .withColumn("tags", smap(slit("grp"), $"group"))
      .withColumn("xs", sarr($"value2", $"value2" + 1))
    val tbl = LakehouseTable.create(cat, spark, "ns", "nested", df.schema, Seq("group"))
    tbl.append(df)
    tbl.append(df.withColumn("id", $"id" + 10))
    // scan round-trips nested content; extraction works
    val got = tbl.scan()
      .select($"id", $"props.g", $"props.v2", $"tags"("grp"), $"xs"(1))
      .orderBy("id").collect()
    assert(got.length == 8)
    assert(got.head.getString(1) == "A" && got.head.getInt(2) == 10)
    assert(got.head.getString(3) == "A" && got.head.getInt(4) == 11)
    // identity pruning on the atomic partition column still works
    assert(tbl.selectFiles(partitionFilter = Map("group" -> "B"))
      .forall(_.partitionValues.get("group").contains("B")))
    // stats: top-level primitives AND struct-leaf dot paths record
    // bounds (the per-leaf metrics file pruning consumes); list/map
    // leaves never do — an element bound is no row-predicate bound
    cat.liveFiles("ns", "nested").foreach { f =>
      val keys = f.columnStats.map(_.keySet).getOrElse(Set.empty) ++
        f.nullCounts.map(_.keySet).getOrElse(Set.empty)
      assert(f.columnStats.exists(_.contains("id")))
      assert(f.columnStats.exists(_.contains("props.g")) &&
        f.columnStats.exists(_.contains("props.v2")),
        s"struct leaf bounds missing: $keys")
      assert(!keys.exists(k => k.startsWith("xs.") || k.startsWith("tags.")),
        s"list/map leaf stat leaked: $keys")
    }
    // nested identity partitioning refuses at create
    val e1 = intercept[IllegalArgumentException] {
      LakehouseTable.create(cat, spark, "ns", "nested_bad", df.schema, Seq("props"))
    }
    assert(e1.getMessage.contains("atomic"))
    // evolution: additive works; renaming a nested column ITSELF
    // refuses (pruned reads of a renamed root would silently null —
    // FieldEvolutionSpec covers the flat rename/drop forms that DO
    // work beside nested columns)
    tbl.addColumn("note", org.apache.spark.sql.types.StringType)
    assert(tbl.schema.fieldNames.contains("note"))
    val e2 = intercept[IllegalArgumentException](tbl.renameColumn("props", "p2"))
    assert(e2.getMessage.contains("nested"))
    // iceberg export emits REAL nested schema JSON (no string fallback),
    // and the tree re-imports with the nested shape intact
    val dest = Files.createTempDirectory("graft-icenest")
    graft.interop.IcebergExport.export(tbl, dest)
    val metaText = Files.readString {
      import scala.jdk.CollectionConverters._
      Files.list(dest.resolve("metadata")).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".metadata.json")).toSeq.head
    }
    assert(metaText.contains("\"struct\"") && metaText.contains("\"list\"") &&
      metaText.contains("\"map\""), metaText)
    assert(metaText.contains("element-id") && metaText.contains("key-id"))
    // the spec's name-mapping property rides along (the sanctioned
    // fallback for resolving fields data files carry no ids for —
    // nested content here), with entries for nested children
    assert(metaText.contains("schema.name-mapping.default"), metaText)
    assert(metaText.contains("\\\"element\\\"") || metaText.contains("\"element\""),
      "name mapping must cover list elements")
    val rep = graft.interop.IcebergImport.register(cat, spark, dest, "ns", "nested_imp")
    assert(rep.schema("props").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    assert(rep.schema("tags").dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
    assert(rep.schema("xs").dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
    val imp = LakehouseTable.load(cat, spark, "ns", "nested_imp")
    assert(imp.scan().select($"id", $"props.v2").orderBy("id").collect().toSeq ==
      tbl.scan().select($"id", $"props.v2").orderBy("id").collect().toSeq)
  }

  test("mbucket: murmur3_x86_32 matches the Iceberg spec's Appendix-B vectors") {
    import graft.functions.IcebergBucketImpl._
    // published hash test values from the Iceberg table spec, Appendix B
    assert(hashLong(34L) == 2017239379, "int/long 34")
    assert(hashBytes(java.math.BigDecimal.valueOf(1420, 2) // decimal 14.20
      .unscaledValue.toByteArray) == -500754589, "decimal 14.20")
    assert(hashLong(java.time.LocalDate.of(2017, 11, 16).toEpochDay)
      == -653330422, "date 2017-11-16")
    assert(hashLong(java.time.LocalTime.of(22, 31, 8).toNanoOfDay / 1000L)
      == -662762989, "time 22:31:08 (micros)")
    assert(hashLong(java.time.Instant.parse("2017-11-16T22:31:08Z")
      .getEpochSecond * 1000000L) == -2047944441, "timestamp 2017-11-16T22:31:08")
    assert(hashBytes("iceberg".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      == 1210000089, "string 'iceberg'")
    assert(hashBytes(Array[Byte](0, 1, 2, 3)) == -188683207, "binary 00010203")
    // bucket index per spec: (hash & MaxInt) % n
    assert(bucketLong(34L, 16) == (2017239379 & Int.MaxValue) % 16)
  }

  test("mbucket export/import: REAL bucket[n] spec, external pruning, foreign import") {
    val cat = freshCatalog()
    val df = Seq(
      (1L, "alpha", 10), (2L, "beta", 20), (3L, "gamma", 30),
      (4L, "delta", 40), (5L, "epsilon", 50), (6L, "zeta", 60)
    ).toDF("id", "name", "v")
    val tbl = LakehouseTable.create(cat, spark, "ns", "mb", df.schema,
      Seq("mbucket(4,id)"))
    tbl.append(df)
    // recorded layout indexes ARE the spec's murmur3 bucket values
    import graft.functions.IcebergBucketImpl
    cat.liveFiles("ns", "mb").foreach { f =>
      val stored = f.partitionValues("id_mbucket").toInt
      // every row in the file must hash to the file's stored index
      val rows = spark.read.parquet(f.path).select("id").collect()
      rows.foreach(r => assert(
        IcebergBucketImpl.bucketLong(r.getLong(0), 4) == stored,
        s"row ${r.getLong(0)} in file with stored index $stored"))
    }
    // write/prune agreement: equality on the source column prunes to
    // exactly the literal's bucket
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Literal}
    val fields = graft.table.PartitionTransforms.parseAll(Seq("mbucket(4,id)"))
    val idAttr = AttributeReference("id", LongType)()
    val want = IcebergBucketImpl.bucketLong(3L, 4).toString
    val kept = cat.liveFiles("ns", "mb").filter(f =>
      graft.table.PartitionTransforms.mayMatch(f, EqualTo(idAttr, Literal(3L)), fields))
    assert(kept.nonEmpty &&
      kept.forall(_.partitionValues("id_mbucket") == want))
    assert(tbl.scan().filter($"id" === 3L).count() == 1)

    // export declares a REAL bucket[4] transform with typed int values
    val dest = Files.createTempDirectory("graft-icemb")
    graft.interop.IcebergExport.export(tbl, dest)
    val metaText = Files.readString {
      import scala.jdk.CollectionConverters._
      Files.list(dest.resolve("metadata")).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".metadata.json")).toSeq.head
    }
    assert(metaText.contains("bucket[4]"), metaText)
    assert(!metaText.contains("\"void\""))
    import scala.jdk.CollectionConverters._
    val manifest = Files.list(dest.resolve("metadata")).iterator().asScala
      .filter(_.getFileName.toString.startsWith("manifest-")).toSeq.head
    val r = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
      manifest.toFile, new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    val idxs = try r.iterator.asScala.toSeq.map(_
      .get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
      .get("partition").asInstanceOf[org.apache.avro.generic.GenericRecord]
      .get("id_mbucket").asInstanceOf[Integer].intValue()) finally r.close()
    assert(idxs.nonEmpty && idxs.forall(i => i >= 0 && i < 4))

    // a foreign bucket[n] tree (which this export now is, structurally)
    // imports WITH the spec — no refusal — and prunes immediately
    val rep = graft.interop.IcebergImport.register(cat, spark, dest, "ns", "mb_imp")
    assert(rep.partitionColumns == Seq("mbucket(4,id)"))
    val imp = LakehouseTable.load(cat, spark, "ns", "mb_imp")
    assert(imp.scan().orderBy("id").collect().toSeq ==
      tbl.scan().orderBy("id").collect().toSeq)
    val keptImp = cat.liveFiles("ns", "mb_imp").filter(f =>
      graft.table.PartitionTransforms.mayMatch(f, EqualTo(idAttr, Literal(3L)), fields))
    assert(keptImp.nonEmpty &&
      keptImp.forall(_.partitionValues("id_mbucket") == want))

    // int→bigint widening is ALLOWED over mbucket sources (ints hash
    // widened to long per the spec, so retained indexes stay valid) —
    // contrast with xxhash64 bucket sources which refuse
    val dfi = Seq((7, "eta")).toDF("k", "name")
    val t2 = LakehouseTable.create(cat, spark, "ns", "mbw", dfi.schema,
      Seq("mbucket(4,k)"))
    t2.append(dfi)
    t2.widenColumn("k", LongType)
    t2.append(Seq((8L, "theta")).toDF("k", "name"))
    // same-value pruning still agrees across the widening: bucket of
    // int 7 (recorded) == bucket of long 7L (pruned)
    val kAttr = AttributeReference("k", LongType)()
    val f2 = graft.table.PartitionTransforms.parseAll(Seq("mbucket(4,k)"))
    val kept2 = cat.liveFiles("ns", "mbw").filter(f =>
      graft.table.PartitionTransforms.mayMatch(f, EqualTo(kAttr, Literal(7L)), f2))
    val want7 = IcebergBucketImpl.bucketLong(7L, 4).toString
    assert(kept2.nonEmpty && kept2.forall(_.partitionValues("k_mbucket") == want7))
    assert(t2.scan().filter($"k" === 7L).count() == 1)
  }

  test("iceberg import registers an exported tree as a new table (round-trip)") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "src", fixture().schema, Seq("group"))
    tbl.append(fixture())
    tbl.append(fixture().withColumn("id", $"id" + 10))
    val dest = Files.createTempDirectory("graft-iceimp")
    graft.interop.IcebergExport.export(tbl, dest)

    val rep = graft.interop.IcebergImport.register(cat, spark, dest, "ns", "imported")
    // schema, partition spec and content all round-trip
    assert(rep.schema.map(f => (f.name, f.dataType)) ==
      tbl.schema.map(f => (f.name, f.dataType)))
    assert(rep.partitionColumns == Seq("group"))
    assert(rep.dataFiles == cat.liveFiles("ns", "src").size)
    assert(rep.totalRecords == 8)
    val imported = LakehouseTable.load(cat, spark, "ns", "imported")
    assert(imported.scan().orderBy("id").collect().toSeq ==
      tbl.scan().orderBy("id").collect().toSeq)
    // per-file stats round-trip from the manifests (no footer reads)
    val srcByPath = cat.liveFiles("ns", "src").map(f => f.path -> f).toMap
    cat.liveFiles("ns", "imported").foreach { f =>
      val src = srcByPath(f.path)
      assert(f.rowCount == src.rowCount && f.sizeBytes == src.sizeBytes)
      assert(f.partitionValues == src.partitionValues,
        s"partition tuple must survive: ${src.partitionValues} vs ${f.partitionValues}")
    }
    // identity-partition pruning works immediately on the imported table
    val pruned = imported.selectFiles(partitionFilter = Map("group" -> "A"))
    assert(pruned.nonEmpty && pruned.forall(_.partitionValues.get("group").contains("A")))
    // statFooters recovers column bounds for stat-based skipping
    val rep2 = graft.interop.IcebergImport.register(cat, spark, dest, "ns", "imported2",
      statFooters = true)
    assert(cat.liveFiles("ns", "imported2").forall(_.columnStats.exists(_.contains("id"))))
    assert(rep2.totalRecords == 8)
  }

  test("rename table is metadata-only and preserves content, history and refs") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "rn", fixture().schema, Seq("group"))
    tbl.append(fixture())
    tbl.append(fixture().withColumn("id", $"id" + 10))
    tbl.tag("v1", Some(1L))
    // an externally-registered file must survive the rename UNREWRITTEN
    val ext = Files.createTempDirectory("graft-rnext")
    fixture().withColumn("id", $"id" + 100).coalesce(1)
      .write.mode("overwrite").parquet(ext.toString)
    val extFile = graft.table.FileStats.listParquet(ext.toString).head
    tbl.addFiles(Seq(extFile))

    cat.renameTable("ns", "rn", "rn2")
    assert(!cat.tableExists("ns", "rn") && cat.tableExists("ns", "rn2"))
    val t2 = LakehouseTable.load(cat, spark, "ns", "rn2")
    assert(t2.scan().count() == 12)
    assert(t2.scan(asOf = Some(1L)).count() == 4) // time travel survives
    assert(t2.scanRef("v1").count() == 4)         // refs survive
    // partition metadata survives: recorded-value files prune exactly;
    // the value-LESS external registration survives conservatively (it
    // cannot be attributed to a partition — scan() re-filters it
    // row-level), so B/C files with recorded values are gone while the
    // external file stays
    val pruned = t2.selectFiles(partitionFilter = Map("group" -> "A"))
    assert(pruned.nonEmpty && pruned.forall(f =>
      f.partitionValues.get("group").forall(_ == "A")))
    assert(pruned.exists(_.path == extFile))
    assert(t2.scan(partitionFilter = Map("group" -> "A")).count() == 6)
    // managed paths rewrote; the external path did not
    val live = cat.liveFiles("ns", "rn2")
    assert(live.exists(_.path == extFile))
    assert(live.filterNot(_.path == extFile).forall(_.path.contains("/rn2/")),
      s"managed paths must move: ${live.map(_.path)}")
    // the renamed table accepts commits immediately (no wedged lock)
    t2.append(fixture())
    assert(t2.scan().count() == 16)
    // a history carrying delete vectors refuses (vector contents record
    // absolute data-file paths — a rename would resurrect deleted rows)
    t2.deleteMor($"id" === 1)
    val e = intercept[IllegalArgumentException] {
      cat.renameTable("ns", "rn2", "rn3")
    }
    assert(e.getMessage.contains("position-delete"))
  }

  test("vacuum age guard: fresh orphans survive, aged orphans are collected") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "vac", fixture().schema)
    tbl.append(fixture())
    // a concurrent writer's staged-but-uncommitted file looks exactly
    // like an orphan — only its age distinguishes it
    val staged = cat.dataDir("ns", "vac").resolve("snap-inflight")
      .resolve("part-00000.parquet")
    Files.createDirectories(staged.getParent)
    Files.write(staged, Array[Byte](1, 2, 3))
    assert(!cat.vacuum("ns", "vac").contains(staged.toString),
      "a fresh orphan must survive the default grace window")
    assert(Files.exists(staged))
    // aged past the threshold → a true orphan, collected
    Files.setLastModifiedTime(staged, java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 2 * Snaplog.VacuumGraceMs))
    assert(cat.vacuum("ns", "vac").contains(staged.toString))
    assert(!Files.exists(staged))
    // referenced data untouched throughout
    assert(tbl.scan().count() == 4)
  }

  test("WAP branch writes stage without touching main; fast_forward publishes") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "wap", fixture().schema)
    tbl.append(fixture()) // main: 4 rows
    val mainSnap = tbl.currentSnapshotId
    val mainFiles = cat.liveFiles("ns", "wap").map(_.path)

    val s1 = tbl.appendToBranch("audit", fixture().withColumn("id", $"id" + 10))
    assert(s1.parentId.contains(mainSnap), "first staged commit forks from main head")
    val s2 = tbl.appendToBranch("audit", fixture().withColumn("id", $"id" + 20))
    assert(s2.parentId.contains(s1.snapshotId), "staged commits chain on the branch")
    // a SECOND branch staged while the first is outstanding forks from
    // the MAIN head, never from the other branch's staged tail
    val other = tbl.appendToBranch("other", fixture().withColumn("id", $"id" + 90))
    assert(other.parentId.contains(mainSnap),
      s"second branch must fork from main ($mainSnap), got ${other.parentId}")
    assert(tbl.scanBranch("other").count() == 8)
    // main is UNTOUCHED: scan, live set, incremental view
    assert(tbl.scan().count() == 4)
    assert(cat.liveFiles("ns", "wap").map(_.path) == mainFiles)
    // the branch sees fork-base content plus both staged appends
    assert(tbl.scanBranch("audit").count() == 12)
    // staged commits are in history (auditable), marked as WAP
    assert(cat.snapshots("ns", "wap").count(Snaplog.isWapStaged) == 3)

    // publish: one conditional append of the staged files; main converges
    val pub = tbl.fastForward("audit")
    assert(tbl.scan().count() == 12)
    assert(pub.summary.get("fast-forwarded-from").contains("audit"))
    assert(pub.summary.get("published-commits").contains("2"))
    assert(cat.refs("ns", "wap")("audit").snapshotId == pub.snapshotId)

    // main advancing past a branch's fork point blocks fast-forward
    tbl.appendToBranch("audit2", fixture().withColumn("id", $"id" + 30))
    tbl.append(fixture().withColumn("id", $"id" + 40))
    val e = intercept[IllegalArgumentException] { tbl.fastForward("audit2") }
    assert(e.getMessage.contains("not fast-forwardable"))
    // ...but the branch stays auditable
    assert(tbl.scanBranch("audit2").count() == 12 + 4)
  }

  test("WAP staged data survives checkpoint folds and never leaks into main") {
    val cat = freshCatalog(checkpointInterval = 3)
    val tbl = LakehouseTable.create(cat, spark, "ns", "wapck", fixture().schema)
    tbl.append(fixture())
    tbl.appendToBranch("b", fixture().withColumn("id", $"id" + 10))
    // enough main appends to trigger an automatic checkpoint fold
    (1 to 4).foreach(i => tbl.append(fixture().withColumn("id", $"id" + 100 * i)))
    assert(cat.snapshots("ns", "wapck").exists(_.operation == Snaplog.OpCheckpoint))
    // the fold must NOT have leaked staged files into main replay
    assert(tbl.scan().count() == 4 + 16)
    // lineage replay is window-independent: the branch still reads
    // fork-base content + its staged append after the fold
    assert(tbl.scanBranch("b").count() == 4 + 4)
  }

  test("fast_forward publishes across a checkpoint fold; expired fork fails loudly") {
    // a checkpoint fold between fork and publish is a content no-op and
    // must not block fast-forward
    val cat = freshCatalog(checkpointInterval = 3)
    val tbl = LakehouseTable.create(cat, spark, "ns", "wapff", fixture().schema)
    tbl.append(fixture())
    tbl.appendToBranch("b", fixture().withColumn("id", $"id" + 10))
    tbl.appendToBranch("b", fixture().withColumn("id", $"id" + 20))
    assert(cat.snapshots("ns", "wapff").exists(_.operation == Snaplog.OpCheckpoint),
      "precondition: a fold landed between fork and publish")
    tbl.fastForward("b")
    assert(tbl.scan().count() == 12)

    // an expired fork base must fail the branch scan loudly, never
    // silently reinterpret the branch as forked-from-empty
    val cat2 = freshCatalog(checkpointInterval = 0)
    val t2 = LakehouseTable.create(cat2, spark, "ns", "wapexp", fixture().schema)
    t2.append(fixture())                                         // 1
    t2.appendToBranch("b", fixture().withColumn("id", $"id" + 10)) // 2 (parent 1)
    t2.overwrite(fixture().withColumn("id", $"id" + 20))           // 3 (reset base)
    cat2.expireSnapshots("ns", "wapexp", keepLast = 2)             // drops 1
    val e = intercept[IllegalStateException] { t2.scanBranch("b") }
    assert(e.getMessage.contains("fork lineage expired"))
  }

  test("expiration gaps never masquerade as checkpoint-only lineage") {
    val cat = freshCatalog(checkpointInterval = 0)
    LakehouseTable.create(cat, spark, "ns", "gap", fixture().schema)
    (1 to 3).foreach { i =>
      cat.commit("ns", "gap", Snaplog.OpAppend,
        Seq(graft.catalog.DataFileEntry(s"/fake/gap-$i.parquet", 1, 1, Map.empty)))
    }
    // a manual fold, then expire everything but it: the real appends
    // 2 and 3 vanish from history
    cat.commit("ns", "gap", Snaplog.OpCheckpoint, cat.liveFiles("ns", "gap"))
    cat.expireSnapshots("ns", "gap", keepLast = 1)
    // a writer that planned at snapshot 1 must CONFLICT: the surviving
    // checkpoint cannot prove the dropped 2..3 were content no-ops
    intercept[graft.catalog.CommitConflictException] {
      cat.commit("ns", "gap", Snaplog.OpOverwrite, Seq.empty,
        expectedSnapshotId = Some(1L))
    }
    ()
  }

  test("tail-block reader handles log lines larger than one block") {
    // a snapshot whose JSON spans multiple 64 KiB blocks exercises the
    // carry path of the backwards reader (the line must reassemble
    // byte-exactly across block boundaries)
    val wh = Files.createTempDirectory("graft-bigline").toString
    val cat = new Snaplog(wh)
    LakehouseTable.create(cat, spark, "ns", "big", fixture().schema)
    val pad = "x" * (3 * Snaplog.ReverseBlockBytes) // ~192 KiB single line
    cat.commit("ns", "big", Snaplog.OpAppend,
      Seq(graft.catalog.DataFileEntry("/fake/big-1.parquet", 1, 1, Map.empty)),
      Map("pad" -> pad))
    cat.commit("ns", "big", Snaplog.OpAppend,
      Seq(graft.catalog.DataFileEntry("/fake/big-2.parquet", 1, 1, Map.empty)))
    val cur = cat.currentSnapshot("ns", "big")
    assert(cur.map(_.snapshotId).contains(2L))
    val window = cat.windowSnapshots("ns", "big", None)
    assert(window.map(_.snapshotId) == Seq(1L, 2L))
    assert(window.head.summary.get("pad").contains(pad),
      "multi-block line must reassemble byte-exactly")
    assert(cat.liveFiles("ns", "big").map(_.path).sorted ==
      Seq("/fake/big-1.parquet", "/fake/big-2.parquet"))
  }

  test("concurrent WAP staging and main appends keep lineages disjoint") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "wapc", fixture().schema)
    tbl.append(fixture())
    import java.util.concurrent.Executors
    val pool = Executors.newFixedThreadPool(3)
    val rounds = 4
    val tasks = Seq(
      () => (1 to rounds).foreach(i =>
        tbl.append(fixture().withColumn("id", $"id" + 1000 * i))),
      () => (1 to rounds).foreach(i =>
        tbl.appendToBranch("a", fixture().withColumn("id", $"id" + 100 * i))),
      () => (1 to rounds).foreach(i =>
        tbl.appendToBranch("b", fixture().withColumn("id", $"id" + 10 * i))))
    val futures = tasks.map(t => pool.submit(new Runnable {
      override def run(): Unit = t()
    }))
    futures.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    // snapshot ids stayed dense under the races
    val snaps = cat.snapshots("ns", "wapc")
    assert(snaps.map(_.snapshotId) == (1L to snaps.size))
    // main sees ONLY main appends (base 4 + rounds×4)
    assert(tbl.scan().count() == 4 + rounds * 4)
    // each branch sees its fork-base main content + its own staged rows
    // (fork base = whatever main head the first staged append observed)
    val (aBase, aStaged) = cat.branchLineage("ns", "wapc", "a")
    val (bBase, bStaged) = cat.branchLineage("ns", "wapc", "b")
    assert(aStaged.size == rounds && bStaged.size == rounds)
    assert(aStaged.forall(_.summary.get(Snaplog.WapBranchKey).contains("a")))
    assert(bStaged.forall(_.summary.get(Snaplog.WapBranchKey).contains("b")))
    val aBaseRows = cat.liveFiles("ns", "wapc", aBase).map(_.rowCount).sum
    assert(tbl.scanBranch("a").count() == aBaseRows + rounds * 4)
    val bBaseRows = cat.liveFiles("ns", "wapc", bBase).map(_.rowCount).sum
    assert(tbl.scanBranch("b").count() == bBaseRows + rounds * 4)
  }

  test("conditional commits tolerate an interleaved automatic checkpoint fold") {
    val cat = freshCatalog(checkpointInterval = 3)
    LakehouseTable.create(cat, spark, "ns", "ckl", fixture().schema)
    // commit until the log head is an automatic checkpoint fold
    var i = 0
    while (cat.currentSnapshot("ns", "ckl").map(_.operation) !=
        Some(Snaplog.OpCheckpoint) && i < 10) {
      i += 1
      cat.commit("ns", "ckl", Snaplog.OpAppend,
        Seq(graft.catalog.DataFileEntry(s"/fake/ckl-$i.parquet", 1, 1, Map.empty)))
    }
    val head = cat.currentSnapshot("ns", "ckl").get
    assert(head.operation == Snaplog.OpCheckpoint)
    // a writer that planned BEFORE the fold landed sees only the
    // checkpoint between its expected snapshot and current — a content
    // no-op, so its conditional commit must land, not spuriously fail
    val landed = cat.commit("ns", "ckl", Snaplog.OpAppend,
      Seq(graft.catalog.DataFileEntry("/fake/ckl-post.parquet", 1, 1, Map.empty)),
      expectedSnapshotId = Some(head.snapshotId - 1))
    assert(landed.snapshotId == head.snapshotId + 1)
    // a REAL interleaved commit (the append before the fold) still conflicts
    intercept[graft.catalog.CommitConflictException] {
      cat.commit("ns", "ckl", Snaplog.OpAppend,
        Seq(graft.catalog.DataFileEntry("/fake/ckl-x.parquet", 1, 1, Map.empty)),
        expectedSnapshotId = Some(head.snapshotId - 2))
    }
    ()
  }

  test("tail-block reads bound hot-path byte I/O to the replay window") {
    val wh = Files.createTempDirectory("graft-tailio").toString
    val cat = new Snaplog(wh, checkpointInterval = 10)
    LakehouseTable.create(cat, spark, "ns", "tio", fixture().schema)
    // long history of synthetic commits; checkpoints fold every 10
    (1 to 1000).foreach { i =>
      cat.commit("ns", "tio", Snaplog.OpAppend,
        Seq(graft.catalog.DataFileEntry(s"/fake/tail-io-file-$i.parquet", 1, 1,
          Map.empty)))
    }
    val log = java.nio.file.Paths.get(wh, "ns", "tio", "snapshots.jsonl")
    val logSize = Files.size(log)
    assert(logSize > 4 * Snaplog.ReverseBlockBytes,
      s"history must span many blocks for the bound to mean anything ($logSize)")
    // a current-snapshot lookup reads tail blocks, not the history
    cat.tailBytesRead = 0
    assert(cat.currentSnapshot("ns", "tio").isDefined)
    assert(cat.tailBytesRead <= 2L * Snaplog.ReverseBlockBytes,
      s"currentSnapshot read ${cat.tailBytesRead} of $logSize bytes")
    // a plan-time window replay is bounded by the checkpoint interval's
    // bytes (the window = last fold + tail appends), not the log size
    cat.tailBytesRead = 0
    val window = cat.windowSnapshots("ns", "tio", None)
    assert(window.size <= 11)
    assert(cat.tailBytesRead < logSize / 4,
      s"window replay read ${cat.tailBytesRead} of $logSize bytes")
    // correctness unchanged: the bounded replay sees the full live set
    assert(cat.liveFiles("ns", "tio").size == 1000)
  }

  test("automatic checkpoints bound the replay window and preserve content") {
    val cat = freshCatalog(checkpointInterval = 5)
    LakehouseTable.create(cat, spark, "ns", "cp", fixture().schema)
    // 12 metadata-only commits (synthetic entries keep the test fast)
    (1 to 12).foreach { i =>
      cat.commit("ns", "cp", Snaplog.OpAppend,
        Seq(graft.catalog.DataFileEntry(s"/fake/f$i.parquet", 1, 1, Map.empty)))
    }
    val snaps = cat.snapshots("ns", "cp")
    assert(snaps.exists(_.operation == Snaplog.OpCheckpoint))
    // the replay window is bounded by the interval, not the history
    assert(cat.windowSnapshots("ns", "cp", None).size <= 5)
    // the folded live set is complete and deduplicated
    assert(cat.liveFiles("ns", "cp").map(_.path).sorted ==
      (1 to 12).map(i => s"/fake/f$i.parquet").sorted)
    // pre-checkpoint time travel still replays exactly
    assert(cat.liveFiles("ns", "cp", Some(3L)).map(_.path).sorted ==
      (1 to 3).map(i => s"/fake/f$i.parquet").sorted)
  }

  test("commits and current-state planning replay a bounded window, not the whole log") {
    val cat = freshCatalog()
    val tbl = LakehouseTable.create(cat, spark, "ns", "w", fixture().schema)
    tbl.append(fixture())     // snapshot 1
    tbl.overwrite(fixture())  // snapshot 2: reset base
    tbl.append(fixture())     // snapshot 3
    corruptOldestSnapshotRow(cat, "ns", "w") // poison snapshot 1, below the reset
    // full-history replay would choke on the poisoned row…
    intercept[Exception] { cat.snapshots("ns", "w") }
    // …but commit (current-snapshot lookup + window check) and scan
    // planning read only at-or-above the reset commit
    tbl.append(fixture())     // snapshot 4
    assert(tbl.scan().count() == 12)
    assert(cat.windowSnapshots("ns", "w", None).size == 3)
    assert(cat.currentSnapshot("ns", "w").map(_.snapshotId).contains(4L))
  }

  test("normalize casts, reorders, fills missing nullable columns") {
    val target = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("group", StringType, nullable = false),
      StructField("extra", DoubleType, nullable = true)))
    val in = Seq(("7", "A")).toDF("ID", "group") // case-insensitive, string id
    val out = SchemaInfer.normalize(in, target)
    assert(out.schema.fieldNames.toSeq == Seq("id", "group", "extra"))
    val r: Row = out.head()
    assert(r.getInt(0) == 7 && r.getString(1) == "A" && r.isNullAt(2))
  }

  test("per-file null counts ride the log and survive backend serialization") {
    val cat = freshCatalog()
    val df = Seq((1L, Option("a")), (2L, None: Option[String]), (3L, Option("c")))
      .toDF("id", "v")
    val t = graft.table.LakehouseTable.create(cat, spark, "ns", "nulls", df.schema)
    t.append(df.coalesce(1))
    val files = cat.liveFiles("ns", "nulls")
    assert(files.size == 1)
    val nc = files.head.nullCounts.getOrElse(
      fail(s"no null counts recorded: ${files.head}"))
    assert(nc.get("v").contains(1L), s"v null count: $nc")
    assert(nc.get("id").contains(0L), s"id null count: $nc")
  }

  test("equality delete: no data scan, sequence semantics, compaction retirement") {
    val cat = freshCatalog()
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v")
    val t = graft.table.LakehouseTable.create(cat, spark, "ns", "eqd", df.schema)
    t.append(df)
    val dataBefore = cat.liveFiles("ns", "eqd").map(_.path).toSet

    t.deleteEq("id", Seq(2L, 3L))
    // data files untouched; ONE key-valued delete file in the log
    assert(cat.liveFiles("ns", "eqd").map(_.path).toSet == dataBefore)
    val dels = cat.liveDeleteFiles("ns", "eqd")
    assert(dels.size == 1 && dels.head.equalityKey.contains("id"))
    assert(t.scan().collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 4L))

    // keyed-CDC sequencing: a LATER append of a deleted key survives
    t.append(Seq((2L, "new")).toDF("id", "v"))
    val after = t.scan().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after == Map(1L -> "a", 2L -> "new", 4L -> "d"),
      s"insert-after-delete must survive: $after")

    // a second delete applies to everything before it, incl. the re-insert
    t.deleteEq("id", Seq(4L, 2L))
    assert(t.scan().collect().map(_.getLong(0)).toSeq == Seq(1L))

    // compaction materializes the subtraction and retires the delete files
    t.compact()
    assert(cat.liveDeleteFiles("ns", "eqd").isEmpty)
    assert(t.scan().collect().map(_.getLong(0)).toSeq == Seq(1L))
    // incremental reads across an eq-delete commit return the NET delta:
    // window (1,3] = deleteEq(2,3) then append (2,"new") — the delete
    // precedes the add in replay order, so the re-insert survives whole
    val delta = t.scanIncremental(1L, Some(3L)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(delta == Seq(2L -> "new"), s"net delta: $delta")
  }

  test("incremental read nets out an in-window equality delete") {
    val cat = freshCatalog()
    val df = Seq((1L, "a")).toDF("id", "v")
    val t = graft.table.LakehouseTable.create(cat, spark, "ns", "eqinc", df.schema)
    t.append(df)                                            // snap 1
    t.append(Seq((2L, "b"), (3L, "c")).toDF("id", "v"))     // snap 2
    t.deleteEq("id", Seq(3L, 1L))                           // snap 3
    t.append(Seq((4L, "d")).toDF("id", "v"))                // snap 4
    // window (1,4]: adds {2,3}, delete {3,1}, add {4} — the delete nets
    // id=3 out of the in-window adds; id=1 predates the window (its
    // removal is not expressible in an additive delta); id=4 postdates
    // the delete and survives
    val delta = t.scanIncremental(1L).collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(delta == Seq(2L, 4L), s"net delta: $delta")
    // the full scan agrees on the table's actual content
    assert(t.scan().collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 4L))
    // a position delete in the window still refuses
    t.deleteMor(col("id") === 2L)                           // snap 5
    val ex = intercept[IllegalArgumentException] { t.scanIncremental(1L) }
    assert(ex.getMessage.contains("position"))
  }

  test("DataFrame-valued equality delete: dedup, null rejection, empty feed, SQL route") {
    val cat = freshCatalog()
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
      .toDF("id", "v")
    val t = graft.table.LakehouseTable.create(cat, spark, "ns", "eqdf", df.schema)
    t.append(df)
    val dataBefore = cat.liveFiles("ns", "eqdf").map(_.path).toSet

    // duplicated feed rows dedup in the written key file
    val feed = Seq(2L, 3L, 3L, 2L, 3L).toDF("k")
    t.deleteEq("id", feed)
    val dels = cat.liveDeleteFiles("ns", "eqdf")
    assert(dels.size == 1 && dels.head.equalityKey.contains("id"))
    assert(dels.head.rowCount == 2L, s"feed must dedup: ${dels.head}")
    assert(cat.liveFiles("ns", "eqdf").map(_.path).toSet == dataBefore)
    assert(t.scan().collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 4L, 5L))

    // a null key in the feed rejects the WHOLE feed, commits nothing
    val delsBefore = cat.liveDeleteFiles("ns", "eqdf").map(_.path).toSet
    val ex = intercept[IllegalArgumentException] {
      t.deleteEq("id", Seq(Some(4L), None).toDF("k"))
    }
    assert(ex.getMessage.contains("null"))
    assert(cat.liveDeleteFiles("ns", "eqdf").map(_.path).toSet == delsBefore)
    assert(t.scan().collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 4L, 5L))

    // an empty feed is a zero-value audit commit, not an error
    val snapsBefore = cat.snapshots("ns", "eqdf").size
    t.deleteEq("id", Seq.empty[Long].toDF("k"))
    val last = cat.snapshots("ns", "eqdf").last
    assert(cat.snapshots("ns", "eqdf").size == snapsBefore + 1 &&
      last.operation == Snaplog.OpEqDelete &&
      last.summary.get("delete-values").contains("0") && last.files.isEmpty)
    assert(t.scan().count() == 3L)

    // multi-column feeds refuse loudly
    intercept[IllegalArgumentException] {
      t.deleteEq("id", Seq((1L, "x")).toDF("k", "x"))
    }
  }

  test("composite-key equality delete: tuple semantics, replay order, null rejection") {
    val cat = freshCatalog()
    val df = Seq((1L, "us", "a"), (1L, "eu", "b"), (2L, "us", "c"), (2L, "eu", "d"))
      .toDF("uid", "region", "v")
    val t = graft.table.LakehouseTable.create(cat, spark, "ns", "ceq", df.schema)
    t.append(df)
    // delete exactly the tuples (1,eu) and (2,us): TUPLE match — a
    // column-wise IN would wrongly delete all four rows
    t.deleteEq(Seq("uid", "region"),
      Seq((1L, "eu"), (2L, "us")).toDF("uid", "region"))
    val dels = cat.liveDeleteFiles("ns", "ceq")
    assert(dels.size == 1 && dels.head.equalityKey.contains("uid,region"),
      s"composite key must encode both columns: $dels")
    assert(t.scan().select("v").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("a", "d"))
    // a re-insert of a deleted tuple survives (replay order)
    t.append(Seq((1L, "eu", "b2")).toDF("uid", "region", "v"))
    assert(t.scan().select("v").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("a", "b2", "d"))
    // null in ANY key column rejects the whole feed, commits nothing
    val delsBefore = cat.liveDeleteFiles("ns", "ceq").size
    val ex = intercept[IllegalArgumentException] {
      t.deleteEq(Seq("uid", "region"),
        Seq((Option(1L), Option.empty[String])).toDF("uid", "region"))
    }
    assert(ex.getMessage.contains("null"))
    assert(cat.liveDeleteFiles("ns", "ceq").size == delsBefore)
    // column-count mismatch and duplicate key columns refuse
    intercept[IllegalArgumentException] {
      t.deleteEq(Seq("uid", "region"), Seq(1L).toDF("uid"))
    }
    intercept[IllegalArgumentException] {
      t.deleteEq(Seq("uid", "uid"), Seq((1L, 2L)).toDF("a", "b"))
    }
    // compaction materializes the composite subtraction and retires it
    t.compact()
    assert(cat.liveDeleteFiles("ns", "ceq").isEmpty)
    assert(t.scan().select("v").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("a", "b2", "d"))
  }

  test("SQL DELETE with IN-subquery routes to the equality tier under equality mode") {
    val wh = Files.createTempDirectory("graft-eqroute").toString
    val cat = new Snaplog(wh)
    cat.createNamespace("ns")
    val cn = "geqr_" + java.lang.Long.toHexString(wh.hashCode.toLong & 0xffffffffL)
    spark.conf.set(s"spark.sql.catalog.$cn", classOf[graft.sql.GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cn.warehouse", wh)
    spark.sql(s"""CREATE TABLE $cn.ns.cdc (id BIGINT, v STRING)
      TBLPROPERTIES ('write.delete.mode'='equality')""")
    spark.sql(s"INSERT INTO $cn.ns.cdc VALUES (1,'a'),(2,'b'),(3,'c'),(4,'d')")
    val dataBefore = cat.liveFiles("ns", "cdc").map(_.path).toSet
    Seq(2L, 4L, 9L).toDF("id").createOrReplaceTempView("eqroute_feed")
    spark.sql(s"DELETE FROM $cn.ns.cdc WHERE id IN (SELECT id FROM eqroute_feed)")
    // the subquery delete must land as ONE key-valued delete file —
    // data files untouched, no COW rewrite, no position vector
    assert(cat.liveFiles("ns", "cdc").map(_.path).toSet == dataBefore,
      "IN-subquery delete must not rewrite data files")
    val dels = cat.liveDeleteFiles("ns", "cdc")
    assert(dels.size == 1 && dels.head.equalityKey.contains("id"),
      s"expected an equality delete entry: $dels")
    assert(spark.sql(s"SELECT id FROM $cn.ns.cdc ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 3L))
    // re-insert after the delete survives (replay order), visible in SQL
    spark.sql(s"INSERT INTO $cn.ns.cdc VALUES (2,'new')")
    assert(spark.sql(s"SELECT id FROM $cn.ns.cdc ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // a CONJUNCTION of equalities routes as one composite key tuple
    spark.sql(s"""CREATE TABLE $cn.ns.cdc2 (uid BIGINT, region STRING, v STRING)
      TBLPROPERTIES ('write.delete.mode'='equality')""")
    spark.sql(s"INSERT INTO $cn.ns.cdc2 VALUES " +
      "(1,'us','a'),(1,'eu','b'),(2,'us','c')")
    spark.sql(s"DELETE FROM $cn.ns.cdc2 WHERE uid = 1 AND region = 'eu'")
    val cdels = cat.liveDeleteFiles("ns", "cdc2")
    assert(cdels.size == 1 && cdels.head.equalityKey.contains("uid,region"),
      s"conjunction DELETE should take the composite equality tier: $cdels")
    assert(spark.sql(s"SELECT v FROM $cn.ns.cdc2 ORDER BY v").collect()
      .map(_.getString(0)).toSeq == Seq("a", "c"))
    // COMPOSITE-key IN-subquery: (uid, region) IN (SELECT …) lands ONE
    // tuple-valued delete file — zero data scan; a null-bearing feed
    // tuple matches nothing (SQL semantics) and drops silently
    Seq((Some(2L), Some("us")), (Some(7L), Some("eu")), (Some(1L), None))
      .toDF("uid", "region").createOrReplaceTempView("eqroute_feed2")
    val data2Before = cat.liveFiles("ns", "cdc2").map(_.path).toSet
    spark.sql(s"""DELETE FROM $cn.ns.cdc2
      WHERE (uid, region) IN (SELECT uid, region FROM eqroute_feed2)""")
    assert(cat.liveFiles("ns", "cdc2").map(_.path).toSet == data2Before,
      "composite IN-subquery delete must not rewrite data files")
    val cdels2 = cat.liveDeleteFiles("ns", "cdc2")
    assert(cdels2.size == 2 && cdels2.last.equalityKey.contains("uid,region"),
      s"expected a second composite equality entry: $cdels2")
    assert(spark.sql(s"SELECT v FROM $cn.ns.cdc2 ORDER BY v").collect()
      .map(_.getString(0)).toSeq == Seq("a"))

    // without equality mode the same statement stays on the COW path
    spark.sql(s"""CREATE TABLE $cn.ns.cow (id BIGINT, v STRING)""")
    spark.sql(s"INSERT INTO $cn.ns.cow VALUES (1,'a'),(2,'b')")
    spark.sql(s"DELETE FROM $cn.ns.cow WHERE id IN (SELECT id FROM eqroute_feed)")
    assert(cat.liveDeleteFiles("ns", "cow").forall(_.equalityKey.isEmpty),
      "non-equality table must not take the eq-delete route")
    assert(spark.sql(s"SELECT id FROM $cn.ns.cow").collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("equality-delete sequencing survives checkpoint folds") {
    // the fold re-lists the window's files by flatMap, which preserves
    // the data-vs-delete interleaving the semantics key off — prove it
    val cat = freshCatalog(checkpointInterval = 4)
    val t = graft.table.LakehouseTable.create(cat, spark, "ns", "eqck",
      Seq((0L, "x")).toDF("id", "v").schema)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))     // snap 1
    t.deleteEq("id", Seq(2L))                               // snap 2
    t.append(Seq((2L, "new")).toDF("id", "v"))              // snap 3
    // drive the window past the interval so a fold commits
    t.append(Seq((3L, "c")).toDF("id", "v"))                // snap 4 (+fold)
    t.append(Seq((4L, "d")).toDF("id", "v"))
    assert(cat.snapshots("ns", "eqck").exists(_.operation == Snaplog.OpCheckpoint),
      s"expected a checkpoint fold: ${cat.snapshots("ns", "eqck").map(_.operation)}")
    // post-fold replay must still show the re-inserted key, not resurrect
    // the deleted row and not lose the delete
    val rows = t.scan().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows == Map(1L -> "a", 2L -> "new", 3L -> "c", 4L -> "d"),
      s"fold broke eq sequencing: $rows")
    // the fold's own entry list keeps data-before-delete ordering
    val ordered = cat.liveEntriesOrdered("ns", "eqck")
    val delIdx = ordered.indexWhere(_.equalityKey.isDefined)
    assert(delIdx > 0, "delete entry must survive the fold")
    assert(ordered.take(delIdx).exists(f => !f.deleteFile.contains(true)),
      "pre-delete data must precede the delete in the folded order")
  }

  test("hidden-partition transform tuples ride the log on every backend") {
    val cat = freshCatalog()
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-01-03 10:00:00"))
    ).toDF("id", "ts")
    val t = graft.table.LakehouseTable.create(cat, spark, "ns", "hp", df.schema,
      partitionColumns = Seq("days(ts)", "bucket(2,id)"))
    assert(cat.loadTable("ns", "hp").partitionColumns ==
      Seq("days(ts)", "bucket(2,id)"))
    t.append(df)
    val files = cat.liveFiles("ns", "hp")
    assert(files.forall(f => f.partitionValues.contains("ts_day") &&
      f.partitionValues.contains("id_bucket")), s"transform tuples: $files")
    // 2024-01-01 = epoch day 19723, 2024-01-03 = 19725
    assert(files.map(_.partitionValues("ts_day")).toSet == Set("19723", "19725"))
    // scan round-trips the raw source columns
    assert(t.scan().count() == 2)
    assert(t.scan().columns.toSet == Set("id", "ts"))
  }

  test("partition evolution: metadata-only spec change, writes follow, reads stay exact") {
    val cat = freshCatalog()
    val df = fixture()
    val tbl = LakehouseTable.create(cat, spark, "ns", "pev", df.schema)
    tbl.append(df)                                 // snap 1 — unpartitioned
    val oldPaths = cat.liveFiles("ns", "pev").map(_.path).toSet
    tbl.updateSpec(Seq("group"))                   // identity evolution
    assert(cat.loadTable("ns", "pev").partitionColumns == Seq("group"))
    // zero data movement
    assert(oldPaths.subsetOf(cat.liveFiles("ns", "pev").map(_.path).toSet))
    tbl.append(df.withColumn("id", $"id" + 10))    // snap 2 — new spec
    val files = cat.liveFiles("ns", "pev")
    val (newer, older) = files.partition(_.partitionValues.contains("group"))
    assert(older.map(_.path).toSet == oldPaths && newer.nonEmpty)
    // partition-filtered scan stays EXACT over mixed coverage: the old
    // files survive pruning and the filter re-applies row-level
    assert(tbl.scan(partitionFilter = Map("group" -> "A"))
      .select("id").collect().map(_.getInt(0)).toSorted == Seq(1, 2, 11, 12))
    // validation: unknown source column and wrong transform type refuse
    intercept[IllegalArgumentException](tbl.updateSpec(Seq("nope")))
    intercept[IllegalArgumentException](tbl.updateSpec(Seq("days(group)")))
    // compaction rewrites under the CURRENT spec and restores uniformity
    tbl.compact()
    assert(cat.liveFiles("ns", "pev")
      .forall(_.partitionValues.contains("group")))
  }

  private implicit class SortedInts(a: Array[Int]) {
    def toSorted: Seq[Int] = a.toSeq.sorted
  }

  test("widenColumn: int->bigint and float->double, mixed files exact") {
    val cat = freshCatalog()
    val df = (1 to 50).map(i => (i, i * 1.5f, s"v$i")).toDF("n", "score", "v")
    val tbl = LakehouseTable.create(cat, spark, "ns", "wide", df.schema)
    tbl.append(df) // narrow files
    tbl.widenColumn("n", org.apache.spark.sql.types.LongType)
    tbl.widenColumn("score", org.apache.spark.sql.types.DoubleType)
    // new writes land wide; old files widen in the reader
    tbl.append(Seq((51L, 51 * 1.5d, "v51")).toDF("n", "score", "v"))
    val got = tbl.scan().orderBy("n").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == (1 to 51).map(i => (i.toLong, (i * 1.5f).toDouble)))
    // range pruning on the widened column still engages and stays exact
    assert(tbl.scan().filter($"n" > 49L).count() == 2)
    // an outstanding eq delete keyed NARROW still subtracts post-widen
    val tbl2 = LakehouseTable.create(cat, spark, "ns", "wide2", df.schema)
    tbl2.append(df)
    tbl2.deleteEq("n", Seq(5, 6)) // int key file
    tbl2.widenColumn("n", org.apache.spark.sql.types.LongType)
    assert(tbl2.scan().count() == 48)
    assert(tbl2.scan().filter($"n".isin(5L, 6L)).count() == 0)
  }

  test("widenColumn refusals: non-promotions and bucket sources") {
    val cat = freshCatalog()
    val df = (1 to 10).map(i => (i, s"v$i", i.toLong)).toDF("n", "v", "big")
    val tbl = LakehouseTable.create(cat, spark, "ns", "wider", df.schema)
    tbl.append(df)
    import org.apache.spark.sql.types._
    intercept[IllegalArgumentException] { tbl.widenColumn("big", IntegerType) }
    intercept[IllegalArgumentException] { tbl.widenColumn("v", LongType) }
    intercept[IllegalArgumentException] { tbl.widenColumn("n", DoubleType) }
    // decimal: precision may grow at equal scale; anything else refuses
    val dd = (1 to 5).map(i => (i, BigDecimal(i * 125, 2))).toDF("k", "d")
      .select($"k", $"d".cast(DecimalType(10, 2)).as("d"))
    val dt = LakehouseTable.create(cat, spark, "ns", "wdec", dd.schema)
    dt.append(dd)
    intercept[IllegalArgumentException] { dt.widenColumn("d", DecimalType(10, 4)) }
    intercept[IllegalArgumentException] { dt.widenColumn("d", DecimalType(8, 2)) }
    dt.widenColumn("d", DecimalType(16, 2))
    dt.append(Seq((6, BigDecimal("12345678901234.50"))).toDF("k", "d")
      .select($"k", $"d".cast(DecimalType(16, 2)).as("d")))
    assert(dt.scan().orderBy("k").collect().map(_.getDecimal(1).toString)
      .toSeq == Seq("1.25", "2.50", "3.75", "5.00", "6.25",
        "12345678901234.50"))
    // bucket sources refuse: xxhash64(int) != xxhash64(long) for equal
    // values, so retained bucket indexes would silently mis-prune
    val bt = LakehouseTable.create(cat, spark, "ns", "wbkt", df.schema,
      Seq("bucket(4,n)"))
    bt.append(df)
    intercept[IllegalArgumentException] { bt.widenColumn("n", LongType) }
    // identity partition sources pass (external text is type-stable)
    val it = LakehouseTable.create(cat, spark, "ns", "wid", df.schema, Seq("n"))
    it.append(df)
    it.widenColumn("n", LongType)
    assert(it.scan().filter($"n" === 3L).count() == 1)
  }

  test("rewriteDeleteFiles retires eq deletes, carries key-disjoint files") {
    val cat = freshCatalog()
    val lo = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val hi = (1000 to 1100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val tbl = LakehouseTable.create(cat, spark, "ns", "rdf", lo.schema)
    tbl.append(lo)
    val loPaths = cat.liveFiles("ns", "rdf").map(_.path).toSet
    tbl.append(hi)
    tbl.deleteEq("id", Seq(1005L, 1050L))
    val snap = tbl.rewriteDeleteFiles()
    assert(cat.liveDeleteFiles("ns", "rdf").isEmpty)
    val after = cat.liveFiles("ns", "rdf").map(_.path).toSet
    assert(loPaths.subsetOf(after), "disjoint lo batch was rewritten")
    assert(snap.summary("retired-delete-entries").toInt == 1)
    assert(snap.summary("rewritten-files").toInt > 0)
    assert(tbl.scan().count() == 100 + 101 - 2)
    assert(tbl.scan().filter($"id".isin(1005L, 1050L)).count() == 0)
    // second call is a no-op: nothing outstanding, no new commit
    val again = tbl.rewriteDeleteFiles()
    assert(again.snapshotId == snap.snapshotId)
  }

  test("rewriteDeleteFiles materializes position vectors, untouched files carry") {
    val cat = freshCatalog()
    val a = (1 to 50).map(i => (i.toLong, i % 5)).toDF("id", "g")
    val b = (51 to 90).map(i => (i.toLong, i % 5)).toDF("id", "g")
    val tbl = LakehouseTable.create(cat, spark, "ns", "rdfv", a.schema)
    tbl.append(a)
    val aPaths = cat.liveFiles("ns", "rdfv").map(_.path).toSet
    tbl.append(b)
    // vector touches only batch b rows
    tbl.deleteMor($"id" >= 60 && $"id" < 70)
    val snap = tbl.rewriteDeleteFiles()
    assert(cat.liveDeleteFiles("ns", "rdfv").isEmpty)
    assert(aPaths.subsetOf(cat.liveFiles("ns", "rdfv").map(_.path).toSet),
      "vector-untouched batch was rewritten")
    assert(tbl.scan().count() == 80)
    assert(tbl.scan().filter($"id" === 65L).count() == 0)
    assert(snap.summary("rewritten-files").toInt > 0)
  }

  test("rewriteDeleteFiles retires a dangling delete without touching data") {
    val cat = freshCatalog()
    val df = (1 to 40).map(i => (i.toLong, s"x$i")).toDF("id", "v")
    val tbl = LakehouseTable.create(cat, spark, "ns", "rdfd", df.schema)
    tbl.append(df)
    val paths = cat.liveFiles("ns", "rdfd").map(_.path).toSet
    // keys far outside every file's bounds: provably dangling
    tbl.deleteEq("id", Seq(100000L))
    val snap = tbl.rewriteDeleteFiles()
    assert(cat.liveDeleteFiles("ns", "rdfd").isEmpty)
    assert(paths.subsetOf(cat.liveFiles("ns", "rdfd").map(_.path).toSet))
    assert(snap.summary("rewritten-files").toInt == 0)
    assert(tbl.scan().count() == 40)
  }

  test("rewriteDeleteFiles composite-key bounds: disjoint on ANY key column carries") {
    val cat = freshCatalog()
    val a = (1 to 30).map(i => (i.toLong, "eu", i)).toDF("id", "region", "x")
    val b = (1 to 30).map(i => (i.toLong + 100, "eu", i)).toDF("id", "region", "x")
    val tbl = LakehouseTable.create(cat, spark, "ns", "rdfc", a.schema)
    tbl.append(a)
    val aPaths = cat.liveFiles("ns", "rdfc").map(_.path).toSet
    tbl.append(b)
    tbl.deleteEq(Seq("id", "region"),
      Seq((105L, "eu"), (110L, "eu")).toDF("id", "region"))
    tbl.rewriteDeleteFiles()
    assert(cat.liveDeleteFiles("ns", "rdfc").isEmpty)
    // batch a: id bounds [1,30] disjoint from delete id bounds [105,110]
    assert(aPaths.subsetOf(cat.liveFiles("ns", "rdfc").map(_.path).toSet))
    assert(tbl.scan().count() == 58)
  }

  test("rewriteDeleteFiles string keys: lexicographic bounds, no numeric-parse resurrection") {
    // {"1","100","20"} records LEXICOGRAPHIC bounds ["1","20"]; parsed
    // numerically that interval (1,20) excludes the contained "100", so
    // a numeric-parse attribution would judge the file disjoint from a
    // delete for "100", carry it by path, retire the delete — and the
    // deleted row would resurrect. The attribution must compare string
    // bounds in the string domain.
    val cat = freshCatalog()
    val df = Seq(("1", 1), ("100", 2), ("20", 3)).toDF("k", "x")
    val tbl = LakehouseTable.create(cat, spark, "ns", "rdfs", df.schema)
    tbl.append(df)
    tbl.deleteEq("k", Seq("100"))
    assert(tbl.scan().count() == 2)
    tbl.rewriteDeleteFiles()
    assert(cat.liveDeleteFiles("ns", "rdfs").isEmpty)
    assert(tbl.scan().count() == 2, "string-keyed deleted row resurrected")
    assert(tbl.scan().filter($"k" === "100").count() == 0)
    // the sound direction still carries: a delete lexicographically
    // disjoint from a file's bounds leaves it untouched
    val df2 = Seq(("aa", 1), ("ab", 2)).toDF("k", "x")
    val t2 = LakehouseTable.create(cat, spark, "ns", "rdfs2", df2.schema)
    t2.append(df2)
    val paths = cat.liveFiles("ns", "rdfs2").map(_.path).toSet
    t2.append(Seq(("zz", 9)).toDF("k", "x"))
    t2.deleteEq("k", Seq("zz"))
    t2.rewriteDeleteFiles()
    assert(paths.subsetOf(cat.liveFiles("ns", "rdfs2").map(_.path).toSet),
      "lexicographically-disjoint file was rewritten")
    assert(t2.scan().count() == 2)
  }

  test("rewriteDeleteFiles preserves eq-delete replay order exactly") {
    // key deleted, then re-appended: the re-appended row must survive
    val cat = freshCatalog()
    val df = Seq((1L, "old"), (2L, "keep")).toDF("id", "v")
    val tbl = LakehouseTable.create(cat, spark, "ns", "rdfo", df.schema)
    tbl.append(df)
    tbl.deleteEq("id", Seq(1L))
    tbl.append(Seq((1L, "new")).toDF("id", "v"))
    tbl.rewriteDeleteFiles()
    assert(cat.liveDeleteFiles("ns", "rdfo").isEmpty)
    val got = tbl.scan().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "new"), (2L, "keep")))
  }


  test("write.bloom-filter-columns stamps parquet bloom filters; reads exact") {
    val cat = freshCatalog()
    val df = (1 to 2000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val tbl = LakehouseTable.create(cat, spark, "ns", "bloom", df.schema,
      properties = Map("write.bloom-filter-columns" -> "id"))
    tbl.append(df)
    // every data file's footer carries a bloom filter for `id` (offset
    // recorded per row group) and none for the unlisted column
    val conf = spark.sessionState.newHadoopConf()
    cat.liveFiles("ns", "bloom").foreach { f =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.path), conf))
      try {
        import scala.jdk.CollectionConverters._
        r.getFooter.getBlocks.asScala.foreach { b =>
          val byName = b.getColumns.asScala.map(c => c.getPath.toDotString -> c).toMap
          assert(byName("id").getBloomFilterOffset >= 0,
            s"no bloom filter for 'id' in ${f.path}")
          assert(byName("v").getBloomFilterOffset < 0,
            s"unexpected bloom filter for 'v' in ${f.path}")
        }
      } finally r.close()
    }
    // point lookups through the filtered scan stay exact
    assert(tbl.scan().filter($"id" === 777L).collect()
      .map(_.getString(1)).toSeq == Seq("v777"))
    assert(tbl.scan().filter($"id".isin(5L, 1999L)).count() == 2)
    // an unknown column in the property refuses loudly at write time
    val bad = LakehouseTable.create(cat, spark, "ns", "bloom2", df.schema,
      properties = Map("write.bloom-filter-columns" -> "nope"))
    intercept[IllegalArgumentException] { bad.append(df) }
  }

  test("write.sort-order clusters appends into disjoint-bound files") {
    val cat = freshCatalog()
    val df = (1 to 40).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val tbl = LakehouseTable.create(cat, spark, "ns", "so", df.schema,
      properties = Map("write.sort-order" -> "id"))
    tbl.append(df.repartition(4)) // hash-shuffled input, 4 tasks
    val bounds = cat.liveFiles("ns", "so")
      .flatMap(_.columnStats.flatMap(_.get("id")))
      .map(b => (b.min.toInt, b.max.toInt)).sortBy(_._1)
    assert(bounds.size > 1)
    // range-clustered: consecutive files never overlap on the sort key
    bounds.sliding(2).foreach { case Seq(a, b) => assert(a._2 < b._1) }
    // a low-range scan prunes from metadata alone
    val kept = tbl.selectFiles(rangeFilter =
      Map("id" -> (Option.empty[Double], Some(5.0)))).size
    assert(kept < bounds.size)
    // exact rows regardless
    assert(tbl.scan(rangeFilter = Map("id" -> (None, Some(5.0))))
      .filter($"id" <= 5).count() == 5)
    // unknown sort column fails the write loudly
    val bad = LakehouseTable.create(cat, spark, "ns", "sobad", df.schema,
      properties = Map("write.sort-order" -> "nope"))
    intercept[IllegalArgumentException](bad.append(df))
  }
}

/** The file-backed implementation (JSON/JSONL + lock file). */
class SnaplogSpec extends CatalogContractSpec {
  override def freshCatalog(checkpointInterval: Int): Catalog =
    new Snaplog(Files.createTempDirectory("graft-wh").toString, checkpointInterval)

  override def corruptOldestSnapshotRow(cat: Catalog, ns: String, t: String): Unit = {
    val log = java.nio.file.Paths.get(
      cat.asInstanceOf[Snaplog].warehouse, ns, t, "snapshots.jsonl")
    val lines = Files.readAllLines(log)
    lines.set(0, "{corrupt")
    Files.write(log, lines)
    ()
  }
}

/** The embedded-Derby SQL implementation — the reference's
  * `catalog_type: "sql"` deployment shape; concurrency via the
  * snapshot primary key instead of a lock file. */
class JdbcCatalogSpec extends CatalogContractSpec {
  override def freshCatalog(checkpointInterval: Int): Catalog = {
    val dir = Files.createTempDirectory("graft-jdbc")
    new JdbcCatalog(s"jdbc:derby:$dir/cat;create=true", s"$dir/wh", checkpointInterval)
  }

  override def corruptOldestSnapshotRow(cat: Catalog, ns: String, t: String): Unit = {
    val c = java.sql.DriverManager.getConnection(cat.asInstanceOf[JdbcCatalog].jdbcUrl)
    try {
      val ps = c.prepareStatement(
        "UPDATE graft_snapshots SET body = '{corrupt' WHERE ns = ? AND tbl = ? " +
          "AND snapshot_id = (SELECT MIN(snapshot_id) FROM graft_snapshots " +
          "WHERE ns = ? AND tbl = ?)")
      ps.setString(1, ns); ps.setString(2, t); ps.setString(3, ns); ps.setString(4, t)
      ps.executeUpdate(); ps.close()
    } finally c.close()
  }
}
