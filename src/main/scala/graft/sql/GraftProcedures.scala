package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.catalog.Catalog
import graft.table.LakehouseTable

/** Maintenance operations callable from SQL — `CALL cat.system.<proc>`
  * via Spark's DSv2 procedure API. Each procedure is a thin binding
  * over the SAME transactional operation the native API runs (per-table
  * commit mutex / conditional commit inside), so `CALL` gets identical
  * concurrency semantics, and each returns a one-row result scan
  * summarizing what happened. The reference drives maintenance through
  * its table API (compaction/expiration in `maintenance.py`); exposing
  * it through `CALL` completes the SQL-only user's surface the same way
  * Iceberg's Spark procedures do.
  *
  * Every procedure is driver-side METADATA work except `compact`, whose
  * data movement is one distributed repartition job — none of them
  * collect table data to the driver.
  */
private[sql] object GraftProcedures {

  val Names: Seq[String] =
    Seq("compact", "expire_snapshots", "expire_snapshots_older_than",
      "vacuum", "set_ref", "drop_ref", "fast_forward", "rollback_to_snapshot",
      "update_partition_spec", "rewrite_data_files", "rewrite_delete_files",
      "create_changelog_view", "merge_delta",
      "iceberg_export", "iceberg_import", "iceberg_refresh",
      "iceberg_register_rest", "analyze_table", "enable_row_lineage")

  def load(catName: String, name: String, backing: Catalog): UnboundProcedure =
    name.toLowerCase(java.util.Locale.ROOT) match {
      case "compact" => proc(name,
        "rewrite live data files toward a target size (optionally sorted); " +
          "one conditional replace commit",
        Seq("ns" -> StringType, "tbl" -> StringType, "sort_by" -> StringType),
        StructType(Seq(
          StructField("snapshot_id", LongType, nullable = false),
          StructField("live_files", IntegerType, nullable = false)))) { in =>
        val (ns, t) = (in.getUTF8String(0).toString, in.getUTF8String(1).toString)
        val sortBy = in.getUTF8String(2).toString.split(',').map(_.trim)
          .filter(_.nonEmpty).toSeq
        val tbl = LakehouseTable.load(backing, SparkSession.active, ns, t)
        val snap = tbl.compact(sortBy = sortBy)
        row(snap.snapshotId, backing.liveFiles(ns, t).size)
      }
      case "analyze_table" => proc(name,
        "one-pass ANALYZE: per-column NDV theta sketches persisted as a " +
          "puffin statistics file + a property summary the planner reads " +
          "(CBO selectivity, join reordering, plan-time broadcast); " +
          "histogram_columns adds equi-height histograms for range " +
          "estimation over skewed distributions",
        Seq("ns" -> StringType, "tbl" -> StringType, "columns" -> StringType,
          "histogram_columns" -> StringType,
          "incremental" -> org.apache.spark.sql.types.BooleanType),
        StructType(Seq(
          StructField("snapshot_id", LongType, nullable = false),
          StructField("analyzed_columns", IntegerType, nullable = false),
          StructField("summary", StringType, nullable = false)))) { in =>
        val (ns, t) = (in.getUTF8String(0).toString, in.getUTF8String(1).toString)
        def csv(i: Int) = in.getUTF8String(i).toString.split(',').map(_.trim)
          .filter(_.nonEmpty).toSeq
        val tbl = LakehouseTable.load(backing, SparkSession.active, ns, t)
        val summary =
          if (in.getBoolean(4)) {
            require(csv(2).isEmpty && csv(3).isEmpty,
              "incremental ANALYZE continues the stored column set — " +
                "pass empty columns/histogram_columns")
            // stats adopted from a foreign ANCESTOR snapshot leave a
            // never-sketched gap no sketch union can close — operators
            // script this CALL, so degrade to the full pass (which
            // clears the marker) with a logged notice instead of
            // erroring the pipeline (round 16; the native
            // analyzeIncremental stays strict)
            if (tbl.meta.properties
                .contains(graft.table.TableStats.AdoptedAncestorProp)) {
              System.err.println(s"analyze_table($ns.$t, incremental=true): stored " +
                "statistics were adopted from a foreign ancestor " +
                "snapshot — the gap rows were never sketched; degrading " +
                "to a FULL analyze (clears the adoption marker)")
              tbl.analyze()
            } else tbl.analyzeIncremental()
          } else tbl.analyze(csv(2), histogramColumns = csv(3))
        row(tbl.currentSnapshotId, summary.size,
          UTF8String.fromString(
            graft.table.TableStats.encodeSummary(summary)))
      }
      case "enable_row_lineage" => proc(name,
        "flip the table to native Iceberg-v3 row lineage: history is " +
          "backfilled in listing order (metadata-only) and every " +
          "subsequent commit assigns first_row_id/data-sequence — " +
          "_row_id/_last_updated_sequence_number then serve via " +
          "scanLineage() and the <table>.lineage relation",
        Seq("ns" -> StringType, "tbl" -> StringType),
        StructType(Seq(
          StructField("next_row_id", LongType, nullable = false),
          StructField("snapshot_id", LongType, nullable = false)))) { in =>
        val (ns, t) = (in.getUTF8String(0).toString, in.getUTF8String(1).toString)
        val tbl = LakehouseTable.load(backing, SparkSession.active, ns, t)
        tbl.enableRowLineage()
        val next = backing.currentSnapshot(ns, t)
          .flatMap(_.summary.get(graft.catalog.Snaplog.NextRowIdKey))
          .flatMap(_.toLongOption).getOrElse(0L)
        row(next, tbl.currentSnapshotId)
      }
      case "expire_snapshots" => proc(name,
        "drop history older than the last N snapshots (refs pin their targets)",
        Seq("ns" -> StringType, "tbl" -> StringType, "keep_last" -> IntegerType),
        StructType(Seq(
          StructField("expired", IntegerType, nullable = false),
          StructField("current_snapshot", LongType, nullable = false)))) { in =>
        val (ns, t) = (in.getUTF8String(0).toString, in.getUTF8String(1).toString)
        val before = backing.snapshots(ns, t).size
        val kept = backing.expireSnapshots(ns, t, in.getInt(2)) // returns KEPT
        row(before - kept.size,
          backing.currentSnapshot(ns, t).map(_.snapshotId).getOrElse(0L))
      }
      case "expire_snapshots_older_than" => proc(name,
        "retention-policy expiration: drop snapshots committed before the " +
          "timestamp, always retaining the last N",
        Seq("ns" -> StringType, "tbl" -> StringType,
          "older_than_ms" -> LongType, "retain_last" -> IntegerType),
        StructType(Seq(
          StructField("expired", IntegerType, nullable = false),
          StructField("current_snapshot", LongType, nullable = false)))) { in =>
        val (ns, t) = (in.getUTF8String(0).toString, in.getUTF8String(1).toString)
        val before = backing.snapshots(ns, t).size
        val kept = backing.expireSnapshotsOlderThan(ns, t, in.getLong(2),
          retainLast = in.getInt(3))
        row(before - kept.size,
          backing.currentSnapshot(ns, t).map(_.snapshotId).getOrElse(0L))
      }
      case "vacuum" => proc(name,
        "delete orphan files no snapshot references and older than grace_ms " +
          "(the remove-orphan-files age guard; 0 only under exclusive access)",
        Seq("ns" -> StringType, "tbl" -> StringType, "grace_ms" -> LongType),
        StructType(Seq(
          StructField("deleted_files", IntegerType, nullable = false),
          StructField("deleted_data_files", IntegerType, nullable = false)))) { in =>
        val (ns, t) = (in.getUTF8String(0).toString, in.getUTF8String(1).toString)
        val deleted = backing.vacuum(ns, t, graceMs = in.getLong(2))
        // split out parquet data files from write-protocol droppings
        // (_SUCCESS, .crc): the data-file count is the auditable signal
        row(deleted.size, deleted.count(_.endsWith(".parquet")))
      }
      case "set_ref" => proc(name,
        "create or move a named ref (tag/branch) to a snapshot",
        Seq("ns" -> StringType, "tbl" -> StringType, "name" -> StringType,
          "snapshot_id" -> LongType, "ref_type" -> StringType),
        StructType(Seq(
          StructField("name", StringType, nullable = false),
          StructField("type", StringType, nullable = false),
          StructField("snapshot_id", LongType, nullable = false)))) { in =>
        val (ns, t) = (in.getUTF8String(0).toString, in.getUTF8String(1).toString)
        val refName = in.getUTF8String(2).toString
        val ref = backing.setRef(ns, t, refName, in.getLong(3),
          refType = in.getUTF8String(4).toString)
        row(UTF8String.fromString(refName), UTF8String.fromString(ref.refType),
          ref.snapshotId)
      }
      case "drop_ref" => proc(name,
        "drop a named ref (tag/branch) — how an audited-and-rejected WAP " +
          "branch is abandoned from SQL (expiration + vacuum then collect it)",
        Seq("ns" -> StringType, "tbl" -> StringType, "name" -> StringType),
        StructType(Seq(
          StructField("dropped", StringType, nullable = false),
          StructField("existed", org.apache.spark.sql.types.BooleanType,
            nullable = false)))) { in =>
        val (ns, t) = (in.getUTF8String(0).toString, in.getUTF8String(1).toString)
        val refName = in.getUTF8String(2).toString
        val existed = backing.refs(ns, t).contains(refName)
        backing.dropRef(ns, t, refName)
        row(UTF8String.fromString(refName), existed)
      }
      case "fast_forward" => proc(name,
        "publish a WAP branch's staged commits onto main (one conditional " +
          "append); fails if main advanced past the fork point",
        Seq("ns" -> StringType, "tbl" -> StringType, "branch" -> StringType),
        StructType(Seq(
          StructField("snapshot_id", LongType, nullable = false),
          StructField("published_files", LongType, nullable = false)))) { in =>
        val (ns, t) = (in.getUTF8String(0).toString, in.getUTF8String(1).toString)
        val tbl = LakehouseTable.load(backing, SparkSession.active, ns, t)
        val snap = tbl.fastForward(in.getUTF8String(2).toString)
        row(snap.snapshotId, snap.files.size.toLong)
      }
      case "rollback_to_snapshot" => proc(name,
        "restore the live content of an earlier snapshot as a NEW " +
          "metadata-only overwrite commit (zero data movement; later " +
          "history stays time-travelable)",
        Seq("ns" -> StringType, "tbl" -> StringType, "snapshot_id" -> LongType),
        StructType(Seq(
          StructField("snapshot_id", LongType, nullable = false),
          StructField("restored_snapshot", LongType, nullable = false),
          StructField("live_files", IntegerType, nullable = false)))) { in =>
        val (ns, t) = (in.getUTF8String(0).toString, in.getUTF8String(1).toString)
        val tbl = LakehouseTable.load(backing, SparkSession.active, ns, t)
        val snap = tbl.rollbackTo(in.getLong(2))
        row(snap.snapshotId, in.getLong(2), snap.files.size)
      }
      case "update_partition_spec" => proc(name,
        "replace the partition spec metadata-only (partition evolution): " +
          "new writes lay out under the new spec, existing files keep " +
          "their recorded values and prune conservatively; spec is a " +
          "comma-separated field list, e.g. 'days(ts),bucket(4,id)'",
        Seq("ns" -> StringType, "tbl" -> StringType, "spec" -> StringType),
        StructType(Seq(
          StructField("partition_spec", StringType, nullable = false)))) { in =>
        val (ns, t) = (in.getUTF8String(0).toString, in.getUTF8String(1).toString)
        val cols = splitSpecs(in.getUTF8String(2).toString)
        val tbl = LakehouseTable.load(backing, SparkSession.active, ns, t)
        val m = tbl.updateSpec(cols)
        row(UTF8String.fromString(m.partitionColumns.mkString(",")))
      }
      case "rewrite_data_files" => proc(name,
        "partial compaction: rewrite only live data files smaller than " +
          "the threshold (bin-packing the small-file tail); everything " +
          "else — including outstanding delete entries — carries by path " +
          "in one conditional replace commit",
        Seq("ns" -> StringType, "tbl" -> StringType,
          "smaller_than_bytes" -> LongType),
        StructType(Seq(
          StructField("snapshot_id", LongType, nullable = false),
          StructField("rewritten_files", IntegerType, nullable = false),
          StructField("carried_files", IntegerType, nullable = false)))) { in =>
        val (ns, t) = (in.getUTF8String(0).toString, in.getUTF8String(1).toString)
        val tbl = LakehouseTable.load(backing, SparkSession.active, ns, t)
        val snap = tbl.rewriteSmallFiles(in.getLong(2))
        row(snap.snapshotId,
          snap.summary.get("rewritten-files").map(_.toInt).getOrElse(0),
          snap.summary.get("carried-files").map(_.toInt).getOrElse(0))
      }
      case "rewrite_delete_files" => proc(name,
        "retire the delete tier delta-sized (Iceberg's " +
          "rewrite_position_delete_files + dangling-delete removal): " +
          "data files a position vector touches or an equality delete's " +
          "key bounds overlap re-materialize through MOR application; " +
          "every other file carries by path; no delete entry survives. " +
          "Content identical",
        Seq("ns" -> StringType, "tbl" -> StringType),
        StructType(Seq(
          StructField("snapshot_id", LongType, nullable = false),
          StructField("rewritten_files", IntegerType, nullable = false),
          StructField("retired_delete_entries", IntegerType, nullable = false),
          StructField("carried_files", IntegerType, nullable = false)))) { in =>
        val (ns, t) = (in.getUTF8String(0).toString, in.getUTF8String(1).toString)
        val tbl = LakehouseTable.load(backing, SparkSession.active, ns, t)
        val before = tbl.currentSnapshotId
        val snap = tbl.rewriteDeleteFiles()
        // no-op (nothing outstanding) returns the PRIOR snapshot — its
        // summary describes that commit, not this call; report zeros
        def c(k: String) =
          if (snap.snapshotId == before) 0
          else snap.summary.get(k).map(_.toInt).getOrElse(0)
        row(snap.snapshotId, c("rewritten-files"),
          c("retired-delete-entries"), c("carried-files"))
      }
      case "create_changelog_view" => proc(name,
        "register the row-level changelog of (from_snapshot, to_snapshot] " +
          "as a temp view (Iceberg's create_changelog_view): rows stamped " +
          "_change_type/_commit_snapshot_id/_commit_timestamp; " +
          "to_snapshot = 0 means current; identifier_columns (comma list, " +
          "may be empty) refines same-commit delete+insert pairs into " +
          "update_preimage/update_postimage images. Passing the single " +
          "value _row_id pairs by DURABLE ROW IDENTITY instead (round " +
          "17): the view rides scanChangesKeyedByRowId on a row-lineage " +
          "table — change rows carry _row_id/_last_updated_sequence_" +
          "number, and a MERGE's images pair with no declared keys",
        Seq("ns" -> StringType, "tbl" -> StringType, "view_name" -> StringType,
          "from_snapshot" -> LongType, "to_snapshot" -> LongType,
          "identifier_columns" -> StringType),
        StructType(Seq(
          StructField("view_name", StringType, nullable = false),
          StructField("from_snapshot", LongType, nullable = false),
          StructField("to_snapshot", LongType, nullable = false)))) { in =>
        val (ns, t) = (in.getUTF8String(0).toString, in.getUTF8String(1).toString)
        val viewName = in.getUTF8String(2).toString
        val from = in.getLong(3)
        val toOpt = in.getLong(4) match { case 0L => None; case v => Some(v) }
        val keys = in.getUTF8String(5).toString.split(',').map(_.trim)
          .filter(_.nonEmpty).toSeq
        val tbl = LakehouseTable.load(backing, SparkSession.active, ns, t)
        val ch =
          if (keys.isEmpty) tbl.scanChanges(from, toOpt)
          else if (keys.map(_.toLowerCase(java.util.Locale.ROOT)) ==
              Seq(graft.types.FieldIds.RowIdCol))
            tbl.scanChangesKeyedByRowId(from, toOpt)
          else tbl.scanChangesKeyed(keys, from, toOpt)
        ch.createOrReplaceTempView(viewName)
        row(UTF8String.fromString(viewName), from,
          toOpt.getOrElse(tbl.currentSnapshotId))
      }
      case "merge_delta" => proc(name,
        "delta-sized merge-on-read MERGE from SQL: upsert the rows of a " +
          "registered view/table into the target keyed by key_columns " +
          "(comma list) — ONE commit carrying an equality-delete key file " +
          "plus the batch's data files; pre-existing files carry by path " +
          "untouched. A non-empty op_column treats its 'D' rows as " +
          "deletes (CDC apply); every other op upserts",
        Seq("ns" -> StringType, "tbl" -> StringType,
          "key_columns" -> StringType, "source" -> StringType,
          "op_column" -> StringType),
        StructType(Seq(
          StructField("snapshot_id", LongType, nullable = false),
          StructField("delete_values", LongType, nullable = false),
          StructField("merged_rows", LongType, nullable = false)))) { in =>
        val (ns, t) = (in.getUTF8String(0).toString, in.getUTF8String(1).toString)
        val keys = in.getUTF8String(2).toString.split(',').map(_.trim)
          .filter(_.nonEmpty).toSeq
        require(keys.nonEmpty, "merge_delta needs at least one key column")
        val sourceName = in.getUTF8String(3).toString
        val opCol = in.getUTF8String(4).toString.trim
        val spark = SparkSession.active
        val src = spark.table(sourceName)
        val tbl = LakehouseTable.load(backing, spark, ns, t)
        val snap =
          if (opCol.isEmpty) graft.pipeline.Upsert.upsertTable(tbl, src, keys)
          else graft.pipeline.Upsert.applyChanges(tbl, src, keys, opCol)
        row(snap.snapshotId,
          snap.summary.get("delete-values").map(_.toLong).getOrElse(0L),
          snap.summary.get("merge-rows").map(_.toLong).getOrElse(0L))
      }
      // the interop pair — Iceberg's own register_table/snapshot Spark
      // procedures, from the other side: SQL-only users publish and
      // adopt metadata trees without the Scala API
      case "iceberg_export" => proc(name,
        "write an Iceberg v2/v3 metadata tree for the table under dest " +
          "(metadata-only, data files referenced in place; outstanding " +
          "merge-on-read state exports as v2 delete manifests; " +
          "format_version 3 additionally carries column defaults as " +
          "initial-default)",
        Seq("ns" -> StringType, "tbl" -> StringType, "dest" -> StringType,
          "format_version" -> IntegerType),
        StructType(Seq(
          StructField("metadata_file", StringType, nullable = false),
          StructField("snapshots", IntegerType, nullable = false),
          StructField("data_files", LongType, nullable = false),
          StructField("delete_files", LongType, nullable = false),
          StructField("total_records", LongType, nullable = false)))) { in =>
        val (ns, t) = (in.getUTF8String(0).toString, in.getUTF8String(1).toString)
        val dest = java.nio.file.Paths.get(in.getUTF8String(2).toString)
        val tbl = LakehouseTable.load(backing, SparkSession.active, ns, t)
        val rep = graft.interop.IcebergExport.export(tbl, dest, in.getInt(3))
        row(UTF8String.fromString(rep.metadataFile.toString),
          rep.manifestLists, rep.dataFiles, rep.deleteFiles, rep.totalRecords)
      }
      case "iceberg_import" => proc(name,
        "register a foreign Iceberg v2/v3 tree as a NEW table " +
          "(metadata-only: the current snapshot's data files are " +
          "referenced in place; position/equality delete files become " +
          "native merge-on-read state; stat_footers=1 adds a footer-only " +
          "pass recovering per-column bounds for file skipping)",
        Seq("ns" -> StringType, "tbl" -> StringType, "root" -> StringType,
          "stat_footers" -> IntegerType),
        StructType(Seq(
          StructField("snapshot_id", LongType, nullable = false),
          StructField("data_files", IntegerType, nullable = false),
          StructField("position_delete_files", IntegerType, nullable = false),
          StructField("equality_delete_files", IntegerType, nullable = false),
          StructField("total_records", LongType, nullable = false)))) { in =>
        val (ns, t) = (in.getUTF8String(0).toString, in.getUTF8String(1).toString)
        val rep = graft.interop.IcebergImport.register(backing,
          SparkSession.active, java.nio.file.Paths.get(in.getUTF8String(2).toString),
          ns, t, statFooters = in.getInt(3) != 0)
        row(rep.snapshot.snapshotId, rep.dataFiles, rep.positionDeleteFiles,
          rep.equalityDeleteFiles, rep.totalRecords)
      }
      case "iceberg_refresh" => proc(name,
        "re-sync a table adopted from an Iceberg tree with its live " +
          "source: new source snapshots land as native commits " +
          "(per_snapshot=1 replays ONE native commit per source snapshot " +
          "— streaming/changelog-readable history; 0 folds the window " +
          "into one delta commit); a source rewrite lands as one reset; " +
          "an unchanged source is a no-op",
        Seq("ns" -> StringType, "tbl" -> StringType,
          "per_snapshot" -> IntegerType),
        StructType(Seq(
          StructField("from_source_snapshot", LongType, nullable = false),
          StructField("to_source_snapshot", LongType, nullable = false),
          StructField("commits", IntegerType, nullable = false),
          StructField("data_files", IntegerType, nullable = false),
          StructField("delete_files", IntegerType, nullable = false),
          StructField("reset", IntegerType, nullable = false)))) { in =>
        val (ns, t) = (in.getUTF8String(0).toString, in.getUTF8String(1).toString)
        val r = graft.interop.IcebergImport.refresh(backing,
          SparkSession.active, ns, t, perSnapshot = in.getInt(2) != 0)
        row(r.fromSourceSnapshotId, r.toSourceSnapshotId, r.commits,
          r.dataFilesAdded, r.positionDeleteFiles + r.equalityDeleteFiles,
          if (r.reset) 1 else 0)
      }
      case "iceberg_register_rest" => proc(name,
        "adopt a table FROM AN ICEBERG REST CATALOG service (metadata-" +
          "only, like iceberg_import but through the catalog's current " +
          "pointer; later iceberg_refresh re-fetches that pointer). " +
          "Tokened catalogs use the Scala API — a bearer token in SQL " +
          "text would land in query logs",
        Seq("ns" -> StringType, "tbl" -> StringType,
          "endpoint" -> StringType, "src_ns" -> StringType,
          "src_table" -> StringType),
        StructType(Seq(
          StructField("snapshot_id", LongType, nullable = false),
          StructField("data_files", IntegerType, nullable = false),
          StructField("position_delete_files", IntegerType, nullable = false),
          StructField("equality_delete_files", IntegerType, nullable = false),
          StructField("total_records", LongType, nullable = false)))) { in =>
        val (ns, t) = (in.getUTF8String(0).toString, in.getUTF8String(1).toString)
        val rep = graft.interop.IcebergImport.registerFromRest(backing,
          SparkSession.active, in.getUTF8String(2).toString,
          in.getUTF8String(3).toString, in.getUTF8String(4).toString, ns, t)
        row(rep.snapshot.snapshotId, rep.dataFiles, rep.positionDeleteFiles,
          rep.equalityDeleteFiles, rep.totalRecords)
      }
      case other => throw new UnsupportedOperationException(
        s"$catName has no procedure '$other' — available: ${Names.mkString(", ")}")
    }

  private def row(vs: Any*): InternalRow = new GenericInternalRow(vs.toArray)

  /** Split a spec list on TOP-LEVEL commas only — `bucket(4,id)` keeps
    * its argument comma. */
  private def splitSpecs(s: String): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 =>
        if (cur.toString.trim.nonEmpty) out += cur.toString.trim
        cur.clear()
      case c => cur += c
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString.trim
    out.toList
  }

  /** One-row-result procedure: parameters are all required IN params,
    * the body runs on the driver at CALL time, and the result surfaces
    * as a LocalScan. */
  private def proc(procName: String, doc: String,
      params: Seq[(String, DataType)], out: StructType)(
      body: InternalRow => InternalRow): UnboundProcedure =
    new UnboundProcedure with BoundProcedure {
      override def name(): String = procName
      override def description(): String = doc
      override def bind(inputType: StructType): BoundProcedure = this
      override def parameters(): Array[ProcedureParameter] =
        params.map { case (n, dt) => ProcedureParameter.in(n, dt).build() }.toArray
      // mutates catalog state; Spark must not cache or re-run it
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val result = body(input)
        java.util.List.of[Scan](new LocalScan {
          override def readSchema(): StructType = out
          override def rows(): Array[InternalRow] = Array(result)
          override def description(): String = s"GraftProcedureResult[$procName]"
        }).iterator()
      }
    }
}
