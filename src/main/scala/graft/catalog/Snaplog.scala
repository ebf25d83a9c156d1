package graft.catalog

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.Serialization
import org.json4s.jackson.Serialization.{read => jread, write => jwrite}

/** One data file registered to a snapshot.
  *
  * `partitionValues` holds the identity-partition value(s) of the file so
  * partition pruning is a pure metadata operation — the engine resolves
  * the pruned file list from the log BEFORE constructing the Spark scan
  * (manifest-style pruning, like the reference's catalog-tracked
  * partition spec `main-polars.py:135-142`; no directory listing at plan
  * time, which is what survives at 100 TB / millions of files).
  */
/** Per-file, per-column value bounds (stringified; numeric columns
  * parse back to double at prune time). Iceberg-manifest-style stats:
  * collected once at commit from the parquet footer, consulted at scan
  * planning so files whose [min,max] cannot match a range predicate are
  * never handed to Spark. */
case class ColBounds(min: String, max: String)

case class DataFileEntry(
    path: String,
    rowCount: Long,
    sizeBytes: Long,
    partitionValues: Map[String, String],
    columnStats: Option[Map[String, ColBounds]] = None)

/** One commit. `operation` ∈ append | overwrite | add_files — the three
  * commit kinds the reference exercises (`table.append`
  * `main-daft.py:137`, `table.overwrite` `upsert.py:84`,
  * `table.add_files` `main-ray.py:113-121`). The live file set of a
  * snapshot is replayed from the latest overwrite at-or-before it.
  */
case class Snapshot(
    snapshotId: Long,
    parentId: Option[Long],
    timestampMs: Long,
    operation: String,
    files: Seq[DataFileEntry],
    summary: Map[String, String])

/** Table-level metadata, the analogue of the reference's catalog row +
  * Iceberg metadata.json (`catalog.create_table` `main-polars.py:150-152`
  * with schema, partition spec and properties `main-daft.py:102-107`).
  */
/** A named snapshot pointer (Iceberg-style ref): `tag`s are immutable
  * audit/release marks, `branch`es may retarget as work advances. */
case class SnapshotRef(snapshotId: Long, refType: String)

case class TableMetadata(
    namespace: String,
    name: String,
    schemaJson: String,
    partitionColumns: Seq[String],
    properties: Map[String, String],
    createdAtMs: Long,
    formatVersion: Int = 1) {
  def schema: StructType =
    DataType.fromJson(schemaJson).asInstanceOf[StructType]
}

/** Snaplog — the native single-writer table-format/catalog layer.
  *
  * Layout (per SURVEY.md §7.0):
  * {{{
  * warehouse/<namespace>/<table>/
  *   metadata.json      # TableMetadata
  *   snapshots.jsonl    # append-only Snapshot log, one JSON per line
  *   data/snap-<id>/…   # parquet files of commit <id>
  * }}}
  *
  * Reproduces every catalog behavior the reference actually uses
  * (S15–S21 in SURVEY.md §2.1) without an Iceberg runtime: namespace /
  * table create (`main-polars.py:144-152`), load (`upsert.py:66-69`),
  * snapshot history (`read_history.py:7-11`), time travel by snapshot id,
  * metadata-only `add_files`, and transactional multi-append (one commit
  * for N batches, `main-polars.py:165-186`).
  *
  * Concurrency: single-writer by design — the same assumption the
  * reference makes (its only concurrency control is the SQLite catalog
  * file lock). Commits are atomic at the filesystem level: the snapshot
  * line is appended with CREATE+APPEND and readers replay the log.
  * Catalog I/O is tiny driver-side metadata (one JSON line per commit) —
  * at cluster scale this layer would sit behind an HA store, but its
  * data-plane design (explicit file lists + stats in the log) is exactly
  * what scales: planning never lists directories.
  */
final class Snaplog(val warehouse: String) {
  private implicit val fmts: Formats = Serialization.formats(NoTypeHints)

  private def nsDir(ns: String): Path = Paths.get(warehouse, ns)
  private def tableDir(ns: String, t: String): Path = Paths.get(warehouse, ns, t)
  private def metaFile(ns: String, t: String): Path = tableDir(ns, t).resolve("metadata.json")
  private def logFile(ns: String, t: String): Path = tableDir(ns, t).resolve("snapshots.jsonl")

  // ---- namespaces -------------------------------------------------------

  /** Idempotent, like the reference's create-and-catch (`main-polars.py:144-148`). */
  def createNamespace(ns: String): Unit = { Files.createDirectories(nsDir(ns)); () }

  def namespaceExists(ns: String): Boolean = Files.isDirectory(nsDir(ns))

  def listNamespaces(): Seq[String] =
    if (!Files.isDirectory(Paths.get(warehouse))) Seq.empty
    else Files.list(Paths.get(warehouse)).iterator.asScala
      .filter(Files.isDirectory(_)).map(_.getFileName.toString).toSeq.sorted

  // ---- tables -----------------------------------------------------------

  def tableExists(ns: String, t: String): Boolean = Files.exists(metaFile(ns, t))

  def createTable(
      ns: String,
      name: String,
      schema: StructType,
      partitionColumns: Seq[String] = Seq.empty,
      properties: Map[String, String] = Map.empty,
      ifNotExists: Boolean = true): TableMetadata = {
    createNamespace(ns)
    if (tableExists(ns, name)) {
      if (ifNotExists) return loadTable(ns, name)
      throw new IllegalStateException(s"table $ns.$name already exists")
    }
    partitionColumns.foreach { c =>
      require(schema.fieldNames.exists(_.equalsIgnoreCase(c)),
        s"partition column '$c' not in schema")
    }
    val meta = TableMetadata(ns, name, schema.json, partitionColumns,
      properties, System.currentTimeMillis())
    Files.createDirectories(tableDir(ns, name).resolve("data"))
    writeAtomic(metaFile(ns, name), jwrite(meta))
    Files.write(logFile(ns, name), Array.emptyByteArray,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    meta
  }

  def loadTable(ns: String, t: String): TableMetadata = {
    require(tableExists(ns, t), s"table $ns.$t does not exist")
    jread[TableMetadata](Files.readString(metaFile(ns, t)))
  }

  def dropTable(ns: String, t: String): Unit = {
    val dir = tableDir(ns, t)
    if (Files.exists(dir)) {
      Files.walk(dir).iterator.asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }
  }

  def listTables(ns: String): Seq[String] =
    if (!namespaceExists(ns)) Seq.empty
    else Files.list(nsDir(ns)).iterator.asScala
      .filter(p => Files.exists(p.resolve("metadata.json")))
      .map(_.getFileName.toString).toSeq.sorted

  def dataDir(ns: String, t: String): Path = tableDir(ns, t).resolve("data")

  // ---- snapshot log -----------------------------------------------------

  def snapshots(ns: String, t: String): Seq[Snapshot] = {
    val f = logFile(ns, t)
    if (!Files.exists(f)) Seq.empty
    else Files.readAllLines(f, StandardCharsets.UTF_8).asScala.toSeq
      .filter(_.nonEmpty).map(jread[Snapshot](_))
  }

  def currentSnapshot(ns: String, t: String): Option[Snapshot] =
    snapshots(ns, t).lastOption

  /** Append one commit to the log; snapshot ids are dense and monotonic. */
  def commit(
      ns: String, t: String, operation: String,
      files: Seq[DataFileEntry],
      summary: Map[String, String] = Map.empty): Snapshot = {
    val prev = currentSnapshot(ns, t)
    val snap = Snapshot(
      snapshotId = prev.map(_.snapshotId + 1).getOrElse(1L),
      parentId = prev.map(_.snapshotId),
      timestampMs = System.currentTimeMillis(),
      operation = operation,
      files = files,
      summary = summary ++ Map(
        "added-files" -> files.size.toString,
        "added-records" -> files.map(_.rowCount).sum.toString))
    Files.write(logFile(ns, t), (jwrite(snap) + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    snap
  }

  /** Live data files as of `asOf` (default: current) — replay from the
    * latest overwrite/replace at-or-before the target snapshot. Time
    * travel = this file list fed to a plain parquet scan. */
  def liveFiles(ns: String, t: String, asOf: Option[Long] = None): Seq[DataFileEntry] = {
    val all = snapshots(ns, t)
    val upto = asOf match {
      case Some(id) =>
        require(all.exists(_.snapshotId == id), s"snapshot $id not found for $ns.$t")
        all.takeWhile(_.snapshotId <= id)
      case None => all
    }
    val fromIdx = upto.lastIndexWhere(s => Snaplog.ResetOps(s.operation))
    (if (fromIdx < 0) upto else upto.drop(fromIdx)).flatMap(_.files)
  }

  // ---- refs (tags / branches) -------------------------------------------

  private def refsFile(ns: String, t: String): Path =
    tableDir(ns, t).resolve("refs.json")

  def refs(ns: String, t: String): Map[String, SnapshotRef] = {
    val f = refsFile(ns, t)
    if (!Files.exists(f)) Map.empty
    else jread[Map[String, SnapshotRef]](Files.readString(f))
  }

  /** Create or (branches only) retarget a named ref. Tags are immutable:
    * re-pointing an existing tag is an error, matching Iceberg ref
    * semantics. The target snapshot must exist. */
  def setRef(ns: String, t: String, name: String, snapshotId: Long,
      refType: String = "tag"): SnapshotRef = {
    require(refType == "tag" || refType == "branch",
      s"refType must be tag|branch, got '$refType'")
    require(snapshots(ns, t).exists(_.snapshotId == snapshotId),
      s"snapshot $snapshotId not found for $ns.$t")
    val cur = refs(ns, t)
    cur.get(name).foreach { r =>
      require(r.refType == "branch",
        s"ref '$name' is a tag and cannot be re-pointed")
    }
    val ref = SnapshotRef(snapshotId, refType)
    writeAtomic(refsFile(ns, t), jwrite(cur + (name -> ref)))
    ref
  }

  def dropRef(ns: String, t: String, name: String): Unit = {
    val cur = refs(ns, t)
    if (cur.contains(name)) writeAtomic(refsFile(ns, t), jwrite(cur - name))
  }

  // ---- maintenance ------------------------------------------------------

  /** Expire history: keep only the last `keepLast` snapshots. Refused
    * unless the kept suffix is self-contained (contains an overwrite/
    * replace base, or nothing is dropped) — expiring snapshots that
    * still contribute live files would corrupt the table; compact or
    * overwrite first. Returns the kept snapshots. */
  def expireSnapshots(ns: String, t: String, keepLast: Int): Seq[Snapshot] = {
    require(keepLast >= 1, "must keep at least one snapshot")
    val all = snapshots(ns, t)
    if (all.size <= keepLast) return all
    val kept = all.takeRight(keepLast)
    require(kept.exists(s => Snaplog.ResetOps(s.operation)),
      s"cannot expire: the last $keepLast snapshots have no overwrite/replace base; " +
        "older snapshots still contribute live files — compact first")
    val keptIds = kept.map(_.snapshotId).toSet
    val orphanedRefs = refs(ns, t).filter { case (_, r) => !keptIds.contains(r.snapshotId) }
    require(orphanedRefs.isEmpty,
      s"cannot expire: refs ${orphanedRefs.keys.toSeq.sorted.mkString(", ")} " +
        "still point at snapshots that would be dropped — drop the refs first")
    val content = kept.map(jwrite(_)).mkString("", "\n", "\n")
    writeAtomic(logFile(ns, t), content)
    kept
  }

  /** Delete data files under the table's managed data dir that no
    * remaining snapshot references (orphans left by expiration or
    * overwrites). Never touches files outside the managed dir (e.g.
    * add_files registrations). Returns deleted paths. */
  def vacuum(ns: String, t: String): Seq[String] = {
    val referenced = snapshots(ns, t).flatMap(_.files).map(_.path).toSet
    val dd = dataDir(ns, t)
    if (!Files.isDirectory(dd)) return Seq.empty
    val orphans = Files.walk(dd).iterator.asScala
      .filter(p => Files.isRegularFile(p) && !referenced.contains(p.toString))
      .map(_.toString).toSeq.sorted
    orphans.foreach(p => Files.deleteIfExists(Paths.get(p)))
    // prune now-empty directories bottom-up
    Files.walk(dd).iterator.asScala.toSeq.reverse
      .filter(p => Files.isDirectory(p) && p != dd)
      .foreach { p =>
        val s = Files.list(p)
        val empty = try !s.iterator.hasNext finally s.close()
        if (empty) Files.deleteIfExists(p)
      }
    orphans
  }

  /** Replace the table schema (schema evolution commit). Caller is
    * responsible for evolution legality (see LakehouseTable.addColumn —
    * additive nullable changes are always safe: parquet scans fill
    * missing columns with null). */
  def updateSchema(ns: String, t: String, schema: StructType): TableMetadata = {
    val m = loadTable(ns, t)
    val updated = m.copy(schemaJson = schema.json)
    writeAtomic(metaFile(ns, t), jwrite(updated))
    updated
  }

  private def writeAtomic(target: Path, content: String): Unit = {
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }
}

object Snaplog {
  val OpAppend = "append"
  val OpOverwrite = "overwrite"
  val OpAddFiles = "add_files"
  /** Compaction commit: same replay semantics as overwrite (resets the
    * live set) but recorded distinctly for history/audit. */
  val OpReplace = "replace"
  /** Copy-on-write row-level delete: the snapshot carries the complete
    * post-delete live set (untouched files + rewritten survivors), so it
    * replays like an overwrite and is recorded distinctly for audit. */
  val OpDelete = "delete"
  val ResetOps: Set[String] = Set(OpOverwrite, OpReplace, OpDelete)
}
