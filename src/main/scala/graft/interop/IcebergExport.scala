package graft.interop

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.JsonDSL._

import graft.table.LakehouseTable

/** Read-only Iceberg-v2-style metadata export for a snaplog table — the
  * interop loop the reference demonstrates by pointing DuckDB's
  * `iceberg_scan` at a table's `metadata.json`
  * (`query_iceberg_duckdb.py:21-29`): a third-party engine reads the
  * table from its metadata tree alone, no graft code involved.
  *
  * Emitted tree (under `destDir/metadata/`):
  * {{{
  * v<N>.metadata.json            # Iceberg v2 table metadata (JSON, per spec)
  * version-hint.text             # latest metadata version pointer
  * snap-<id>.manifest-list.json  # manifest list, one entry per manifest
  * manifest-<id>.json            # manifest: one entry per live data file
  * }}}
  *
  * Documented deviation: Iceberg serializes manifest lists + manifests
  * as AVRO; no Iceberg runtime exists in this sandbox, so those two
  * levels are JSON with the spec's field NAMES (`manifest_path`,
  * `data_file.file_path`, `record_count`, …). The `metadata.json`
  * itself follows the v2 JSON layout (format-version, schemas with
  * field-ids, partition-specs with identity transforms, snapshots with
  * manifest-list pointers). Data files are referenced in place —
  * export is metadata-only, zero data movement, any engine that reads
  * the tree scans the same parquet graft scans.
  */
object IcebergExport {

  final case class Report(
      metadataFile: Path,
      manifestLists: Int,
      manifests: Int,
      dataFiles: Long,
      totalRecords: Long)

  private def icebergType(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case IntegerType | ShortType | ByteType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case StringType => "string"
    case BinaryType => "binary"
    case DateType => "date"
    case TimestampType => "timestamptz"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case other => s"string" // lossy fallback for nested types, documented read-only export
  }

  /** Export every snapshot of the table's history; the current snapshot
    * becomes `current-snapshot-id`. Returns counts for verification. */
  def export(table: LakehouseTable, destDir: Path): Report = {
    val metaDir = destDir.resolve("metadata")
    Files.createDirectories(metaDir)
    val cat = table.catalog
    val (ns, name) = (table.namespace, table.name)
    val schema = table.schema
    val fields = schema.fields.zipWithIndex.map { case (f, i) =>
      ("id" -> (i + 1)) ~ ("name" -> f.name) ~
        ("required" -> !f.nullable) ~ ("type" -> icebergType(f.dataType))
    }
    val fieldId = schema.fieldNames.zipWithIndex.map { case (n, i) => n -> (i + 1) }.toMap
    val specFields = table.partitionColumns.zipWithIndex.map { case (c, i) =>
      ("name" -> c) ~ ("transform" -> "identity") ~
        ("source-id" -> fieldId(c)) ~ ("field-id" -> (1000 + i))
    }

    val snaps = cat.snapshots(ns, name)
    var manifests = 0
    var dataFiles = 0L
    var totalRecords = 0L
    val snapshotJsons = snaps.map { s =>
      val live = cat.liveFiles(ns, name, Some(s.snapshotId))
      val manifestName = s"manifest-${s.snapshotId}.json"
      val entries = live.map { f =>
        ("status" -> 1) ~ ("snapshot_id" -> s.snapshotId) ~
          ("data_file" ->
            (("file_path" -> f.path) ~ ("file_format" -> "PARQUET") ~
              ("partition" -> JObject(f.partitionValues.toList.map {
                case (k, v) => k -> (JString(v): JValue)
              })) ~
              ("record_count" -> f.rowCount) ~
              ("file_size_in_bytes" -> f.sizeBytes)))
      }
      write(metaDir.resolve(manifestName),
        JsonMethods.pretty(JsonMethods.render(JArray(entries.toList))))
      manifests += 1
      if (s.snapshotId == snaps.last.snapshotId) {
        dataFiles = live.size.toLong
        totalRecords = live.map(_.rowCount).sum
      }
      val listName = s"snap-${s.snapshotId}.manifest-list.json"
      val listJson = JArray(List(
        ("manifest_path" -> metaDir.resolve(manifestName).toString) ~
          ("manifest_length" -> Files.size(metaDir.resolve(manifestName))) ~
          ("added_files_count" -> live.size) ~
          ("added_rows_count" -> live.map(_.rowCount).sum)))
      write(metaDir.resolve(listName), JsonMethods.pretty(JsonMethods.render(listJson)))
      ("snapshot-id" -> s.snapshotId) ~
        ("parent-snapshot-id" -> s.parentId.map(JLong(_)).getOrElse(JNothing: JValue)) ~
        ("sequence-number" -> s.snapshotId) ~
        ("timestamp-ms" -> s.timestampMs) ~
        ("summary" -> (("operation" ->
          (if (s.operation == "add_files" || s.operation == "append") "append"
           else "overwrite")) ~ ("graft-operation" -> s.operation))) ~
        ("manifest-list" -> metaDir.resolve(listName).toString) ~
        ("schema-id" -> 0)
    }

    val m = table.meta
    // table-uuid must be stable across re-exports of the same table:
    // derive it from the identity, not a random source
    val uuid = java.util.UUID.nameUUIDFromBytes(
      s"graft:$ns.$name".getBytes(StandardCharsets.UTF_8)).toString
    val metadata =
      ("format-version" -> 2) ~
        ("table-uuid" -> uuid) ~
        ("location" -> destDir.toString) ~
        ("last-sequence-number" -> snaps.lastOption.map(_.snapshotId).getOrElse(0L)) ~
        ("last-updated-ms" -> snaps.lastOption.map(_.timestampMs)
          .getOrElse(m.createdAtMs)) ~
        ("last-column-id" -> schema.fields.length) ~
        ("schemas" -> List(
          ("schema-id" -> 0) ~ ("type" -> "struct") ~ ("fields" -> fields.toList))) ~
        ("current-schema-id" -> 0) ~
        ("partition-specs" -> List(
          ("spec-id" -> 0) ~ ("fields" -> specFields.toList))) ~
        ("default-spec-id" -> 0) ~
        ("last-partition-id" -> (999 + specFields.length)) ~
        ("properties" -> JObject(m.properties.toList.map {
          case (k, v) => k -> (JString(v): JValue)
        })) ~
        ("current-snapshot-id" -> snaps.lastOption.map(_.snapshotId).getOrElse(-1L)) ~
        ("snapshots" -> snapshotJsons.toList) ~
        ("sort-orders" -> List(("order-id" -> 0) ~ ("fields" -> List.empty[JValue]))) ~
        ("default-sort-order-id" -> 0)

    val version = snaps.lastOption.map(_.snapshotId).getOrElse(0L)
    val metaFile = metaDir.resolve(s"v$version.metadata.json")
    write(metaFile, JsonMethods.pretty(JsonMethods.render(metadata)))
    write(metaDir.resolve("version-hint.text"), version.toString)
    Report(metaFile, snaps.size, manifests, dataFiles, totalRecords)
  }

  /** Parsed-back view of an export, for verification: walk
    * version-hint → metadata.json → current snapshot's manifest list →
    * manifest → data files, exactly as a third-party reader would. */
  final case class ReadBack(
      formatVersion: Int,
      nSchemaFields: Int,
      nSpecFields: Int,
      nSnapshots: Int,
      currentOperation: String,
      nDataFiles: Int,
      totalRecords: Long,
      dataFilesExist: Boolean)

  def readBack(destDir: Path): ReadBack = {
    implicit val fmts: Formats = DefaultFormats
    val metaDir = destDir.resolve("metadata")
    val version = Files.readString(metaDir.resolve("version-hint.text")).trim
    val meta = JsonMethods.parse(Files.readString(
      metaDir.resolve(s"v$version.metadata.json")))
    val formatVersion = (meta \ "format-version").extract[Int]
    val nSchemaFields = (meta \ "schemas").asInstanceOf[JArray].arr.headOption
      .map(s => (s \ "fields").asInstanceOf[JArray].arr.size).getOrElse(0)
    val nSpecFields = (meta \ "partition-specs").asInstanceOf[JArray].arr.headOption
      .map(s => (s \ "fields").asInstanceOf[JArray].arr.size).getOrElse(0)
    val snapshots = (meta \ "snapshots").asInstanceOf[JArray].arr
    val currentId = (meta \ "current-snapshot-id").extract[Long]
    val current = snapshots.find(s => (s \ "snapshot-id").extract[Long] == currentId)
      .getOrElse(throw new IllegalStateException("current snapshot missing"))
    val listPath = (current \ "manifest-list").extract[String]
    val list = JsonMethods.parse(Files.readString(java.nio.file.Paths.get(listPath)))
      .asInstanceOf[JArray].arr
    val entries = list.flatMap { l =>
      val mp = (l \ "manifest_path").extract[String]
      JsonMethods.parse(Files.readString(java.nio.file.Paths.get(mp)))
        .asInstanceOf[JArray].arr
    }
    val files = entries.map(e => ((e \ "data_file" \ "file_path").extract[String],
      (e \ "data_file" \ "record_count").extract[Long]))
    ReadBack(
      formatVersion = formatVersion,
      nSchemaFields = nSchemaFields,
      nSpecFields = nSpecFields,
      nSnapshots = snapshots.size,
      currentOperation = (current \ "summary" \ "operation").extract[String],
      nDataFiles = files.size,
      totalRecords = files.map(_._2).sum,
      dataFilesExist = files.forall(f =>
        Files.exists(java.nio.file.Paths.get(f._1))))
  }

  private def write(p: Path, content: String): Unit = {
    Files.write(p, content.getBytes(StandardCharsets.UTF_8))
    ()
  }
}
