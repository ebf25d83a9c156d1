package graft.interop

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.catalog.{Catalog, DataFileEntry, Snaplog, Snapshot}
import graft.table.{FileStats, LakehouseTable}

/** External Iceberg-v2 READ (import) — the inverse of
  * [[IcebergExport]], closing the interop loop the reference runs in
  * both directions (PyIceberg writes a metadata tree, DuckDB's
  * `iceberg_scan` consumes one, `query_iceberg_duckdb.py:21-29`):
  * walk a foreign `metadata/` tree — version-hint → metadata.json →
  * Avro manifest-list → Avro manifests — and register the CURRENT
  * snapshot's data files as a NEW graft table through the same
  * metadata-only path `add_files` uses.
  *
  * Zero data movement: data files are referenced in place, row counts
  * and sizes come from the manifests, identity-partition tuples map
  * onto the log's partition metadata (so partition pruning works on
  * the imported table immediately). Import cost is metadata-sized at
  * any table size — a 100 TB Iceberg table imports by parsing its
  * manifests, never by touching a data page. Optional
  * `statFooters = true` adds a footer-only pass per data file to
  * recover column [min,max] bounds for stat-based file skipping (the
  * manifests' binary bound maps are not parsed).
  *
  * Partition specs import at full transform fidelity where the
  * semantics match graft's own: `identity`, `day`, `hour`, `month`,
  * `year` (epoch-index values — graft's stored form exactly) and
  * `truncate[w]` reconstruct the corresponding graft spec, so a
  * PyIceberg-written day-partitioned table prunes immediately after
  * import. `void` fields carry no information and are dropped from
  * the spec (the shape graft's own export gives xxhash64 bucket
  * fields). `bucket[n]` imports as graft's `mbucket(n,col)` — the
  * SAME murmur3_x86_32 spec hash ([[graft.functions.IcebergBucketImpl]],
  * Appendix-B vectors pinned in SnaplogSpec), so a PyIceberg-written
  * bucket tree's stored indexes are exactly what graft's write and
  * prune sides compute.
  *
  * Nested (struct/list/map) columns import at full shape — graft
  * resolves nested CONTENT by name in every plan shape (only top-level
  * roots are ever id-matched, and renaming a nested root is refused),
  * so the tree's nested field-ids need no tracking.
  *
  * Honest refusals, all failing BEFORE any catalog mutation: delete
  * manifests / delete files (a data-only import would resurrect
  * deleted rows), non-parquet file formats, primitive types the
  * spec names that graft cannot represent exactly, and trees mixing
  * id-stamped with id-less data files (no single resolution mode —
  * see `register`'s probe).
  */
object IcebergImport {

  final case class Report(
      table: LakehouseTable,
      snapshot: Snapshot,
      schema: StructType,
      partitionColumns: Seq[String],
      dataFiles: Int,
      totalRecords: Long)

  /** Inverse of IcebergExport.icebergType for the primitive types the
    * spec names. Anything else refuses — imported schemas must read
    * back exactly. */
  private def sparkType(s: String): DataType = s match {
    case "boolean" => BooleanType
    case "int" => IntegerType
    case "long" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "string" => StringType
    case "binary" => BinaryType
    case "date" => DateType
    case "timestamp" | "timestamptz" => TimestampType
    case d if d.startsWith("decimal(") =>
      val Array(p, sc) = d.stripPrefix("decimal(").stripSuffix(")").split(",").map(_.trim.toInt)
      DecimalType(p, sc)
    case other => throw new IllegalArgumentException(
      s"iceberg type '$other' has no exact graft mapping — import refused")
  }

  /** Full type parser: primitive names plus the spec's NESTED JSON
    * nodes (struct/list/map). Nested inner field-ids are not carried
    * into the registry — graft resolves nested children by name (the
    * rename gate keeps nested root names stable), so id-based
    * resolution is never required below the top level. */
  private def sparkTypeJson(j: JValue)(implicit fmts: Formats): DataType = j match {
    case JString(s) => sparkType(s)
    case obj: JObject => (obj \ "type").extract[String] match {
      case "struct" => StructType((obj \ "fields") match {
        case JArray(fs) => fs.map { f =>
          StructField((f \ "name").extract[String], sparkTypeJson(f \ "type"),
            nullable = !(f \ "required").extractOpt[Boolean].getOrElse(false))
        }
        case other => throw new IllegalArgumentException(
          s"malformed struct fields: ${JsonMethods.compact(JsonMethods.render(other))}")
      })
      case "list" => ArrayType(sparkTypeJson(obj \ "element"),
        containsNull = !(obj \ "element-required").extractOpt[Boolean].getOrElse(false))
      case "map" => MapType(sparkTypeJson(obj \ "key"), sparkTypeJson(obj \ "value"),
        valueContainsNull = !(obj \ "value-required").extractOpt[Boolean].getOrElse(false))
      case other => throw new IllegalArgumentException(
        s"iceberg complex type '$other' has no graft mapping — import refused")
    }
    case other => throw new IllegalArgumentException(
      s"malformed iceberg type node: ${JsonMethods.compact(JsonMethods.render(other))}")
  }

  /** Real Iceberg writers (PyIceberg, the Java library) record absolute
    * `file://` URIs in metadata; our export records plain paths — both
    * must walk. */
  private def normalizePath(s: String): String = FileStats.normalizePath(s)

  private def readAvro(file: Path): Seq[GenericRecord] = {
    val r = new DataFileReader[GenericRecord](file.toFile,
      new GenericDatumReader[GenericRecord]())
    try r.iterator.asScala.toSeq finally r.close()
  }

  /** Avro partition-struct value → the stored external text the log
    * records for identity partitions (null → the Hive null sentinel,
    * date logical ints → ISO dates — the exact inverse of the export's
    * `partitionAvroValue`). */
  private def partitionText(v: Any, dt: DataType): String = v match {
    case null => Snaplog.HiveDefaultPartition
    case i: Integer if dt == DateType =>
      java.time.LocalDate.ofEpochDay(i.longValue()).toString
    case other => other.toString
  }

  /** Transform-field value → graft's stored text: the epoch indexes /
    * truncated values ARE the stored form, so plain toString (Avro
    * Utf8 included); null → the sentinel. */
  private def transformText(v: Any): String =
    if (v == null) Snaplog.HiveDefaultPartition else v.toString

  /** Walk `root` (the table dir containing `metadata/`, or the
    * `metadata/` dir itself) and register the current snapshot as the
    * new table `ns.name` in `catalog`. */
  def register(catalog: Catalog, spark: SparkSession, root: Path,
      ns: String, name: String, statFooters: Boolean = false): Report = {
    implicit val fmts: Formats = DefaultFormats
    val metaDir =
      if (Files.exists(root.resolve("version-hint.text"))) root
      else root.resolve("metadata")
    val version = Files.readString(metaDir.resolve("version-hint.text")).trim
    val meta = JsonMethods.parse(Files.readString(
      metaDir.resolve(s"v$version.metadata.json")))
    require((meta \ "format-version").extract[Int] == 2,
      "only Iceberg format-version 2 trees import")

    // -- schema (current-schema-id) ------------------------------------------
    val schemaId = (meta \ "current-schema-id").extract[Int]
    val schemaJson = (meta \ "schemas").asInstanceOf[JArray].arr
      .find(s => (s \ "schema-id").extract[Int] == schemaId)
      .getOrElse(throw new IllegalArgumentException(
        s"current-schema-id $schemaId not present in schemas"))
    val fieldsJson = (schemaJson \ "fields").asInstanceOf[JArray].arr
    val fieldById = fieldsJson.map(f => (f \ "id").extract[Int] -> f).toMap
    val schema = StructType(fieldsJson.map { f =>
      StructField((f \ "name").extract[String], sparkTypeJson(f \ "type"),
        nullable = !(f \ "required").extract[Boolean])
    })

    // -- partition spec (default-spec-id) ------------------------------------
    val specId = (meta \ "default-spec-id").extract[Int]
    val specJson = (meta \ "partition-specs").asInstanceOf[JArray].arr
      .find(s => (s \ "spec-id").extract[Int] == specId)
      .getOrElse(throw new IllegalArgumentException(
        s"default-spec-id $specId not present in partition-specs"))
    // Per spec field: (avroName, graft spec string) — the Avro
    // partition struct is keyed by the spec field's OWN name, which
    // legally differs from the derived name graft would use (e.g. a
    // renamed source keeps the old spec-field name); the log registers
    // under graft's derived field name, which is what graft prunes on.
    // `void` fields are dropped (no information), `bucket[n]` refuses
    // (murmur3 ≠ xxhash64 — see object scaladoc).
    val partFields: Seq[(String, graft.table.PartField)] =
      (specJson \ "fields").asInstanceOf[JArray].arr.flatMap { pf =>
        val transform = (pf \ "transform").extract[String]
        if (transform == "void") None else {
          val srcId = (pf \ "source-id").extract[Int]
          val sourceCol = (fieldById.getOrElse(srcId, throw new IllegalArgumentException(
            s"partition source-id $srcId not in schema")) \ "name").extract[String]
          val spec = transform match {
            case "identity" => sourceCol
            case "day" => s"days($sourceCol)"
            case "hour" => s"hours($sourceCol)"
            case "month" => s"months($sourceCol)"
            case "year" => s"years($sourceCol)"
            case t if t.startsWith("truncate[") && t.endsWith("]") =>
              s"truncate(${t.stripPrefix("truncate[").stripSuffix("]")},$sourceCol)"
            // the spec's bucket[n] IS graft's mbucket(n,col): both are
            // murmur3_x86_32 over the spec encodings, so the foreign
            // tree's stored indexes are exactly what graft's write and
            // prune sides compute — pruning works on the first query
            case t if t.startsWith("bucket[") && t.endsWith("]") =>
              s"mbucket(${t.stripPrefix("bucket[").stripSuffix("]")},$sourceCol)"
            case other => throw new IllegalArgumentException(
              s"partition transform '$other' has no graft equivalent; " +
                "import refused")
          }
          Some(((pf \ "name").extract[String],
            graft.table.PartitionTransforms.parse(spec)))
        }
      }
    val partCols = partFields.map(_._2.spec)
    val identityTypes = partFields.collect { case (_, pf: graft.table.IdentityField) =>
      pf.source -> schema.fields.find(_.name == pf.source).map(_.dataType)
        .getOrElse(StringType)
    }.toMap

    // -- current snapshot → manifest list → manifests → data files -----------
    val currentId = (meta \ "current-snapshot-id").extract[Long]
    require(currentId > 0, "table has no current snapshot — nothing to import")
    val current = (meta \ "snapshots").asInstanceOf[JArray].arr
      .find(s => (s \ "snapshot-id").extract[Long] == currentId)
      .getOrElse(throw new IllegalArgumentException(
        s"current-snapshot-id $currentId missing from snapshots"))
    val manifestFiles = readAvro(Paths.get(
      normalizePath((current \ "manifest-list").extract[String])))
    manifestFiles.foreach { mf =>
      require(mf.get("content").asInstanceOf[Int] == 0,
        s"${mf.get("manifest_path")}: DELETE manifests present — a data-only " +
          "import would resurrect deleted rows; import refused")
    }
    val entries = manifestFiles.flatMap(mf =>
      readAvro(Paths.get(normalizePath(mf.get("manifest_path").toString))))
      .filter(_.get("status").asInstanceOf[Int] != 2) // 2 = DELETED
    val files = entries.map { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      require(df.get("content").asInstanceOf[Int] == 0,
        s"${df.get("file_path")}: delete file listed as data — import refused")
      require(df.get("file_format").toString.equalsIgnoreCase("PARQUET"),
        s"${df.get("file_path")}: only PARQUET data files import")
      val path = normalizePath(df.get("file_path").toString)
      require(Files.exists(Paths.get(path)), s"data file missing: $path")
      val part = df.get("partition").asInstanceOf[GenericRecord]
      val pv = partFields.map { case (avroName, pf) =>
        pf.fieldName -> (pf match {
          case id: graft.table.IdentityField =>
            partitionText(part.get(avroName), identityTypes(id.source))
          case _ => transformText(part.get(avroName))
        })
      }.toMap
      if (statFooters) FileStats.stat(spark, path, pv)
      else DataFileEntry(path, df.get("record_count").asInstanceOf[Long],
        df.get("file_size_in_bytes").asInstanceOf[Long], pv, None)
    }

    // -- one metadata-only registration commit -------------------------------
    // Carry the SOURCE's field ids as this table's registry: the
    // imported files are stamped with those ids, so new managed writes
    // (and a later export) must use the same numbering — a fresh 1..n
    // assignment would diverge from the files whenever the source had
    // evolved (dropped/reordered ids). The high-water mark comes from
    // the source's last-column-id so later ADD COLUMNs never collide
    // with ids the source already retired.
    val srcRegistry: Map[String, Int] = fieldsJson.map(f =>
      (f \ "name").extract[String] -> (f \ "id").extract[Int]).toMap
    val registryProps =
      if (srcRegistry.keys.exists(n => n.contains(",") || n.contains(":")) ||
          srcRegistry.values.exists(_ <= 0)) Map.empty[String, String]
      else Map(
        graft.types.FieldIds.RegistryProp ->
          graft.types.FieldIds.encode(srcRegistry),
        graft.types.FieldIds.LastIdProp ->
          ((meta \ "last-column-id").extractOpt[Int]
            .getOrElse(0).max(srcRegistry.values.max)).toString)
    // Resolution mode: the Iceberg spec resolves columns by FIELD ID
    // (spec-conforming writers stamp ids into every parquet footer), so
    // when the tree's data files carry top-level ids the stored schema
    // keeps the schema ids too — scans then resolve by id, and a tree
    // whose CURRENT names diverge from old files' written names
    // (source-side rename/drop evolution, including graft's own
    // evolved exports) round-trips values instead of silently
    // null-filling the renamed columns. Id-less trees (migrated
    // add_files data living under a name-mapping) keep name matching —
    // correct exactly when names agree, the only binding such a tree
    // can express. A MIXED tree has no single resolution mode: refuse.
    // EVERY file is footer-probed, in parallel, no data pages — a
    // name-mapping tree that later received spec-conforming native
    // writes is mixed in exactly the way a uniform-prefix sample would
    // miss, and a wrong mode silently null-fills whole columns of the
    // minority files. Nested CHILDREN always resolve by
    // name either way (graft's convention — see object scaladoc); a
    // source-side rename of a nested INNER field is not recoverable
    // here and reads null, like any name-mapping-only reader would
    // without the mapping.
    val storedSchema =
      if (registryProps.isEmpty || files.isEmpty) schema
      else {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.DurationInt
        implicit val ec: ExecutionContext = ExecutionContext.global
        val probed = Await.result(
          Future.traverse(files)(f =>
            Future(graft.types.FieldIds.fileCarriesIds(spark, f.path))),
          30.minutes)
        if (probed.forall(identity))
          graft.types.FieldIds.attach(schema, srcRegistry)
        else if (!probed.exists(identity)) schema
        else throw new IllegalArgumentException(
          s"$ns.$name: imported tree mixes id-stamped and id-less data " +
            "files — field resolution cannot be by-id and by-name at " +
            "once; rewrite the tree uniformly before importing")
      }
    catalog.createTable(ns, name, storedSchema, partCols,
      properties = Map("iceberg.imported-from" -> metaDir.toString,
        "iceberg.imported-snapshot-id" -> currentId.toString) ++ registryProps,
      ifNotExists = false)
    val snap = catalog.commit(ns, name, Snaplog.OpAddFiles, files,
      Map("iceberg-import" -> s"v$version.metadata.json",
        "iceberg-snapshot-id" -> currentId.toString))
    Report(LakehouseTable.load(catalog, spark, ns, name), snap, storedSchema,
      partCols, files.size, files.map(_.rowCount).sum)
  }
}
