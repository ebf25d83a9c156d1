package graft.types

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** Parquet field-id indirection for column RENAME / DROP — the Iceberg
  * evolution model, carried by Spark's native field-id support
  * (`spark.sql.parquet.fieldId.{write,read}.enabled`; reader matches a
  * requested column to a parquet column BY ID when the requested
  * StructField carries `parquet.field.id` metadata).
  *
  * Lifecycle: every table gets a name→id REGISTRY at creation (a table
  * property), and every managed write stamps the ids into its parquet
  * files — but reads keep plain name matching (the stored schema stays
  * id-free), so tables holding foreign files (add_files / Iceberg
  * import, whose ids are absent or numbered by another system) behave
  * exactly as before. The FIRST rename/drop flips the table to
  * read-by-id: the stored schema becomes id-bearing and every
  * subsequent scan resolves columns by id, so files written under the
  * OLD name still serve the renamed column's values — including through
  * time travel. Dropped ids are never reused (a high-water property),
  * so re-adding a dropped column's name yields nulls for old rows, not
  * resurrected data. */
object FieldIds {

  /** Spark's field-id metadata key (ParquetUtils.FIELD_ID_METADATA_KEY). */
  val MetaKey = "parquet.field.id"
  /** Table property: the name→id registry, `"name:id,name:id"`. */
  val RegistryProp = "graft.field-ids"
  /** Table property: high-water id mark — ids of dropped columns are
    * retired forever, never reassigned. */
  val LastIdProp = "graft.last-field-id"
  /** Table property: lowercase names RELEASED by a rename-from or drop.
    * A later column taking a freed name is a REBINDING — old files'
    * name-keyed column stats then describe a different column. */
  val FreedNamesProp = "graft.freed-names"
  /** Table property: lowercase CURRENT names whose binding reuses a
    * freed name. Their log-recorded [min,max] stats are untrustworthy
    * forever (historical entries cannot be rewritten), so every stats
    * consumer — file pruning, metadata aggregates, COW group filtering —
    * must treat predicates on them as never-prunable. */
  val StatsUnsafeProp = "graft.stats-unsafe"

  def namesSet(props: Map[String, String], key: String): Set[String] =
    props.get(key).toSeq.flatMap(_.split(',')).filter(_.nonEmpty).toSet

  def addNames(props: Map[String, String], key: String,
      add: Seq[String]): String =
    (namesSet(props, key) ++ add.map(_.toLowerCase(java.util.Locale.ROOT)))
      .toSeq.sorted.mkString(",")

  val WriteConf = "spark.sql.parquet.fieldId.write.enabled"
  val ReadConf = "spark.sql.parquet.fieldId.read.enabled"

  /** Run `body` with the two managed-write session confs in force —
    * field-id stamping on, INT64-micros timestamps (footer stats +
    * Iceberg-v2-legal data files) — restoring the caller's values
    * after. Both confs are session-global, so an UNSCOPED set would
    * leak into a same-session foreign `df.write.parquet` between two
    * managed writes. `body` must contain the point where the write
    * job captures its conf (the eager `.parquet(...)` call, or a DSv2
    * delegate's `toBatch`, which snapshots the session conf
    * synchronously into its job description).
    *
    * Save/set/restore of a SESSION-global conf is not safe under
    * concurrent interleaving (thread B's capture could see thread A's
    * restore, writing id-less INT96 files; B's restore could re-leak
    * the managed values session-wide), so the whole scope runs under
    * one JVM-wide reentrant lock: managed writes serialize their
    * conf-capture sections. Two managed writes racing in one session
    * is already outside the engine's single-writer commit model —
    * the lock turns a silent wrong-file hazard into brief driver-side
    * serialization. */
  private val writeConfLock = new java.util.concurrent.locks.ReentrantLock()

  def withManagedWriteConfs[A](spark: org.apache.spark.sql.SparkSession)(body: => A): A = {
    writeConfLock.lock()
    try {
      val keys = Seq(WriteConf, "spark.sql.parquet.outputTimestampType")
      val saved = keys.map(k => k -> spark.conf.getOption(k))
      spark.conf.set(WriteConf, "true")
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      try body finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    } finally writeConfLock.unlock()
  }

  /** Registry for a fresh table: ids 1..n in schema order. None when a
    * column name cannot round-trip the encoding (such a table simply
    * never becomes renameable — it refuses with guidance). */
  def registryFor(schema: StructType): Option[Map[String, Int]] =
    if (schema.fieldNames.exists(n => n.contains(",") || n.contains(":")))
      None
    else Some(schema.fieldNames.zipWithIndex.map {
      case (n, i) => n -> (i + 1)
    }.toMap)

  def encode(reg: Map[String, Int]): String =
    reg.toSeq.sortBy(_._2).map { case (n, i) => s"$n:$i" }.mkString(",")

  /** Tolerant decode: malformed entries are DROPPED, not thrown — a
    * hand-corrupted registry then degrades to "those columns never get
    * ids" (the rename gate later refuses with footer evidence) instead
    * of crashing every write of the table. */
  def decode(s: String): Map[String, Int] =
    s.split(',').filter(_.nonEmpty).flatMap { kv =>
      val i = kv.lastIndexOf(':')
      if (i <= 0) None
      else kv.substring(i + 1).toIntOption.filter(_ > 0)
        .map(id => kv.substring(0, i) -> id)
    }.toMap

  /** Schema with `parquet.field.id` metadata stamped from the registry
    * (fields without a registry entry stay untouched). */
  def attach(schema: StructType, reg: Map[String, Int]): StructType =
    StructType(schema.fields.map { f =>
      reg.get(f.name) match {
        case Some(id) => f.copy(metadata = new MetadataBuilder()
          .withMetadata(f.metadata).putLong(MetaKey, id.toLong).build())
        case None => f
      }
    })

  def hasIds(schema: StructType): Boolean =
    schema.fields.exists(_.metadata.contains(MetaKey))

  def strip(schema: StructType): StructType =
    StructType(schema.fields.map { f =>
      if (!f.metadata.contains(MetaKey)) f
      else {
        val mb = new MetadataBuilder().withMetadata(f.metadata).remove(MetaKey)
        f.copy(metadata = mb.build())
      }
    })

  /** Does the parquet file's PHYSICAL schema hold a field at the given
    * path (case-insensitive per step)? Footer-only, no data pages —
    * the foreign-file probe `addStructField` runs before appending an
    * inner field: graft resolves nested children by NAME, so a foreign
    * file (add_files / Iceberg import) already holding bytes at the
    * path would serve them under the new field — silent resurrection
    * of another system's dropped data. Managed files need no probe
    * (inner fields are never renamed or dropped, so the current schema
    * contains every inner name any managed file ever wrote). */
  def fileContainsPath(spark: SparkSession, path: String,
      parts: Seq[String]): Boolean =
    fileContainsAll(spark, path, Seq(parts))

  /** [[fileContainsPath]] for SEVERAL paths in ONE footer open — true
    * when the file holds a field at EVERY given path. The export
    * defaults gate probes all defaulted columns per file through this
    * (k columns must not cost k footer round-trips per file). */
  def fileContainsAll(spark: SparkSession, path: String,
      pathsToFind: Seq[Seq[String]]): Boolean = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path), spark.sessionState.newHadoopConf())
    val r = ParquetFileReader.open(in)
    try {
      import scala.jdk.CollectionConverters._
      val root: org.apache.parquet.schema.Type =
        r.getFooter.getFileMetaData.getSchema
      def holds(parts: Seq[String]): Boolean = {
        var t = root
        var i = 0
        while (i < parts.length) {
          if (t.isPrimitive) return false
          t.asGroupType().getFields.asScala
            .find(_.getName.equalsIgnoreCase(parts(i))) match {
            case Some(child) => t = child; i += 1
            case None => return false
          }
        }
        true
      }
      pathsToFind.forall(holds)
    } finally r.close()
  }

  /** Do ALL top-level fields of the parquet file carry field ids?
    * Footer-only (no data pages) — the eligibility probe a rename/drop
    * runs over the table's files before flipping to read-by-id. */
  def fileCarriesIds(spark: SparkSession, path: String): Boolean = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path), spark.sessionState.newHadoopConf())
    val r = ParquetFileReader.open(in)
    try {
      import scala.jdk.CollectionConverters._
      r.getFooter.getFileMetaData.getSchema.getFields.asScala
        .forall(_.getId != null)
    } finally r.close()
  }
}
