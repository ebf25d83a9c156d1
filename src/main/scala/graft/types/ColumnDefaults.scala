package graft.types

import org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
import org.apache.spark.sql.types.{DataType, MetadataBuilder, StructField, StructType}

/** Column DEFAULT values — Iceberg v3's initial/write-default model,
  * carried by Spark's own schema-metadata convention so the readers do
  * the heavy lifting:
  *
  *  - `EXISTS_DEFAULT` (the existence default, Iceberg's
  *    `initial-default`): a FOLDED literal, set once when the column is
  *    added and immutable after. Spark's parquet readers fill a column
  *    MISSING from a file from this key, so rows that predate the add
  *    answer the default instead of null in every plan shape (native
  *    scans, DSv2, MOR subtraction, changelog, time travel) with zero
  *    data movement.
  *  - `CURRENT_DEFAULT` (the write default, Iceberg's
  *    `write-default`): the original SQL text, resolved for rows
  *    written WITHOUT the column — by Spark's analyzer for SQL
  *    INSERTs, by [[SchemaInfer.normalize]]'s missing-column fill for
  *    API batches. `ALTER COLUMN SET/DROP DEFAULT` edits ONLY this key:
  *    files already interpreted under one existence default can never
  *    silently re-read under another.
  *
  * Everything here is a pure StructField/metadata transform; the
  * folding delegates to Spark's `ResolveDefaultColumns` (the same
  * analysis SQL DDL runs), so "constant-foldable, type-coercible"
  * refusals match Spark's own. */
object ColumnDefaults {

  val CurrentKey: String =
    ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY
  val ExistsKey: String =
    ResolveDefaultColumns.EXISTS_DEFAULT_COLUMN_METADATA_KEY

  /** A fresh nullable field carrying the default: CURRENT_DEFAULT = the
    * given SQL text, EXISTS_DEFAULT = its folded literal (analyzed,
    * type-coerced, constant-required — throws Spark's own analysis
    * errors otherwise). */
  def foldedField(name: String, dataType: DataType,
      defaultSql: String): StructField = {
    val seeded = StructField(name, dataType, nullable = true,
      metadata = new MetadataBuilder()
        .putString(CurrentKey, defaultSql).build())
    ResolveDefaultColumns.constantFoldCurrentDefaultsToExistDefaults(
      StructType(Array(seeded)), "ALTER TABLE ADD COLUMNS").fields.head
  }

  /** The write-side default's SQL text, if the column has one. */
  def currentDefault(f: StructField): Option[String] =
    if (f.metadata.contains(CurrentKey)) Some(f.metadata.getString(CurrentKey))
    else None

  /** Does the column carry an existence default (old files answer a
    * value, not null)? The EXPORT gate keys on this: an Iceberg v2
    * tree cannot express `initial-default`, so a v2 reader would
    * null-fill where graft serves values — silent divergence. A
    * write-only default (SET DEFAULT on a pre-existing column) exports
    * fine: both sides null-fill the old files. */
  def hasExistsDefault(f: StructField): Boolean = f.metadata.contains(ExistsKey)

  def anyExistsDefaults(schema: StructType): Seq[String] =
    schema.fields.filter(hasExistsDefault).map(_.name).toSeq

  /** The field with its WRITE default replaced (Some) or dropped
    * (None). EXISTS_DEFAULT is deliberately untouched — see the class
    * doc. `Some` validates foldability/coercion exactly like the add
    * path before mutating anything. */
  def withCurrentDefault(f: StructField, defaultSql: Option[String]): StructField =
    defaultSql match {
      case Some(sql) =>
        foldedField(f.name, f.dataType, sql) // validation only
        f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
          .putString(CurrentKey, sql).build())
      case None =>
        f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
          .remove(CurrentKey).build())
    }
}
