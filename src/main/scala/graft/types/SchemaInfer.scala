package graft.types

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Schema-inference and normalization policy.
  *
  * Mirrors the reference's two-phase schema handling (infer from a sample
  * file, then force-cast every batch — see reference
  * `main-polars.py:80-97,180` and `main-polars-lazy.py:11-44`):
  *
  *  - `referencePolicy` collapses arbitrary input types onto the
  *    reference's concrete universe: integers stay 32/64-bit, floats stay
  *    32/64-bit, strings stay strings, and anything else falls back to
  *    string (the lossy fallback at `main-polars.py:93-94`). Nullability
  *    is preserved (`main-polars.py:95`).
  *  - `nativePolicy` keeps Spark's own types (timestamps, arrays, binary
  *    stay first-class) — what our engine uses by default; the driver
  *    testdata needs TimestampType and ArrayType(FloatType).
  *  - `normalize` is the "force cast every batch to the table schema"
  *    step (`main-polars.py:180` `arrow_table.cast(read_schema)`): a
  *    single projection of casts in table-schema column order, which
  *    Catalyst folds into the scan (column pruning + no extra stage).
  *
  * All pure functions over `StructType` — no Spark session required,
  * unit-testable in isolation, and O(#columns) regardless of data size.
  */
object SchemaInfer {

  /** Reference type policy: 3-way switch + string fallback. */
  def referencePolicy(schema: StructType): StructType =
    StructType(schema.fields.map { f =>
      val t = f.dataType match {
        case ByteType | ShortType | IntegerType => IntegerType
        case LongType                           => LongType
        case FloatType                          => FloatType
        case DoubleType                         => DoubleType
        case StringType                         => StringType
        case _                                  => StringType // lossy fallback
      }
      StructField(f.name, t, f.nullable)
    })

  /** Native policy: identity — Spark types are already what we store. */
  def nativePolicy(schema: StructType): StructType = schema

  /** Force-cast a batch to the table schema: one projection, in table
    * column order. Missing nullable columns are filled with typed nulls;
    * missing required columns are an error (fail fast, like the
    * reference's cast raising per bad file `main-polars.py:181-183`).
    *
    * Casts target the NULLABILITY-RELAXED form of the stored type: a
    * cast can never ADD a NOT NULL guarantee (Spark refuses
    * `struct<v:int>` → `struct<v:int NOT NULL>` outright), and parquet
    * reads come back inner-nullable regardless of what the writer
    * declared — so a stored schema with required nested fields would
    * otherwise make every read-modify path (MOR subtraction, COW
    * rewrite, changelog) unanalyzable. Equal-up-to-nullability types
    * skip the cast node entirely. */
  def normalize(df: DataFrame, target: StructType): DataFrame = {
    val present = df.columns.map(c => c.toLowerCase -> c).toMap
    val cols: Array[Column] = target.fields.map { f =>
      // `.as(name, metadata)` keeps the target field's metadata on the
      // aliased column — field-id stamps must survive normalization or
      // the parquet writer has nothing to populate
      present.get(f.name.toLowerCase) match {
        case Some(src) =>
          val srcType = df.schema(df.schema.fieldIndex(src)).dataType
          val c = if (relaxNulls(srcType) == relaxNulls(f.dataType)) col(src)
                  else col(src).cast(relaxNulls(f.dataType))
          c.as(f.name, f.metadata)
        case None if f.nullable =>
          org.apache.spark.sql.functions.lit(null).cast(relaxNulls(f.dataType))
            .as(f.name, f.metadata)
        case None =>
          throw new IllegalArgumentException(
            s"required column '${f.name}' absent from batch " +
              s"(batch columns: ${df.columns.mkString(", ")})")
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** The type with every nested nullability flag set true (top-level
    * nullability lives on StructField, untouched here). */
  private def relaxNulls(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(dataType = relaxNulls(f.dataType), nullable = true)))
    case a: ArrayType => ArrayType(relaxNulls(a.elementType), containsNull = true)
    case m: MapType =>
      MapType(relaxNulls(m.keyType), relaxNulls(m.valueType), valueContainsNull = true)
    case other => other
  }

  /** True when `batch` can be appended to a table of schema `target`
    * after `normalize` (same columns up to case, castable types). */
  def compatible(batch: StructType, target: StructType): Boolean =
    target.fields.forall { f =>
      batch.fields.exists(_.name.equalsIgnoreCase(f.name)) || f.nullable
    }
}
