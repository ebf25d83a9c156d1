package graft.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** DSv2 FunctionCatalog surface for the partition transforms that
  * storage-partitioned joins must RESOLVE (Spark compares two scans'
  * `bucket(n, col)` partitionings by loading the function from each
  * side's catalog and matching `canonicalName` + numBuckets — the
  * Iceberg `system.bucket` pattern). The bound function computes the
  * SAME value the write path records
  * ([[graft.table.BucketField.expr]]: `floorMod(xxhash64(value), n)`,
  * XxHash64 seed 42), so a Spark-side re-derivation (e.g. partially
  * clustered distributions pushing partition values) agrees with the
  * stored layout by construction. */
private[graft] object GraftBucketUnbound extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): floorMod(xxhash64(col, seed=42), n) — the graft " +
      "bucket partition transform"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket expects (numBuckets INT, value), got ${inputType.simpleString}")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket: numBuckets must be INT, got ${inputType.fields(0).dataType.simpleString}")
    new GraftBucketBound(inputType.fields(1).dataType)
  }
}

private[graft] final class GraftBucketBound(valueType: DataType)
    extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, valueType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  /** BOTH join sides must report the identical canonical name for
    * Spark to treat their partitionings as compatible. */
  override def canonicalName(): String = "graft.bucket"
  override def isResultNullable: Boolean = true
  override def produceResult(input: InternalRow): Integer = {
    if (input.isNullAt(1)) return null
    val n = input.getInt(0)
    val v = input.get(1, valueType)
    // the same interpreted hasher XxHash64's eval dispatches to (seed
    // 42 = the expression default) — no per-row expression allocation
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
      .hash(v, valueType, 42L)
    Int.box(Math.floorMod(h, n.toLong).toInt)
  }
}

/** The four time transforms as V2 functions — same epoch-index
  * arithmetic as the write path's [[graft.table.TimeField]] family
  * (timezone-independent floorDiv on internal micros / epoch days),
  * so the reported `days(ts)` partitioning of two tables resolves to
  * one canonical function and their daily fact-fact joins go
  * shuffle-free. */
private[graft] final class GraftTimeUnbound(unit: String) extends UnboundFunction {
  override def name(): String = unit
  override def description(): String =
    s"$unit(col): the graft $unit partition transform's epoch index " +
      "(timezone-independent)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1,
      s"$unit expects one temporal argument, got ${inputType.simpleString}")
    val dt = inputType.fields(0).dataType
    require(dt == TimestampType || dt == TimestampNTZType ||
        (dt == DateType && unit != "hours"),
      s"$unit: unsupported source type ${dt.simpleString}")
    new GraftTimeBound(unit, dt)
  }
}

private[graft] final class GraftTimeBound(unit: String, valueType: DataType)
    extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(valueType)
  override def resultType(): DataType = IntegerType
  override def name(): String = unit
  override def canonicalName(): String = s"graft.$unit"
  override def isResultNullable: Boolean = true
  override def produceResult(input: InternalRow): Integer = {
    if (input.isNullAt(0)) return null
    val epochDay: Long = valueType match {
      case DateType => input.getInt(0).toLong
      case _ => Math.floorDiv(input.getLong(0), 86400000000L)
    }
    Int.box(unit match {
      case "days" => epochDay.toInt
      case "hours" => Math.floorDiv(input.getLong(0), 3600000000L).toInt
      case "months" =>
        val d = java.time.LocalDate.ofEpochDay(epochDay)
        (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
      case "years" =>
        java.time.LocalDate.ofEpochDay(epochDay).getYear - 1970
    })
  }
}
