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
    * Spark to treat their partitionings as compatible — and the name
    * must carry the BOUND VALUE TYPE: xxhash64 of an INT and a BIGINT
    * differ for equal numeric values, so tables bucketed on
    * differently-typed keys must NOT report compatible functions
    * (Iceberg's system.bucket makes the same distinction). */
  override def canonicalName(): String =
    s"graft.bucket(${valueType.catalogString})"
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

/** The Iceberg-spec murmur3 bucket (`mbucket(n,col)`,
  * [[graft.table.MBucketField]]) as a V2 function family. Like
  * truncate, the COUNT is encoded in the name (`mbucket_8(col)`):
  * Spark's SPJ machinery special-cases only the built-in `bucket`
  * shape for out-of-band numBuckets, and serving a SECOND function
  * under the name `bucket` would collide with the xxhash64 transform's
  * report. The bound function computes the same value the write path
  * records ([[graft.functions.IcebergBucketImpl]]).
  *
  * The canonical name carries the spec's ENCODING of the bound type,
  * not the type itself: ints hash widened to long, so an int-keyed and
  * a bigint-keyed mbucket(n) table ARE compatible partitionings
  * (exactly why the widening path allows mbucket sources). Decimal
  * encodes the unscaled value, so the SCALE (not precision) is part of
  * the encoding identity. */
private[graft] final class GraftMBucketUnbound(n: Int) extends UnboundFunction {
  require(n > 0, s"mbucket count must be positive, got $n")
  override def name(): String = s"mbucket_$n"
  override def description(): String =
    s"mbucket_$n(col): (murmur3_x86_32(iceberg-encode(col)) & MaxInt) % $n " +
      "— the Iceberg-spec bucket transform"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1,
      s"mbucket_$n expects one argument, got ${inputType.simpleString}")
    inputType.fields(0).dataType match {
      case IntegerType | LongType | ShortType | ByteType | DateType |
           TimestampType | TimestampNTZType | StringType | BinaryType |
           _: DecimalType => ()
      case other => throw new IllegalArgumentException(
        s"mbucket: unsupported source type ${other.simpleString}")
    }
    new GraftMBucketBound(n, inputType.fields(0).dataType)
  }
}

private[graft] final class GraftMBucketBound(n: Int, valueType: DataType)
    extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(valueType)
  override def resultType(): DataType = IntegerType
  override def name(): String = s"mbucket_$n"
  override def canonicalName(): String = {
    val enc = valueType match {
      case IntegerType | LongType | ShortType | ByteType | DateType |
           TimestampType | TimestampNTZType => "long"
      case StringType => "utf8"
      case BinaryType => "bytes"
      case d: DecimalType => s"unscaled(${d.scale})"
      case other => other.catalogString // unreachable post-bind
    }
    s"graft.mbucket($n, $enc)"
  }
  override def isResultNullable: Boolean = true
  override def produceResult(input: InternalRow): Integer = {
    if (input.isNullAt(0)) return null
    import graft.functions.IcebergBucketImpl
    Int.box(valueType match {
      case IntegerType | DateType => IcebergBucketImpl.bucketLong(input.getInt(0).toLong, n)
      case ShortType => IcebergBucketImpl.bucketLong(input.getShort(0).toLong, n)
      case ByteType => IcebergBucketImpl.bucketLong(input.getByte(0).toLong, n)
      case LongType | TimestampType | TimestampNTZType =>
        IcebergBucketImpl.bucketLong(input.getLong(0), n)
      case StringType => IcebergBucketImpl.bucketBytes(input.getUTF8String(0).getBytes, n)
      case BinaryType => IcebergBucketImpl.bucketBytes(input.getBinary(0), n)
      case d: DecimalType =>
        IcebergBucketImpl.bucketDecimal(input.getDecimal(0, d.precision, d.scale), n)
      case other => throw new IllegalStateException(s"unreachable: $other")
    })
  }
}

/** The `truncate` partition transform as a V2 function — the same
  * arithmetic as the write path's
  * [[graft.table.TruncateField.expr]]: leading-codepoints prefix for
  * STRING sources, `v - floorMod(v, width)` for integral sources — so
  * two truncate-partitioned tables' reports resolve to one canonical
  * function and their key joins plan shuffle-free.
  *
  * The WIDTH is encoded in the function NAME (`truncate_10(col)`),
  * not passed as an argument: Spark's
  * `KeyGroupedPartitioning.supportsExpressions` admits only
  * single-child transform expressions (bucket alone gets its
  * numBuckets carried out-of-band), so the Iceberg-style two-argument
  * `truncate(width, col)` can never ride a storage-partitioned join —
  * a width-per-name family of unary functions, served by this
  * catalog, can. Integral results are LONG regardless of source width
  * (matching the stored layout value, the long multiple); the
  * canonical name carries the width AND the bound source type, since
  * different widths — like a string prefix vs an integral multiple —
  * are incomparable partitionings. */
private[graft] final class GraftTruncateUnbound(width: Int) extends UnboundFunction {
  require(width > 0, s"truncate width must be positive, got $width")
  override def name(): String = s"truncate_$width"
  override def description(): String =
    s"truncate_$width(col): leading-codepoints prefix (string) or the " +
      s"width-$width multiple at or below the value (integral) — the " +
      "graft truncate partition transform"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1,
      s"truncate_$width expects one argument, got ${inputType.simpleString}")
    inputType.fields(0).dataType match {
      case StringType | IntegerType | LongType | ShortType | ByteType => ()
      case other => throw new IllegalArgumentException(
        s"truncate: unsupported source type ${other.simpleString}")
    }
    new GraftTruncateBound(width, inputType.fields(0).dataType)
  }
}

private[graft] final class GraftTruncateBound(width: Int, valueType: DataType)
    extends ScalarFunction[Any] {
  override def inputTypes(): Array[DataType] = Array(valueType)
  override def resultType(): DataType =
    if (valueType == StringType) StringType else LongType
  override def name(): String = s"truncate_$width"
  override def canonicalName(): String =
    s"graft.truncate($width, ${valueType.catalogString})"
  override def isResultNullable: Boolean = true
  override def produceResult(input: InternalRow): Any = {
    if (input.isNullAt(0)) return null
    valueType match {
      case StringType =>
        // substringSQL counts codepoints exactly like the write side's
        // functions.substring
        input.getUTF8String(0).substringSQL(1, width)
      case _ =>
        val v: Long = valueType match {
          case LongType => input.getLong(0)
          case IntegerType => input.getInt(0).toLong
          case ShortType => input.getShort(0).toLong
          case _ => input.getByte(0).toLong
        }
        Long.box(v - Math.floorMod(v, width.toLong))
    }
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
