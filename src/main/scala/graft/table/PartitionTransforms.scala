package graft.table

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Literal => CatalystLiteral}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.{DataFileEntry, Snaplog}

/** Hidden-partitioning transforms (Iceberg `PartitionSpec` semantics,
  * reference `main-polars.py:135-142` — the reference itself only uses
  * IdentityTransform; the transform set here is the one a
  * time-partitioned 100 TB events table actually needs).
  *
  * A table's partition spec is stored as strings in
  * `TableMetadata.partitionColumns` — `"col"` (identity),
  * `"days(col)"`, `"hours(col)"`, `"months(col)"`, `"years(col)"`,
  * `"bucket(n,col)"`, `"truncate(w,col)"` — so the serialized metadata
  * format is unchanged and every pre-existing identity table parses as
  * before. Each non-identity transform derives a FIELD NAME
  * (`col_day`, `col_bucket`, …) under which the per-file TRANSFORMED
  * value is recorded in the log (and used as the `__p_` layout
  * directory), while the raw source column stays untouched in the data
  * files — queries filter the SOURCE column and pruning happens on the
  * transformed metadata, which is exactly what "hidden" means.
  *
  * Write path and prune path MUST agree bit-for-bit: the layout
  * Column `expr` records the value, `ofCatalyst` transforms a pushed
  * literal the same way. Both sides are TIMEZONE-INDEPENDENT by
  * construction: timestamps index by their raw epoch micros
  * (`unix_micros`), NTZ/date values by wall-clock epoch-day arithmetic
  * — no session-timezone-dependent cast ever touches a partition
  * value, so a non-UTC session cannot desynchronize stored indexes
  * from prune-side indexes. Time transforms store integral epoch
  * indexes (day/hour/month/year offsets from 1970, exact integral
  * arithmetic so boundaries never round); `bucket` is
  * floorMod(xxhash64, n); `truncate` is the leading-codepoints string
  * prefix for strings and the floorMod-aligned width multiple for
  * integral sources (order-preserving — range-prunable). Null sources
  * go to the null partition (Hive default sentinel), like identity
  * nulls.
  */
sealed trait PartField {
  /** The spec string stored in TableMetadata.partitionColumns. */
  def spec: String
  /** Source data column the transform consumes. */
  def source: String
  /** Name the transformed value is recorded under (file partitionValues
    * key and `__p_<fieldName>=` layout directory). Identity uses the
    * source name itself — unchanged from pre-transform logs. */
  def fieldName: String
  /** The transformed value as a string-typed layout Column. `dt` is the
    * SOURCE column's declared type — time transforms dispatch on it so
    * each type gets pure (timezone-free) arithmetic. */
  def expr(c: Column, dt: DataType): Column
  /** The same transform applied to a pushed catalyst literal, as the
    * stored string form; None = not evaluable (wrong type / null). */
  def ofCatalyst(l: CatalystLiteral): Option[String] = None
  /** Order-preserving transform — licenses range pruning at transform
    * granularity. Hash buckets and identity stay false. */
  def ordered: Boolean = false
  /** Order-preservation may depend on the SOURCE type (truncate orders
    * integral sources but not strings, whose stored prefix compares
    * lexicographically while numeric cmp would compare numerically);
    * the pushed literal's type IS the source type post-analysis, so
    * range pruning gates per-literal here. */
  def orderedFor(l: CatalystLiteral): Boolean = ordered
  /** Does a sentinel (null-partition) stored value prove the file holds
    * ONLY null source rows? True for every transform except string
    * truncate, where an EMPTY-STRING source also lands in the sentinel
    * directory (Spark writes "" partition values as the Hive default
    * dir) — pruning such a file under IS NOT NULL would drop its ""
    * rows, which are not null. */
  def isNotNullExact: Boolean = true
  /** True when the literal sits EXACTLY on the lower boundary of its
    * transform unit — then `col < lit` provably excludes the whole
    * unit, so a strict upper bound prunes the endpoint's unit too
    * (`WHERE ts < DATE'…'`, the most common day filter, prunes
    * exactly instead of keeping the boundary day). */
  def atUnitStart(l: CatalystLiteral): Boolean = false
  /** Compare two stored-form values (only consulted when `ordered`). */
  def cmp(a: String, b: String): Option[Int] =
    (scala.util.Try(a.toLong).toOption, scala.util.Try(b.toLong).toOption) match {
      case (Some(x), Some(y)) => Some(java.lang.Long.compare(x, y))
      case _ => None
    }
}

final case class IdentityField(source: String) extends PartField {
  val spec: String = source
  val fieldName: String = source
  def expr(c: Column, dt: DataType): Column = c
}

/** Shared epoch-index scaffolding for the four time transforms. */
sealed trait TimeField extends PartField {
  override def ordered: Boolean = true
  /** Exact integral floorDiv of a (possibly negative) micros column.
    * `m - pmod(m, unit)` is an exact multiple of `unit`, so truncating
    * division recovers floorDiv for any sign — but Spark's `/` on longs
    * is DOUBLE division, which rounds for |micros| ≥ 2^53 (before
    * ~1685 / after ~2255). Divide in decimal so the quotient stays
    * exact over the full long range, matching Math.floorDiv on the
    * prune side bit-for-bit. */
  protected def floorDivCol(m: Column, unit: Long): Column =
    ((m - pmod(m, lit(unit))).cast(DecimalType(20, 0)) / lit(unit))
      .cast(LongType)
  /** Wall-clock epoch day of a date/NTZ column — pure date arithmetic,
    * no timezone involved (NTZ→date truncates the wall clock). */
  protected def epochDayCol(c: Column, dt: DataType): Column = dt match {
    case DateType => datediff(c, to_date(lit("1970-01-01"))).cast(LongType)
    case _ => datediff(c.cast(DateType), to_date(lit("1970-01-01"))).cast(LongType)
  }
  /** The UTC calendar date a temporal column falls on, as a pure
    * expression: instants floor raw micros to an epoch day and rebuild
    * the date with `date_from_unix_date` (no session-timezone cast);
    * date/NTZ are already wall-clock. */
  protected def utcDateCol(c: Column, dt: DataType): Column = dt match {
    case TimestampType =>
      date_from_unix_date(
        floorDivCol(unix_micros(c), 86400000000L).cast(IntegerType))
    case DateType => c
    case _ => c.cast(DateType) // NTZ: wall-clock truncation, tz-free
  }
  protected def microsOf(l: CatalystLiteral): Option[Long] = (l.value, l.dataType) match {
    case (m: Long, TimestampType | TimestampNTZType) => Some(m)
    case _ => None
  }
  protected def localDateOf(l: CatalystLiteral): Option[java.time.LocalDate] =
    (l.value, l.dataType) match {
      case (m: Long, TimestampType | TimestampNTZType) =>
        Some(java.time.LocalDate.ofEpochDay(Math.floorDiv(m, 86400000000L)))
      case (d: Int, DateType) => Some(java.time.LocalDate.ofEpochDay(d.toLong))
      case _ => None
    }
  /** Timestamp literal exactly at a midnight boundary (dates always
    * are); `dayAligned` further constrains the date below. */
  protected def atDayStart(l: CatalystLiteral,
      dayOk: java.time.LocalDate => Boolean): Boolean = (l.value, l.dataType) match {
    case (m: Long, TimestampType | TimestampNTZType) =>
      Math.floorMod(m, 86400000000L) == 0L &&
        dayOk(java.time.LocalDate.ofEpochDay(Math.floorDiv(m, 86400000000L)))
    case (d: Int, DateType) => dayOk(java.time.LocalDate.ofEpochDay(d.toLong))
    case _ => false
  }
}

final case class DaysField(source: String) extends TimeField {
  val spec: String = s"days($source)"
  val fieldName: String = s"${source}_day"
  def expr(c: Column, dt: DataType): Column = (dt match {
    case TimestampType => floorDivCol(unix_micros(c), 86400000000L)
    case _ => epochDayCol(c, dt)
  }).cast(StringType)
  override def ofCatalyst(l: CatalystLiteral): Option[String] =
    localDateOf(l).map(_.toEpochDay.toString)
  override def atUnitStart(l: CatalystLiteral): Boolean = atDayStart(l, _ => true)
}

final case class HoursField(source: String) extends TimeField {
  val spec: String = s"hours($source)"
  val fieldName: String = s"${source}_hour"
  def expr(c: Column, dt: DataType): Column = (dt match {
    case TimestampType => floorDivCol(unix_micros(c), 3600000000L)
    // NTZ: wall-clock hour index — epochDay*24 + hour-of-day, both pure
    case _ => epochDayCol(c, dt) * lit(24L) + hour(c).cast(LongType)
  }).cast(StringType)
  override def ofCatalyst(l: CatalystLiteral): Option[String] =
    microsOf(l).map(m => Math.floorDiv(m, 3600000000L).toString)
  override def atUnitStart(l: CatalystLiteral): Boolean = (l.value, l.dataType) match {
    case (m: Long, TimestampType | TimestampNTZType) =>
      Math.floorMod(m, 3600000000L) == 0L
    case _ => false
  }
}

final case class MonthsField(source: String) extends TimeField {
  val spec: String = s"months($source)"
  val fieldName: String = s"${source}_month"
  def expr(c: Column, dt: DataType): Column = {
    val d = utcDateCol(c, dt)
    ((year(d) - lit(1970)) * lit(12) + (month(d) - lit(1)))
      .cast(LongType).cast(StringType)
  }
  override def ofCatalyst(l: CatalystLiteral): Option[String] =
    localDateOf(l).map(d => ((d.getYear - 1970) * 12 + (d.getMonthValue - 1)).toString)
  override def atUnitStart(l: CatalystLiteral): Boolean =
    atDayStart(l, _.getDayOfMonth == 1)
}

final case class YearsField(source: String) extends TimeField {
  val spec: String = s"years($source)"
  val fieldName: String = s"${source}_year"
  def expr(c: Column, dt: DataType): Column =
    (year(utcDateCol(c, dt)) - lit(1970)).cast(LongType).cast(StringType)
  override def ofCatalyst(l: CatalystLiteral): Option[String] =
    localDateOf(l).map(d => (d.getYear - 1970).toString)
  override def atUnitStart(l: CatalystLiteral): Boolean =
    atDayStart(l, _.getDayOfYear == 1)
}

final case class BucketField(n: Int, source: String) extends PartField {
  val spec: String = s"bucket($n,$source)"
  val fieldName: String = s"${source}_bucket"
  def expr(c: Column, dt: DataType): Column =
    when(c.isNull, lit(null).cast(StringType))
      .otherwise(pmod(xxhash64(c), lit(n.toLong)).cast(StringType))
  /** Evaluates the SAME XxHash64 expression the layout column uses, so
    * agreement is by construction. */
  override def ofCatalyst(l: CatalystLiteral): Option[String] =
    if (l.value == null) None
    else {
      val h = new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(l))
        .eval(null).asInstanceOf[Long]
      Some(Math.floorMod(h, n.toLong).toString)
    }
}

/** Iceberg-SPEC bucket — `mbucket(n,col)`: murmur3_x86_32 over the
  * spec's per-type byte encodings, `(hash & Int.MaxValue) % n`
  * ([[graft.functions.IcebergBucketImpl]], Appendix-B vectors pinned
  * in SnaplogSpec). The xxhash64 [[BucketField]] stays the native
  * default (one 64-bit mix, no byte encoding — cheaper per row); THIS
  * transform is the interop choice: the metadata export emits a REAL
  * `bucket[n]` spec external Iceberg readers prune on, and foreign
  * PyIceberg/Java-written `bucket[n]` trees import onto it with their
  * stored indexes intact. Because the spec hashes ints widened to
  * longs and decimals by unscaled value, `int→bigint` and
  * `decimal(p,s)→decimal(p',s)` type widening preserve every recorded
  * index — widening is allowed over mbucket sources (and refused over
  * xxhash64 bucket sources, which hash the value as its type). */
final case class MBucketField(n: Int, source: String) extends PartField {
  val spec: String = s"mbucket($n,$source)"
  val fieldName: String = s"${source}_mbucket"
  def expr(c: Column, dt: DataType): Column =
    graft.functions.IcebergBucket.bucket(c, n).cast(StringType)
  /** Evaluates the SAME IcebergBucketExpr the layout column uses, so
    * write/prune agreement is by construction. */
  override def ofCatalyst(l: CatalystLiteral): Option[String] =
    if (l.value == null) None
    else {
      val e = graft.functions.IcebergBucketExpr(l, n)
      if (e.checkInputDataTypes().isSuccess)
        Some(e.eval(null).asInstanceOf[Int].toString)
      else None
    }
}

/** Iceberg `truncate[W]`: leading-codepoints prefix for STRING sources,
  * `v - floorMod(v, W)` (the width-W multiple at or below v) for
  * integral sources. Integral truncate is ORDER-PRESERVING, so it
  * licenses range pruning — and range CONSUMPTION when the bound sits
  * on a width multiple; string truncate stays equality/IN-only because
  * lexicographic comparison of the stored prefix can disagree with
  * Spark's UTF-8 binary ordering on supplementary characters (and a
  * numeric cmp of digit-string prefixes would order "12" above "5").
  * Write/prune agreement over the FULL long range: the write side
  * subtracts in decimal (long `-` would wrap within W of Long.MinValue
  * — parquet dirs then store e.g. "-9223372036854775810"), the prune
  * side in BigInt; `cmp` parses BigInt so even the wrap-range bucket
  * orders correctly. */
final case class TruncateField(width: Int, source: String) extends PartField {
  val spec: String = s"truncate($width,$source)"
  val fieldName: String = s"${source}_trunc"
  override val ordered: Boolean = true
  override def orderedFor(l: CatalystLiteral): Boolean = integralOf(l).isDefined
  override def isNotNullExact: Boolean = false // "" lands in the sentinel too
  def expr(c: Column, dt: DataType): Column = dt match {
    case StringType => substring(c, 1, width)
    case IntegerType | LongType | ShortType | ByteType =>
      val lc = c.cast(LongType)
      (lc.cast(DecimalType(20, 0)) -
        pmod(lc, lit(width.toLong)).cast(DecimalType(20, 0)))
        .cast(DecimalType(20, 0)).cast(StringType)
    case other => throw new IllegalArgumentException(
      s"$spec: unsupported source type ${other.simpleString}")
  }
  private def integralOf(l: CatalystLiteral): Option[Long] = (l.value, l.dataType) match {
    case (v: Int, IntegerType) => Some(v.toLong)
    case (v: Long, LongType) => Some(v)
    case (v: Short, ShortType) => Some(v.toLong)
    case (v: Byte, ByteType) => Some(v.toLong)
    case _ => None
  }
  override def ofCatalyst(l: CatalystLiteral): Option[String] = (l.value, l.dataType) match {
    case (u: org.apache.spark.unsafe.types.UTF8String, StringType) =>
      // substringSQL counts codepoints exactly like functions.substring
      Some(u.substringSQL(1, width).toString)
    case _ => integralOf(l).map(v =>
      (BigInt(v) - Math.floorMod(v, width.toLong)).toString)
  }
  override def atUnitStart(l: CatalystLiteral): Boolean =
    integralOf(l).exists(v => Math.floorMod(v, width.toLong) == 0L)
  override def cmp(a: String, b: String): Option[Int] =
    (scala.util.Try(BigInt(a)).toOption, scala.util.Try(BigInt(b)).toOption) match {
      case (Some(x), Some(y)) => Some(x.compare(y))
      case _ => None
    }
}

object PartitionTransforms {

  private val DaysRe = """(?i)days?\(\s*([^()\s,]+)\s*\)""".r
  private val HoursRe = """(?i)hours?\(\s*([^()\s,]+)\s*\)""".r
  private val MonthsRe = """(?i)months?\(\s*([^()\s,]+)\s*\)""".r
  private val YearsRe = """(?i)years?\(\s*([^()\s,]+)\s*\)""".r
  private val BucketRe = """(?i)bucket\(\s*(\d+)\s*,\s*([^()\s,]+)\s*\)""".r
  private val MBucketRe = """(?i)mbucket\(\s*(\d+)\s*,\s*([^()\s,]+)\s*\)""".r
  private val TruncateRe = """(?i)truncate\(\s*(\d+)\s*,\s*([^()\s,]+)\s*\)""".r

  def parse(spec: String): PartField = spec match {
    case DaysRe(c) => DaysField(c)
    case HoursRe(c) => HoursField(c)
    case MonthsRe(c) => MonthsField(c)
    case YearsRe(c) => YearsField(c)
    case MBucketRe(n, c) => MBucketField(n.toInt, c)
    case BucketRe(n, c) => BucketField(n.toInt, c)
    case TruncateRe(w, c) => TruncateField(w.toInt, c)
    case c => IdentityField(c)
  }

  def parseAll(specs: Seq[String]): Seq[PartField] = specs.map(parse)

  /** The layout expression for `pf` with its source dtype resolved
    * from `schema` — the one way every write path builds transform
    * columns, so type dispatch cannot drift between writers. */
  def layoutExpr(pf: PartField, schema: StructType): Column = {
    val dt = schema.fields.find(_.name.equalsIgnoreCase(pf.source))
      .map(_.dataType).getOrElse(throw new IllegalArgumentException(
        s"partition source '${pf.source}' not in schema " +
          s"(${schema.fieldNames.mkString(", ")})"))
    pf.expr(col(pf.source), dt)
  }

  /** Shared CREATE-time validation (Snaplog + JdbcCatalog): source
    * column exists, transform source type is usable, derived field
    * names collide with nothing. */
  def validate(schema: StructType, specs: Seq[String]): Unit = {
    val fields = parseAll(specs)
    fields.foreach { pf =>
      val f = schema.fields.find(_.name.equalsIgnoreCase(pf.source)).getOrElse(
        throw new IllegalArgumentException(
          s"partition column '${pf.source}' (of spec '${pf.spec}') not in schema"))
      pf match {
        case _: HoursField => f.dataType match {
          case TimestampType | TimestampNTZType => ()
          case other => throw new IllegalArgumentException(
            s"${pf.spec}: source must be a timestamp, is ${other.simpleString}")
        }
        case _: TimeField => f.dataType match {
          case TimestampType | TimestampNTZType | DateType => ()
          case other => throw new IllegalArgumentException(
            s"${pf.spec}: source must be timestamp/date, is ${other.simpleString}")
        }
        case b: BucketField =>
          require(b.n > 0, s"${pf.spec}: bucket count must be positive")
          f.dataType match {
            case _: ArrayType | _: MapType | _: StructType =>
              throw new IllegalArgumentException(
                s"${pf.spec}: source must be an atomic type, is ${f.dataType.simpleString}")
            case _ => ()
          }
        case b: MBucketField =>
          require(b.n > 0, s"${pf.spec}: bucket count must be positive")
          f.dataType match {
            // exactly the Iceberg spec's bucketable types — floats,
            // doubles and booleans are excluded BY the spec
            case IntegerType | LongType | ShortType | ByteType | DateType |
                 TimestampType | TimestampNTZType | StringType | BinaryType |
                 _: DecimalType => ()
            case other => throw new IllegalArgumentException(
              s"${pf.spec}: source must be an Iceberg-bucketable type " +
                s"(int/long/date/timestamp/string/binary/decimal), " +
                s"is ${other.simpleString}")
          }
        case t: TruncateField =>
          require(t.width > 0, s"${pf.spec}: truncate width must be positive")
          f.dataType match {
            case StringType | IntegerType | LongType | ShortType | ByteType => ()
            case other => throw new IllegalArgumentException(
              s"${pf.spec}: source must be a string or integral column, " +
                s"is ${other.simpleString}")
          }
        case _: IdentityField => f.dataType match {
          // a struct/map/array has no stable external text to directory-
          // encode or prune on — identity partitioning is atomic-only
          case _: ArrayType | _: MapType | _: StructType =>
            throw new IllegalArgumentException(
              s"${pf.spec}: identity partition source must be an atomic " +
                s"type, is ${f.dataType.simpleString}")
          case _ => ()
        }
      }
    }
    val names = fields.map(_.fieldName.toLowerCase(java.util.Locale.ROOT))
    require(names.distinct.size == names.size,
      s"partition spec derives duplicate field names: ${specs.mkString(", ")}")
    fields.filterNot(_.isInstanceOf[IdentityField]).foreach { pf =>
      require(!schema.fieldNames.exists(_.equalsIgnoreCase(pf.fieldName)),
        s"derived partition field '${pf.fieldName}' collides with a schema column")
    }
  }

  /** Is `e` TRANSFORM-EXACT — a predicate whose per-file may-match
    * answer under [[mayMatch]] selects EXACTLY the matching rows, not a
    * superset? True only for:
    *  - `col >= lit` / `col < lit` where an ordered transform field
    *    covers `col`, the literal sits exactly on a unit boundary
    *    (`atUnitStart`), and every file records the derived field — a
    *    kept file then holds ONLY rows inside the half-open unit range,
    *    so pruning is selection (the shape of every day/hour/month
    *    window filter);
    *  - `IS NOT NULL` over a covered source (sentinel semantics are
    *    exact);
    *  - conjunctions/disjunctions of exact predicates.
    * This is what licenses CONSUMING such filters (no residual row
    * evaluation) and answering aggregates from the pruned file set —
    * the day-window COUNT a 100 TB events dashboard asks for, free
    * from metadata. */
  def rangeExact(e: org.apache.spark.sql.catalyst.expressions.Expression,
      fields: Seq[PartField], files: Seq[DataFileEntry]): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{And => XAnd, AttributeReference => XAttr, GreaterThan => XGt, GreaterThanOrEqual => XGte, In => XIn, IsNotNull => XIsNotNull, LessThan => XLt, LessThanOrEqual => XLte, EqualTo => XEq, Or => XOr}
    val ordered = fields.filter(_.ordered)
    // exactness needs every file to record a REAL comparable index:
    // a null-partition (sentinel) file would be kept by conservative
    // range pruning yet hold no matching row — decline, stay residual
    def covering(c: String): Option[PartField] = ordered.find(pf =>
      pf.source.equalsIgnoreCase(c) &&
        files.forall(_.partitionValues.get(pf.fieldName).exists(s =>
          s != Snaplog.HiveDefaultPartition &&
            scala.util.Try(s.toLong).isSuccess)))
    def alignedBound(c: String, l: CatalystLiteral): Boolean =
      covering(c).exists(pf => pf.atUnitStart(l) && pf.ofCatalyst(l).isDefined)
    e match {
      case XGte(a: XAttr, l: CatalystLiteral) => alignedBound(a.name, l)
      case XLt(a: XAttr, l: CatalystLiteral) => alignedBound(a.name, l)
      // mirrored literal-first shapes: lit <= col ⇔ col >= lit;
      // lit > col ⇔ col < lit
      case XLte(l: CatalystLiteral, a: XAttr) => alignedBound(a.name, l)
      case XGt(l: CatalystLiteral, a: XAttr) => alignedBound(a.name, l)
      // covering ⇒ every file stores a REAL (non-sentinel) numeric
      // index ⇒ the table holds NO null-source rows at all (nulls land
      // in sentinel dirs, which covering excludes) ⇒ IS NOT NULL
      // matches every row — exact for every transform, including
      // truncate (the string-truncate ""-alias hazard concerns
      // sentinel PRUNING via isNotNullExact, which never fires here:
      // ""-rows would also sit in sentinel dirs covering excludes)
      case XIsNotNull(a: XAttr) => covering(a.name).isDefined
      case XAnd(l, r) => rangeExact(l, fields, files) && rangeExact(r, fields, files)
      case XOr(l, r) => rangeExact(l, fields, files) && rangeExact(r, fields, files)
      case _: XEq | _: XIn => false // a unit holds more instants than one
      case _ => false
    }
  }

  // ---- conservative transform pruning ------------------------------------

  import org.apache.spark.sql.catalyst.expressions.{And => CAnd, AttributeReference, EqualTo => CEq, Expression, GreaterThan => CGt, GreaterThanOrEqual => CGte, In => CIn, IsNotNull => CIsNotNull, LessThan => CLt, LessThanOrEqual => CLte, Or => COr}

  /** Conservative may-match of one pushed predicate (on SOURCE columns)
    * against a file's recorded TRANSFORMED partition values. `true` is
    * always safe; `false` only when the transform metadata proves no
    * row of the file can match:
    *  - ordered transforms (time indexes): equality + range pruning at
    *    transform granularity (a range endpoint prunes whole units
    *    outside it; the endpoint's own unit survives);
    *  - bucket / truncate: equality/IN only.
    * Files that record no value for the derived field never prune. */
  def mayMatch(f: DataFileEntry, e: Expression, fields: Seq[PartField]): Boolean = {
    if (fields.isEmpty) return true
    val bySource = fields.filterNot(_.isInstanceOf[IdentityField])
      .groupBy(_.source.toLowerCase(java.util.Locale.ROOT))
    if (bySource.isEmpty) return true

    def forSource(c: String): Seq[PartField] =
      bySource.getOrElse(c.toLowerCase(java.util.Locale.ROOT), Seq.empty)
    def stored(pf: PartField): Option[String] = f.partitionValues.get(pf.fieldName)
    def storedReal(pf: PartField): Option[String] = stored(pf) match {
      case Some(Snaplog.HiveDefaultPartition) => None
      case other => other
    }

    def eqOk(c: String, l: CatalystLiteral): Boolean =
      forSource(c).forall { pf =>
        (pf.ofCatalyst(l), storedReal(pf)) match {
          case (Some(v), Some(s)) => v == s
          // non-evaluable literal (incl. null): a non-null literal can
          // still never match a null-partition file
          case _ => l.value != null || !stored(pf).contains(Snaplog.HiveDefaultPartition)
        }
      }

    // op receives cmp(stored, transformed(lit)); keep the file when it
    // holds (or anything is unknown). `strictUpper` marks `col < lit`,
    // where a unit-start-aligned literal excludes the endpoint's whole
    // unit — the stored value must then be STRICTLY below.
    def rangeOk(c: String, l: CatalystLiteral, strictUpper: Boolean = false)
        (op: Int => Boolean): Boolean =
      forSource(c).forall { pf =>
        if (!pf.orderedFor(l)) true
        else (pf.ofCatalyst(l), storedReal(pf)) match {
          case (Some(v), Some(s)) =>
            val effective: Int => Boolean =
              if (strictUpper && pf.atUnitStart(l)) (_ < 0) else op
            pf.cmp(s, v).forall(effective)
          case _ => true
        }
      }

    e match {
      case CEq(a: AttributeReference, l: CatalystLiteral) => eqOk(a.name, l)
      case CEq(l: CatalystLiteral, a: AttributeReference) => eqOk(a.name, l)
      case CIn(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[CatalystLiteral]) =>
        vs.exists(v => eqOk(a.name, v.asInstanceOf[CatalystLiteral]))
      // transform granularity: a file of unit u may hold rows matching
      // `col > v` iff u >= unit(v) (rows later in v's own unit qualify)
      case CGt(a: AttributeReference, l: CatalystLiteral) => rangeOk(a.name, l)(_ >= 0)
      case CGte(a: AttributeReference, l: CatalystLiteral) => rangeOk(a.name, l)(_ >= 0)
      case CLt(a: AttributeReference, l: CatalystLiteral) =>
        rangeOk(a.name, l, strictUpper = true)(_ <= 0)
      case CLte(a: AttributeReference, l: CatalystLiteral) => rangeOk(a.name, l)(_ <= 0)
      case CGt(l: CatalystLiteral, a: AttributeReference) =>
        rangeOk(a.name, l, strictUpper = true)(_ <= 0)
      case CGte(l: CatalystLiteral, a: AttributeReference) => rangeOk(a.name, l)(_ <= 0)
      case CLt(l: CatalystLiteral, a: AttributeReference) => rangeOk(a.name, l)(_ >= 0)
      case CLte(l: CatalystLiteral, a: AttributeReference) => rangeOk(a.name, l)(_ >= 0)
      case CIsNotNull(a: AttributeReference) =>
        forSource(a.name).forall(pf =>
          !pf.isNotNullExact || !stored(pf).contains(Snaplog.HiveDefaultPartition))
      case CAnd(l, r) => mayMatch(f, l, fields) && mayMatch(f, r, fields)
      case COr(l, r) => mayMatch(f, l, fields) || mayMatch(f, r, fields)
      case _ => true
    }
  }
}
