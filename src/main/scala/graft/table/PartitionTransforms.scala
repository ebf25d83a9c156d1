package graft.table

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.{DataFileEntry, Snaplog}

/** Hidden-partitioning transforms (Iceberg `PartitionSpec` semantics,
  * reference `main-polars.py:135-142` — the reference itself only uses
  * IdentityTransform; `days`/`bucket` are the beyond-parity transforms
  * a time-partitioned 100 TB events table actually needs).
  *
  * A table's partition spec is stored as strings in
  * `TableMetadata.partitionColumns` — `"col"` (identity),
  * `"days(col)"`, `"bucket(n,col)"` — so the serialized metadata format
  * is unchanged and every pre-existing identity table parses as before.
  * Each non-identity transform derives a FIELD NAME (`col_day`,
  * `col_bucket`) under which the per-file TRANSFORMED value is recorded
  * in the log (and used as the `__p_` layout directory), while the raw
  * source column stays untouched in the data files — queries filter on
  * the SOURCE column and pruning happens on the transformed metadata,
  * which is exactly what "hidden" means.
  *
  * Transform definitions (write path and prune path MUST agree):
  *  - `days(ts)`  = floorDiv(micros-since-epoch, 86 400 000 000) — the
  *    epoch-day index as a decimal string. Computed with exact integral
  *    arithmetic (`(m − pmod(m, D)) / D`, both double-exact below 2^53)
  *    so the day boundary never rounds. For DATE sources it is the
  *    internal epoch-day itself.
  *  - `bucket(n, col)` = floorMod(xxhash64(col), n) — Spark's XxHash64
  *    (seed 42) of the single column, nonnegative remainder. Null
  *    sources go to the null partition (Hive default sentinel), like
  *    identity nulls.
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
  /** The transformed value as a string-typed layout Column. */
  def expr(c: Column): Column
}

final case class IdentityField(source: String) extends PartField {
  val spec: String = source
  val fieldName: String = source
  def expr(c: Column): Column = c
}

final case class DaysField(source: String) extends PartField {
  val spec: String = s"days($source)"
  val fieldName: String = s"${source}_day"
  def expr(c: Column): Column = {
    val D = 86400000000L
    val m = unix_micros(c.cast(TimestampType))
    ((m - pmod(m, lit(D))) / lit(D)).cast(LongType).cast(StringType)
  }
}

final case class BucketField(n: Int, source: String) extends PartField {
  val spec: String = s"bucket($n,$source)"
  val fieldName: String = s"${source}_bucket"
  def expr(c: Column): Column =
    when(c.isNull, lit(null).cast(StringType))
      .otherwise(pmod(xxhash64(c), lit(n.toLong)).cast(StringType))
}

object PartitionTransforms {

  private val DaysRe = """(?i)days?\(\s*([^()\s,]+)\s*\)""".r
  private val BucketRe = """(?i)bucket\(\s*(\d+)\s*,\s*([^()\s,]+)\s*\)""".r

  def parse(spec: String): PartField = spec match {
    case DaysRe(c) => DaysField(c)
    case BucketRe(n, c) => BucketField(n.toInt, c)
    case c => IdentityField(c)
  }

  def parseAll(specs: Seq[String]): Seq[PartField] = specs.map(parse)

  def identityOnly(specs: Seq[String]): Boolean =
    specs.forall(parse(_).isInstanceOf[IdentityField])

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
        case _: DaysField => f.dataType match {
          case TimestampType | TimestampNTZType | DateType => ()
          case other => throw new IllegalArgumentException(
            s"days(${pf.source}): source must be timestamp/date, is ${other.simpleString}")
        }
        case b: BucketField =>
          require(b.n > 0, s"bucket(${b.n},${pf.source}): bucket count must be positive")
          f.dataType match {
            case _: ArrayType | _: MapType | _: StructType =>
              throw new IllegalArgumentException(
                s"bucket(${pf.source}): source must be an atomic type, " +
                  s"is ${f.dataType.simpleString}")
            case _ => ()
          }
        case _: IdentityField => ()
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

  // ---- driver-side transforms of pushed catalyst literals ----------------
  // Both MUST agree bit-for-bit with the layout Column exprs above: the
  // write path records expr(value), the prune path compares against
  // transform-of-literal — disagreement would prune live rows.

  /** Epoch-day of a catalyst-internal temporal literal value. */
  def dayOfCatalyst(v: Any, dt: DataType): Option[Long] = (v, dt) match {
    case (null, _) => None
    case (micros: Long, TimestampType | TimestampNTZType) =>
      Some(Math.floorDiv(micros, 86400000000L))
    case (days: Int, DateType) => Some(days.toLong)
    case _ => None
  }

  /** Bucket of a catalyst literal — evaluates the SAME XxHash64
    * expression the layout column uses, so agreement is by
    * construction. */
  def bucketOfCatalyst(n: Int,
      lit: org.apache.spark.sql.catalyst.expressions.Literal): Option[Long] =
    if (lit.value == null) None
    else {
      val h = new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(lit))
        .eval(null).asInstanceOf[Long]
      Some(Math.floorMod(h, n.toLong))
    }

  // ---- conservative transform pruning ------------------------------------

  import org.apache.spark.sql.catalyst.expressions.{And => CAnd, AttributeReference, EqualTo => CEq, Expression, GreaterThan => CGt, GreaterThanOrEqual => CGte, In => CIn, IsNotNull => CIsNotNull, LessThan => CLt, LessThanOrEqual => CLte, Literal => CLit, Or => COr}

  /** Conservative may-match of one pushed predicate (on SOURCE columns)
    * against a file's recorded TRANSFORMED partition values. `true` is
    * always safe; `false` only when the transform metadata proves no
    * row of the file can match:
    *  - days: equality/range at day granularity (a range endpoint
    *    prunes whole days outside it; the endpoint's own day survives).
    *  - bucket: equality/IN only — a hash bucket carries no order.
    * Files that record no value for the derived field never prune. */
  def mayMatch(f: DataFileEntry, e: Expression, fields: Seq[PartField]): Boolean = {
    if (fields.isEmpty) return true
    val bySource = fields.filterNot(_.isInstanceOf[IdentityField])
      .groupBy(_.source.toLowerCase(java.util.Locale.ROOT))
    if (bySource.isEmpty) return true

    def stored(pf: PartField): Option[String] = f.partitionValues.get(pf.fieldName)
    def storedDay(pf: PartField): Option[Long] = stored(pf) match {
      case Some(Snaplog.HiveDefaultPartition) => None
      case Some(s) => scala.util.Try(s.toLong).toOption
      case None => None
    }

    def eqOk(c: String, l: CLit): Boolean =
      bySource.getOrElse(c.toLowerCase(java.util.Locale.ROOT), Seq.empty).forall {
        case pf: DaysField =>
          (dayOfCatalyst(l.value, l.dataType), storedDay(pf)) match {
            case (Some(d), Some(sd)) => d == sd
            // null literal: equality never matches any row — but null
            // semantics are the residual's job; only the null-partition
            // file check below is exact. Keep conservative.
            case _ => l.value != null || !stored(pf).contains(Snaplog.HiveDefaultPartition)
          }
        case pf: BucketField =>
          (bucketOfCatalyst(pf.n, l), storedDay(pf)) match {
            case (Some(b), Some(sb)) => b == sb
            case _ => true
          }
        case _ => true
      }

    def rangeOk(c: String, l: CLit)(dayCmp: (Long, Long) => Boolean): Boolean =
      bySource.getOrElse(c.toLowerCase(java.util.Locale.ROOT), Seq.empty).forall {
        case pf: DaysField =>
          (dayOfCatalyst(l.value, l.dataType), storedDay(pf)) match {
            case (Some(d), Some(sd)) => dayCmp(sd, d)
            case _ => true
          }
        case _ => true // bucket carries no order
      }

    e match {
      case CEq(a: AttributeReference, l: CLit) => eqOk(a.name, l)
      case CEq(l: CLit, a: AttributeReference) => eqOk(a.name, l)
      case CIn(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[CLit]) =>
        vs.exists(v => eqOk(a.name, v.asInstanceOf[CLit]))
      // day granularity: a file of day sd may hold rows matching
      // `col > v` iff sd >= day(v) (rows later in v's own day qualify)
      case CGt(a: AttributeReference, l: CLit) => rangeOk(a.name, l)(_ >= _)
      case CGte(a: AttributeReference, l: CLit) => rangeOk(a.name, l)(_ >= _)
      case CLt(a: AttributeReference, l: CLit) => rangeOk(a.name, l)(_ <= _)
      case CLte(a: AttributeReference, l: CLit) => rangeOk(a.name, l)(_ <= _)
      case CGt(l: CLit, a: AttributeReference) => rangeOk(a.name, l)(_ <= _)
      case CGte(l: CLit, a: AttributeReference) => rangeOk(a.name, l)(_ <= _)
      case CLt(l: CLit, a: AttributeReference) => rangeOk(a.name, l)(_ >= _)
      case CLte(l: CLit, a: AttributeReference) => rangeOk(a.name, l)(_ >= _)
      case CIsNotNull(a: AttributeReference) =>
        bySource.getOrElse(a.name.toLowerCase(java.util.Locale.ROOT), Seq.empty)
          .forall(pf => !stored(pf).contains(Snaplog.HiveDefaultPartition))
      case CAnd(l, r) => mayMatch(f, l, fields) && mayMatch(f, r, fields)
      case COr(l, r) => mayMatch(f, l, fields) || mayMatch(f, r, fields)
      case _ => true
    }
  }
}
