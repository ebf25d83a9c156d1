package graft.table

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union, UpdateSketch}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.JsonDSL._

/** Table-level column statistics — the ANALYZE tier.
  *
  * The reference keeps no table statistics (its engines re-estimate per
  * query); at 100 TB a planner that cannot see cardinality broadcasts
  * nothing and reorders nothing, so this tier computes per-column NDV
  * once and lets every subsequent plan consume it for free:
  *
  *  - NDV per column via theta sketches (the bundled Apache
  *    DataSketches library Spark itself ships) — ONE distributed pass,
  *    map-side sketching (each task folds its partition into a ~KB
  *    compact sketch), driver union of #partitions sketches. At 1000
  *    executors the driver merges 1000 × 4 KB objects — metadata-sized
  *    regardless of table size.
  *  - Sketches are built over values in ICEBERG SINGLE-VALUE BINARY
  *    form (spec Appendix D) with the library's default seed/family,
  *    which is exactly how Iceberg's own `compute_table_stats` builds
  *    them — so the native stats file IS a spec
  *    `apache-datasketches-theta-v1` puffin payload, exportable
  *    verbatim and mergeable by external engines.
  *  - min/max/nullCount are NOT re-computed here: the snapshot log
  *    already records them per file (footer stats), so the scan-side
  *    reporter aggregates them live — always fresh, zero extra I/O.
  *    ANALYZE only adds what files cannot record: distinct counts and
  *    string lengths.
  *
  * Exactness: a theta sketch is EXACT below its nominal entry count
  * (default 4096) and ~2% beyond — which is why the correctness gate
  * pins NDV on low-cardinality columns against a COUNT(DISTINCT)
  * oracle, and why estimates on high-cardinality columns are still the
  * right planner input (CBO needs magnitude, not equality).
  *
  * Known deviation (kept deliberately): DataSketches'
  * `UpdateSketch.update(byte[])` is a documented no-op for EMPTY
  * arrays, so the empty string / empty binary value is never hashed —
  * NDV undercounts `COUNT(DISTINCT)` by exactly 1 on columns that
  * contain `""`, while `nn`/avgLen still count it. Iceberg's own
  * `theta-v1` sketches share the convention (same library call), so
  * hashing a private sentinel here would break the cross-engine
  * sketch-merge parity the puffin export promises. Planner impact is
  * a ±1 NDV — noise at any cardinality CBO acts on.
  */
object TableStats {

  /** Table property holding the analyzed snapshot id. Stats are
    * ANALYZE-semantics: they describe the table as of this snapshot
    * and go stale (never wrong-plan-fatal) as the table advances. */
  val SnapshotProp = "graft.stats.snapshot-id"

  /** Table property pointing at the native puffin statistics file. */
  val PathProp = "graft.stats.path"

  /** Provenance marker set when the stored stats were ADOPTED from a
    * foreign (Iceberg) statistics entry that described an ANCESTOR of
    * the imported snapshot, not the imported content itself — the
    * value is the foreign snapshot id the stats actually cover. The
    * imported tree then contains rows the foreign ANALYZE never
    * sketched, so [[graft.table.LakehouseTable.analyzeIncremental]]
    * must NOT treat [[SnapshotProp]] as fully sketched (a union over
    * post-import deltas would leave the gap rows permanently
    * uncounted); it refuses with full-analyze guidance, and a full
    * `analyze()` clears the marker. */
  val AdoptedAncestorProp = "graft.stats.adopted-ancestor-snapshot"

  /** Table property holding the compact JSON summary the scan reports
    * from without touching the puffin file:
    * `{"col":{"ndv":N,"avgLen":n,"maxLen":n},…}` (lengths only where
    * tracked, i.e. variable-width columns). */
  val SummaryProp = "graft.stats.summary"

  /** One equi-height histogram bin over the column's CATALYST-INTERNAL
    * value space as doubles (dates epoch-days, timestamps epoch-micros
    * — the space Spark's estimation compares literals in). */
  final case class Bin(lo: Double, hi: Double, ndv: Long)

  /** `nn` = the analyzed pass's non-null count — what lets an
    * INCREMENTAL analyze weight merged average lengths. */
  final case class ColNdv(ndv: Long, avgLen: Option[Long], maxLen: Option[Long],
      hist: Option[Seq[Bin]] = None, nn: Option[Long] = None)

  /** Column types ANALYZE sketches: every type with an Iceberg
    * single-value binary form the footer-stat machinery also
    * understands. Nested types carry no single-value form. */
  def analyzable(dt: DataType): Boolean = dt match {
    case BooleanType | IntegerType | LongType | ShortType | ByteType |
         FloatType | DoubleType | StringType | BinaryType | DateType |
         TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  /** One distributed pass: per-column compact theta sketches plus
    * byte-length aggregates for variable-width columns. Returns
    * (sketchBytes, ColNdv) per column, in `cols` order.
    *
    * Values are hashed in catalyst-internal form converted to Iceberg
    * single-value bytes — ints/longs/dates/timestamps little-endian,
    * strings UTF-8, decimals minimal big-endian two's-complement —
    * so two engines analyzing the same data produce mergeable
    * sketches with identical estimates. */
  def collect(df: DataFrame, cols: Seq[String])
      : Seq[(Array[Byte], ColNdv)] = {
    val proj = df.select(cols.map(col): _*)
    val dts: Array[DataType] = proj.schema.fields.map(_.dataType)
    dts.foreach(dt => require(analyzable(dt),
      s"ANALYZE cannot sketch type $dt — no single-value binary form"))
    val n = dts.length
    // catalyst rows: the internal values ARE the serialized integers
    // (epoch days/micros), so no external-type round trip
    val parts: Array[(Array[Array[Byte]], Array[Long], Array[Long], Array[Long])] =
      proj.queryExecution.toRdd.mapPartitions { it =>
        val sks = Array.fill(n)(UpdateSketch.builder().build())
        val tot = new Array[Long](n)
        val mx = new Array[Long](n)
        val nn = new Array[Long](n)
        it.foreach { row =>
          var i = 0
          while (i < n) {
            if (!row.isNullAt(i)) {
              val b = singleValueBytes(dts(i), row, i)
              sks(i).update(b)
              nn(i) += 1
              tot(i) += b.length
              if (b.length > mx(i)) mx(i) = b.length
            }
            i += 1
          }
        }
        Iterator.single((sks.map(_.compact.toByteArray), tot, mx, nn))
      }.collect()
    (0 until n).map { i =>
      val u: Union = SetOperation.builder().buildUnion()
      parts.foreach(p =>
        u.union(Sketches.heapifyCompactSketch(Memory.wrap(p._1(i)))))
      val compact = u.getResult(true, null)
      val nonNull = parts.map(_._4(i)).sum
      val lens = dts(i) match {
        case StringType | BinaryType | _: DecimalType if nonNull > 0 =>
          val tot = parts.map(_._2(i)).sum
          (Some((tot + nonNull - 1) / nonNull), Some(parts.map(_._3(i)).max))
        case _ => (None, None)
      }
      (compact.toByteArray,
        ColNdv(Math.round(compact.getEstimate), lens._1, lens._2,
          nn = Some(nonNull)))
    }
  }

  /** Merge a stored column summary with a DELTA pass's summary given
    * the delta's compact sketch unioned in by the caller: lengths
    * merge exactly for max, weighted by non-null counts for avg. */
  def mergeLens(old: ColNdv, delta: ColNdv, mergedNdv: Long): ColNdv = {
    val nnOld = old.nn.getOrElse(0L)
    val nnNew = delta.nn.getOrElse(0L)
    val avg = (old.avgLen, delta.avgLen) match {
      case (Some(a), Some(b)) if nnOld + nnNew > 0 =>
        Some((a * nnOld + b * nnNew + nnOld + nnNew - 1) / (nnOld + nnNew))
      case (Some(a), None) => Some(a)
      case (None, Some(b)) => Some(b)
      case _ => None
    }
    val mx = (old.maxLen.toSeq ++ delta.maxLen.toSeq).reduceOption(_ max _)
    // histograms cannot merge (bin boundaries are distribution-wide) —
    // an incremental pass drops them; re-run a full ANALYZE to refresh
    ColNdv(mergedNdv, avg, mx, hist = None, nn = Some(nnOld + nnNew))
  }

  /** Union a stored compact sketch with a delta pass's sketch. */
  def unionSketches(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val u: Union = SetOperation.builder().buildUnion()
    u.union(Sketches.heapifyCompactSketch(Memory.wrap(a)))
    u.union(Sketches.heapifyCompactSketch(Memory.wrap(b)))
    u.getResult(true, null).toByteArray
  }

  /** Iceberg single-value binary serialization (spec Appendix D) of a
    * catalyst-internal value: the bytes both the sketch hashes and an
    * external DataSketches reader would hash for the same value. */
  private def singleValueBytes(dt: DataType,
      row: org.apache.spark.sql.catalyst.InternalRow, i: Int): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def le(n: Int) = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    dt match {
      case BooleanType => Array[Byte](if (row.getBoolean(i)) 1 else 0)
      // Iceberg has no 1/2-byte integrals: short/byte widen to int
      case ByteType => le(4).putInt(row.getByte(i).toInt).array()
      case ShortType => le(4).putInt(row.getShort(i).toInt).array()
      case IntegerType | DateType => le(4).putInt(row.getInt(i)).array()
      case LongType | TimestampType | TimestampNTZType =>
        le(8).putLong(row.getLong(i)).array()
      case FloatType => le(4).putFloat(row.getFloat(i)).array()
      case DoubleType => le(8).putDouble(row.getDouble(i)).array()
      case StringType => row.getUTF8String(i).getBytes
      case BinaryType => row.getBinary(i)
      case d: DecimalType =>
        row.getDecimal(i, d.precision, d.scale)
          .toJavaBigDecimal.unscaledValue.toByteArray
      case other =>
        throw new IllegalStateException(s"unsketchable type $other")
    }
  }

  /** Column types an equi-height histogram can cover: totally-ordered
    * types whose catalyst-internal value maps losslessly to a double
    * for estimation (Spark's own ANALYZE histogram space). NTZ
    * timestamps are excluded — their internal wall-clock micros can't
    * be recovered through a session-timezone-dependent cast. */
  def histogramType(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | ShortType | ByteType | FloatType |
         DoubleType | DateType | TimestampType => true
    case _: DecimalType => true
    case _ => false
  }

  /** The column in its internal-as-double estimation space. */
  private def histExpr(c: String, dt: DataType): org.apache.spark.sql.Column =
    dt match {
      case DateType =>
        org.apache.spark.sql.functions.unix_date(col(c)).cast(DoubleType)
      case TimestampType =>
        org.apache.spark.sql.functions.unix_micros(col(c)).cast(DoubleType)
      case _ => col(c).cast(DoubleType)
    }

  /** Equi-height histograms (Spark's ANALYZE ... COMPUTE STATISTICS
    * FOR COLUMNS histogram equivalent) in TWO distributed passes over
    * all requested columns together:
    *
    *  1. one aggregation computes every column's `numBins+1` equi-height
    *     boundaries via `percentile_approx` (nulls skipped);
    *  2. one explode+aggregate computes per-bin NDV via HLL — rows
    *     shuffled = numBins × columns, never data-sized.
    *
    * Bins live in the internal-as-double space [[Bin]] documents, which
    * is exactly what CBO's range estimation compares predicate literals
    * in — a skewed 100 TB fact column then prices `BETWEEN` windows by
    * its real distribution instead of a uniform [min,max] spread. */
  def histograms(df: DataFrame, cols: Seq[String], numBins: Int)
      : Map[String, Seq[Bin]] = {
    import org.apache.spark.sql.functions._
    require(numBins >= 2 && numBins <= 1000, s"numBins $numBins out of range")
    val dts = cols.map(c => c -> df.schema(c).dataType).toMap
    cols.foreach(c => require(histogramType(dts(c)),
      s"histogram column '$c' has type ${dts(c)} — no ordered double space"))
    val fractions = array((0 to numBins).map(i =>
      lit(i.toDouble / numBins)): _*)
    val bounds: Map[String, Seq[Double]] = {
      val row = df.select(cols.map(c =>
        percentile_approx(histExpr(c, dts(c)), fractions, lit(10000))
          .as(c)): _*).head()
      cols.zipWithIndex.map { case (c, i) =>
        c -> (if (row.isNullAt(i)) Seq.empty[Double]
              else row.getSeq[Double](i))
      }.toMap
    }
    val withData = cols.filter(c => bounds(c).size == numBins + 1)
    if (withData.isEmpty) return Map.empty
    // bin index = number of INNER boundaries strictly below the value
    // (0-based, in [0, numBins-1]) — a codegen'd higher-order filter,
    // no UDF; each row contributes one (column, bin, value) triple per
    // histogrammed column
    val exploded = df.select(explode(array(withData.map { c =>
      val inner = array(bounds(c).slice(1, numBins).map(lit): _*)
      val v = histExpr(c, dts(c))
      struct(lit(c).as("c"),
        size(filter(inner, b => b < v)).as("bin"),
        v.as("v"))
    }: _*)).as("h"))
      .select(col("h.c"), col("h.bin"), col("h.v"))
      .filter(col("v").isNotNull)
    val ndvRows = exploded.groupBy(col("c"), col("bin"))
      .agg(approx_count_distinct(col("v")).as("ndv"))
      .collect()
    val ndvByBin: Map[(String, Int), Long] = ndvRows.map(r =>
      (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    withData.map { c =>
      val b = bounds(c)
      c -> (0 until numBins).map(i =>
        Bin(b(i), b(i + 1), ndvByBin.getOrElse((c, i), 0L)))
    }.toMap
  }

  /** NDV estimate of a serialized compact theta sketch — how import
    * recovers a foreign blob's cardinality when the writer omitted the
    * `ndv` property. */
  def estimate(sketchBytes: Array[Byte]): Long =
    Math.round(Sketches.heapifyCompactSketch(Memory.wrap(sketchBytes)).getEstimate)

  // ---- summary JSON codec --------------------------------------------------

  def encodeSummary(m: Map[String, ColNdv]): String =
    JsonMethods.compact(JsonMethods.render(JObject(
      m.toList.sortBy(_._1).map { case (c, s) =>
        val base = ("ndv" -> s.ndv) ~
          ("avgLen" -> s.avgLen) ~ ("maxLen" -> s.maxLen) ~ ("nn" -> s.nn)
        c -> (s.hist match {
          case Some(bins) => base ~ ("hist" -> bins.map(b =>
            JArray(List(JDouble(b.lo), JDouble(b.hi), JLong(b.ndv)))).toList)
          case None => base: JValue
        })
      })))

  def decodeSummary(s: String): Map[String, ColNdv] = {
    implicit val fmts: Formats = DefaultFormats
    JsonMethods.parse(s) match {
      case JObject(fs) => fs.map { case (c, v) =>
        val hist = (v \ "hist") match {
          case JArray(bins) => Some(bins.collect {
            case JArray(List(lo, hi, n)) =>
              Bin(lo.extract[Double], hi.extract[Double], n.extract[Long])
          })
          case _ => None
        }
        c -> ColNdv((v \ "ndv").extract[Long],
          (v \ "avgLen").extractOpt[Long], (v \ "maxLen").extractOpt[Long],
          hist.filter(_.nonEmpty),
          (v \ "nn").extractOpt[Long])
      }.toMap
      case _ => Map.empty
    }
  }

  /** Parsed summary from table properties — empty when never analyzed. */
  def fromProperties(props: Map[String, String]): Map[String, ColNdv] =
    props.get(SummaryProp).map(decodeSummary).getOrElse(Map.empty)
}
