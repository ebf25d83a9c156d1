package graft.sql

import java.util.{Optional, OptionalLong}

import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.Statistics
import org.apache.spark.sql.connector.read.colstats.{ColumnStatistics, Histogram, HistogramBin}
import org.apache.spark.sql.types._

import graft.catalog.DataFileEntry
import graft.table.TableStats

/** Planner-facing statistics of a graft SQL scan, assembled from the
  * SNAPSHOT LOG (exact row counts, per-file bounds and null counts —
  * free, always current) plus the ANALYZE summary (NDV and string
  * lengths — one pass, advisory). Reported through DSv2
  * `SupportsReportStatistics`, which is what lets Spark:
  *
  *  - auto-BROADCAST a small graft table at plan time (no hint, no AQE
  *    wait): `numRows × row-width` is the build-side footprint the
  *    broadcast threshold compares against;
  *  - CBO-estimate filter selectivity from min/max/nullCount and
  *    reorder joins from NDV (`spark.sql.cbo.enabled`) — at 100 TB the
  *    difference between probing the small side and building the big
  *    one.
  *
  * Exactness contract: the caller only reports from the delete-free
  * branch (outstanding MOR deletes provably dodge every kept file), so
  * `numRows` is the exact post-prune count from the log — which also
  * makes the reported stats POST-PRUNE (a partition-filtered scan
  * reports the filtered magnitude, not the table's). Bounds follow the
  * metadata-aggregate gates: stat-exact types only, never a column
  * rebound by evolution (`statsUnsafe`), every kept file recording the
  * stat (all-null files count via their null counts). */
private[sql] object ScanStats {

  /** Types whose recorded bounds are exact, totally ordered, and stored
    * as stringified catalyst-internal integers — the same gate the
    * metadata MIN/MAX pushdown applies (GraftScanBuilder.statType):
    * floats excluded for NaN-poisoned footer stats, strings excluded
    * for UTF-8 vs UTF-16 order disagreement. */
  private def boundType(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | DateType | TimestampType |
         TimestampNTZType => true
    case _ => false
  }

  private def parseBound(dt: DataType, s: String): Option[Any] = dt match {
    case IntegerType | DateType =>
      scala.util.Try(s.toLong.toInt: Any).toOption
    case LongType | TimestampType | TimestampNTZType =>
      scala.util.Try(s.toLong: Any).toOption
    case _ => None
  }

  private def lt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Int, y: Int) => x < y
    case (x: Long, y: Long) => x < y
    case _ => false
  }

  /** Variable-width types whose in-memory row footprint `defaultSize`
    * (20 B for strings) can be arbitrarily wrong — the ANALYZE avgLen,
    * when present, replaces it in the row-width estimate. Without it a
    * 500K-row table of ~1 KB strings reports ~10 MB and auto-broadcasts
    * a ~500 MB build side. */
  private def varWidth(dt: DataType): Boolean = dt match {
    case StringType | BinaryType => true
    case _ => false
  }

  /** @param unpruned true when `entries` is the FULL live file set (no
    *   partition/stat pruning dropped anything) — the only case where
    *   the table-wide ANALYZE histogram describes this scan's rows. */
  def report(readSchema: StructType, entries: Seq[DataFileEntry],
      statsUnsafe: Set[String],
      ndv: Map[String, TableStats.ColNdv],
      unpruned: Boolean = true): Statistics = {
    val rows = entries.map(_.rowCount).sum
    // row width folds the ANALYZE average length in for string/binary
    // columns (defaultSize is a fixed 20 B guess); fixed-width types
    // keep defaultSize. avgLen counts only non-null values — close
    // enough for a broadcast decision, and strictly better than the
    // constant.
    val width = math.max(1L, readSchema.fields.map { f =>
      if (varWidth(f.dataType))
        ndv.get(f.name).flatMap(_.avgLen)
          .getOrElse(f.dataType.defaultSize.toLong)
      else f.dataType.defaultSize.toLong
    }.sum)
    val size =
      try math.multiplyExact(rows, width)
      catch { case _: ArithmeticException => Long.MaxValue }
    val byCol = new java.util.HashMap[NamedReference, ColumnStatistics]()
    readSchema.fields.foreach { f =>
      val c = f.name
      if (!statsUnsafe(c.toLowerCase(java.util.Locale.ROOT))) {
        // exact when EVERY kept file recorded the count (footer-stat
        // coverage rule — one unknown file poisons the sum)
        val nulls: Option[Long] =
          if (entries.nonEmpty &&
              entries.forall(_.nullCounts.exists(_.contains(c))))
            Some(entries.map(_.nullCounts.get(c)).sum)
          else None
        // bounds: stat-exact type, every file records them (all-null
        // files contribute nothing and are vacuously covered)
        val mm: Option[(Any, Any)] =
          if (boundType(f.dataType) && entries.nonEmpty &&
              entries.forall(e => e.columnStats.exists(_.contains(c)) ||
                e.nullCounts.exists(_.get(c).contains(e.rowCount)))) {
            val bs = entries.flatMap(_.columnStats.flatMap(_.get(c)))
            val parsed = bs.map(b =>
              (parseBound(f.dataType, b.min), parseBound(f.dataType, b.max)))
            if (parsed.nonEmpty && parsed.forall(p => p._1.isDefined && p._2.isDefined))
              Some((parsed.map(_._1.get).reduce((x, y) => if (lt(y, x)) y else x),
                parsed.map(_._2.get).reduce((x, y) => if (lt(x, y)) y else x)))
            else None
          } else None
        val nd = ndv.get(c)
        if (nulls.isDefined || mm.isDefined || nd.isDefined) {
          byCol.put(Expressions.column(c), new ColumnStatistics {
            // capped at the scan's own row count: ANALYZE NDV is
            // table-wide, and a partition-pruned scan of 2 rows must
            // not claim 25 distinct values to the estimator
            override def distinctCount(): OptionalLong =
              nd.map(x => OptionalLong.of(math.min(x.ndv, rows)))
                .getOrElse(OptionalLong.empty)
            override def min(): Optional[Object] =
              mm.map(x => Optional.of(x._1.asInstanceOf[Object]))
                .getOrElse(Optional.empty[Object])
            override def max(): Optional[Object] =
              mm.map(x => Optional.of(x._2.asInstanceOf[Object]))
                .getOrElse(Optional.empty[Object])
            override def nullCount(): OptionalLong =
              nulls.map(OptionalLong.of).getOrElse(OptionalLong.empty)
            override def avgLen(): OptionalLong =
              nd.flatMap(_.avgLen).map(OptionalLong.of)
                .getOrElse(if (boundType(f.dataType) ||
                    f.dataType.isInstanceOf[NumericType])
                  OptionalLong.of(f.dataType.defaultSize.toLong)
                else OptionalLong.empty)
            override def maxLen(): OptionalLong =
              nd.flatMap(_.maxLen).map(OptionalLong.of)
                .getOrElse(if (boundType(f.dataType) ||
                    f.dataType.isInstanceOf[NumericType])
                  OptionalLong.of(f.dataType.defaultSize.toLong)
                else OptionalLong.empty)
            // equi-height histogram from ANALYZE(histogramColumns):
            // height = non-null rows per bin — CBO's range estimation
            // then prices skewed BETWEEN windows by the distribution.
            // Reported ONLY on unpruned scans (the bin boundaries are
            // table-wide; a partition-pruned scan's rows follow a
            // different distribution) and only with exact null
            // coverage (an unknown null count would overstate height).
            override def histogram(): Optional[Histogram] =
              nd.flatMap(_.hist) match {
                case Some(bs) if bs.nonEmpty && rows > 0 && unpruned &&
                    nulls.isDefined =>
                  val nonNull = rows - nulls.getOrElse(0L)
                  Optional.of(new Histogram {
                    override def height(): Double =
                      nonNull.toDouble / bs.size
                    override def bins(): Array[HistogramBin] =
                      bs.map(b => new HistogramBin {
                        override def lo(): Double = b.lo
                        override def hi(): Double = b.hi
                        override def ndv(): Long = b.ndv
                      }: HistogramBin).toArray
                  })
                case _ => Optional.empty[Histogram]
              }
          })
        }
      }
    }
    new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(size)
      override def numRows(): OptionalLong = OptionalLong.of(rows)
      override def columnStats()
          : java.util.Map[NamedReference, ColumnStatistics] = byCol
    }
  }
}
