package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.catalog.DataFileEntry

/** Equality-delete application, shared by the native scan assembly and
  * the SQL MOR relation (one definition of the semantics, two plan
  * entry points).
  *
  * An equality-delete file (`equalityKey = Some("col")` or, for
  * COMPOSITE keys, `Some("col1,col2")` — column names cannot contain
  * commas, enforced at write — a parquet of deleted key tuples)
  * applies to exactly the DATA files that precede it in replay order —
  * so `DELETE WHERE k = 5` followed by an append of a new `k = 5` row
  * leaves the new row visible (keyed-CDC semantics; Iceberg v2
  * sequence-number rules, expressed here by log position; Iceberg's
  * own equality deletes are field-LIST-valued for the same composite
  * CDC keys). The subtraction is a broadcast anti-join per (segment,
  * delete) on all key columns: delete files are predicate-sized, so
  * the broadcast is bounded and the data side never shuffles.
  *
  * Null keys: an equality delete never removes null-keyed rows (the
  * anti-join's `=` is null-rejecting on both sides, per column),
  * matching SQL `(k1, k2) IN (…)` semantics. */
object EqDeletes {

  def isEq(f: DataFileEntry): Boolean =
    f.deleteFile.contains(true) && f.equalityKey.isDefined
  def isPos(f: DataFileEntry): Boolean =
    f.deleteFile.contains(true) && f.equalityKey.isEmpty

  /** Key columns of an equality-delete entry (comma-encoded). */
  def keyCols(f: DataFileEntry): Seq[String] =
    f.equalityKey.get.split(',').toSeq

  /** Data-file paths possibly AFFECTED by the outstanding delete
    * entries in `ordered` (replay order) — one definition of
    * delete-touch attribution, shared by the delete-tier compaction's
    * file selection ([[LakehouseTable.rewriteDeleteFiles]]) and the
    * DSv2 scan's metadata-aggregate gate:
    *  - position vectors touch exactly the `file_path`s they record
    *    (vectors read once, driver-side; distinct paths are bounded by
    *    the live file count);
    *  - an equality delete touches the data files PRECEDING it in
    *    replay order whose key-column [min,max] bounds OVERLAP the
    *    delete file's own recorded key bounds — a provably key-disjoint
    *    file cannot hold a deleted tuple. Bounds compare in their
    *    collection domain (strings lexicographically, numeric types as
    *    doubles — dispatched on the schema's key type). Missing stats /
    *    undecidable types / NaN / evolution-rebound (`statsUnsafe`) /
    *    schema-absent key columns count as touched (conservative).
    * Every path NOT returned is provably unaffected: its logged row
    * count and column bounds describe its live rows exactly even while
    * the deletes stay outstanding. */
  /** Vector files are immutable once committed (unique staging paths,
    * never rewritten in place), so their distinct file_path sets cache
    * safely across plans — a hot CDC table planned hundreds of times
    * between maintenance runs pays the driver-side vector read once.
    * Bounded LRU; retired vectors age out. */
  private val vecPathCache =
    new java.util.LinkedHashMap[Seq[String], Set[String]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Seq[String], Set[String]]): Boolean = size > 64
    }

  def touchedDataPaths(spark: SparkSession, ordered: Seq[DataFileEntry],
      statsUnsafe: Set[String], schema: StructType): Set[String] = {
    val deletes = ordered.filter(_.deleteFile.contains(true))
    if (deletes.isEmpty) return Set.empty
    val posTouched: Set[String] = {
      val vecs = deletes.filter(isPos).map(_.path).sorted
      if (vecs.isEmpty) Set.empty
      else vecPathCache.synchronized(Option(vecPathCache.get(vecs))).getOrElse {
        val read = spark.read.parquet(vecs: _*)
          .select("file_path").coalesce(1).distinct().collect()
          .map(r => FileStats.normalizePath(r.getString(0))).toSet
        vecPathCache.synchronized(vecPathCache.put(vecs, read))
        read
      }
    }
    // Disjointness is decided in the DOMAIN the bounds were collected
    // in, dispatched on the key column's CURRENT type. String bounds
    // are exact lexicographic min/max — a numeric parse would be
    // unsound, not just lossy: {"1","100","20"} records ["1","20"],
    // whose numeric reading (1,20) excludes the contained 100, so a
    // delete for "100" would be judged disjoint and its row would
    // resurrect through every consumer of this attribution. Numeric
    // types parse to double (monotonic for the integral/decimal-
    // unscaled/micros encodings the stat writer emits, so rounding can
    // only widen the overlap verdict, never fabricate disjointness).
    // None = no sound comparison → touched (conservative).
    import org.apache.spark.sql.types._
    def disjoint(dt: DataType, db: graft.catalog.ColBounds,
        eb: graft.catalog.ColBounds): Option[Boolean] = dt match {
      case StringType =>
        // UTF-8 byte order — the order parquet chose the bounds in
        // (String.compareTo would misorder supplementary characters)
        Some(FileStats.utf8Compare(db.max, eb.min) < 0 ||
          FileStats.utf8Compare(db.min, eb.max) > 0)
      case _: NumericType | DateType | TimestampType | TimestampNTZType =>
        try {
          val (dmn, dmx) = (db.min.toDouble, db.max.toDouble)
          val (emn, emx) = (eb.min.toDouble, eb.max.toDouble)
          if (dmn.isNaN || dmx.isNaN || emn.isNaN || emx.isNaN) None
          else Some(dmx < emn || dmn > emx)
        } catch { case _: NumberFormatException => None }
      case _ => None
    }
    def eqAffected(f: DataFileEntry, del: DataFileEntry): Boolean = {
      val keys = del.equalityKey.toSeq.flatMap(_.split(',')).map(_.trim)
      !keys.exists { k =>
        !statsUnsafe(k.toLowerCase(java.util.Locale.ROOT)) &&
          schema.fields.find(_.name.equalsIgnoreCase(k)).exists { fld =>
            (for {
              db <- f.columnStats.flatMap(_.get(k))
              eb <- del.columnStats.flatMap(_.get(k))
              verdict <- disjoint(fld.dataType, db, eb)
            } yield verdict).getOrElse(false)
          }
      }
    }
    // one reverse replay walk: a data file is affected by the equality
    // deletes that FOLLOW it in the listing
    val laterEq = scala.collection.mutable.ArrayBuffer.empty[DataFileEntry]
    val touched = scala.collection.mutable.Set.empty[String]
    ordered.reverseIterator.foreach { e =>
      if (isEq(e)) laterEq += e
      else if (!e.deleteFile.contains(true) &&
          (posTouched(FileStats.normalizePath(e.path)) ||
            laterEq.exists(del => eqAffected(e, del)))) touched += e.path
    }
    touched.toSet
  }

  /** Segment the replay-ordered entries into (data files, equality
    * deletes that apply to them) groups: consecutive data files with
    * the same downstream-delete suffix share a segment, so the number
    * of segments is ≤ live equality deletes + 1 (bounded by the replay
    * window, not the table). `keepData` applies metadata pruning to
    * data entries without disturbing the sequence. */
  def segments(ordered: Seq[DataFileEntry], keepData: DataFileEntry => Boolean)
      : Seq[(Seq[DataFileEntry], Seq[DataFileEntry])] = {
    // walk backwards accumulating the eq-delete suffix
    val out = scala.collection.mutable.ListBuffer
      .empty[(Seq[DataFileEntry], Seq[DataFileEntry])]
    var suffix = List.empty[DataFileEntry]
    var bucket = List.empty[DataFileEntry]
    ordered.reverse.foreach { f =>
      if (isEq(f)) {
        if (bucket.nonEmpty) { out.prepend((bucket, suffix)); bucket = Nil }
        suffix = f :: suffix
      } else if (!f.deleteFile.contains(true) && keepData(f)) {
        bucket = f :: bucket
      }
    }
    if (bucket.nonEmpty) out.prepend((bucket, suffix))
    out.toList
  }

  /** The data side of a scan with equality deletes applied. `withMeta`
    * additionally carries `_metadata.file_path` / `_metadata.row_index`
    * (as `__scan_file` / `__scan_pos`) through the union for a
    * downstream position-vector subtraction — metadata columns must be
    * selected inside each read.
    *
    * Subtraction shape (round 17, guide §2.4/§3): ONE broadcast join
    * per distinct KEY-COLUMN SET, not one anti-join per delete FILE.
    * The replay-order rule ("a delete applies to data files preceding
    * it") is Iceberg's sequence-number semantics, so it folds: stamp
    * each segment with its replay position, build a broadcast map
    * `key tuple → max delete position` from all of that key set's
    * delete files, and keep a row iff its key is absent or its max
    * delete position is STRICTLY LESS than the segment position (a
    * delete at position == the segment position applies to that
    * segment). The former shape
    * planned one BroadcastHashJoin LeftAnti per (segment, applicable
    * delete) — O(outstanding²/2) joins and O(outstanding) broadcasts
    * for a long-running CDC sink; this plans O(distinct key sets)
    * joins and broadcasts at ANY outstanding-delete depth, the same
    * predicate-sized build and an unshuffled data side. Segments past
    * the last delete skip the join entirely. Null keys never match the
    * equality condition, so null-keyed rows survive exactly as under
    * the anti-join. */
  def readSubtracted(spark: SparkSession, readSchema: StructType,
      segs: Seq[(Seq[DataFileEntry], Seq[DataFileEntry])],
      withMeta: Boolean,
      readerOptions: Map[String, String] = Map.empty): DataFrame = {
    def baseRead(data: Seq[DataFileEntry]): DataFrame = {
      val b = spark.read.schema(readSchema).options(readerOptions)
        .parquet(data.map(_.path): _*)
      if (!withMeta) b
      else b.select(col("*"),
        col("_metadata.file_path").as("__scan_file"),
        col("_metadata.row_index").as("__scan_pos"))
    }
    // suffixes are nested along replay order (the earliest segment sees
    // every later delete), so the first segment's suffix IS the ordered
    // list of all applying deletes; a delete's index in it is its
    // replay position, and a segment's position is the count of deletes
    // BEFORE it. A delete at position j applies to segment i iff j ≥ i.
    val allDels = segs.headOption.map(_._2).getOrElse(Seq.empty)
    // fail loudly on a non-conforming caller (a segment list whose head
    // does not carry the full delete list would silently skip deletes);
    // driver-side, bounded by the replay window
    require(segs.forall { case (_, sfx) =>
      sfx.length <= allDels.length &&
        allDels.drop(allDels.length - sfx.length).map(_.path) == sfx.map(_.path)
    }, "readSubtracted requires replay-ordered segments with nested " +
      "delete suffixes (build them with EqDeletes.segments)")
    if (allDels.isEmpty) return segs.map(s => baseRead(s._1)).reduce(_.unionByName(_))
    val (joined, passThrough) = segs.partition(_._2.nonEmpty)
    val stamped = joined.map { case (data, suffix) =>
      baseRead(data).withColumn("__eqd_seg", lit(allDels.length - suffix.length))
    }.reduce(_.unionByName(_))
    val byKeySet = allDels.zipWithIndex.groupBy { case (d, _) => keyCols(d) }
    val subtracted = byKeySet.toSeq.sortBy(_._1.mkString(","))
      .zipWithIndex.foldLeft(stamped) {
        case (df, ((cols, dels), si)) =>
          val keyed = dels.map { case (del, pos) =>
            spark.read.parquet(del.path).select(
              cols.zipWithIndex.map { case (c, i) =>
                col(c).as(s"__eqk_${si}_$i") } :+
                lit(pos).as("__eqd_pos"): _*)
          }.reduce(_.unionByName(_))
          // coalesce(1) before the dedup (round 18): SinglePartition
          // satisfies the aggregation's clustering, so the broadcast
          // build plans NO Exchange — a single-task max-per-key over a
          // relation bounded by the same invariant that makes it
          // broadcastable at all (delete files are predicate-sized)
          val delMap = broadcast(
            keyed.coalesce(1)
              .groupBy(cols.indices.map(i => col(s"__eqk_${si}_$i")): _*)
              .agg(max(col("__eqd_pos")).as(s"__eqd_max_$si")))
          df.join(delMap,
              cols.zipWithIndex.map { case (c, i) =>
                df(c) === col(s"__eqk_${si}_$i") }.reduce(_ && _),
              "left_outer")
            .filter(col(s"__eqd_max_$si").isNull ||
              col(s"__eqd_max_$si") < col("__eqd_seg"))
            .drop((s"__eqd_max_$si" +:
              cols.indices.map(i => s"__eqk_${si}_$i")): _*)
      }
      .drop("__eqd_seg")
    (subtracted +: passThrough.map(s => baseRead(s._1))).reduce(_.unionByName(_))
  }
}
