package graft.sql

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.catalog.{Catalog, Snaplog}
import graft.table.LakehouseTable

/** Streaming CHANGE-FEED source — `spark.readStream.format
  * ("graft-changes")`: the table's row-level changelog
  * ([[LakehouseTable.scanChanges]]) as a live stream, Delta CDF's
  * `readChangeFeed` analogue. Each micro-batch carries the changes of
  * a snapshot window `(start, end]` stamped with `_change_type` /
  * `_commit_snapshot_id` / `_commit_timestamp`.
  *
  * This is the retraction-capable complement to the append-only DSv2
  * table stream (`readStream.table`): equality deletes, MOR position
  * deletes, COW deletes, overwrites and rollbacks all STREAM THROUGH
  * as 'delete'/'insert' change rows instead of failing the query or
  * silently skipping — the feed a downstream materialization keeps
  * itself exact against. Compaction and checkpoint folds are content
  * no-ops and cross silently.
  *
  * Options:
  *  - `warehouse` (required) — Snaplog warehouse directory
  *  - `table` (required) — `namespace.table`
  *  - `startSnapshotId` — first batch covers `(startSnapshotId, head]`;
  *    default 0 streams the changelog since table creation (refusing
  *    loudly when that history was expired — scanChanges' guard)
  *  - `maxCommitsPerTrigger` — bound each batch's snapshot window
  *    (applies per `getOffset` poll, so it shapes ProcessingTime
  *    triggers; an AvailableNow run pins one end offset up front and
  *    is not split)
  *
  * Offsets are snapshot ids, so checkpointed restarts resume exactly;
  * an expired checkpointed id fails loudly with restart guidance.
  * Batch planning is pure log metadata; the emitted plan reads only
  * the window's touch set (see scanChanges' scale notes).
  *
  * Why DataSource V1: `Source.getBatch` returns an arbitrary
  * DataFrame, which is exactly what a changelog batch is (per-segment
  * anti/semi joins, multiset diffs) — the V2 micro-batch contract
  * (file-list `InputPartition`s) cannot express it. V1 streaming
  * sources remain a stable public extension point (Spark's own
  * file/rate/socket sources still ride it). */
final class GraftChangeFeedProvider extends StreamSourceProvider with DataSourceRegister {
  import GraftChangeFeedSource.resolve

  override def shortName(): String = "graft-changes"

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val tbl = resolve(sqlContext.sparkSession, parameters)
    (shortName(),
      if (GraftChangeFeedSource.lineageOpt(parameters))
        tbl.changesLineageSchema
      else tbl.changesSchema)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new GraftChangeFeedSource(sqlContext.sparkSession, metadataPath, parameters)
}

private[graft] object GraftChangeFeedSource {
  /** Option lookup is case-insensitive (DataStreamReader preserves the
    * caller's key casing) — Spark's own map type, not a private
    * convention. */
  def opt(parameters: Map[String, String], key: String): Option[String] =
    org.apache.spark.sql.catalyst.util.CaseInsensitiveMap(parameters).get(key)

  def lineageOpt(parameters: Map[String, String]): Boolean =
    opt(parameters, "lineage").exists(_.toBoolean)

  def resolve(spark: SparkSession, parameters: Map[String, String]): LakehouseTable = {
    val wh = opt(parameters, "warehouse").getOrElse(
      throw new IllegalArgumentException(
        "graft-changes source requires option 'warehouse'"))
    val full = opt(parameters, "table").getOrElse(
      throw new IllegalArgumentException(
        "graft-changes source requires option 'table' (namespace.table)"))
    val parts = full.split('.')
    require(parts.length == 2,
      s"option 'table' must be namespace.table, got '$full'")
    LakehouseTable.load(new Snaplog(wh), spark, parts(0), parts(1))
  }
}

private[graft] final class GraftChangeFeedSource(
    spark: SparkSession,
    metadataPath: String,
    parameters: Map[String, String]) extends Source {
  import GraftChangeFeedSource.opt

  private val table: LakehouseTable =
    GraftChangeFeedSource.resolve(spark, parameters)
  private def backing: Catalog = table.catalog

  private val startSnapshotId: Long =
    opt(parameters, "startSnapshotId").map(_.toLong).getOrElse(0L)
  private val maxCommitsPerTrigger: Option[Int] =
    opt(parameters, "maxCommitsPerTrigger").map(_.toInt)
  maxCommitsPerTrigger.foreach(n =>
    require(n > 0, s"maxCommitsPerTrigger must be positive, got $n"))

  /** `refresh=true` — the change-feed twin of the DSv2 table source's
    * option: valid only on a table adopted from an Iceberg tree; each
    * offset poll first re-syncs the mirror in PER-SNAPSHOT mode, so a
    * live foreign tree's commits become native changelog windows —
    * including RETRACTIONS (a foreign equality delete streams as
    * 'delete' change rows; a foreign compaction's reset crosses as a
    * content no-op). This is CDC replication OUT of a live external
    * Iceberg table: the feed a downstream materialization keeps itself
    * exact against, with one driver-side metadata walk per poll. */
  private val refreshSource: Boolean =
    opt(parameters, "refresh").exists(_.toBoolean)
  if (refreshSource)
    require(backing.loadTable(table.namespace, table.name).properties
        .contains(graft.interop.IcebergImport.ImportedFromProp),
      s"change feed of ${table.namespace}.${table.name}: refresh=true " +
        "requires a table imported from an Iceberg tree " +
        "(IcebergImport.register)")

  /** `lineage=true` — stamp the Iceberg-v3 `_row_id` /
    * `_last_updated_sequence_number` columns onto every change row
    * (round 17): the streaming form of [[LakehouseTable
    * .scanChangesLineage]], so a downstream CDC materialization keys
    * on durable row identity instead of declared key columns — a
    * MERGE update's postimage carries its preimage's id across the
    * micro-batch boundary. Requires lineage to serve; a batch over
    * unassigned files fails loudly like the batch API. Cost matches
    * the plain feed leg for leg (broadcast per-file lookup, no extra
    * shuffle). */
  private val lineage: Boolean =
    GraftChangeFeedSource.lineageOpt(parameters)

  /** Output schema pinned at source creation; a mid-stream table schema
    * change fails the batch loudly (same contract as the DSv2 stream). */
  private val pinnedSchema: StructType = table.schema
  override val schema: StructType =
    if (lineage) table.changesLineageSchema else table.changesSchema

  private def mainSnaps() =
    backing.snapshots(table.namespace, table.name)
      .filterNot(Snaplog.isWapStaged)

  /** Furthest snapshot id already handed to getBatch — the admission
    * baseline for maxCommitsPerTrigger. Persisted under the source's
    * `metadataPath` (the V1 source-metadata convention), because the
    * engine never tells a source its committed offset on a clean
    * restart: an in-memory baseline would restart below the checkpoint
    * and re-emit consumed commits. A high-water written for a batch the
    * offset WAL then lost only DELAYS those commits (they plan with the
    * next window), never skips or duplicates them. */
  @volatile private var plannedUpTo: Long = readHighWater()

  private def highWaterFile = new org.apache.hadoop.fs.Path(
    metadataPath, "graft-changes-highwater")
  private def highWaterTmp = new org.apache.hadoop.fs.Path(
    metadataPath, "graft-changes-highwater.tmp")
  private def hadoopFs = highWaterFile.getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def readHighWater(): Long = {
    val fs = hadoopFs
    def read(p: org.apache.hadoop.fs.Path): Option[Long] =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val raw = try scala.io.Source.fromInputStream(in).mkString.trim
          finally in.close()
        // a torn file reads as empty/garbage — treat as absent; the
        // baseline then re-seeds from the offset WAL's replayed
        // getBatch, never skipping data
        try Some(raw.toLong)
        catch { case _: NumberFormatException => None }
      }
    // a crash between delete and rename leaves only the tmp — its
    // value is complete (written + closed before the publish step)
    read(highWaterFile).orElse(read(highWaterTmp)).getOrElse(-1L)
  }

  private def writeHighWater(v: Long): Unit = {
    // write-temp-then-rename: the visible file is always complete
    val fs = hadoopFs
    val out = fs.create(highWaterTmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(highWaterFile, false)
    if (!fs.rename(highWaterTmp, highWaterFile))
      throw new java.io.IOException(
        s"could not publish change-feed high-water $highWaterFile")
  }

  override def getOffset: Option[V1Offset] = {
    if (refreshSource)
      graft.interop.IcebergImport.refresh(backing, spark,
        table.namespace, table.name, perSnapshot = true)
    val snaps = mainSnaps()
    val head = snaps.lastOption.map(_.snapshotId).getOrElse(return None)
    // a typo'd start id AT/ABOVE head would silently stream zero
    // batches forever (below-head ids fail loudly inside scanChanges
    // when they seed a batch) — refuse it while the stream is still
    // virgin; a RESUMED stream (high-water present, or the WAL about
    // to hand getBatch its start) never needs the id again, so an
    // expired long-consumed start id cannot brick a restart
    if (plannedUpTo < 0L && startSnapshotId != 0L &&
        head <= startSnapshotId &&
        !snaps.exists(_.snapshotId == startSnapshotId))
      throw new IllegalArgumentException(
        s"startSnapshotId $startSnapshotId is not a main-lineage " +
          s"snapshot of ${table.namespace}.${table.name}")
    val baseline = math.max(plannedUpTo, startSnapshotId)
    if (head <= baseline) return None
    val capped = maxCommitsPerTrigger match {
      case Some(n) =>
        snaps.filter(_.snapshotId > baseline).take(n)
          .lastOption.map(_.snapshotId).getOrElse(baseline)
      case None => head
    }
    if (capped <= baseline) None else Some(LongOffset(capped))
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val s = start.map(toId).getOrElse {
      // startSnapshotId actually seeds THIS batch (no checkpointed
      // offset) — validate it here, not at construction: a restart
      // whose long-consumed start id was expired must keep resuming
      // from the WAL, never re-fail on an id it no longer needs
      if (startSnapshotId != 0L)
        require(mainSnaps().exists(_.snapshotId == startSnapshotId),
          s"startSnapshotId $startSnapshotId is not a main-lineage " +
            s"snapshot of ${table.namespace}.${table.name}")
      startSnapshotId
    }
    val e = toId(end)
    if (e > plannedUpTo) { writeHighWater(e); plannedUpTo = e }
    if (e <= s) // defensive: an inverted/empty window plans zero rows
      return org.apache.spark.sql.GraftStreamingShim.asStreamingFrame(
        spark, spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema))
    locally {
      val cur = table.schema
      require(cur == pinnedSchema,
        s"change feed of ${table.namespace}.${table.name}: the table " +
          s"schema changed while the stream was running (pinned " +
          s"${pinnedSchema.simpleString}, now ${cur.simpleString}) — " +
          "restart the streaming query")
    }
    val changes =
      try {
        if (lineage) table.scanChangesLineage(s, Some(e))
        else table.scanChanges(s, Some(e))
      } catch {
        case ex: IllegalArgumentException =>
          throw new IllegalArgumentException(
            s"change feed of ${table.namespace}.${table.name}: " +
              s"${ex.getMessage} — restart from a fresh checkpoint " +
              "(or a retained startSnapshotId) to re-read current content",
            ex)
      }
    // V1 contract: the returned frame must carry isStreaming=true, so
    // wrap the (lazy, fully distributed) physical plan of the batch.
    val ordered = changes.select(schema.fieldNames.map(col): _*)
    org.apache.spark.sql.GraftStreamingShim.asStreamingFrame(spark, ordered)
  }

  private def toId(o: V1Offset): Long = o match {
    case LongOffset(id) => id
    case other => other.json.trim.toLong
  }

  override def commit(end: V1Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String =
    s"GraftChangeFeed[${table.namespace}.${table.name}]"
}
