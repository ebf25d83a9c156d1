package graft.queries

import org.apache.spark.sql.functions._

import graft.catalog.Snaplog
import graft.streaming.StreamingIngest
import graft.table.LakehouseTable
import Common._

/** Structured-Streaming surface, driver-checked: for a static input set,
  * a correctly-implemented streaming job must produce EXACTLY the batch
  * answer — so the DuckDB oracle for each streaming query is the plain
  * batch SQL over the same rows. Scratch drop-dirs under target/qwh.
  */
object Streaming {

  val defs: Seq[QueryDef] = Seq(

    // Watermarked tumbling-window aggregation via the memory sink.
    QueryDef("stream_windowed_daily",
      (s, d) => {
        val drop = scratchDir("stream_windowed_daily", d)
        val ev = events(s, d).select("event_id", "ts", "event_type", "value")
        ev.coalesce(2).write.mode("append").parquet(drop)
        val stream = StreamingIngest.readParquetStream(s, drop, ev.schema)
        StreamingIngest.windowedCounts(s, stream, "ts", "event_type",
          windowLen = "1 day", watermark = "1 day",
          queryName = "stream_windowed_daily_mem")
          .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
            col("event_type"), col("n"), col("total_value"))
          .orderBy(col("day"), col("event_type"))
      },
      Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
          COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM events GROUP BY day, event_type ORDER BY day, event_type""")),

    // foreachBatch MERGE into a Snaplog table: three single-file batches
    // streamed in, upserted by key, then the table is read back.
    QueryDef("stream_upsert_ingest",
      (s, d) => {
        val drop = scratchDir("stream_upsert_ingest_drop", d)
        val orders = t(s, d, "orders")
        (0 until 3).foreach { i =>
          orders.filter(col("o_orderkey") % 3 === i)
            .coalesce(1).write.mode("append").parquet(drop)
        }
        val cat = new Snaplog(scratchDir("stream_upsert_ingest_wh", d))
        val table = LakehouseTable.create(cat, s, "lake", "orders_stream",
          orders.schema)
        val stream = StreamingIngest.readParquetStream(s, drop, orders.schema,
          maxFilesPerTrigger = 1)
        val nBatches = StreamingIngest.upsertEachBatch(stream, table, Seq("o_orderkey"))
        table.scan()
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .withColumn("n_batches", lit(nBatches).cast("int"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
          3 AS n_batches
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Watermarked streaming dedup: the same event feed delivered twice;
    // dropDuplicates state (bounded by the watermark) must make the
    // result equal the batch DISTINCT.
    QueryDef("stream_dedup",
      (s, d) => {
        val drop = scratchDir("stream_dedup", d)
        val ev = events(s, d).select("event_id", "ts", "event_type", "value")
        ev.coalesce(1).write.mode("append").parquet(drop)
        ev.coalesce(1).write.mode("append").parquet(drop)
        val stream = StreamingIngest.readParquetStream(s, drop, ev.schema,
          maxFilesPerTrigger = 1)
        StreamingIngest.dedupStream(s, stream, "ts", Seq("event_id"),
          watermark = "40 days", queryName = "stream_dedup_mem")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("total_value"))
          .orderBy(col("event_type"))
      },
      Some("""WITH dedup AS (SELECT DISTINCT event_id, ts, event_type, value
          FROM events)
        SELECT event_type, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM dedup GROUP BY event_type ORDER BY event_type"""))
  )
}
