package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Snaplog
import graft.table.LakehouseTable

/** Scratch dev harness for this optimization round: section-level timing
  * of a gate's internals in a warm JVM (edit, re-run, read [LAB] lines).
  * Not part of the driver surface.
  */
object Lab {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[LAB] $label%-42s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val s = spark

    for (round <- 1 to 3) {
      println(s"[LAB] ===== round $round =====")
      val orders = queries.Common.t(s, d, "orders")
      val cat = new Snaplog(queries.Common.scratchDir("lab_md", d))
      val table = LakehouseTable.create(cat, s, "lake", "o", orders.schema)
      val batch = orders.filter(col("o_orderkey") % 3 === 0)
      // one upsertTable call, piece by piece (mirrors mergeDelta)
      val deduped = time("dedupIncoming (plan only)")(
        graft.pipeline.Upsert.dedupIncoming(batch, Seq("o_orderkey")))
      val persisted = time("persist feed (materialize)")({
        val p = deduped.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        p.count(); p
      })
      time("stage eqdelete keys (distinct+rep1+write)")({
        val keyDf = persisted.select(col("o_orderkey")).na.drop("any")
          .distinct().repartition(1)
        graft.types.FieldIds.managedWrite(keyDf)
          .write.mode("overwrite").parquet(
            cat.dataDir("lake", "o").resolve("labeqdel").toString)
      })
      time("stage eqdelete keys (rep1+write only)")({
        val keyDf = persisted.select(col("o_orderkey")).na.drop("any")
          .repartition(1)
        graft.types.FieldIds.managedWrite(keyDf)
          .write.mode("overwrite").parquet(
            cat.dataDir("lake", "o").resolve("labeqdel2").toString)
      })
      time("stage data files (write)")({
        graft.types.FieldIds.managedWrite(persisted)
          .write.mode("overwrite").parquet(
            cat.dataDir("lake", "o").resolve("labdata").toString)
      })
      persisted.unpersist(false)
      time("full upsertTable")(
        graft.pipeline.Upsert.upsertTable(table, batch, Seq("o_orderkey")))
      time("full upsertTable again")(
        graft.pipeline.Upsert.upsertTable(table, batch, Seq("o_orderkey")))
    }
    spark.stop()
  }
}
