package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Snaplog
import graft.interop.IcebergExport
import graft.pipeline.Ingest
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

    for (round <- 1 to 2) {
      println(s"[LAB] ===== round $round =====")
      val whDir = queries.Common.scratchDir("lab_imor", d)
      val cat = new Snaplog(whDir)
      val orders = queries.Common.t(s, d, "orders").select(
        col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      val rep = time("ingest (partitioned)")(
        Ingest.ingestDf(cat, "lake", "orders_mor", orders,
          partitionColumns = Seq("o_orderpriority")))
      time("deleteEq")(rep.table.deleteEq("o_orderpriority", Seq("1-URGENT")))
      time("mergeDelta")(rep.table.mergeDelta(Seq("o_orderkey"),
        orders.filter(col("o_orderkey") < 100)
          .withColumn("o_orderpriority", lit("1-URGENT"))
          .withColumn("o_totalprice", col("o_totalprice") * 2)))
      time("deleteMor")(rep.table.deleteMor(col("o_orderkey") % 10 === 3))
      val dest = java.nio.file.Paths.get(whDir, "ice_mor")
      val exp = time("export")(IcebergExport.export(rep.table, dest))
      val rb = time("readBack")(IcebergExport.readBack(dest))
      val imp = time("register")(graft.interop.IcebergImport.register(
        cat, s, dest, "lake", "orders_mor_rt"))
      time("final scan+agg")(imp.table.scan()
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), queries.Common.dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderpriority")).count())
    }
    spark.stop()
  }
}
