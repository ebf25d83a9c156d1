package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Snaplog

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
      val whDir = queries.Common.scratchDir("lab_lpt", d)
      val cat = new Snaplog(whDir)
      cat.createNamespace("ns")
      val cn = "labx_" +
        java.lang.Long.toHexString(whDir.hashCode.toLong & 0xffffffffL)
      s.conf.set(s"spark.sql.catalog.$cn", classOf[graft.sql.GraftSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cn.warehouse", whDir)
      time("create table")(s.sql(s"""CREATE TABLE $cn.ns.ev
        (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
         event_type STRING, value DOUBLE)
        PARTITIONED BY (days(ts), bucket(8, user_id))"""))
      time("temp view")(queries.Common.events(s, d)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .createOrReplaceTempView("lab_lpt_src"))
      time("INSERT")(s.sql(s"INSERT INTO $cn.ns.ev SELECT * FROM lab_lpt_src"))
      val minTs = time("min ts")(
        s.sql("SELECT MIN(ts) FROM lab_lpt_src").head().getTimestamp(0))
      val start = new java.sql.Timestamp(minTs.getTime + 2L * 86400000)
      val end = new java.sql.Timestamp(minTs.getTime + 4L * 86400000)
      val cond = s"ts >= TIMESTAMP '$start' AND ts < TIMESTAMP '$end'"
      val total = time("liveFiles")(cat.liveFiles("ns", "ev").size)
      val pruned = time("prune audit")(
        s.sql(s"SELECT * FROM $cn.ns.ev WHERE $cond")
          .queryExecution.sparkPlan
          .collect { case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan }
          .collect { case fs: org.apache.spark.sql.execution.datasources.v2.FileScan =>
            fs.fileIndex.inputFiles.length }.sum)
      require(pruned > 0 && pruned < total)
      time("final agg")(s.sql(s"""SELECT event_type, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM $cn.ns.ev WHERE $cond
        GROUP BY event_type ORDER BY event_type""").count())
    }
    spark.stop()
  }
}
