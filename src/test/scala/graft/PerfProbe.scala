package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc perf probe: time a subset of SparkEntry queries at any SF.
  * Usage: sbt "Test/runMain graft.PerfProbe sf0.1 dedup_simhash dedup_ngram"
  * (no args → all queries). Not part of the driver contract.
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/" + args.headOption.getOrElse("sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(n)(spark, sfDir).count()
      println(f"PROBE $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$cnt")
    }
    spark.stop()
  }
}
