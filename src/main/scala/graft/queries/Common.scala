package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One driver-facing query: a Spark DataFrame program plus (when
  * SQL-expressible) a DuckDB oracle over the same parquet files. */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Common {

  /** Read one testdata table (TESTDATA.md): `<sfDir>/<name>.parquet`. */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.parquet carries `ts` as parquet TIMESTAMP(NANOS), which
    * Spark 4 refuses natively — read nanos as long and floor-convert to
    * a microsecond timestamp (exactly DuckDB's ns→us floor). The raw
    * nanos stay as `ts_ns` so ORDER BY can tie-break identically to
    * DuckDB's full-precision ordering. */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    eventsRaw(spark, sfDir)
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** events with `ts` left as raw nanos-since-epoch long. */
  def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
  }

  /** Per-(query, sf) scratch dir under target/ — wiped and recreated on
    * every call so driver re-runs are idempotent. */
  def scratchDir(name: String, sfDir: String): String = {
    val label = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val p = java.nio.file.Paths.get("target", "qwh", s"$name-$label").toAbsolutePath
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator.asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    java.nio.file.Files.createDirectories(p)
    p.toString
  }

  /** Order-independent, engine-identical double aggregate:
    * cast each input to an exact decimal → exact associative sum →
    * cast back to double. Both Spark and DuckDB round the identical
    * IEEE double to the identical decimal, sum exactly, and produce the
    * identical double — so results hash-match regardless of row order,
    * partitioning, or partial-aggregation split. The oracle twin is
    * `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)`. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Deterministic average: exact decimal sum divided by count, both
    * as doubles (same IEEE division in both engines). Oracle twin:
    * `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / COUNT(x)`. */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(c)
}
