package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, TimestampNTZType, TimestampType}

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

  /** events table with a two-column time contract every consumer relies
    * on: `ts` = microsecond TimestampType (UTC session) and `ts_ns` =
    * nanos-since-epoch Long for bit-exact ordering/gap arithmetic.
    * The fixture has shipped `ts` as both TIMESTAMP(NANOS) (read as a
    * nanos long via the legacy conf, floor-converted like DuckDB's
    * ns→us) and TIMESTAMP(MICROS) (read natively; NTZ→TZ cast is
    * value-preserving under the UTC session timezone) — branch on the
    * dtype actually read so either fixture generation works. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = eventsRaw(spark, sfDir)
    raw.schema("ts").dataType match {
      case LongType => // legacy timestamp[ns] fixture, read as nanos long
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType | TimestampType => // timestamp[us] fixture
        raw.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
      case other =>
        throw new IllegalStateException(
          s"events.parquet ts has unexpected type $other — adapt Common.events")
    }
  }

  /** events exactly as the parquet stores it (`ts` a nanos long for the
    * legacy ns fixture, a timestamp for the µs fixture). The legacy conf
    * is a no-op for non-NANOS columns, so it is safe to always set. */
  def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
  }

  /** Per-(query, sf) scratch dir under target/ — wiped and recreated on
    * every call so driver re-runs are idempotent. */
  def scratchDir(name: String, sfDir: String): String = {
    val label = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val p = java.nio.file.Paths.get("target", "qwh", s"$name-$label").toAbsolutePath
    graft.util.Fs.deleteTree(p)
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
