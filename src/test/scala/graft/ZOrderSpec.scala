package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.Snaplog
import graft.functions.ZOrder
import graft.pipeline.Ingest

/** Z-order clustering: bit-interleave correctness and the property the
  * layout exists for — a 2-D box filter prunes strictly more files under
  * a z-order layout than under a single-column range layout. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zorder2 interleaves bits (a odd positions, b even)") {
    // a=5 (101), b=3 (011) → bits: a0→1, a2→5, b0→0, b1→2 ⇒ 100111 = 39
    val got = spark.range(1)
      .select(ZOrder.zorder2(lit(5), lit(3), bits = 3).as("z"))
      .head().getLong(0)
    assert(got == 39L)
  }

  test("zorder2 clamps negatives and oversized values to the bit range") {
    val got = spark.range(1).select(
      ZOrder.zorder2(lit(-7), lit(1 << 10), bits = 4).as("z")).head().getLong(0)
    // a clamps to 0, b clamps to 15 (1111 at even positions) = 0b01010101
    assert(got == 85L)
  }

  test("SQL zorder2 matches the Column-composed key on the full bit range") {
    GraftFunctions.registerAll(spark)
    val n = spark.range(500)
      .select((col("id") * 37 % 1021).as("a"), (col("id") * 91 % 997).as("b"))
      .withColumn("zc", ZOrder.zorder2(col("a"), col("b"), bits = 10))
      .withColumn("zs", call_function("zorder2", col("a"), col("b"), lit(10)))
      .filter(col("zc") =!= col("zs"))
      .count()
    assert(n == 0)
  }

  test("z-order layout out-prunes a one-column range layout on a 2-D box") {
    // 64×64 uniform grid over (x, y)
    val grid = spark.range(64L * 64)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))

    def filesFor(layout: org.apache.spark.sql.DataFrame): Int = {
      val cat = new Snaplog(Files.createTempDirectory("graft-zorder").toString)
      val rep = Ingest.ingestDf(cat, "z", "grid", layout)
      rep.table.selectFiles(rangeFilter = Map(
        "x" -> (Some(0.0), Some(15.0)),
        "y" -> (Some(0.0), Some(15.0)))).size
    }

    val linear = filesFor(grid.repartitionByRange(16, col("x")))
    val zorded = filesFor(
      grid.repartitionByRange(16, ZOrder.zorder2(col("x"), col("y"), bits = 6)))
    // linear: every file spans all of y, so only the x bound prunes
    // (16/64 of the range ⇒ ~4 of 16 files survive); z-order: files are
    // boxes, the quarter-quarter box keeps ~1/16 of them
    assert(zorded < linear,
      s"z-order kept $zorded files, linear kept $linear — expected strictly fewer")

    // and the pruned scan still returns the exact box
    val cat = new Snaplog(Files.createTempDirectory("graft-zorder").toString)
    val rep = Ingest.ingestDf(cat, "z", "grid",
      grid.repartitionByRange(16, ZOrder.zorder2(col("x"), col("y"), bits = 6)))
    val n = rep.table.scan(rangeFilter = Map(
        "x" -> (Some(0.0), Some(15.0)), "y" -> (Some(0.0), Some(15.0))))
      .filter(col("x").between(0, 15) && col("y").between(0, 15))
      .count()
    assert(n == 16L * 16)
  }
}
