package graft

import org.apache.spark.sql.functions._

import graft.queries.Common

class SketchSpec extends SparkSpec {

  test("approx sketches stay within bounds of the exact answers") {
    val ev = Common.events(spark, sf)
    val approx = SparkEntry.queries("approx_sketches")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("users"),
        percentile(col("value"), lit(0.5)).as("median"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (users, median)) =>
      val (aUsers, aMedian) = approx(k)
      // HLL++ at rsd=0.02: generous 10% tolerance for tiny groups
      assert(math.abs(aUsers - users) <= math.max(2.0, 0.10 * users),
        s"$k: approx users $aUsers vs exact $users")
      // percentile_approx with accuracy 10000 is near-exact at this size
      assert(math.abs(aMedian - median) <= math.max(1e-6, 0.05 * math.abs(median)),
        s"$k: approx median $aMedian vs exact $median")
    }
  }

  test("sketches are deterministic across runs (hash-based, no RNG)") {
    val a = SparkEntry.queries("approx_sketches")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("approx_sketches")(spark, sf).collect().toSeq
    assert(a == b)
  }
}
