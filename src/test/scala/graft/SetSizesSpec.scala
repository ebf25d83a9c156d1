package graft

import org.apache.spark.sql.functions._

import graft.functions.FuseSetSizes

class SetSizesSpec extends SparkSpec {
  import spark.implicits._

  test("fused set sizes == size(array_intersect/union) on adversarial inputs") {
    GraftFunctions.registerAll(spark)
    // duplicates, nulls, unicode, empties, disjoint, identical
    val rows = Seq(
      (Seq("a", "b", "a", null), Seq("a", null, "c")),
      (Seq[String](), Seq("x")),
      (Seq("中", "中", "ä"), Seq("ä", "中")),
      (Seq("p", "q"), Seq("r", "s")),
      (Seq(null, null), Seq(null)),
      (Seq("same"), Seq("same"))
    ).toDF("a", "b")
    val cmp = rows.select(
      size(array_intersect($"a", $"b")).as("ref_i"),
      call_function("intersect_size", $"a", $"b").as("got_i"),
      size(array_union($"a", $"b")).as("ref_u"),
      call_function("union_size", $"a", $"b").as("got_u"))
      .collect()
    cmp.foreach { r =>
      assert(r.getInt(0) == r.getInt(1), s"intersect: $r")
      assert(r.getInt(2) == r.getInt(3), s"union: $r")
    }
  }

  test("FuseSetSizes rewrites the built-in pattern in the optimized plan") {
    FuseSetSizes.install(spark)
    // table-backed input so constant folding cannot evaluate the whole
    // projection at plan time (which a literal Seq would allow)
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(10)
    val df = docs.select(split(lower($"text"), " ").as("a"),
        split($"text", " ").as("b"))
      .select((size(array_intersect($"a", $"b")) * lit(1.0) /
        size(array_union($"a", $"b"))).as("jaccard"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("intersect_size"), optimized)
    assert(optimized.contains("union_size"), optimized)
    assert(df.collect().forall(r => r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0))
    // idempotent install
    FuseSetSizes.install(spark)
    assert(spark.experimental.extraOptimizations.count(_ == FuseSetSizes) == 1)
  }

  test("minhash verification runs through the fused kernels") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val mh = graft.operators.Dedup.minhashPairs(docs, "doc_id", "text")
    assert(mh.queryExecution.optimizedPlan.toString.contains("intersect_size"))
  }
}
