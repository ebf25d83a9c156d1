package graft

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("every graft kernel is callable from SQL with literal params") {
    GraftFunctions.registerAll(spark)
    Seq((1L, "The quick brown fox jumps over the lazy dog",
      Seq(1.0, 2.0, 2.0), Seq(2.0, 0.0, 1.0)))
      .toDF("id", "text", "va", "vb").createOrReplaceTempView("gfx")

    val r = spark.sql("""
      SELECT
        size(graft_shingles(text, 3))            AS n_shingles,
        simhash64(graft_shingles(text, 3))       AS sketch,
        size(minhash_bands(graft_shingles(text, 3), 64, 32)) AS n_bands,
        vector_dot(va, vb)                       AS dot,
        vector_norm(va)                          AS nrm,
        hyperplane_sketch(va, 4)                 AS bucket
      FROM gfx""").head()
    assert(r.getInt(0) == 7)        // 9 tokens -> 7 trigrams
    assert(r.getInt(2) == 32)
    assert(r.getDouble(3) == 4.0)
    assert(r.getDouble(4) == 3.0)
    assert(r.getInt(5) >= 0 && r.getInt(5) < 16)

    val agg = spark.sql(
      "SELECT topk_double(x, 2) AS tp FROM VALUES (1.0), (9.0), (4.0) AS t(x)")
      .head().getSeq[Double](0)
    assert(agg == Seq(9.0, 4.0))
  }

  test("non-literal width parameter is rejected with a clear error") {
    GraftFunctions.registerAll(spark)
    Seq(("x y z", 3)).toDF("text", "n").createOrReplaceTempView("gfx_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingles(text, n) FROM gfx_bad").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("GraftExtensions wires every builder through injectFunction") {
    // the extensions path is deployment config (spark.sql.extensions);
    // here: the injector accepts every builder without error
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // building a session from a live context with custom extensions is
    // not possible in the shared-JVM test; assert the builder list is
    // complete and consistent instead
    assert(GraftFunctions.builders.map(_._1).toSet == Set(
      "graft_shingles", "simhash64", "minhash_bands", "vector_dot",
      "vector_norm", "hyperplane_sketch", "topk_double",
      "intersect_size", "union_size", "zorder2"))
  }
}
