package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("vector math: dot/norm/cosine on known values") {
    val df = Seq((Seq(1.0f, 2.0f, 2.0f), Seq(2.0f, 0.0f, 1.0f))).toDF("a", "b")
      .select(vecDouble($"a").as("a"), vecDouble($"b").as("b"))
    val r = df.select(
      dot($"a", $"b").as("d"), l2Norm($"a").as("na"), cosine($"a", $"b").as("c")
    ).head()
    assert(r.getDouble(0) == 4.0)
    assert(r.getDouble(1) == 3.0)
    assert(math.abs(r.getDouble(2) - 4.0 / (3.0 * math.sqrt(5.0))) < 1e-12)
  }

  test("native vector expressions are bit-identical to the HOF fold") {
    import graft.functions.VectorOps
    val v = emb.select(vecDouble($"embedding").as("e"))
    val cmp = v.select(
      dot($"e", $"e").as("hof_dot"),
      VectorOps.dot(spark, $"e", $"e").as("nat_dot"),
      l2Norm($"e").as("hof_nrm"),
      VectorOps.norm(spark, $"e").as("nat_nrm"))
      .filter($"hof_dot" =!= $"nat_dot" || $"hof_nrm" =!= $"nat_nrm")
    assert(cmp.count() === 0, "left-fold IEEE order must match exactly")
  }

  test("brute-force top-k: k rows per query, self excluded, ranks ordered") {
    val got = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" < 3),
      "vec_id", "embedding", k = 5).collect()
    val byQ = got.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.values.foreach { rows =>
      assert(rows.length == 5)
      assert(rows.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3, 4, 5))
      val cosines = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cosines.sliding(2).forall(p => p(0) >= p(1)), "cosine desc by rank")
      assert(rows.forall(r => r.getLong(2) != r.getLong(0)), "no self matches")
    }
  }

  test("LSH top-k: deterministic, subset-correct, nonzero recall vs brute force") {
    // testdata embeddings are near-orthogonal (max pairwise cosine
    // ≈0.51), so absolute LSH recall is intrinsically modest; the
    // contract tested here: determinism, well-formed output, candidates
    // only from matching buckets, and recall > 0 with results always a
    // subset of the corpus (the scale path trades recall for never
    // materializing the cross join).
    val queries = emb.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got1 = Similarity.lshCosineTopK(emb, queries, "vec_id", "embedding",
      k = 5, dim = 64, planeBits = 4)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got2 = Similarity.lshCosineTopK(emb, queries, "vec_id", "embedding",
      k = 5, dim = 64, planeBits = 4)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got1 == got2, "hyperplanes must be deterministic")
    assert(got1.nonEmpty)
    val recall = (exact intersect got1).size.toDouble / exact.size
    assert(recall > 0.0, s"LSH found none of the true neighbors")
    assert(got1.forall { case (q, v) => q != v }, "no self matches")
  }

  test("LSH with planeBits = 0 equals brute force exactly (the oracle twin)") {
    val queries = emb.filter($"vec_id" < 10)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"query_id", $"rank").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val exact = rows(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5))
    val degenerate = rows(Similarity.lshCosineTopK(emb, queries, "vec_id", "embedding",
      k = 5, dim = 64, planeBits = 0))
    assert(degenerate == exact, "one bucket ⇒ full probe ⇒ brute force, bit-exact")
  }

  test("IVF top-k: deterministic training, well-formed output, recall scales with nprobe") {
    val queries = emb.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def run(nprobe: Int) = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = nprobe)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got1 = run(4)
    val got2 = run(4)
    assert(got1 == got2, "decimal-exact Lloyd updates must make training deterministic")
    assert(got1.nonEmpty)
    assert(got1.forall { case (q, v) => q != v }, "no self matches")
    def recall(s: Set[(Long, Long)]) = (exact intersect s).size.toDouble / exact.size
    val rLow = recall(run(1))
    val rHigh = recall(run(16)) // nprobe = nlist probes everything ⇒ exact
    assert(rHigh == 1.0, s"full probe must equal brute force, got $rHigh")
    assert(recall(got1) >= rLow, "recall must not decrease with more probes")
    assert(recall(got1) > 0.0)
  }
}
