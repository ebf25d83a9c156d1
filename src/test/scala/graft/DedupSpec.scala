package graft

import org.apache.spark.sql.functions._

import graft.functions.{SimHash, SimHashImpl, TextFunctions => TF}
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("exact dedup collapses identical canonical texts") {
    val df = Seq(
      (1L, "Spark  is FAST"), (2L, "spark is fast"), // same canonical form
      (3L, "flink is ok")
    ).toDF("doc_id", "text")
    val groups = Dedup.exactGroups(df, "doc_id", "text").collect()
    assert(groups.length == 2)
    assert(groups.find(_.getAs[Long]("n_copies") == 2).get.getAs[Long]("kept_id") == 1L)
    assert(Dedup.dropExactDuplicates(df, "doc_id", "text").count() == 2)
  }

  test("minhash LSH pairs == exact inverted-index pairs (testdata)") {
    val mh = Dedup.minhashPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ex = Dedup.ngramJaccardPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh == ex, s"minhash=$mh exact=$ex")
    assert(ex.nonEmpty, "testdata should contain planted near-duplicates")
  }

  test("simhash finds every extreme near-dup and no weakly-similar pair") {
    // SimHash (Hamming on a 64-bit sketch) and Jaccard are different
    // similarity measures; they provably agree only at the extremes:
    // j→1 ⇒ tiny Hamming, j→0 ⇒ Hamming ≈ 32. Assert exactly that.
    val sh = Dedup.simhashPairs(spark, docs, "doc_id", "text")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val strong = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val weakOk = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strong.nonEmpty)
    assert((strong -- sh).isEmpty, s"missed extreme near-dups: ${strong -- sh}")
    assert((sh -- weakOk).isEmpty, s"false positives below j=0.3: ${sh -- weakOk}")
  }

  test("simhash64 expression: identical features → identical sketch; codegen path works") {
    val df = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("a b c", "b c d", "c d e")),
      (3L, Seq("x y z", "y z w", "z w v"))
    ).toDF("id", "feats")
    val got = df.select($"id", SimHash.simhash(spark, $"feats").as("sk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == got(2L))
    assert(got(1L) != got(3L))
    // SQL surface too (registered function)
    df.createOrReplaceTempView("simhash_in")
    val viaSql = spark.sql("SELECT simhash64(feats) AS sk FROM simhash_in WHERE id = 1")
      .head().getLong(0)
    assert(viaSql == got(1L))
  }

  test("fnv1a64 is stable (golden value)") {
    // golden: independently computed FNV-1a 64 of "abc"
    assert(SimHashImpl.fnv1a64("abc".getBytes("UTF-8")) == 0xe71fa2190541574bL)
  }

  test("maxBucket skew guard drops oversized buckets") {
    val skewed = (1 to 30).map(i => (i.toLong, "same same same text here"))
      .toDF("doc_id", "text")
    // every doc identical → one giant bucket; cap at 5 → no candidates
    val pairs = Dedup.ngramJaccardPairs(skewed, "doc_id", "text", maxDf = 5)
    assert(pairs.count() == 0)
  }

  test("embedding near-dup pairs are symmetric-free and thresholded") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val pairs = Dedup.embeddingPairs(emb, "vec_id", "embedding", threshold = 0.3)
      .collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(r => r.getDouble(2) >= 0.3))
  }

  test("native graft_shingles == composed-builtin shingles on real corpus") {
    // The fused codegen kernel must be indistinguishable from the
    // declarative reference implementation (which is what the DuckDB
    // oracle mirrors) — compare the full shingle SET per document.
    import graft.functions.Shingles
    val ref = docs.limit(500).select($"doc_id",
      TF.shingles(TF.tokens($"text"), 3).as("sh"))
    val fused = docs.limit(500).select($"doc_id",
      Shingles.shingles(spark, $"text", 3).as("sh"))
    val r = ref.collect().map(x => x.getLong(0) -> x.getSeq[String](1).toSet).toMap
    val f = fused.collect().map(x => x.getLong(0) -> x.getSeq[String](1).toSet).toMap
    assert(r == f)
    // edge cases: unicode separators, short docs, empty, numerics
    val edge = Seq("", "a", "ab cd", "Ünïcode—DASH  12x3", "一二三 mixed EN text",
      "a b c d e f").zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val er = edge.select($"doc_id", when(size(TF.tokens($"text")) >= lit(3),
      TF.shingles(TF.tokens($"text"), 3)).otherwise(array().cast("array<string>")).as("sh"))
      .collect().map(x => x.getLong(0) -> x.getSeq[String](1).toSet).toMap
    val ef = edge.select($"doc_id", Shingles.shingles(spark, $"text", 3).as("sh"))
      .collect().map(x => x.getLong(0) -> x.getSeq[String](1).toSet).toMap
    assert(er == ef)
  }

  test("containment: planted half-docs pair with their source at high containment") {
    val dd = docs.select($"doc_id", $"text").filter($"doc_id" < 300)
    val halves = dd.withColumn("doc_id", $"doc_id" + 2000000)
      .withColumn("text", substring($"text", lit(1), (length($"text") / 2).cast("int")))
    def run() = graft.operators.Dedup
      .containmentPairs(dd.unionByName(halves), "doc_id", "text",
        window = 4, target = 8, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val pairs = run()
    val planted = pairs.filter { case (a, b, _) => b == a + 2000000 }
    // a prefix IS a shared span: the half shares every chunk except the
    // trailing partial one, so detection needs only one content boundary
    // inside the half (~98% at chunk ≈ 8 tokens / ~25-token halves)
    assert(planted.length >= 240, s"found only ${planted.length}/300 planted pairs")
    // detection means >= 1 shared chunk of the half's k >= 2 chunks, and
    // exactly the trailing partial chunk differs -> containment = (k-1)/k >= 0.5
    assert(planted.forall(_._3 >= 0.5),
      s"planted below 0.5: ${planted.filter(_._3 < 0.5)}")
    assert(pairs.toSet == run().toSet) // determinism
  }

  test("cdc chunking: boundaries are content-local (prefix insertion)") {
    import graft.functions.CdcChunks
    val base = docs.filter($"doc_id" < 100)
      .select($"doc_id", CdcChunks.chunks(spark, $"text", 4, 8).as("ck"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val shifted = docs.filter($"doc_id" < 100)
      .select($"doc_id", CdcChunks.chunks(spark,
        concat(lit("zzz unrelated prefix words here "), $"text"), 4, 8).as("ck"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    // fixed-size chunking would shift EVERY boundary; content-defined
    // chunking must preserve most fingerprints past the first boundary
    val overlaps = base.keys.map { id =>
      val b = base(id); val s = shifted(id)
      if (b.isEmpty) 1.0 else (b intersect s).size.toDouble / b.size
    }
    assert(overlaps.sum / overlaps.size >= 0.5,
      f"mean chunk survival ${overlaps.sum / overlaps.size}%.2f too low")
  }

  test("connected components: chain, triangle, isolated pair, determinism") {
    import graft.operators.Graph
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (12L, 10L), (21L, 20L)).toDF("a", "b")
    val got = Graph.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("keepCanonical keeps min id per cluster and all unpaired docs") {
    import graft.operators.Graph
    val corpus = (1L to 10L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((3L, 5L), (5L, 7L), (2L, 9L)).toDF("doc_a", "doc_b")
    val kept = Graph.keepCanonical(corpus, "doc_id", pairs, "doc_a", "doc_b")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L, 4L, 6L, 8L, 10L)) // 5,7 -> 3; 9 -> 2
  }

  test("property: native shingles == composed builtins on arbitrary strings") {
    import org.scalacheck.Gen
    import graft.functions.Shingles
    val weird = Gen.oneOf("a", "Z", "0", "9", " ", "-", "—", "ä", "中", "\n",
      "\t", ".", "🙂", "K") // includes the Kelvin sign (lowercases to 'k')
    val doc = Gen.listOf(weird).map(_.mkString)
    val docsGen = Gen.listOfN(60, doc)
    val sample = docsGen.sample.get ++ Seq("", "ab", "a b c", "ΑΒΓ δεζ")
    val df = sample.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val ref = df.select($"doc_id", when(size(TF.tokens($"text")) >= lit(2),
      TF.shingles(TF.tokens($"text"), 2)).otherwise(array().cast("array<string>")).as("sh"))
      .collect().map(x => x.getLong(0) -> x.getSeq[String](1).toSet).toMap
    val fused = df.select($"doc_id", Shingles.shingles(spark, $"text", 2).as("sh"))
      .collect().map(x => x.getLong(0) -> x.getSeq[String](1).toSet).toMap
    assert(ref == fused)
  }

  test("tokens/shingles/fingerprint basics") {
    val df = Seq(("The  quick-BROWN fox!", 1)).toDF("text", "id")
      .select(TF.tokens($"text").as("tk"))
    val tk = df.head().getSeq[String](0)
    assert(tk == Seq("the", "quick", "brown", "fox"))
    val sh = df.select(TF.shingles($"tk", 3).as("sh")).head().getSeq[String](0)
    assert(sh.toSet == Set("the quick brown", "quick brown fox"))
    val fp = df.select(TF.fingerprint($"tk")).head().getString(0)
    assert(fp.length == 16 && fp.matches("[0-9a-f]+"))
  }
}
