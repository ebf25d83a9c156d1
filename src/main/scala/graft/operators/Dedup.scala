package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{SimHash, TextFunctions => TF}

/** Deduplication operators for large-scale training-data pipelines:
  * exact, MinHash+LSH, SimHash, n-gram Jaccard — all as declarative
  * DataFrame programs (no driver-side loops, no collects), so every
  * stage scales horizontally:
  *
  *  - feature extraction (tokens → shingles → signatures) is map-only;
  *  - candidate generation shuffles once on the bucket/band key;
  *  - exact verification joins candidates back to features keyed by
  *    doc id (AQE broadcasts the pair side when small).
  *
  * Skew note (matters at 100 TB): a degenerate band/bucket key (e.g.
  * boilerplate docs) makes candidate generation quadratic in that
  * bucket. `maxBucket` caps it — buckets above the cap are dropped,
  * trading bounded recall loss for bounded cost, the standard
  * production mitigation.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per identical canonical text.
    * Pure hash-aggregate — one shuffle on the 64-bit fingerprint. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.withColumn("fp", TF.fingerprint(TF.tokens(col(textCol))))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("kept_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup that returns the surviving rows. */
  def dropExactDuplicates(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactGroups(docs, idCol, textCol).select(col("kept_id").as(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** Candidate pairs whose band key collides, then exact-Jaccard
    * verified — returns (doc_a, doc_b, jaccard) with jaccard ≥
    * `threshold`. MinHash+LSH (shingle → signature → band → bucket
    * join): with 64 hashes / 32 bands, a pair at j=0.8 is missed with
    * probability (1-0.8²)^32 ≈ 6e-15 — the exact-verification step then
    * makes the output equal to the all-pairs answer without the O(n²)
    * cost. */
  def minhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 32,
      threshold: Double = 0.5, maxBucket: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands

    val feats = shingled(docs, idCol, textCol, shingleSize)

    // signature_i = min over shingles of xxhash64(i, shingle) — one
    // map-side pass, all codegen'd built-ins.
    val sig = array((0 until numHashes).map(i =>
      array_min(transform(col("sh"), s => xxhash64(lit(i), s)))): _*)
    // band key b = (b, sig[b*r+1 .. b*r+r])
    val bandKeys = transform(sequence(lit(0), lit(bands - 1)),
      b => concat_ws(":", b.cast("string"),
        concat_ws(",", transform(slice(col("sig"), b * lit(r) + lit(1), lit(r)),
          x => x.cast("string")))))

    val banded = feats.withColumn("sig", sig)
      .select(col(idCol), explode(bandKeys).as("bk"))

    verifyPairs(candidatesFromBuckets(banded, idCol, "bk", maxBucket),
      feats, idCol, threshold)
  }

  /** Exact n-gram-Jaccard pairs via an inverted index on shingles
    * (posting-list join) instead of LSH: every pair sharing ≥1 surviving
    * shingle is a candidate, so with an honest `maxDf` this is the
    * EXACT all-pairs answer at inverted-index cost. `maxDf` drops
    * ubiquitous shingles (boilerplate) — the classic scale lever. */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, threshold: Double = 0.5,
      maxDf: Int = 1000): DataFrame = {
    val feats = shingled(docs, idCol, textCol, shingleSize)
    val postings = feats.select(col(idCol), explode(col("sh")).as("shingle"))
    verifyPairs(candidatesFromBuckets(postings, idCol, "shingle", maxDf),
      feats, idCol, threshold)
  }

  /** SimHash near-dup pairs: 64-bit sketch per doc (custom codegen
    * Catalyst expression), banded into `bands` chunks for candidate
    * generation, verified by exact Hamming distance ≤ `maxHamming`.
    * Output: (doc_a, doc_b, hamming).
    *
    * Recall guarantee: with `bands > maxHamming`, a qualifying pair
    * ALWAYS shares at least one clean band (pigeonhole: ≤ maxHamming
    * differing bits cannot touch all bands) — so the output equals the
    * exact hamming-threshold answer, deterministically. */
  def simhashPairs(
      spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, maxHamming: Int = 12, bands: Int = 16,
      maxBucket: Int = 10000): DataFrame = {
    val chunk = 64 / bands
    val feats = shingled(docs, idCol, textCol, shingleSize)
      .withColumn("sk", SimHash.simhash(spark, col("sh")))
    val sketches = feats.select(col(idCol), col("sk"))
    // band key = (band index, 16-bit chunk value)
    val bandCols = (0 until bands).map { b =>
      concat_ws(":", lit(b).cast("string"),
        shiftrightunsigned(col("sk"), b * chunk)
          .bitwiseAND(lit((1L << chunk) - 1)).cast("string"))
    }
    val banded = sketches
      .select(col(idCol), explode(array(bandCols: _*)).as("bk"))
    val cand = candidatesFromBuckets(banded, idCol, "bk", maxBucket)
    cand
      .join(sketches.select(col(idCol).as("doc_a"), col("sk").as("sk_a")), "doc_a")
      .join(sketches.select(col(idCol).as("doc_b"), col("sk").as("sk_b")), "doc_b")
      .withColumn("hamming", bit_count(col("sk_a").bitwiseXOR(col("sk_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Embedding-cosine near-dup pairs (doc_a < doc_b, cosine ≥ threshold).
    * Brute-force all-pairs — exact, and fine to ~10^4 vectors per
    * executor chunk; above that use Similarity.lshCosinePairs. */
  def embeddingPairs(
      emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions._
    val v = emb.select(col(idCol).as("id"), vecDouble(col(vecCol)).as("e"))
      .withColumn("nrm", l2Norm(col("e")))
    val a = v.select(col("id").as("doc_a"), col("e").as("ea"), col("nrm").as("na"))
    val b = v.select(col("id").as("doc_b"), col("e").as("eb"), col("nrm").as("nb"))
    a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("cosine", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("cosine"))
  }

  // ---- shared plumbing --------------------------------------------------

  /** (id, sh: array<string>) distinct shingle sets; empty-feature docs
    * dropped (can never pair). */
  private def shingled(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    docs.select(col(idCol), TF.shingles(TF.tokens(col(textCol)), n).as("sh"))
      .filter(size(col("sh")) > 0)

  /** Bucket join: ids sharing a bucket key → distinct ordered candidate
    * pairs. Buckets larger than `maxBucket` are dropped (skew guard). */
  private def candidatesFromBuckets(bucketed: DataFrame, idCol: String,
      keyCol: String, maxBucket: Int): DataFrame = {
    val big = bucketed.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBucket).select(col(keyCol))
    val ok = bucketed.join(big, Seq(keyCol), "left_anti")
    val x = ok.select(col(keyCol), col(idCol).as("doc_a"))
    val y = ok.select(col(keyCol), col(idCol).as("doc_b"))
    x.join(y, Seq(keyCol)).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  /** Exact Jaccard over the distinct shingle sets of candidate pairs. */
  private def verifyPairs(cand: DataFrame, feats: DataFrame, idCol: String,
      threshold: Double): DataFrame =
    cand
      .join(feats.select(col(idCol).as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(feats.select(col(idCol).as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))) * lit(1.0) /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
}
