package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{SimHash, TextFunctions => TF}
import graft.util.Par

/** Deduplication operators for large-scale training-data pipelines:
  * exact, MinHash+LSH, SimHash, n-gram Jaccard — all as declarative
  * DataFrame programs (no driver-side loops, no collects), so every
  * stage scales horizontally:
  *
  *  - feature extraction (tokens → shingles → signatures) is map-only,
  *    spread across all cores even when the input arrives as one split;
  *  - candidate generation shuffles once on the bucket/band key;
  *  - verification is COUNT-based: exact Jaccard is derived from
  *    posting-list intersection counts (`|A∩B| = matches in a
  *    shingle-keyed join`, `|A∪B| = |A|+|B|-|A∩B|`) — never from
  *    per-pair `array_intersect`, which re-materializes both shingle
  *    arrays for every candidate and dominates wall-clock.
  *
  * Skew note (matters at 100 TB): a degenerate band/bucket key (e.g.
  * boilerplate docs) makes candidate generation quadratic in that
  * bucket. `maxBucket`/`maxDf` cap it — buckets above the cap are
  * dropped, trading bounded recall loss for bounded cost, the standard
  * production mitigation.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per identical canonical text.
    * Pure hash-aggregate — one shuffle on the 64-bit fingerprint. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Par.spread(docs).withColumn("fp", TF.fingerprint(TF.tokens(col(textCol))))
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
    * cost. Band keys are hashes of the band's permutation minima (a
    * false key collision only adds a candidate, which verification
    * removes — so hashing is safe and keeps the shuffle key a single
    * long), computed by the native MinHashBandsExpr in one fused pass. */
  def minhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 32,
      threshold: Double = 0.5, maxBucket: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")

    val feats = shingled(docs, idCol, textCol, shingleSize)

    // Banded signature via the native minhash_bands expression — one
    // fused pass per row (64 permutation minima + band hashing) with
    // one-line generated code. The composed-builtins alternative (64 ×
    // array_min(transform(...)) + band slices) is semantically equal but
    // Janino-compiles for seconds and traverses the shingle array 64
    // times per row, interpreted.
    //
    // explode_outer, NOT explode: InferFiltersFromGenerate would infer
    // `size(keys)>0` for a plain explode, inlining the signature tree
    // into a filter pushed to the (unspread) scan. The key array always
    // has exactly `bands` elements, so outer explode is semantically
    // identical and skips the inferred filter.
    val banded = feats.select(col(idCol),
      explode_outer(graft.functions.MinHash.minhashBands(
        docs.sparkSession, col("sh"), numHashes, bands)).as("bk"))
    // (id, band-key) pairs feed 4 plan branches (skew prune + both join
    // sides); persist so the signature pass runs once.
    banded.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    verifyPairs(candidatesFromBuckets(banded, idCol, "bk", maxBucket),
      feats, idCol, threshold)
  }

  /** Exact n-gram-Jaccard pairs via an inverted index on shingles
    * (posting-list join) instead of LSH. One pass: the posting self-join
    * keyed on the shingle yields |A∩B| per pair directly as a count —
    * candidate generation and verification fused, no arrays shuffled.
    * Shingles with document frequency 1 can never pair and are pruned;
    * `maxDf` drops ubiquitous shingles (boilerplate) — the classic
    * scale lever. Exact whenever no surviving pair depends on a dropped
    * shingle (always true until a corpus has >maxDf-frequency shingles;
    * beyond that, a bounded Jaccard underestimate, documented here). */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, threshold: Double = 0.5,
      maxDf: Int = 1000): DataFrame = {
    val feats = shingled(docs, idCol, textCol, shingleSize)
    val sizes = featSizes(feats, idCol)
    // explode_outer: see minhashPairs — avoids the inferred-filter
    // pushdown that re-evaluates the shingle tree at the scan. feats
    // rows always carry ≥1 shingle, so no null rows appear.
    val postings = feats.select(col(idCol), explode_outer(col("sh")).as("shingle"))
    val keep = postings.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, maxDf)).select(col("shingle"))
    val p = postings.join(keep, Seq("shingle"))
    val inter = p.select(col("shingle"), col(idCol).as("doc_a"))
      .join(p.select(col("shingle"), col(idCol).as("doc_b")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("c"))
    val pairs = jaccardFromCounts(inter, sizes, threshold)
    // the verified pair set is tiny (bounded by true near-dups) and
    // consumed by several downstream pipelines in a session (pair
    // listing, clustering, canonical selection) — materialize once
    pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs
  }

  /** Exact n-gram CONTAINMENT pairs — the SQL-expressible companion of
    * [[containmentPairs]]'s rolling-hash chunking: containment of the
    * smaller document in the larger as |sh(A)∩sh(B)| / min(|sh(A)|,
    * |sh(B)|) over distinct shingle sets. The same posting-list join as
    * [[ngramJaccardPairs]] (one shuffle on the shingle, candidate
    * generation and |A∩B| fused, df∈[2,maxDf] pruning — df-1 shingles
    * can never pair, so pruning them is exact), only the final score
    * normalizes by the SMALLER set: a half-document planted inside a
    * full one scores ≈1 where Jaccard ≈0.5 — the partial-duplicate
    * shape full-document measures miss. */
  def ngramContainmentPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, threshold: Double = 0.5,
      maxDf: Int = 1000): DataFrame = {
    val feats = shingled(docs, idCol, textCol, shingleSize)
    val sizes = featSizes(feats, idCol)
    val postings = feats.select(col(idCol), explode_outer(col("sh")).as("shingle"))
    val keep = postings.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, maxDf)).select(col("shingle"))
    val p = postings.join(keep, Seq("shingle"))
    val inter = p.select(col("shingle"), col(idCol).as("doc_a"))
      .join(p.select(col("shingle"), col(idCol).as("doc_b")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("c"))
    inter
      .join(sizes.select(col("pid").as("doc_a"), col("sz").as("na")), Seq("doc_a"))
      .join(sizes.select(col("pid").as("doc_b"), col("sz").as("nb")), Seq("doc_b"))
      .withColumn("containment",
        col("c") * lit(1.0) / least(col("na"), col("nb")))
      .filter(col("containment") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("containment"))
  }

  /** SimHash near-dup pairs: 64-bit sketch per doc (custom codegen
    * Catalyst expression), banded into `bands` contiguous bit-chunks for
    * candidate generation, verified by exact Hamming distance ≤
    * `maxHamming`. Output: (doc_a, doc_b, hamming).
    *
    * Recall guarantee: with `bands > maxHamming`, a qualifying pair
    * ALWAYS shares at least one clean band (pigeonhole: ≤ maxHamming
    * differing bits cannot touch all bands) — so the output equals the
    * exact hamming-threshold answer, deterministically.
    *
    * Scale note: the per-band keyspace is 2^(64/bands), so a loose
    * hamming threshold (many bands ⇒ few bits per band) widens buckets
    * toward quadratic candidate generation. For web-scale corpora run
    * with a tight threshold (e.g. maxHamming=3, bands=4 ⇒ 16-bit bands,
    * 65 536-way spread); the verification step keeps any configuration
    * exact, only cost varies. */
  def simhashPairs(
      spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, maxHamming: Int = 12, bands: Int = 13,
      maxBucket: Int = 10000): DataFrame = {
    require(bands > maxHamming, "pigeonhole recall guarantee needs bands > maxHamming")
    require(bands <= 64, "at most one band per sketch bit")
    val feats = shingled(docs, idCol, textCol, shingleSize)
      .withColumn("sk", SimHash.simhash(spark, col("sh")))
    val sketches = feats.select(col(idCol), col("sk"))
    // Contiguous chunks with widths differing by ≤1 (64 = Σ widths).
    val base = 64 / bands
    val widths = (0 until bands).map(b => if (b < 64 % bands) base + 1 else base)
    val offsets = widths.scanLeft(0)(_ + _)
    // band key = band index ⧺ chunk value, packed in one long
    val bandCols = (0 until bands).map { b =>
      (lit(b.toLong) * lit(1L << widths(b))) +
        shiftrightunsigned(col("sk"), offsets(b))
          .bitwiseAND(lit((1L << widths(b)) - 1))
    }
    // The 64-bit sketch rides THROUGH the band self-join (it's one long
    // — unlike minhash's shingle arrays) so Hamming verification runs
    // INLINE in the join's filter, inside the same codegen stage: one
    // shuffle on the band key, no multi-million-pair distinct, no
    // verify joins. Only surviving pairs (a tiny set) get distinct'd —
    // a pair can match in several bands.
    // explode_outer: see minhashPairs — skips InferFiltersFromGenerate.
    val banded = sketches
      .select(col(idCol), col("sk"), explode_outer(array(bandCols: _*)).as("bk"))
    // feeds 3 plan branches (skew prune + both join sides)
    banded.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val big = banded.groupBy(col("bk")).agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBucket).select(col("bk"))
    val ok = banded.join(big, Seq("bk"), "left_anti")
    val x = ok.select(col("bk"), col(idCol).as("doc_a"), col("sk").as("sk_a"))
    val y = ok.select(col("bk"), col(idCol).as("doc_b"), col("sk").as("sk_b"))
    x.join(y, Seq("bk"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("sk_a").bitwiseXOR(col("sk_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .distinct()
  }

  /** Embedding-cosine near-dup pairs (doc_a < doc_b, cosine ≥ threshold).
    * Brute-force all-pairs — exact; the corpus is spread so the nested-
    * loop join parallelizes across all cores, the right side broadcasts.
    * Fine to ~10^4 vectors; above that use Similarity.lshCosinePairs. */
  def embeddingPairs(
      emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions.vecDouble
    import graft.functions.VectorOps
    val ss = emb.sparkSession
    val v = Par.spread(emb)
      .select(col(idCol).as("id"), vecDouble(col(vecCol)).as("e"))
      .withColumn("nrm", VectorOps.norm(ss, col("e")))
    v.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = v.select(col("id").as("doc_a"), col("e").as("ea"), col("nrm").as("na"))
    val b = v.select(col("id").as("doc_b"), col("e").as("eb"), col("nrm").as("nb"))
    val cos = VectorOps.dot(ss, col("ea"), col("eb")) / (col("na") * col("nb"))
    // The cosine threshold lives IN the join condition: the nested-loop
    // join then emits only surviving pairs (a tiny set) instead of
    // materializing O(n²/2) rows each carrying both full embedding
    // arrays for a post-hoc filter. cosine is recomputed for survivors
    // only — same expression, bit-identical.
    a.join(broadcast(b), col("doc_a") < col("doc_b") && cos >= threshold)
      .withColumn("cosine", cos)
      .select(col("doc_a"), col("doc_b"), col("cosine"))
  }

  /** Partial-duplicate (containment) pairs via content-defined chunking:
    * documents sharing ≥ `minShared` CDC chunk fingerprints, scored by
    * containment = shared / min(|chunks_a|, |chunks_b|) — catches one
    * doc CONTAINING another or long shared boilerplate spans, which
    * whole-doc fingerprints miss and full-set Jaccard dilutes (a half-
    * contained doc has jaccard ≈ 0.5 but containment ≈ 1.0).
    *
    * Same scale shape as the n-gram inverted index: one fused chunking
    * pass (native CdcChunksExpr), one posting shuffle on the 64-bit
    * chunk fingerprint (never the text), df-pruned postings, count-based
    * scoring. Output: (doc_a, doc_b, shared_chunks, containment). */
  def containmentPairs(
      docs: DataFrame, idCol: String, textCol: String,
      window: Int = 8, target: Int = 32, minShared: Int = 2,
      maxDf: Int = 1000): DataFrame = {
    val ss = docs.sparkSession
    val f = Par.spread(docs)
      .select(col(idCol),
        array_distinct(graft.functions.CdcChunks.chunks(
          ss, col(textCol), window, target)).as("ck"))
      .filter(size(col("ck")) > 0)
    f.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = f.select(col(idCol).as("pid"), size(col("ck")).as("sz"))
    val postings = f.select(col(idCol), explode_outer(col("ck")).as("chunk"))
    val keep = postings.groupBy(col("chunk")).agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, maxDf)).select(col("chunk"))
    val p = postings.join(keep, Seq("chunk"))
    p.select(col("chunk"), col(idCol).as("doc_a"))
      .join(p.select(col("chunk"), col(idCol).as("doc_b")), Seq("chunk"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("shared_chunks"))
      .filter(col("shared_chunks") >= minShared)
      .join(sizes.select(col("pid").as("doc_a"), col("sz").as("na")), Seq("doc_a"))
      .join(sizes.select(col("pid").as("doc_b"), col("sz").as("nb")), Seq("doc_b"))
      .withColumn("containment",
        col("shared_chunks") * lit(1.0) / least(col("na"), col("nb")))
      .select(col("doc_a"), col("doc_b"), col("shared_chunks"), col("containment"))
  }

  // ---- shared plumbing --------------------------------------------------

  /** (id, sh: array<string>) distinct shingle sets; empty-feature docs
    * dropped (can never pair). Input spread across cores first — the
    * shingle/signature map stages are the CPU hot path.
    *
    * Two deliberate choices, both load-bearing at scale:
    *
    *  - the shingle computation is the fused native `ShinglesExpr`
    *    (codegen'd single pass), NOT the composed built-ins: predicate
    *    inference (e.g. `isnotnull` derived from a downstream jaccard
    *    filter) substitutes projected aliases into filters and pushes
    *    them to the scan — with interpreted higher-order functions that
    *    re-ran the whole tokenizer+shingler per row on the unspread
    *    scan split (observed: 35 s single-task stage on a 5 000-doc
    *    corpus). The native kernel makes even a redundantly-pushed copy
    *    cost microseconds;
    *
    *  - the result is persisted (memory-with-disk-spill): every dedup
    *    pipeline consumes its feature set from 2–6 plan branches
    *    (posting sides, df-prune, size join, verify), and without
    *    materialization each branch re-reads and re-shingles the whole
    *    corpus. At 100 TB that is the difference between one corpus
    *    scan and six — the standard "materialize the signature table
    *    once" production design. Cache entries are shared across
    *    queries in a session (same plan ⇒ same cache key). */
  private def shingled(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val f = Par.spread(docs)
      .select(col(idCol),
        graft.functions.Shingles.shingles(docs.sparkSession, col(textCol), n)
          .as("sh"))
      .filter(size(col("sh")) > 0)
    f.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    f
  }

  private def featSizes(feats: DataFrame, idCol: String): DataFrame =
    feats.select(col(idCol).as("pid"), size(col("sh")).as("sz"))

  /** Bucket join: ids sharing a bucket key → ordered candidate pairs.
    * Buckets larger than `maxBucket` are dropped (skew guard).
    *
    * Deliberately NOT distinct'd: a pair colliding in several bands
    * appears a few times (measured ~3× on the test corpus), but
    * deduplicating here costs a full shuffle of the candidate set while
    * verification is a per-row broadcast probe — cheaper to verify the
    * duplicates and distinct the (tiny) surviving pair set instead
    * (done in verifyPairs). */
  private def candidatesFromBuckets(bucketed: DataFrame, idCol: String,
      keyCol: String, maxBucket: Int): DataFrame = {
    val big = bucketed.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBucket).select(col(keyCol))
    val ok = bucketed.join(big, Seq(keyCol), "left_anti")
    val x = ok.select(col(keyCol), col(idCol).as("doc_a"))
    val y = ok.select(col(keyCol), col(idCol).as("doc_b"))
    x.join(y, Seq(keyCol)).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
  }

  /** Exact Jaccard for the (LSH-bounded, small) candidate pair set:
    * join the two shingle arrays back and intersect directly. Faster
    * than a posting-count join once candidates are few — the arrays are
    * only materialized for pairs that banding already vetted. */
  private def verifyPairs(cand: DataFrame, feats: DataFrame, idCol: String,
      threshold: Double): DataFrame = {
    // fuse size(array_intersect/union) into single-pass counts — the
    // per-candidate verification kernel (see FuseSetSizes scaladoc)
    graft.functions.FuseSetSizes.install(cand.sparkSession)
    cand
      .join(feats.select(col(idCol).as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(feats.select(col(idCol).as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))) * lit(1.0) /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      // multi-band collisions arrive duplicated (see
      // candidatesFromBuckets) — dedup the surviving set, which is
      // orders of magnitude smaller than the candidate set
      .distinct()
  }

  /** jaccard = |A∩B| / (|A|+|B|-|A∩B|) — same integer division order as
    * the DuckDB oracle's `len(list_intersect)/len(distinct concat)`. */
  private def jaccardFromCounts(inter: DataFrame, sizes: DataFrame,
      threshold: Double): DataFrame =
    inter
      .join(sizes.select(col("pid").as("doc_a"), col("sz").as("na")), Seq("doc_a"))
      .join(sizes.select(col("pid").as("doc_b"), col("sz").as("nb")), Seq("doc_b"))
      .withColumn("jaccard",
        col("c") * lit(1.0) / (col("na") + col("nb") - col("c")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
}
