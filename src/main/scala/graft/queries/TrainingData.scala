package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.operators.{Dedup, Graph, Multimodal, Similarity}
import Common._

/** Training-data pipeline operators as driver-checkable queries: text
  * analysis, dedup family, similarity search, multimodal plumbing.
  *
  * Oracle strategy: the APPROXIMATE operators (MinHash-LSH, SimHash)
  * end in an exact verification step, so their oracle is the plain
  * all-pairs answer — the oracle never needs to re-implement the
  * sketch, it checks the RESULT. Parameters are sized so the miss
  * probability at the planted-duplicate similarity level (~0.98
  * Jaccard) is < 1e-40. Vector math relies on the left-fold == DuckDB
  * `list_sum∘list_transform` bit-equality (see VectorFunctions).
  */
object TrainingData {

  /** documents table, spread across cores — the text queries are
    * CPU-bound map work and the table arrives as one parquet split. */
  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.util.Par.spread(t(s, d, "documents"))

  /** DuckDB fragments mirrored from TextFunctions — kept as constants so
    * Spark and SQL stay in lockstep. */
  private val TkSql =
    "list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), x -> x <> '')"
  private def shSql(tk: String): String =
    s"list_distinct([array_to_string($tk[i:i+2],' ') for i in generate_series(1, len($tk)-2)])"

  /** Shared oracle: exact all-pairs 3-gram-shingle Jaccard ≥ 0.5. */
  private val ExactPairsSql = s"""
    WITH toks AS (SELECT doc_id, $TkSql AS tk FROM documents),
    sh AS (SELECT doc_id, ${shSql("tk")} AS sh FROM toks WHERE len(tk) >= 3),
    p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        len(list_intersect(a.sh, b.sh)) * 1.0
          / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)"""

  /** Shared oracle for the exact ANN formulations (brute force and the
    * degenerate-parameter twins of LSH/IVF, which equal it): cosine
    * top-10 for queries vec_id < 5, rank by cosine desc with id
    * tiebreak. */
  private val AnnExactSql =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      n AS (SELECT vec_id, e,
          sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v),
      q AS (SELECT * FROM n WHERE vec_id < 5),
      p AS (SELECT q.vec_id AS query_id, n.vec_id AS vec_id,
          list_sum(list_transform(list_zip(q.e, n.e), s -> s[1] * s[2]))
            / (q.nrm * n.nrm) AS cosine
        FROM q JOIN n ON q.vec_id <> n.vec_id)
      SELECT query_id, rank, vec_id, cosine FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS INT) AS rank
        FROM p)
      WHERE rank <= 10 ORDER BY query_id, rank"""

  val defs: Seq[QueryDef] = Seq(

    // ---- text analysis --------------------------------------------------
    QueryDef("text_token_stats",
      (s, d) => {
        val dd = docs(s, d).withColumn("tk", TF.tokens(col("text")))
        val stats = dd.groupBy(col("lang")).agg(
          count(lit(1)).as("n_docs"),
          sum(size(col("tk"))).as("total_tokens"),
          (sum(col("n_chars")) * lit(1.0) / count(lit(1))).as("avg_chars"))
        // explode_outer: a plain explode makes InferFiltersFromGenerate
        // push an inlined-tokenizer size filter down to the scan.
        val dt = dd.select(col("lang"), explode_outer(col("tk")).as("tok"))
          .groupBy(col("lang")).agg(countDistinct(col("tok")).as("distinct_tokens"))
        stats.join(dt, "lang").orderBy(col("lang"))
      },
      Some(s"""WITH toks AS (SELECT lang, n_chars, $TkSql AS tk FROM documents),
        stats AS (SELECT lang, COUNT(*) AS n_docs,
            CAST(SUM(len(tk)) AS BIGINT) AS total_tokens,
            SUM(n_chars) * 1.0 / COUNT(*) AS avg_chars
          FROM toks GROUP BY lang),
        dt AS (SELECT lang, COUNT(DISTINCT tok) AS distinct_tokens
          FROM (SELECT lang, unnest(tk) AS tok FROM toks) GROUP BY lang)
        SELECT stats.lang, n_docs, total_tokens, avg_chars, distinct_tokens
        FROM stats JOIN dt USING (lang) ORDER BY lang""")),

    // BPE-ish vs whitespace token counting. The synthetic corpus is
    // bare lowercase words (the two counts coincide), so a fixed
    // punctuation-rich suffix is appended in-query to force the
    // sub-word splits (contraction, digits, hyphenated run) that make
    // BPE counts diverge — token-boundary behavior is then part of the
    // hash-checked result, not dead code.
    QueryDef("text_bpe_tokens",
      (s, d) => {
        val enriched = docs(s, d)
          .withColumn("etext", concat(col("text"), lit(" it's 123 end-of-doc!")))
        enriched.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(size(TF.bpeTokens(col("etext")))).as("bpe_tokens"),
            sum(TF.wsTokenCount(col("etext")).cast("long")).as("ws_tokens"))
          .withColumn("subword_ratio",
            col("bpe_tokens") * lit(1.0) / col("ws_tokens"))
          .orderBy(col("lang"))
      },
      Some("""WITH e AS (SELECT lang, text || ' it''s 123 end-of-doc!' AS etext
            FROM documents)
        SELECT lang, COUNT(*) AS n_docs,
          CAST(SUM(len(regexp_extract_all(etext,
            '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s'']+'))) AS BIGINT) AS bpe_tokens,
          CAST(SUM(len(list_filter(string_split_regex(etext, '\s+'), x -> x <> ''))) AS BIGINT) AS ws_tokens,
          SUM(len(regexp_extract_all(etext,
            '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s'']+'))) * 1.0
            / SUM(len(list_filter(string_split_regex(etext, '\s+'), x -> x <> ''))) AS subword_ratio
        FROM e GROUP BY lang ORDER BY lang""")),

    QueryDef("text_quality",
      (s, d) => docs(s, d)
        .withColumn("tk", TF.tokens(col("text")))
        .select(col("doc_id"), size(col("tk")).as("n_tokens"),
          TF.qualityScore(col("text"), col("tk")).as("score"))
        .orderBy(col("score").desc, col("doc_id")).limit(50),
      Some(s"""WITH toks AS (SELECT doc_id, $TkSql AS tk FROM documents),
        m AS (SELECT doc_id, len(tk) AS n_tokens,
            len(list_filter(tk, x -> x IN ('the','a','of','and','in'))) AS n_stop,
            list_sum(list_transform(tk, x -> length(x))) AS tot_chars
          FROM toks)
        SELECT doc_id, n_tokens,
          CASE WHEN n_tokens = 0 THEN 0.0 ELSE
            least(n_tokens * 1.0 / 100.0, 1.0) * 0.5
            + (n_stop * 1.0 / n_tokens) * 0.3
            + least((tot_chars * 1.0 / n_tokens) / 10.0, 1.0) * 0.2 END AS score
        FROM m ORDER BY score DESC, doc_id LIMIT 50""")),

    QueryDef("text_langid",
      (s, d) => {
        val dd = docs(s, d).withColumn("tk", TF.tokens(col("text")))
        dd.withColumn("predicted", TF.langId(col("text"), col("tk")))
          .groupBy(col("lang"), col("predicted")).agg(count(lit(1)).as("n"))
          .orderBy(col("lang"), col("predicted"))
      },
      Some(s"""WITH m AS (SELECT lang, $TkSql AS tk,
          len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS cjk
          FROM documents),
        h AS (SELECT lang, cjk,
            len(list_filter(tk, x -> x IN ('the','a','of','and','in'))) AS en,
            len(list_filter(tk, x -> x IN ('el','la','los','de','que'))) AS es,
            len(list_filter(tk, x -> x IN ('der','die','und','das','ist'))) AS de,
            len(list_filter(tk, x -> x IN ('le','les','des','est','une'))) AS fr
          FROM m)
        SELECT lang,
          CASE WHEN cjk > 0 THEN 'zh'
               WHEN en > 0 AND en >= es AND en >= de AND en >= fr THEN 'en'
               WHEN es > 0 AND es >= de AND es >= fr THEN 'es'
               WHEN de > 0 AND de >= fr THEN 'de'
               WHEN fr > 0 THEN 'fr'
               ELSE 'und' END AS predicted,
          COUNT(*) AS n
        FROM h GROUP BY lang, predicted ORDER BY lang, predicted""")),

    QueryDef("text_fingerprint",
      (s, d) => docs(s, d)
        .filter(col("doc_id") < 50)
        .select(col("doc_id"),
          TF.fingerprint(TF.tokens(col("text"))).as("fp"),
          TF.tokenCount(col("text")).as("n_tokens"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
          substr(md5(array_to_string($TkSql, ' ')), 1, 16) AS fp,
          len($TkSql) AS n_tokens
        FROM documents WHERE doc_id < 50 ORDER BY doc_id""")),

    // ---- dedup family ---------------------------------------------------
    // Exact dedup on a deterministically doubled corpus (the raw corpus
    // has no exact dups): every group must collapse to 2 copies.
    QueryDef("dedup_exact",
      (s, d) => {
        val dd = docs(s, d).select(col("doc_id"), col("text"))
        val doubled = dd.unionByName(
          dd.withColumn("doc_id", col("doc_id") + 1000000))
        Dedup.exactGroups(doubled, "doc_id", "text")
          .orderBy(col("kept_id")).limit(50)
      },
      Some(s"""WITH docs2 AS (
          SELECT doc_id, text FROM documents
          UNION ALL SELECT doc_id + 1000000, text FROM documents),
        g AS (SELECT substr(md5(array_to_string($TkSql, ' ')), 1, 16) AS fp,
            MIN(doc_id) AS kept_id, COUNT(*) AS n_copies
          FROM docs2 GROUP BY fp)
        SELECT fp, kept_id, n_copies FROM g ORDER BY kept_id LIMIT 50""")),

    QueryDef("dedup_minhash",
      (s, d) => Dedup.minhashPairs(docs(s, d), "doc_id", "text")
        .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""$ExactPairsSql
        SELECT doc_a, doc_b, jaccard FROM p WHERE jaccard >= 0.5
        ORDER BY doc_a, doc_b""")),

    QueryDef("dedup_ngram",
      (s, d) => Dedup.ngramJaccardPairs(docs(s, d), "doc_id", "text")
        .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""$ExactPairsSql
        SELECT doc_a, doc_b, jaccard FROM p WHERE jaccard >= 0.5
        ORDER BY doc_a, doc_b""")),

    // SimHash emits only the pair ids — the oracle checks the same
    // near-dup pair SET falls out of a completely different sketch.
    QueryDef("dedup_simhash",
      (s, d) => Dedup.simhashPairs(s, docs(s, d), "doc_id", "text")
        .select(col("doc_a"), col("doc_b"))
        .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""$ExactPairsSql
        SELECT doc_a, doc_b FROM p WHERE jaccard >= 0.5
        ORDER BY doc_a, doc_b""")),

    // Pairs → clusters: connected components over the verified near-dup
    // pair graph (iterative min-label propagation — the distributed
    // clustering step between pair generation and canonical selection).
    // Oracle: recursive-CTE label closure over the exact pair set.
    QueryDef("dedup_components",
      (s, d) => {
        val pairs = Dedup.ngramJaccardPairs(docs(s, d), "doc_id", "text")
        Graph.connectedComponents(pairs, "doc_a", "doc_b")
          .groupBy(col("component")).agg(count(lit(1)).as("n_docs"))
          .orderBy(col("component"))
      },
      Some(s"""${ExactPairsSql.replaceFirst("WITH", "WITH RECURSIVE")},
        pe AS (SELECT doc_a AS src, doc_b AS dst FROM p WHERE jaccard >= 0.5
          UNION SELECT doc_b, doc_a FROM p WHERE jaccard >= 0.5),
        r(node, label) AS (
          SELECT DISTINCT src, src FROM pe
          UNION
          SELECT pe.dst, r.label FROM r JOIN pe ON r.node = pe.src),
        lab AS (SELECT node, MIN(label) AS component FROM r GROUP BY node)
        SELECT component, COUNT(*) AS n_docs FROM lab
        GROUP BY component ORDER BY component""")),

    // Clusters → survivors: keep the minimum-id document per near-dup
    // cluster; untouched docs pass through. The end-to-end dedup
    // pipeline (shingle → LSH-free exact pairs → components → canonical)
    // in one gated query.
    QueryDef("dedup_canonical",
      (s, d) => {
        val dd = docs(s, d)
        val pairs = Dedup.ngramJaccardPairs(dd, "doc_id", "text")
        Graph.keepCanonical(dd, "doc_id", pairs, "doc_a", "doc_b")
          .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
          .orderBy(col("lang"))
      },
      Some(s"""${ExactPairsSql.replaceFirst("WITH", "WITH RECURSIVE")},
        pe AS (SELECT doc_a AS src, doc_b AS dst FROM p WHERE jaccard >= 0.5
          UNION SELECT doc_b, doc_a FROM p WHERE jaccard >= 0.5),
        r(node, label) AS (
          SELECT DISTINCT src, src FROM pe
          UNION
          SELECT pe.dst, r.label FROM r JOIN pe ON r.node = pe.src),
        lab AS (SELECT node, MIN(label) AS component FROM r GROUP BY node)
        SELECT lang, COUNT(*) AS n_docs FROM documents
        WHERE doc_id NOT IN (SELECT node FROM lab WHERE node <> component)
        GROUP BY lang ORDER BY lang""")),

    // Partial-duplicate detection: each doc's first half is planted as
    // a synthetic "contained" document; chunk-level matching must
    // recover the containment pairs that full-document fingerprints
    // miss. No SQL oracle (rolling-hash boundaries are not expressible
    // in SQL) → rows-only gate; recall/precision pinned in DedupSpec.
    QueryDef("dedup_containment",
      (s, d) => {
        val dd = docs(s, d).select(col("doc_id"), col("text"))
          .filter(col("doc_id") < 500)
        val halves = dd
          .withColumn("doc_id", col("doc_id") + 2000000)
          .withColumn("text", substring(col("text"), lit(1),
            (length(col("text")) / 2).cast("int")))
        // chunk ≈ 8 tokens: sized to the corpus's ~50-token documents
        // (production corpora use the 32-token default)
        Dedup.containmentPairs(dd.unionByName(halves), "doc_id", "text",
            window = 4, target = 8, minShared = 1)
          .filter(col("containment") >= 0.5)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      None),

    // EXACT-TWIN of the containment tier: n-gram-shingle containment
    // |sh(A)∩sh(B)| / min(|sh(A)|,|sh(B)|) over the SAME planted-half
    // fixture — fully SQL-expressible, so the posting-join plumbing the
    // rolling-hash tier shares gets a hash-green oracle. Threshold 0.8
    // absorbs the half's cut-token tail (its last token may be a
    // fragment absent from the full document).
    QueryDef("dedup_containment_exact",
      (s, d) => {
        val dd = docs(s, d).select(col("doc_id"), col("text"))
          .filter(col("doc_id") < 500)
        val halves = dd
          .withColumn("doc_id", col("doc_id") + 2000000)
          .withColumn("text", substring(col("text"), lit(1),
            (length(col("text")) / 2).cast("int")))
        Dedup.ngramContainmentPairs(dd.unionByName(halves), "doc_id", "text",
            threshold = 0.8, maxDf = Int.MaxValue)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""WITH docs2 AS (
          SELECT doc_id, text FROM documents WHERE doc_id < 500
          UNION ALL
          SELECT doc_id + 2000000 AS doc_id,
            substr(text, 1, length(text) // 2) AS text
          FROM documents WHERE doc_id < 500),
        toks AS (SELECT doc_id, $TkSql AS tk FROM docs2),
        sh AS (SELECT doc_id, ${shSql("tk")} AS sh FROM toks WHERE len(tk) >= 3),
        p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            len(list_intersect(a.sh, b.sh)) * 1.0
              / least(len(a.sh), len(b.sh)) AS containment
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        SELECT doc_a, doc_b, containment FROM p WHERE containment >= 0.8
        ORDER BY doc_a, doc_b""")),

    QueryDef("dedup_embedding",
      (s, d) => Dedup.embeddingPairs(t(s, d, "embeddings"), "vec_id", "embedding",
        threshold = 0.4)
        .orderBy(col("doc_a"), col("doc_b")),
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        n AS (SELECT vec_id, e,
            sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v),
        p AS (SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
            list_sum(list_transform(list_zip(a.e, b.e), s -> s[1] * s[2]))
              / (a.nrm * b.nrm) AS cosine
          FROM n a JOIN n b ON a.vec_id < b.vec_id)
        SELECT doc_a, doc_b, cosine FROM p WHERE cosine >= 0.4
        ORDER BY doc_a, doc_b""")),

    // ---- capstone: the full training-corpus pipeline --------------------
    // quality filter → exact near-dup pairs → connected-component
    // clustering → canonical survivors → language distribution, in one
    // gated query whose DuckDB oracle recomputes every stage (the
    // quality CASE, the shingle jaccard, the recursive label closure).
    QueryDef("pipeline_training_corpus",
      (s, d) => {
        // materialized scoring stage: predicate pushdown would otherwise
        // substitute the interpreted quality tree into the single-split
        // scan filter (the Dedup-scaladoc pathology); the cache boundary
        // keeps scoring in the spread 32-task stage, evaluated once
        val scored0 = docs(s, d)
          .withColumn("tk", TF.tokens(col("text")))
          .select(col("doc_id"), col("text"), col("lang"),
            TF.qualityScore(col("text"), col("tk")).as("score"))
        scored0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val scored = scored0.filter(col("score") >= 0.5)
          .select(col("doc_id"), col("text"), col("lang"))
        val pairs = Dedup.ngramJaccardPairs(scored, "doc_id", "text")
        Graph.keepCanonical(scored, "doc_id", pairs, "doc_a", "doc_b")
          .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH RECURSIVE toks AS (
          SELECT doc_id, text, lang, $TkSql AS tk FROM documents),
        m AS (SELECT doc_id, text, lang, tk, len(tk) AS n_tokens,
            len(list_filter(tk, x -> x IN ('the','a','of','and','in'))) AS n_stop,
            list_sum(list_transform(tk, x -> length(x))) AS tot_chars
          FROM toks),
        keep0 AS (SELECT doc_id, lang, tk FROM m
          WHERE (CASE WHEN n_tokens = 0 THEN 0.0 ELSE
            least(n_tokens * 1.0 / 100.0, 1.0) * 0.5
            + (n_stop * 1.0 / n_tokens) * 0.3
            + least((tot_chars * 1.0 / n_tokens) / 10.0, 1.0) * 0.2 END) >= 0.5),
        sh AS (SELECT doc_id, ${shSql("tk")} AS sh FROM keep0 WHERE len(tk) >= 3),
        p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            len(list_intersect(a.sh, b.sh)) * 1.0
              / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
        pe AS (SELECT doc_a AS src, doc_b AS dst FROM p WHERE jaccard >= 0.5
          UNION SELECT doc_b, doc_a FROM p WHERE jaccard >= 0.5),
        r(node, label) AS (
          SELECT DISTINCT src, src FROM pe
          UNION
          SELECT pe.dst, r.label FROM r JOIN pe ON r.node = pe.src),
        lab AS (SELECT node, MIN(label) AS component FROM r GROUP BY node)
        SELECT lang, COUNT(*) AS n_docs FROM keep0
        WHERE doc_id NOT IN (SELECT node FROM lab WHERE node <> component)
        GROUP BY lang ORDER BY lang""")),

    // ---- similarity search ---------------------------------------------
    QueryDef("ann_bruteforce",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 10)
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        n AS (SELECT vec_id, e,
            sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v),
        q AS (SELECT * FROM n WHERE vec_id < 5),
        p AS (SELECT q.vec_id AS query_id, n.vec_id AS vec_id,
            list_sum(list_transform(list_zip(q.e, n.e), s -> s[1] * s[2]))
              / (q.nrm * n.nrm) AS cosine
          FROM q JOIN n ON q.vec_id <> n.vec_id)
        SELECT query_id, rank, vec_id, cosine FROM (
          SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS INT) AS rank
          FROM p)
        WHERE rank <= 10 ORDER BY query_id, rank""")),

    // Approximate tier — no oracle (recall measured in SimilaritySpec).
    QueryDef("ann_lsh",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.lshCosineTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 10, dim = 64, planeBits = 8)
          .orderBy(col("query_id"), col("rank"))
      },
      None),

    // IVF tier — trained coarse quantizer + probed inverted lists; no
    // oracle (approximate; determinism + recall asserted in
    // SimilaritySpec).
    QueryDef("ann_ivf",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 10, nlist = 16, nprobe = 4)
          .orderBy(col("query_id"), col("rank"))
      },
      None),

    // EXACT-TWIN gates for the approximate tier: the same code paths
    // at their degenerate parameterizations equal brute force, so the
    // DuckDB oracle hash-checks the full plumbing (bucketing, probing,
    // re-rank) even though the production parameterizations stay
    // rows-only by design.
    // LSH with planeBits = 0: one bucket, full probe == brute force.
    QueryDef("ann_lsh_exact",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.lshCosineTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 10, dim = 64, planeBits = 0)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(AnnExactSql)),

    // IVF with nprobe = nlist: every inverted list probed == brute
    // force (SimilaritySpec proves the equality; this pins it to the
    // external oracle).
    QueryDef("ann_ivf_exact",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 10, nlist = 16, nprobe = 16)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(AnnExactSql)),

    // ---- multimodal plumbing -------------------------------------------
    // ---- TF-IDF term scoring -------------------------------------------
    // Top-3 salient terms per document (doc_id < 20) with the document
    // frequency computed over the WHOLE corpus. The weight is the
    // BM25-style rational idf tf·(N-df+0.5)/(df+0.5) — exact IEEE
    // arithmetic (one divide, one multiply), so Spark and DuckDB produce
    // bit-identical doubles where a log-based idf would be at the mercy
    // of two libm implementations. Scale: tf is one shuffle on
    // (doc, term), df one map-side-combined shuffle on term; the corpus
    // text itself never shuffles.
    QueryDef("text_tfidf",
      (s, d) => {
        val tok = docs(s, d)
          .select(col("doc_id"), explode_outer(TF.tokens(col("text"))).as("term"))
          .filter(col("term").isNotNull)
        val tf = tok.groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        tf.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val n = docs(s, d).agg(count(lit(1)).as("n_docs"))
        val scored = tf.filter(col("doc_id") < 20)
          .join(df_, Seq("term"))
          .crossJoin(broadcast(n))
          .withColumn("score", col("tf") *
            ((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
        scored.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("rk"), col("term"), col("score"))
          .orderBy(col("doc_id"), col("rk"))
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest($TkSql) AS term FROM documents),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (SELECT tf.doc_id, tf.term,
            tf.tf * ((n.n_docs - df.df + 0.5) / (df.df + 0.5)) AS score
          FROM tf JOIN df USING (term) CROSS JOIN n
          WHERE tf.doc_id < 20),
        r AS (SELECT doc_id, term, score,
            ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY score DESC, term) AS rk
          FROM scored)
        SELECT doc_id, rk, term, score FROM r WHERE rk <= 3
        ORDER BY doc_id, rk""")),

    // ---- per-label embedding centroids ---------------------------------
    // Element-wise mean vector per label — the k-means/centroid building
    // block over the embedding column. posexplode keeps the work one
    // map-side pass + one (label, dim) shuffle of scalar partials; the
    // decimal-exact sum makes the mean order-independent and
    // engine-identical. At 100 TB the shuffle carries |labels|·dim
    // partial rows per task, never vectors.
    QueryDef("embedding_centroids",
      (s, d) => {
        import graft.functions.VectorFunctions
        t(s, d, "embeddings")
          .select(col("label"),
            posexplode(VectorFunctions.vecDouble(col("embedding")))
              .as(Seq("pos", "x")))
          .groupBy(col("label"), (col("pos") + 1).as("dim"))
          .agg(count(lit(1)).as("n_vecs"), davg(col("x"), 9).as("mean_val"))
          .orderBy(col("label"), col("dim"))
      },
      Some("""WITH v AS (SELECT label, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings),
        x AS (SELECT label, i AS dim, e[i] AS x
          FROM v CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) s
          WHERE i <= len(e))
        SELECT label, dim, COUNT(*) AS n_vecs,
          CAST(SUM(CAST(x AS DECIMAL(18,9))) AS DOUBLE) / COUNT(x) AS mean_val
        FROM x GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- incremental dedup against a reference corpus ------------------
    // The ingest-time variant of exact dedup: NEW documents (every 5th
    // doc plays the incoming batch) checked against the already-ingested
    // corpus by content fingerprint — one broadcast-or-shuffle join on a
    // 64-hex key, the standard "don't re-ingest what the corpus already
    // has" gate in front of a training-data lake.
    QueryDef("dedup_incremental",
      (s, d) => {
        val all = docs(s, d).withColumn("fp", md5(col("text")))
        val corpus = all.filter(col("doc_id") % 5 =!= 0)
          .select(col("fp")).distinct().withColumn("dup", lit(1))
        all.filter(col("doc_id") % 5 === 0)
          .join(corpus, Seq("fp"), "left")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_incoming"),
            count(when(col("dup").isNull, 1)).as("n_novel"))
          .orderBy(col("lang"))
      },
      Some("""WITH corp AS (SELECT DISTINCT md5(text) AS fp FROM documents
            WHERE doc_id % 5 <> 0),
        inc AS (SELECT lang, md5(text) AS fp FROM documents WHERE doc_id % 5 = 0)
        SELECT lang, COUNT(*) AS n_incoming,
          COUNT(CASE WHEN corp.fp IS NULL THEN 1 END) AS n_novel
        FROM inc LEFT JOIN corp ON inc.fp = corp.fp
        GROUP BY lang ORDER BY lang""")),

    // ---- PII scrubbing --------------------------------------------------
    // Regex-based detect + redact of email-like and long-digit-run
    // spans — the privacy pass a training corpus runs before the
    // tokenizer. The corpus text is synthetic (no real PII), so each doc
    // gets a deterministic PII-ish suffix built identically in both
    // engines; emails are scrubbed first so their digit parts don't
    // double-count as numbers. Pure map work: detection, redaction and
    // length accounting happen in one pass, only lang-level scalar
    // partials shuffle.
    QueryDef("text_pii_scrub",
      (s, d) => {
        val email = "[a-z0-9]+@[a-z0-9.]+"
        val num = "[0-9]{4,}"
        docs(s, d)
          .withColumn("etext", concat(col("text"), lit(" contact user"),
            col("doc_id"), lit("@example.com phone "),
            (col("doc_id") * 7919 + 10000000L)))
          .withColumn("n_emails",
            size(regexp_extract_all(col("etext"), lit(email), lit(0))))
          .withColumn("t1", regexp_replace(col("etext"), email, "<email>"))
          .withColumn("n_nums",
            size(regexp_extract_all(col("t1"), lit(num), lit(0))))
          .withColumn("clean", regexp_replace(col("t1"), num, "<num>"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_emails")).cast("long").as("n_emails"),
            sum(col("n_nums")).cast("long").as("n_nums"),
            sum(length(col("clean"))).cast("long").as("clean_chars"))
          .orderBy(col("lang"))
      },
      Some("""WITH e AS (SELECT lang,
            text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com phone '
              || CAST(doc_id * 7919 + 10000000 AS VARCHAR) AS etext
          FROM documents),
        s1 AS (SELECT lang,
            len(regexp_extract_all(etext, '[a-z0-9]+@[a-z0-9.]+')) AS n_emails,
            regexp_replace(etext, '[a-z0-9]+@[a-z0-9.]+', '<email>', 'g') AS t1
          FROM e),
        s2 AS (SELECT lang, n_emails,
            len(regexp_extract_all(t1, '[0-9]{4,}')) AS n_nums,
            regexp_replace(t1, '[0-9]{4,}', '<num>', 'g') AS clean
          FROM s1)
        SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_emails) AS BIGINT) AS n_emails,
          CAST(SUM(n_nums) AS BIGINT) AS n_nums,
          CAST(SUM(len(clean)) AS BIGINT) AS clean_chars
        FROM s2 GROUP BY lang ORDER BY lang""")),

    // ---- video frame sampling ------------------------------------------
    // Strided frame extraction over the video tier of the REAL-format
    // media corpus: each payload is concatenated 90-byte BMP frames, so
    // the fixed-size columnar splitter (Multimodal.frames: pure Column
    // ops, no shuffle) yields whole parseable bitmaps. The query proves
    // it by checking every kept frame's BMP magic and summing the first
    // DECODED pixel byte (payload offset 55 = header 54 + 1); the
    // oracle recomputes both from the md5-derived pixel layout: frame f
    // pixel 0 = md5[(f*36) % 16], stride 2 keeps f ∈ {0,2,4}.
    QueryDef("multimodal_frames",
      (s, d) => {
        val media = Multimodal.synthesizeFromDocs(docs(s, d))
        Multimodal.frames(media.filter(col("modality") === "video"),
            frameBytes = 90, stride = 2)
          .groupBy(col("modality"))
          .agg(countDistinct(col("media_id")).as("n_media"),
            count(lit(1)).as("n_frames"),
            sum(when(substring(col("frame_bytes"), 1, 2) === lit("BM".getBytes), 1L)
              .otherwise(0L)).as("n_bmp"),
            sum(conv(hex(substring(col("frame_bytes"), 55, 1)), 16, 10)
              .cast("long")).as("first_pixel_sum"))
          .orderBy(col("modality"))
      },
      // nFrames = 2+(doc_id%4); stride 2 keeps (nFrames+1)//2 frames;
      // kept-frame first pixels: m4=0→{b0}, m4∈{1,2}→{b0,b8},
      // m4=3→{b0,b0,b8} (b0 = md5 byte 0, b8 = md5 byte 8)
      Some("""WITH m AS (SELECT doc_id,
          CAST(doc_id % 4 AS INT) AS m4,
          ('0x' || substr(md5(text), 1, 2))::BIGINT AS b0,
          ('0x' || substr(md5(text), 17, 2))::BIGINT AS b8
        FROM documents WHERE doc_id % 3 = 2)
        SELECT 'video' AS modality, COUNT(*) AS n_media,
          CAST(SUM((2 + m4 + 1) // 2) AS BIGINT) AS n_frames,
          CAST(SUM((2 + m4 + 1) // 2) AS BIGINT) AS n_bmp,
          CAST(SUM(CASE m4 WHEN 0 THEN b0 WHEN 3 THEN 2*b0 + b8
            ELSE b0 + b8 END) AS BIGINT) AS first_pixel_sum
        FROM m GROUP BY 1 ORDER BY modality""")),

    // Real-codec media stats: extractFeatures parses every payload's
    // HEADER (BMP dims, WAV rate/samples, frame walk via declared
    // sizes) — the oracle recomputes each parsed field analytically
    // from the synthesis parameters, so a hash match proves the full
    // encode→parse loop is byte-correct.
    QueryDef("multimodal_stats",
      (s, d) => {
        val media = Multimodal.synthesizeFromDocs(docs(s, d))
        Multimodal.extractFeatures(s, media).toDF()
          .groupBy(col("modality")).agg(
            count(lit(1)).as("n_items"),
            sum(col("n_bytes")).cast("long").as("total_bytes"),
            sum(col("dim1")).cast("long").as("dim1_sum"),
            sum(col("dim2")).cast("long").as("dim2_sum"),
            sum(col("n_units")).cast("long").as("units_sum"),
            sum(col("head_byte")).cast("long").as("head_sum"))
          .orderBy(col("modality"))
      },
      Some("""WITH m AS (SELECT doc_id,
          ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS modality,
          CAST(doc_id % 4 AS INT) AS m4, CAST(doc_id % 5 AS INT) AS m5,
          ('0x' || substr(md5(text), 1, 2))::BIGINT AS b0
        FROM documents)
        SELECT modality, COUNT(*) AS n_items,
          CAST(SUM(CASE modality
            WHEN 'image' THEN 54 + 3*((m4+1)*4)*(m5+1)
            WHEN 'audio' THEN 44 + 2*(16 + m5*8)
            ELSE 90*(2 + m4) END) AS BIGINT) AS total_bytes,
          CAST(SUM(CASE modality WHEN 'image' THEN (m4+1)*4
            WHEN 'audio' THEN 8000 + 1000*m4 ELSE 4 END) AS BIGINT) AS dim1_sum,
          CAST(SUM(CASE modality WHEN 'image' THEN m5+1
            WHEN 'audio' THEN 16 + m5*8 ELSE 3 END) AS BIGINT) AS dim2_sum,
          CAST(SUM(CASE modality WHEN 'image' THEN 1
            WHEN 'audio' THEN 16 + m5*8 ELSE 2 + m4 END) AS BIGINT) AS units_sum,
          CAST(SUM(b0) AS BIGINT) AS head_sum
        FROM m GROUP BY modality ORDER BY modality"""))
  )
}
