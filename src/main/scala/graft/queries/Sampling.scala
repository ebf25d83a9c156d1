package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import Common._

/** Corpus sampling / sharding / chunking — the selection-and-layout
  * stage of a training-data pipeline (what runs between dedup and the
  * tokenizer): stratified and Bernoulli sampling, token-budget shard
  * packing, and context-window chunking.
  *
  * Determinism contract: "random" choices are hash order (`md5` of the
  * document text), which both Spark and DuckDB compute identically —
  * the sample is stable across runs, partitionings, and engines, which
  * is exactly what a reproducible training mix needs.
  *
  * Scale notes per query inline; none of these materializes the corpus
  * more than once, and only the stratified sample shuffles at all.
  */
object Sampling {

  /** Tokenizer SQL twin — must stay in lockstep with TextFunctions. */
  private val TkSql =
    "list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), x -> x <> '')"

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.util.Par.spread(t(s, d, "documents"))

  val defs: Seq[QueryDef] = Seq(

    // ---- stratified sample: first-k per language by hash order ---------
    // One shuffle (partitionBy lang). At 100 TB the per-stratum sort is
    // the cost; for small k the bounded-heap TopKDoubleAgg pattern
    // (operators §8.1) caps what crosses the wire at k rows/stratum/
    // partition — here strata are few and k small, so the plain window
    // is the right plan.
    QueryDef("sample_stratified",
      (s, d) => {
        val w = Window.partitionBy(col("lang"))
          .orderBy(md5(col("text")), col("doc_id"))
        docs(s, d)
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 20)
          .select(col("lang"), col("rk"), col("doc_id"), col("source"))
          .orderBy(col("lang"), col("rk"))
      },
      Some("""SELECT lang, rk, doc_id, source FROM (
          SELECT lang, doc_id, source,
            ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rk
          FROM documents) WHERE rk <= 20 ORDER BY lang, rk""")),

    // ---- Bernoulli sample: deterministic hash-bucket filter -------------
    // Map-only selection (the md5-prefix predicate evaluates at the
    // scan); the only shuffle is the report aggregation. The 2-hex-char
    // prefix < '1a' keeps 26/256 ≈ 10.2% of docs, identically in both
    // engines — a seeded, re-runnable sample with no RNG state.
    QueryDef("sample_hash_bernoulli",
      (s, d) => docs(s, d)
        .filter(substring(md5(col("text")), 1, 2) < "1a")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy(col("lang"), col("source")),
      Some("""SELECT lang, source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents WHERE substr(md5(text), 1, 2) < '1a'
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- weighted Bernoulli sample --------------------------------------
    // Keep each doc with probability ∝ its length (longer docs carry
    // more training signal): a uniform in [0,1) derived from the md5
    // prefix is compared to the per-row weight — the hash plays the RNG,
    // so the weighted sample is seeded, rerun-stable, and identical in
    // both engines (one IEEE divide and compare). Map-only selection.
    QueryDef("sample_weighted",
      (s, d) => docs(s, d)
        .withColumn("u",
          conv(substring(md5(col("text")), 1, 4), 16, 10).cast("double") / 65536.0)
        .filter(col("u") < col("n_chars") / lit(2000.0))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_chars")).cast("long").as("kept_chars"))
        .orderBy(col("lang")),
      Some("""SELECT lang, COUNT(*) AS n_kept,
          CAST(SUM(n_chars) AS BIGINT) AS kept_chars
        FROM documents
        WHERE ('0x' || substr(md5(text), 1, 4))::BIGINT / 65536.0
          < n_chars / 2000.0
        GROUP BY lang ORDER BY lang""")),

    // ---- token-budget shard packing -------------------------------------
    // Assign docs to fixed-budget training shards: running token count
    // per source stream, shard = exclusive-prefix div budget. The window
    // partitions by source, so no global single-partition sort; at
    // 100 TB each source stream packs independently (the realistic
    // layout — shards never mix sources). Integer `div` keeps the
    // arithmetic exact in both engines.
    QueryDef("pack_token_shards",
      (s, d) => {
        val budget = 2000
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        docs(s, d)
          .select(col("source"), col("doc_id"),
            TF.tokenCount(col("text")).cast("long").as("n_tokens"))
          .withColumn("cum", sum(col("n_tokens"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("shard_id", expr(s"(cum - n_tokens) div $budget"))
          .groupBy(col("source"), col("shard_id"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("shard_tokens"))
          .orderBy(col("source"), col("shard_id"))
      },
      Some(s"""WITH toks AS (
          SELECT source, doc_id, len($TkSql) AS n_tokens FROM documents),
        packed AS (
          SELECT source, n_tokens,
            CAST((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
              // 2000 AS BIGINT) AS shard_id
          FROM toks)
        SELECT source, shard_id, COUNT(*) AS n_docs,
          CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
        FROM packed GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- feature binning -------------------------------------------------
    // Equal-width value binning (histogram featurization): global
    // [min,max] comes back as ONE broadcast row, then bin assignment is
    // pure map arithmetic — no global sort, unlike an ntile(10) window
    // whose empty PARTITION BY funnels the corpus through one task. The
    // bin expression is plain IEEE sub/div/mul/floor, so both engines
    // agree bit-for-bit.
    QueryDef("feature_binning",
      (s, d) => {
        val orders = t(s, d, "orders")
        val mm = orders.agg(min(col("o_totalprice")).as("mn"),
          max(col("o_totalprice")).as("mx"))
        orders.crossJoin(broadcast(mm))
          .withColumn("bin", least(
            floor((col("o_totalprice") - col("mn"))
              / (col("mx") - col("mn")) * lit(10.0)), lit(9L)))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"), min(col("o_totalprice")).as("lo"),
            max(col("o_totalprice")).as("hi"),
            dsum(col("o_totalprice")).as("total"))
          .orderBy(col("bin"))
      },
      Some("""WITH mm AS (SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx
            FROM orders)
        SELECT CAST(LEAST(FLOOR((o_totalprice - mn) / (mx - mn) * 10), 9) AS BIGINT) AS bin,
          COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders CROSS JOIN mm GROUP BY 1 ORDER BY 1""")),

    // ---- context-window chunking ----------------------------------------
    // Split each doc into overlapping token windows (size 64, stride
    // 48) — the context-window splitter that feeds sequence packing.
    // Map-only: tokenize once, explode a chunk-index sequence, slice.
    // No shuffle at any scale; output is one row per chunk with a
    // chunk fingerprint (so downstream chunk-level dedup can run on it).
    QueryDef("text_chunk_windows",
      (s, d) => {
        val sz = 64; val st = 48
        docs(s, d)
          .select(col("doc_id"), TF.tokens(col("text")).as("tk"))
          .filter(size(col("tk")) >= 1)
          .withColumn("nc",
            when(size(col("tk")) <= sz, lit(1L))
              .otherwise(ceil((size(col("tk")) - lit(sz)) / lit(st.toDouble)) + 1L))
          .select(col("doc_id"), col("tk"),
            explode(sequence(lit(0L), col("nc") - 1)).as("chunk_id"))
          .withColumn("chunk", slice(col("tk"),
            (col("chunk_id") * st + 1).cast("int"), lit(sz)))
          .select(col("doc_id"), col("chunk_id"),
            size(col("chunk")).cast("long").as("n_tokens"),
            substring(md5(array_join(col("chunk"), " ")), 1, 16).as("chunk_fp"))
          .orderBy(col("doc_id"), col("chunk_id"))
      },
      Some(s"""WITH toks AS (
          SELECT doc_id, $TkSql AS tk FROM documents),
        n AS (
          SELECT doc_id, tk,
            CASE WHEN len(tk) <= 64 THEN 1
                 ELSE CAST(CEIL((len(tk) - 64) / 48.0) AS BIGINT) + 1 END AS nc
          FROM toks WHERE len(tk) >= 1),
        c AS (
          SELECT doc_id, tk, unnest(generate_series(0, nc - 1)) AS chunk_id FROM n),
        sl AS (
          SELECT doc_id, chunk_id,
            tk[chunk_id * 48 + 1 : chunk_id * 48 + 64] AS chunk FROM c)
        SELECT doc_id, chunk_id, len(chunk) AS n_tokens,
          substr(md5(array_to_string(chunk, ' ')), 1, 16) AS chunk_fp
        FROM sl ORDER BY doc_id, chunk_id"""))
  )
}
