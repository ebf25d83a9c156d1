package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.{TextFunctions => TF}
import Common._

/** Corpus-quality and decontamination operators for training-data
  * pipelines — the filtering stages that sit between raw ingest and
  * dedup in a web-scale corpus build (cf. the C4 / Gopher / MassiveText
  * filtering recipes, arXiv:1910.10683, arXiv:2112.11446):
  *
  *  - repetition signals (modal-bigram coverage, duplicate 5-grams)
  *  - benchmark decontamination (n-gram overlap with an eval set)
  *  - exact-substring cross-doc duplication (fingerprinted token windows)
  *  - corpus-frequency token rarity scoring
  *  - source-mixture resampling to target weights
  *
  * All determinism follows the house rules: integer counts wherever
  * possible, a single final IEEE division for ratios (bit-identical in
  * Spark and DuckDB), md5-prefix uniforms instead of RNG state.
  */
object Quality {

  /** documents table spread across cores (single-split parquet input;
    * the heavy per-doc work is map-side). */
  private def docs(s: SparkSession, d: String) =
    graft.util.Par.spread(t(s, d, "documents"))

  /** DuckDB tokenizer twin (mirrors TextFunctions.tokens). */
  private val TkSql =
    "list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), x -> x <> '')"

  val defs: Seq[QueryDef] = Seq(

    // ---- repetition signals (Gopher-style quality filter) ---------------
    // Per-doc: coverage of the modal bigram and duplicate-5-gram count,
    // computed entirely inside the row (no shuffle until the per-lang
    // rollup). Flags are integer comparisons (top*5 >= n  ⇔  top/n >=
    // 0.2) so no float threshold can diverge; the pooled fraction is
    // exact integer sums with ONE final IEEE division.
    QueryDef("text_repetition",
      (s, d) => {
        val dd = docs(s, d)
          .select(col("doc_id"), col("lang"), TF.tokens(col("text")).as("tk"))
          .withColumn("bg", when(size(col("tk")) >= 2,
            expr("transform(sequence(0, size(tk)-2), i -> concat(tk[i], ' ', tk[i+1]))"))
            .otherwise(expr("cast(array() as array<string>)")))
          .withColumn("g5", when(size(col("tk")) >= 5,
            expr("transform(sequence(0, size(tk)-5), i -> concat_ws(' ', slice(tk, i+1, 5)))"))
            .otherwise(expr("cast(array() as array<string>)")))
          .select(col("lang"), size(col("bg")).as("n_bg"),
            coalesce(expr(
              "array_max(transform(array_distinct(bg), b -> size(filter(bg, x -> x = b))))"),
              lit(0)).as("top_cnt"),
            size(col("g5")).as("n_g5"),
            size(array_distinct(col("g5"))).as("d_g5"))
        dd.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("top_cnt") * 5 >= col("n_bg") && col("n_bg") > 0, 1L)
              .otherwise(0L)).as("n_top_flagged"),
            sum(when(col("n_g5") > col("d_g5"), 1L).otherwise(0L)).as("n_dup5_flagged"),
            sum(col("top_cnt")).as("top_sum"), sum(col("n_bg")).as("bg_sum"))
          .withColumn("pooled_top_frac",
            when(col("bg_sum") === 0, 0.0)
              .otherwise(col("top_sum") * lit(1.0) / col("bg_sum")))
          .select(col("lang"), col("n_docs"), col("n_top_flagged"),
            col("n_dup5_flagged"), col("pooled_top_frac"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, lang, $TkSql AS tk FROM documents),
        m AS (SELECT lang,
            [tk[i] || ' ' || tk[i+1] for i in generate_series(1, len(tk)-1)] AS bg,
            [array_to_string(tk[i:i+4], ' ') for i in generate_series(1, len(tk)-4)] AS g5
          FROM toks),
        f AS (SELECT lang, len(bg) AS n_bg,
            coalesce(list_max(list_transform(list_distinct(bg),
              b -> len(list_filter(bg, x -> x = b)))), 0) AS top_cnt,
            len(g5) AS n_g5, len(list_distinct(g5)) AS d_g5
          FROM m)
        SELECT lang, COUNT(*) AS n_docs,
          CAST(SUM(CASE WHEN top_cnt * 5 >= n_bg AND n_bg > 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_top_flagged,
          CAST(SUM(CASE WHEN n_g5 > d_g5 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup5_flagged,
          CASE WHEN SUM(n_bg) = 0 THEN 0.0
               ELSE SUM(top_cnt) * 1.0 / SUM(n_bg) END AS pooled_top_frac
        FROM f GROUP BY lang ORDER BY lang""")),

    // ---- benchmark decontamination ---------------------------------------
    // Treat one source (src0) as the held-out eval set; a training doc is
    // contaminated if it shares ANY 8-token shingle with it. The eval
    // shingle set is tiny relative to the corpus → broadcast; the corpus
    // never shuffles (the only exchange is the contaminated-doc distinct
    // and the per-source rollup). Scale: eval sets are benchmarks
    // (MBs), corpora are the 100 TB side — exactly this asymmetry.
    QueryDef("text_decontaminate",
      (s, d) => {
        val dd = docs(s, d)
        val sh8 = graft.functions.Shingles.shingles(s, col("text"), 8)
        val bench = dd.filter(col("source") === "src0")
          .select(explode(sh8).as("sh")).distinct()
        val contam = dd.filter(col("source") =!= "src0")
          .select(col("doc_id"), explode_outer(sh8).as("sh"))
          .join(broadcast(bench), Seq("sh"))
          .select(col("doc_id")).distinct()
          .withColumn("hit", lit(1L))
        dd.filter(col("source") =!= "src0")
          .select(col("doc_id"), col("source"))
          .join(contam, Seq("doc_id"), "left")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(coalesce(col("hit"), lit(0L))).as("n_contaminated"))
          .orderBy(col("source"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, source, $TkSql AS tk FROM documents),
        sh AS (SELECT doc_id, source,
            list_distinct([array_to_string(tk[i:i+7], ' ')
              for i in generate_series(1, len(tk)-7)]) AS sh
          FROM toks),
        bench AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE source = 'src0'),
        tr AS (SELECT doc_id, unnest(sh) AS s FROM sh WHERE source <> 'src0'),
        contam AS (SELECT DISTINCT doc_id FROM tr JOIN bench USING (s))
        SELECT d.source, COUNT(*) AS n_docs,
          CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_contaminated
        FROM (SELECT doc_id, source FROM documents WHERE source <> 'src0') d
        LEFT JOIN contam c ON d.doc_id = c.doc_id
        GROUP BY d.source ORDER BY d.source""")),

    // ---- exact-substring cross-doc duplication ---------------------------
    // MassiveText-style exact-substring detection, made scale-safe with
    // winnowing (Schleimer/Wilkerson/Aiken, MOSS): fingerprint every
    // 16-token window, then keep only the MINIMUM fingerprint of each run
    // of 15 consecutive windows. Guarantee: any substring of >= 30 tokens
    // (16 + 15 - 1) shared by two docs selects at least one common
    // fingerprint in both, so no long dup escapes; expected density is
    // 2/(w+1) ~ 1/8 of the stride-1 volume — the posting shuffle drops
    // from O(corpus tokens) to O(corpus tokens / 8). The join is an
    // inverted-index posting join with a df∈[2,64] band (df≥2: only
    // fingerprints that can pair; df≤64: boilerplate cap) mirrored
    // EXACTLY in the oracle so both engines compute the same contract at
    // every scale factor. Recall on planted long dups: QualitySpec.
    QueryDef("dedup_substring",
      (s, d) => {
        // fused native kernel (see WinnowImpl scaladoc): the declarative
        // two-layer transform gets cloned below the repartition by
        // InferFiltersFromGenerate with the fps array inlined per winnow
        // slice — O(n²) md5s on the single input split. One codegen call
        // is O(n) and stays cheap even when redundantly cloned.
        val w = docs(s, d)
          .select(col("doc_id"),
            explode(graft.functions.Winnow.winnow(s, col("text"), 16, 15)).as("fp"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val hot = w.groupBy(col("fp")).agg(count(lit(1)).as("df"))
          .filter(col("df").between(2, 64)).select(col("fp"))
        val ww = w.join(hot, Seq("fp"))
        ww.as("a").join(ww.as("b"),
            col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .agg(count(lit(1)).as("n_shared"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, $TkSql AS tk FROM documents),
        fps AS (SELECT doc_id,
            CASE WHEN len(tk) >= 16 THEN
              [substr(md5(array_to_string(tk[i:i+15], ' ')), 1, 16)
                for i in generate_series(1, len(tk)-15)]
            ELSE [] END AS fp_list
          FROM toks),
        wn AS (SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(fp_list) >= 15 THEN
              [list_min(fp_list[j:j+14]) for j in generate_series(1, len(fp_list)-14)]
            WHEN len(fp_list) > 0 THEN [list_min(fp_list)]
            ELSE [] END)) AS fp
          FROM fps),
        hot AS (SELECT fp FROM wn GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND 64)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
        FROM wn a JOIN hot USING (fp) JOIN wn b
          ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- corpus-frequency rarity scoring ----------------------------------
    // Score each doc by the mean inverse document-frequency of its token
    // occurrences — the cheap "is this doc full of rare strings" signal
    // that catches gibberish and mojibake. Exactness: per-token rarity is
    // an integer reciprocal (1e9 div df), summed exactly; ONE IEEE
    // division per doc at the end. Text never shuffles — only (doc_id,
    // term) pairs do.
    QueryDef("text_rarity",
      (s, d) => {
        val tok = docs(s, d)
          .select(col("doc_id"), explode_outer(TF.tokens(col("text"))).as("term"))
          .filter(col("term").isNotNull)
          .persist(StorageLevel.MEMORY_AND_DISK)
        val dfreq = tok.distinct().groupBy(col("term")).agg(count(lit(1)).as("df"))
        tok.join(dfreq, Seq("term"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            sum(expr("1000000000 div df")).as("rarity_num"))
          .withColumn("rarity", col("rarity_num") * lit(1.0) / col("n_tokens"))
          .select(col("doc_id"), col("n_tokens"), col("rarity"))
          .orderBy(col("rarity").desc, col("doc_id")).limit(50)
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest($TkSql) AS term FROM documents),
        df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        sc AS (SELECT tok.doc_id, COUNT(*) AS n_tokens,
            SUM(1000000000 // df.df) AS rarity_num
          FROM tok JOIN df USING (term) GROUP BY 1)
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
          rarity_num * 1.0 / n_tokens AS rarity
        FROM sc ORDER BY rarity DESC, doc_id LIMIT 50""")),

    // ---- bigram-LM quality scoring (CCNet-style) --------------------------
    // Score each document's fluency under a bigram language model trained
    // on the corpus itself — the CCNet/CC-Net recipe (arXiv:1911.00359)
    // scores web text with an LM and keeps the most natural tier; here
    // the LM is the corpus's own add-one-smoothed bigram model, so the
    // signal is self-contained and fully deterministic. Exactness: each
    // bigram's smoothed likelihood (cbg+1)/(cug+V) is kept as an integer
    // rational (1e9-scaled div), summed exactly per doc, ONE IEEE
    // division at the end — no libm, engine-identical. Scale: text is
    // tokenized once (persist); the bigram window shuffles token rows on
    // doc_id; the model tables are (term) and (w1,w2) count shuffles —
    // scalar rows, never documents; V broadcasts as a 1-row aggregate.
    QueryDef("text_lm_quality",
      (s, d) => {
        val tok = docs(s, d)
          .select(col("doc_id"),
            posexplode_outer(TF.tokens(col("text"))).as(Seq("pos", "term")))
          .filter(col("term").isNotNull)
          .persist(StorageLevel.MEMORY_AND_DISK)
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val bg = tok.withColumn("w2", lead(col("term"), 1).over(w))
          .filter(col("w2").isNotNull)
          .select(col("doc_id"), col("term").as("w1"), col("w2"))
        val ug = tok.groupBy(col("term")).agg(count(lit(1)).as("cug"))
        val cbg = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cbg"))
        val v = tok.select(col("term")).distinct().agg(count(lit(1)).as("v"))
        bg.join(cbg, Seq("w1", "w2"))
          .join(ug, col("w1") === col("term")).drop("term")
          .crossJoin(broadcast(v))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"),
            sum(expr("(1000000000 * (cbg + 1)) div (cug + v)")).as("lm_num"))
          .withColumn("lm_score", col("lm_num") * lit(1.0) / col("n_bigrams"))
          .select(col("doc_id"), col("n_bigrams"), col("lm_score"))
          .orderBy(col("lm_score").desc, col("doc_id")).limit(50)
      },
      Some(s"""WITH tokl AS (SELECT doc_id, $TkSql AS l FROM documents),
        tok AS (SELECT doc_id, unnest(l) AS term FROM tokl),
        v AS (SELECT COUNT(DISTINCT term) AS v FROM tok),
        ug AS (SELECT term, COUNT(*) AS cug FROM tok GROUP BY 1),
        bg AS (SELECT doc_id, l[i] AS w1, l[i+1] AS w2
               FROM tokl, unnest(range(1, len(l))) AS t(i)),
        cbgt AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY 1, 2),
        sc AS (SELECT bg.doc_id, COUNT(*) AS n_bigrams,
                 SUM((1000000000 * (cbgt.c + 1)) // (ug.cug + v.v)) AS lm_num
               FROM bg JOIN cbgt USING (w1, w2) JOIN ug ON bg.w1 = ug.term
               CROSS JOIN v
               GROUP BY 1)
        SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
          lm_num * 1.0 / n_bigrams AS lm_score
        FROM sc ORDER BY lm_score DESC, doc_id LIMIT 50""")),

    // ---- source-mixture resampling ----------------------------------------
    // Downsample each source to a target mixture weight (the training-mix
    // knob: wiki at 1.0, crawl at 0.125, …). Keep decision = md5-prefix
    // uniform vs the source's rate — seeded, rerun-stable, map-only at
    // any scale; only per-source scalars shuffle.
    QueryDef("sample_mixture",
      (s, d) => docs(s, d)
        .withColumn("rate", {
          val m = substring(col("source"), 4, 10).cast("int") % 4
          when(m === 0, 1.0).when(m === 1, 0.5).when(m === 2, 0.25).otherwise(0.125)
        })
        .withColumn("u",
          conv(substring(md5(col("text")), 1, 4), 16, 10).cast("double") / 65536.0)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("u") < col("rate"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("u") < col("rate"), col("n_chars")).otherwise(lit(0L)))
            .as("kept_chars"))
        .orderBy(col("source")),
      Some("""SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(CASE WHEN u < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
          CAST(SUM(CASE WHEN u < rate THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
        FROM (SELECT source, n_chars,
            ('0x' || substr(md5(text), 1, 4))::BIGINT / 65536.0 AS u,
            CASE CAST(substr(source, 4) AS INT) % 4
              WHEN 0 THEN 1.0 WHEN 1 THEN 0.5 WHEN 2 THEN 0.25
              ELSE 0.125 END AS rate
          FROM documents) GROUP BY source ORDER BY source"""))
  )
}
