package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for training-data pipelines: tokenizer,
  * shingles, quality scoring, language-ID heuristic, fingerprinting.
  *
  * Everything here is a pure `Column` expression built from Spark's
  * codegen'd built-ins (no UDFs) — so whole-stage codegen keeps the hot
  * path fused, predicates on top of these still push down, and each
  * helper has an exact ANSI-SQL twin runnable by the DuckDB oracle
  * (see graft.queries.TrainingData). Arithmetic is int-based or fixed
  * IEEE op order, so results are bit-identical across engines.
  */
object TextFunctions {

  /** Lowercase alphanumeric tokenizer.
    * DuckDB twin: `list_filter(string_split_regex(lower(t),'[^a-z0-9]+'), x -> x <> '')`. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  /** Distinct word n-gram shingles over a token array (MinHash features).
    * DuckDB twin:
    * `list_distinct([array_to_string(tk[i:i+n-1],' ') for i in generate_series(1, len(tk)-n+1)])`. */
  def shingles(tk: Column, n: Int): Column =
    when(size(tk) >= n,
      array_distinct(transform(sequence(lit(0), size(tk) - n),
        i => concat_ws(" ", slice(tk, i + lit(1), lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** Whitespace-insensitive content fingerprint: md5 of the canonical
    * token stream, truncated to 64 bits of hex. Identical in DuckDB:
    * `substr(md5(array_to_string(tk,' ')),1,16)`. */
  def fingerprint(tk: Column): Column =
    substring(md5(concat_ws(" ", tk)), 1, 16)

  /** Token count of raw text (BPE-ish proxy: alnum runs). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** GPT-2-style BPE pre-tokenizer pattern, restricted to constructs
    * Java regex and RE2 (DuckDB) match identically: contraction
    * suffixes, optional-space letter runs, digit runs, punctuation runs.
    * (The original's `\s+(?!\S)` lookahead is RE2-incompatible and only
    * matters for trailing-whitespace tokens, which never survive
    * counting.) Both engines use leftmost, first-alternative matching,
    * so token boundaries are engine-identical. */
  val BpePattern = """'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s']+"""

  /** BPE-ish sub-word segmentation of raw text (array of pre-tokens).
    * DuckDB twin: `regexp_extract_all(text, <BpePattern>)`. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  /** Whitespace token count (the naive baseline BPE counts refine).
    * DuckDB twin: `len(list_filter(string_split_regex(text,'\s+'), x -> x <> ''))`. */
  def wsTokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => length(t) > 0))

  private def hits(tk: Column, words: Seq[String]): Column =
    size(filter(tk, t => t.isin(words.map(w => lit(w)): _*)))

  val EnStop = Seq("the", "a", "of", "and", "in")
  val EsStop = Seq("el", "la", "los", "de", "que")
  val DeStop = Seq("der", "die", "und", "das", "ist")
  val FrStop = Seq("le", "les", "des", "est", "une")

  /** n-gram/stopword language-ID heuristic: CJK codepoints → zh, else
    * argmax of per-language marker-word hits with fixed precedence
    * en > es > de > fr, else 'und'. SQL twin uses the same CASE chain. */
  def langId(text: Column, tk: Column): Column = {
    val cjk = regexp_count(text, lit("[\\x{4e00}-\\x{9fff}]"))
    val en = hits(tk, EnStop); val es = hits(tk, EsStop)
    val de = hits(tk, DeStop); val fr = hits(tk, FrStop)
    when(cjk > 0, "zh")
      .when(en > 0 && en >= es && en >= de && en >= fr, "en")
      .when(es > 0 && es >= de && es >= fr, "es")
      .when(de > 0 && de >= fr, "de")
      .when(fr > 0, "fr")
      .otherwise("und")
  }

  /** Sum of token lengths (int, exact). DuckDB:
    * `list_sum(list_transform(tk, x -> length(x)))` (0 for empty). */
  def totalTokenChars(tk: Column): Column =
    coalesce(aggregate(tk, lit(0), (acc, t) => acc + length(t)), lit(0))

  /** Heuristic quality score in [0,1]: length signal + stopword ratio +
    * mean token length, all from integer counts with a fixed IEEE op
    * order so the SQL twin is bit-identical. */
  def qualityScore(text: Column, tk: Column): Column = {
    val nTok = size(tk)
    val stopRatio = hits(tk, EnStop) * lit(1.0) / nTok
    val meanLen = totalTokenChars(tk) * lit(1.0) / nTok
    when(nTok === 0, 0.0).otherwise(
      least(nTok * lit(1.0) / lit(100.0), lit(1.0)) * lit(0.5)
        + stopRatio * lit(0.3)
        + least(meanLen / lit(10.0), lit(1.0)) * lit(0.2))
  }
}
