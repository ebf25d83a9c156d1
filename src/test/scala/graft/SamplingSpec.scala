package graft

import org.apache.spark.sql.functions._

import graft.queries.Sampling

/** Invariant tests for the sampling / sharding / chunking queries —
  * properties the DuckDB hash-match can't express (determinism across
  * runs, conservation laws, overlap geometry). */
class SamplingSpec extends SparkSpec {

  private def q(name: String) =
    Sampling.defs.find(_.name == name).get.fn(spark, sf)

  test("sample_stratified: at most k rows per stratum, identical across runs") {
    val a = q("sample_stratified").collect()
    val b = q("sample_stratified").collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    val perLang = a.groupBy(_.getString(0)).view.mapValues(_.length)
    assert(perLang.values.forall(_ <= 20))
    // ranks are 1..n contiguous within each stratum
    a.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq === (1 to rows.length))
    }
  }

  test("sample_hash_bernoulli: selects ~26/256 of docs, all from the corpus") {
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    val kept = q("sample_hash_bernoulli").agg(sum("n_docs")).collect()(0).getLong(0)
    val frac = kept.toDouble / total
    // 26/256 ≈ 0.1016; loose bounds — the corpus is small
    assert(frac > 0.04 && frac < 0.20, s"fraction $frac out of range")
  }

  test("pack_token_shards: shard ids contiguous per source, tokens conserved") {
    val shards = q("pack_token_shards").collect()
    val bySource = shards.groupBy(_.getString(0))
    bySource.foreach { case (_, rows) =>
      val ids = rows.map(_.getLong(1)).sorted.toSeq
      assert(ids === (0L until ids.length).toSeq, s"non-contiguous shards: $ids")
      assert(rows.forall(_.getLong(2) > 0))
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val totalTokens = docs
      .select(graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    val shardTokens = shards.map(_.getLong(3)).sum
    assert(shardTokens === totalTokens)
  }

  test("text_chunk_windows: full coverage, stride geometry, bounded size") {
    val chunks = q("text_chunk_windows")
      .select("doc_id", "chunk_id", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = chunks.groupBy(_._1)
    // every non-empty doc chunks; every chunk ≤ 64 tokens
    assert(byDoc.keySet === docs.filter(_._2 >= 1).keySet)
    assert(chunks.forall(_._3 <= 64))
    byDoc.foreach { case (docId, cs) =>
      val n = docs(docId)
      val sorted = cs.sortBy(_._2)
      // chunk ids contiguous from 0
      assert(sorted.map(_._2).toSeq === (0L until sorted.length).toSeq)
      // chunk i covers tokens [i*48+1, i*48+len]; last chunk reaches n
      val last = sorted.last
      assert(last._2 * 48 + last._3 === n,
        s"doc $docId: last chunk ends at ${last._2 * 48 + last._3}, want $n")
      // all but the last chunk are full-size (64) when n > 64
      if (n > 64) assert(sorted.init.forall(_._3 === 64))
    }
  }

  test("text_chunk_windows plans no hash exchange (map-only until the sort)") {
    val plan = q("text_chunk_windows").queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"),
      s"unexpected hash exchange in chunking plan:\n$plan")
  }
}
