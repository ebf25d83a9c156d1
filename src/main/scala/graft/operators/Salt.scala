package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for big-big equi-joins.
  *
  * A hot join key sends its entire row population to one reducer; AQE's
  * skew-join split handles many cases, but an engine needs the explicit
  * form too (AQE only splits post-shuffle partitions of sort-merge
  * joins, and only when stats detect the skew). Salting rewrites the
  * join key to (key, salt): the skewed side gets a per-row salt in
  * [0, factor), the other side is replicated across all `factor` salt
  * values, so one hot key spreads over `factor` reducers. The result is
  * EXACTLY the plain join (asserted in SaltSpec) — only the shuffle
  * layout changes.
  *
  * When the non-skewed side fits in memory, prefer `broadcast()` — no
  * shuffle at all. Salting is for the case where both sides are too big
  * to broadcast and one is skewed; `factor` multiplies the replicated
  * side's shuffle volume, so size it to the observed hot-key imbalance,
  * not higher. */
object Salt {

  /** Inner equi-join of `skewed` with `other` on `key`, salted
    * `factor` ways. Output columns = skewed.* ++ (other.* minus key). */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      factor: Int): DataFrame = {
    require(factor >= 1, "factor >= 1")
    // deterministic per-row salt: hash of the whole row, not a RNG —
    // re-computation under task retry lands in the same bucket
    val l = skewed.withColumn("__salt",
      pmod(xxhash64(struct(skewed.columns.map(col): _*)), lit(factor)).cast("int"))
    val r = other.withColumn("__salt",
      explode(array((0 until factor).map(i => lit(i)): _*)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
