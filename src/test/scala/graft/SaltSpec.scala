package graft

import org.apache.spark.sql.functions._

import graft.operators.Salt

class SaltSpec extends SparkSpec {
  import spark.implicits._

  test("salted join result == plain join result (skewed key, duplicates, factor 1)") {
    // heavy skew: 10k rows on one key, a handful elsewhere; dim has
    // duplicate keys too (join multiplicity must be preserved)
    val skewed = ((1 to 10000).map(i => ("hot", i.toLong)) ++
      Seq(("a", 1L), ("a", 2L), ("b", 3L))).toDF("k", "v")
    val dim = Seq(("hot", 1.0), ("a", 2.0), ("a", 3.0), ("c", 9.0)).toDF("k", "w")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "w").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .sorted.toSeq
    val plain = canon(skewed.join(dim, Seq("k")))
    assert(canon(Salt.saltedJoin(skewed, dim, "k", 8)) == plain)
    assert(canon(Salt.saltedJoin(skewed, dim, "k", 1)) == plain)
  }

  test("salted join shuffles on (key, salt), spreading the hot key") {
    val skewed = (1 to 1000).map(i => ("hot", i.toLong)).toDF("k", "v")
    val dim = Seq(("hot", 1.0)).toDF("k", "w")
    val plan = Salt.saltedJoin(skewed, dim, "k", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), "salt column must be part of the join key")
  }
}
