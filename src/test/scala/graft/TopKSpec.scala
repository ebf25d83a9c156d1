package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopK

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("topk_double equals window-rank top-k on real data (multiset, order)") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val viaAgg = li.groupBy($"l_returnflag")
      .agg(TopK.topkDouble(spark, $"l_extendedprice", 7).as("tp"))
      .select($"l_returnflag", posexplode($"tp").as(Seq("pos", "price")))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
    val w = Window.partitionBy($"l_returnflag")
      .orderBy($"l_extendedprice".desc)
    val viaWindow = li
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 7)
      .select($"l_returnflag", ($"rn" - 1).as("pos"), $"l_extendedprice")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
    assert(viaAgg == viaWindow)
  }

  test("topk_double: merge across partitions, k > group size, null input") {
    val df = Seq(
      ("a", Some(3.0)), ("a", Some(1.0)), ("a", Some(2.0)), ("a", None),
      ("b", Some(5.0))
    ).toDF("g", "x").repartition(4) // force partial buffers + merges
    val got = df.groupBy($"g")
      .agg(TopK.topkDouble(spark, $"x", 2).as("tp"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got("a") == Seq(3.0, 2.0))
    assert(got("b") == Seq(5.0)) // fewer than k values → shorter array
  }

  test("topk_double survives serialize/deserialize round trip") {
    import graft.functions.TopKDoubleAgg
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = TopKDoubleAgg(Literal(1.0), 3)
    val h = agg.createAggregationBuffer()
    Seq(4.0, 9.0, 1.0, 7.0).foreach { d =>
      if (h.size < 3) h.add(d) else if (h.peek() < d) { h.poll(); h.add(d) }
    }
    val h2 = agg.deserialize(agg.serialize(h))
    assert(agg.eval(h2).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toDoubleArray().toSeq == Seq(9.0, 7.0, 4.0))
  }
}
