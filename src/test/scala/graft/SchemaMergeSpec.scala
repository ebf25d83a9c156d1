package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, lit, struct}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}

import graft.catalog.Snaplog
import graft.table.LakehouseTable

/** Auto schema evolution on write (`evolveToMatch` / `appendEvolve` —
  * Delta mergeSchema analogue): drifting batches evolve the table
  * additively (new columns, new struct leaves, legal widenings) and
  * everything else keeps the strict contract. */
class SchemaMergeSpec extends SparkSpec {
  import spark.implicits._

  private def era1 = Seq((1, "a", 10), (2, "b", 20)).toDF("id", "tag", "score")
    .withColumn("p", struct(col("tag").as("t")))

  test("appendEvolve: new columns, new struct leaves, widenings — one call") {
    val cat = new Snaplog(Files.createTempDirectory("graft-merge").toString)
    val tbl = LakehouseTable.create(cat, spark, "ns", "m", era1.schema)
    tbl.append(era1)
    // era 2 drifts three ways at once: score int→bigint (with values
    // only a long can hold), a fresh lang column, and a new leaf p.v
    val era2 = Seq((3L, "c", 3000000003L, "en"), (4L, "d", 3000000004L, "xx"))
      .toDF("id", "tag", "score", "lang")
      .withColumn("id", col("id").cast(IntegerType))
      .withColumn("p", struct(col("tag").as("t"), (col("id") * 10).as("v")))
    tbl.appendEvolve(era2)
    assert(tbl.schema("score").dataType == LongType)
    assert(tbl.schema.fieldNames.contains("lang"))
    assert(graft.types.SchemaInfer.innerType(
      tbl.schema, Seq("p", "v")).contains(IntegerType))
    val got = tbl.scan()
      .select(col("id"), col("score"), col("lang"), col("p.v"))
      .orderBy("id").collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) "-" else r.getString(2),
        if (r.isNullAt(3)) -1 else r.getInt(3))).toSeq
    assert(got == Seq((1, 10L, "-", -1), (2, 20L, "-", -1),
      (3, 3000000003L, "en", 30), (4, 3000000004L, "xx", 40)))
    // identical schema = zero evolution commits and a plain append
    val snapsBefore = cat.snapshots("ns", "m").size
    val sch = tbl.schema
    tbl.appendEvolve(tbl.scan().limit(0))
    assert(tbl.schema == sch)
    assert(cat.snapshots("ns", "m").size == snapsBefore + 1)
    // a narrower batch type does NOT un-widen — normalize casts up
    val era3 = Seq((5, "e", 50, "en")).toDF("id", "tag", "score", "lang")
      .withColumn("p", struct(col("tag").as("t"), (col("id") * 10).as("v")))
    tbl.appendEvolve(era3)
    assert(tbl.schema("score").dataType == LongType)
    assert(tbl.scan().filter(col("id") === 5).select("score")
      .head().getLong(0) == 50L)
    // list-element shape drift refuses loudly (no evolution expresses it)
    val tbl2 = LakehouseTable.create(cat, spark, "ns", "m2",
      era1.withColumn("xs", org.apache.spark.sql.functions.array(
        struct(col("score").as("s")))).schema)
    val drifted = era1.withColumn("xs", org.apache.spark.sql.functions.array(
      struct(col("score").as("s"), col("tag").as("t2"))))
    val e = intercept[IllegalArgumentException](tbl2.evolveToMatch(drifted.schema))
    assert(e.getMessage.contains("list element"))
    // inherited gates still fire: a widening whose source feeds a
    // bucket spec refuses instead of silently mis-pruning
    val tbl3 = LakehouseTable.create(cat, spark, "ns", "m3",
      era1.schema, partitionColumns = Seq("bucket(4, score)"))
    tbl3.append(era1)
    val wide = era1.withColumn("score", col("score").cast(LongType))
    val e2 = intercept[IllegalArgumentException](tbl3.evolveToMatch(wide.schema))
    assert(e2.getMessage.contains("bucket"))
  }

  test("evolveToMatch composes with upsert: drifting CDC batches") {
    val cat = new Snaplog(Files.createTempDirectory("graft-mergeup").toString)
    val tbl = LakehouseTable.create(cat, spark, "ns", "mu", era1.schema)
    tbl.append(era1)
    val patch = Seq((2, "B2", 200, "hot")).toDF("id", "tag", "score", "seg")
      .withColumn("p", struct(col("tag").as("t")))
    tbl.evolveToMatch(patch.schema)
    graft.pipeline.Upsert.upsertTable(tbl, patch, Seq("id"))
    val got = tbl.scan().select("id", "tag", "score", "seg").orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2),
        if (r.isNullAt(3)) "-" else r.getString(3))).toSeq
    assert(got == Seq((1, "a", 10, "-"), (2, "B2", 200, "hot")))
  }
}
