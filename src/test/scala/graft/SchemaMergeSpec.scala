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

  test("by-name struct alignment: drifted field order binds by name, never position") {
    val cat = new Snaplog(Files.createTempDirectory("graft-align").toString)
    // stored shape: p = struct<t string, v int>
    val base = Seq((1, "a", 10)).toDF("id", "tag", "v")
      .withColumn("p", struct(col("tag").as("t"), col("v").as("v")))
      .drop("tag", "v")
    val tbl = LakehouseTable.create(cat, spark, "ns", "al", base.schema)
    tbl.append(base)
    // batch 2 carries the SAME fields REORDERED — a positional struct
    // cast would bind t<->v (int->string / string->int both "castable",
    // silent swap); by-name alignment must land values correctly
    val reordered = Seq((2, 20, "b")).toDF("id", "v", "tag")
      .withColumn("p", struct(col("v").as("v"), col("tag").as("t")))
      .drop("tag", "v")
    tbl.append(reordered)
    // batch 3 drifts a NEW field MID-struct (schema-inferred sources
    // order freely); appendEvolve appends it at the END of the stored
    // struct, and the append must still bind every field by name
    val midDrift = Seq((3, "c", 30, 333L)).toDF("id", "tag", "v", "score")
      .withColumn("p", struct(col("tag").as("t"),
        col("score").as("score"), col("v").as("v")))
      .drop("tag", "v", "score")
    tbl.appendEvolve(midDrift)
    val got = tbl.scan()
      .select(col("id"), col("p.t"), col("p.v"), col("p.score"))
      .orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(got == Seq((1, "a", 10, -1L), (2, "b", 20, -1L),
      (3, "c", 30, 333L)), got.toString)
    // a PLAIN append whose struct carries an EXTRA field still fails
    // loudly (by-name binding must not silently drop batch data —
    // evolving is appendEvolve's job, and it succeeded above)
    val extra = Seq((9, "z", 90, 9L, 1.5)).toDF("id", "tag", "v", "score", "oops")
      .withColumn("p", struct(col("tag").as("t"), col("score").as("score"),
        col("v").as("v"), col("oops").as("oops")))
      .drop("tag", "v", "score", "oops")
    assert(intercept[Exception](tbl.append(extra)).getMessage != null)
    assert(tbl.scan().count() == 3, "failed append must land nothing")
    // array-of-struct element order drift binds by name too
    val tbl2 = LakehouseTable.create(cat, spark, "ns", "al2",
      base.withColumn("xs", org.apache.spark.sql.functions.array(
        struct(lit(1).as("a"), lit("x").as("b")))).schema)
    tbl2.append(base.withColumn("xs", org.apache.spark.sql.functions.array(
      struct(lit(1).as("a"), lit("x").as("b")))))
    tbl2.append(base.withColumn("id", lit(2))
      .withColumn("xs", org.apache.spark.sql.functions.array(
        struct(lit("y").as("b"), lit(2).as("a")))))
    val el = tbl2.scan().orderBy("id")
      .select(org.apache.spark.sql.functions.element_at(col("xs"), 1))
      .collect().map(_.getStruct(0)).map(s => (s.getInt(0), s.getString(1)))
    assert(el.toSeq == Seq((1, "x"), (2, "y")), el.mkString(","))
  }

  test("whole-struct add over a freed dotted flat name poisons its stat keys") {
    // the addStructField hazard, reached through addColumns: a dropped
    // flat column literally named 'attrs.n' left name-keyed stats in
    // old log entries; adding a WHOLE struct column 'attrs' with leaf
    // 'n' must poison the dotted key and the root, or IS NULL reads
    // false-prune the pre-add files
    import org.apache.spark.sql.types.{IntegerType, StructType}
    val wh = Files.createTempDirectory("graft-freedstruct").toString
    val cat = new Snaplog(wh)
    val withFlat = Seq((1, 10), (2, 20)).toDF("id", "v")
      .withColumn("attrs.n", col("v") * 7)
    val t = LakehouseTable.create(cat, spark, "ns", "fs", withFlat.schema)
    t.append(withFlat)
    t.dropColumn("attrs.n")
    t.addColumn("attrs", new StructType().add("n", IntegerType))
    val unsafe = graft.types.FieldIds.namesSet(
      cat.loadTable("ns", "fs").properties,
      graft.types.FieldIds.StatsUnsafeProp)
    assert(unsafe("attrs.n") && unsafe("attrs"),
      s"dotted leaf and root must be stats-poisoned, got $unsafe")
    t.append(Seq((3, 30)).toDF("id", "v")
      .withColumn("attrs", struct((col("v") / 10).cast(IntegerType).as("n"))))
    spark.conf.set("spark.sql.catalog.gfs", classOf[graft.sql.GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfs.warehouse", wh)
    // rows 1-2 predate the struct: attrs.n IS NULL for them — the old
    // flat column's nullCount==0 entries must not prune those files
    assert(spark.sql("SELECT COUNT(*) FROM gfs.ns.fs WHERE attrs.n IS NULL")
      .head().getLong(0) == 2)
    assert(spark.sql("SELECT COUNT(*) FROM gfs.ns.fs WHERE attrs.n < 5")
      .head().getLong(0) == 1)
  }

  test("concurrent evolveToMatch of the same drift converges, never crashes") {
    // two sinks merging identical drift race the adds; the loser's
    // "already exists" retries against the fresh schema and converges
    val cat = new Snaplog(Files.createTempDirectory("graft-mergerace").toString)
    val tbl = LakehouseTable.create(cat, spark, "ns", "race", era1.schema)
    tbl.append(era1)
    val drift = era1.withColumn("lang", lit("en"))
      .withColumn("p", struct(col("tag").as("t"), (col("id") * 2).as("v")))
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.DurationInt
    implicit val ec: ExecutionContext = ExecutionContext.global
    val runs = Future.sequence((1 to 4).map(_ =>
      Future(tbl.evolveToMatch(drift.schema))))
    Await.result(runs, 2.minutes)
    assert(tbl.schema.fieldNames.contains("lang"))
    assert(graft.types.SchemaInfer.innerType(
      tbl.schema, Seq("p", "v")).isDefined)
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
