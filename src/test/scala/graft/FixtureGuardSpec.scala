package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.queries.Common

/** Driver-testdata drift alarm (FIXTURES.md §2). The round-8 fixture
  * regeneration silently switched `events.ts` from timestamp[ns] to
  * timestamp[us] and took 19 queries dark; this guard makes the next
  * drift fail loudly at suite start, naming the drifted column and the
  * loader that must adapt.
  *
  * `expected` encodes what the LOADERS accept today (a set per column,
  * since e.g. `Common.events` deliberately serves both the legacy ns
  * and the current µs generation) — not a single frozen footer, so a
  * regeneration that the code already handles stays green.
  */
object FixtureGuard {

  private val ts: Set[DataType] = Set(TimestampType, TimestampNTZType)
  /** events.ts: legacy ns fixture surfaces as LongType under
    * `nanosAsLong`; current µs fixture as (NTZ) timestamp. */
  private val eventsTs: Set[DataType] = ts + LongType

  /** table -> (column -> accepted Spark dtypes), plus the loader to
    * adapt when that table drifts. */
  val expected: Map[String, (Map[String, Set[DataType]], String)] = {
    def one(cols: (String, DataType)*): Map[String, Set[DataType]] =
      cols.map { case (n, t) => n -> Set(t) }.toMap
    Map(
      "region" -> (one("r_regionkey" -> IntegerType, "r_name" -> StringType),
        "graft.queries.Common.t"),
      "nation" -> (one("n_nationkey" -> IntegerType, "n_name" -> StringType,
        "n_regionkey" -> IntegerType), "graft.queries.Common.t"),
      "customer" -> (one("c_custkey" -> LongType, "c_name" -> StringType,
        "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
        "c_mktsegment" -> StringType), "graft.queries.Common.t"),
      "supplier" -> (one("s_suppkey" -> LongType, "s_name" -> StringType,
        "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
        "graft.queries.Common.t"),
      "part" -> (one("p_partkey" -> LongType, "p_name" -> StringType,
        "p_brand" -> StringType, "p_type" -> StringType,
        "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
        "graft.queries.Common.t"),
      "orders" -> (one("o_orderkey" -> LongType, "o_custkey" -> LongType,
        "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
        "o_orderpriority" -> StringType) + ("o_orderdate" -> ts),
        "graft.queries.Common.t"),
      "lineitem" -> (one("l_orderkey" -> LongType, "l_partkey" -> LongType,
        "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
        "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
        "l_discount" -> DoubleType, "l_tax" -> DoubleType,
        "l_returnflag" -> StringType, "l_linestatus" -> StringType)
        + ("l_shipdate" -> ts), "graft.queries.Common.t"),
      "events" -> (one("event_id" -> LongType, "user_id" -> LongType,
        "event_type" -> StringType, "value" -> DoubleType,
        "props" -> StringType) + ("ts" -> eventsTs),
        "graft.queries.Common.events/eventsRaw"),
      "documents" -> (one("doc_id" -> LongType, "text" -> StringType,
        "lang" -> StringType, "source" -> StringType,
        "n_chars" -> LongType), "graft.queries.Common.t"),
      "embeddings" -> (one("vec_id" -> LongType,
        "embedding" -> ArrayType(FloatType, containsNull = true),
        "label" -> IntegerType), "graft.queries.Common.t"))
  }

  /** Drift messages for one table's actual schema against `expected`;
    * empty = no drift. Pure, so the perturbation test can feed it a
    * deliberately wrong schema without touching testdata. */
  def drift(table: String, actual: StructType): Seq[String] = {
    val (want, loader) = expected(table)
    val got = actual.fields.map(f => f.name -> f.dataType).toMap
    val missing = (want.keySet -- got.keySet).toSeq.sorted.map(c =>
      s"FIXTURE DRIFT: $table.$c missing from testdata — adapt $loader")
    val extra = (got.keySet -- want.keySet).toSeq.sorted.map(c =>
      s"FIXTURE DRIFT: $table.$c (${got(c).simpleString}) new in testdata — " +
        s"extend FixtureGuard.expected and audit $loader")
    val changed = want.toSeq.sortBy(_._1).collect {
      case (c, ok) if got.contains(c) && !ok.contains(got(c)) =>
        s"FIXTURE DRIFT: $table.$c is ${got(c).simpleString}, loaders accept " +
          s"{${ok.map(_.simpleString).mkString(", ")}} — adapt $loader"
    }
    missing ++ extra ++ changed
  }

  /** All drift messages for the real testdata at `sfDir`. */
  def check(spark: SparkSession, sfDir: String): Seq[String] =
    expected.keys.toSeq.sorted.flatMap { t =>
      val df = if (t == "events") Common.eventsRaw(spark, sfDir)
      else spark.read.parquet(s"$sfDir/$t.parquet")
      drift(t, df.schema)
    }
}

class FixtureGuardSpec extends SparkSpec {

  test("driver testdata matches the schemas the loaders were written for") {
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val drifted = FixtureGuard.check(spark, dir)
      assert(drifted.isEmpty, s"\n[$dir]\n" + drifted.mkString("\n"))
    }
  }

  test("guard fails loudly on a perturbed schema, naming column and loader") {
    // ts flipped to a type no loader handles
    val perturbed = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", StringType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val msgs = FixtureGuard.drift("events", perturbed)
    assert(msgs.size == 1)
    assert(msgs.head.contains("events.ts is string"))
    assert(msgs.head.contains("Common.events"))
    // dropped + added column both reported
    val reshaped = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampNTZType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType),
      StructField("payload", StringType)))
    val msgs2 = FixtureGuard.drift("events", reshaped)
    assert(msgs2.exists(m => m.contains("events.props missing")))
    assert(msgs2.exists(m => m.contains("events.payload") && m.contains("new in testdata")))
  }
}
