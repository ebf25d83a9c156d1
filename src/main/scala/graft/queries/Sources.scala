package graft.queries

import org.apache.spark.sql.functions._

import Common._

/** Non-parquet source/sink coverage. The reference is parquet-only
  * (SURVEY.md §2.1), but a complete engine must round-trip the other
  * first-class Spark formats; each leg writes a disjoint slice of the
  * same table to a different format, reads it back with an explicit
  * schema, and the union must reproduce the parquet-derived oracle
  * exactly — so text-format value fidelity (shortest-round-trip doubles,
  * header/schema handling) is part of the gate. */
object Sources {

  val defs: Seq[QueryDef] = Seq(

    // orders split 3 ways: CSV (with header), JSON lines, ORC. Dates
    // travel as epoch-day ints in the text formats (explicit, engine-
    // neutral), then everything reunites and aggregates per status.
    QueryDef("source_format_roundtrip",
      (s, d) => {
        val base = scratchDir("source_format_roundtrip", d)
        val orders = t(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
            datediff(col("o_orderdate"), lit("1990-01-01")).as("day_num"))
        val m0 = orders.filter(col("o_orderkey") % 3 === 0)
        val m1 = orders.filter(col("o_orderkey") % 3 === 1)
        val m2 = orders.filter(col("o_orderkey") % 3 === 2)
        m0.write.option("header", "true").csv(s"$base/csv")
        m1.write.json(s"$base/json")
        m2.write.orc(s"$base/orc")
        val csv = s.read.schema(m0.schema).option("header", "true").csv(s"$base/csv")
        val json = s.read.schema(m1.schema).json(s"$base/json")
        val orc = s.read.schema(m2.schema).orc(s"$base/orc")
        csv.unionByName(json).unionByName(orc)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            dsum(col("o_totalprice")).as("total"),
            min(col("day_num")).as("first_day"),
            max(col("day_num")).as("last_day"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
          CAST(MIN(datediff('day', TIMESTAMP '1990-01-01', o_orderdate)) AS INT) AS first_day,
          CAST(MAX(datediff('day', TIMESTAMP '1990-01-01', o_orderdate)) AS INT) AS last_day
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))
  )
}
