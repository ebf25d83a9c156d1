#!/usr/bin/env python3
"""Prototype the round-3 TPC-H-adaptation oracles in DuckDB before writing
the Spark twins. Prints row count + first rows for each."""
import sys
import duckdb

d = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["part", "supplier", "customer", "orders", "lineitem", "nation", "region"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")

Q = {}

# q02 flavor: min-cost supplier per part (cost := min unit price ever shipped),
# EUROPE suppliers, p_size=15 STANDARD parts — correlated min subquery.
Q["q02_min_cost_supplier"] = """
WITH cost AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY 1, 2),
eur AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE')
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
FROM part JOIN cost ON p_partkey = l_partkey
JOIN eur ON l_suppkey = s_suppkey
WHERE p_size = 15 AND p_type = 'STANDARD'
  AND unit_cost = (SELECT MIN(c2.unit_cost) FROM cost c2
                   JOIN eur e2 ON c2.l_suppkey = e2.s_suppkey
                   WHERE c2.l_partkey = p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
"""

# q07: bidirectional trade volume between two nations by ship year.
Q["q07_nation_trade"] = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  EXTRACT(year FROM l_shipdate) AS l_year,
  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""

# q08: market share of NATION_5 suppliers in ASIA-customer STANDARD-part revenue.
Q["q08_market_share"] = """
WITH vol AS (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
    l_extendedprice * (1.0 - l_discount) AS volume,
    n1.n_name AS supp_nation
  FROM lineitem JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region ON n2.n_regionkey = r_regionkey
  WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')
SELECT o_year,
  CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
    / CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS mkt_share
FROM vol GROUP BY o_year ORDER BY o_year
"""

# q09: profit on 'red' parts by supplier nation and ship year (no partsupp →
# profit is the discounted price alone).
Q["q09_product_profit"] = """
SELECT n_name AS nation, EXTRACT(year FROM l_shipdate) AS o_year,
  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS profit
FROM lineitem JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE 'red%'
GROUP BY 1, 2 ORDER BY nation, o_year DESC
"""

# q10: top 20 customers by returned revenue in a quarter.
Q["q10_returned_items"] = """
SELECT c_custkey, c_name,
  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
  c_acctbal, n_name, c_mktsegment
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1995-10-01' AND o_orderdate < TIMESTAMP '1996-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey LIMIT 20
"""

# q12: shipping-delay buckets × priority-class conditional counts
# (no l_shipmode/commitdate → delay days o_orderdate→l_shipdate).
Q["q12_ship_delay"] = """
SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 30 THEN 'fast'
            WHEN datediff('day', o_orderdate, l_shipdate) <= 60 THEN 'normal'
            ELSE 'slow' END AS delay_bucket,
  COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
  COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY 1 ORDER BY 1
"""

# q13: distribution of per-customer order counts (left outer join keeps
# zero-order customers), excluding LOW-priority orders from the count.
Q["q13_customer_distribution"] = """
WITH c_orders AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey)
SELECT c_count, COUNT(*) AS custdist
FROM c_orders GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

# q14: promo revenue share in one ship-month.
Q["q14_promo_revenue"] = """
SELECT CAST(100.00 * SUM(CAST(CASE WHEN p_type = 'PROMO'
      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
    / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
"""

# q15: supplier(s) achieving max quarterly revenue (scalar max subquery).
Q["q15_top_supplier"] = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""

# q16: distinct-supplier counts per part group, suppliers with negative
# balance excluded via NOT IN (supply relation := distinct lineitem pairs).
Q["q16_supplier_counts"] = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) sup
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

# q19: disjunctive brand/size/quantity predicate join.
Q["q19_disjunctive_revenue"] = """
SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""

# q20: suppliers who shipped >80 units of some 'hot' part in 1996 (nested
# IN subqueries with grouped HAVING standing in for the availqty check).
Q["q20_heavy_suppliers"] = """
SELECT s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_3', 'NATION_4', 'NATION_5')
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'hot%')
      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(l_quantity) > 45.0)
ORDER BY s_name
"""

# q21: suppliers solely at fault — their item returned in a multi-supplier
# order where nobody else's was (correlated EXISTS + NOT EXISTS).
Q["q21_sole_fault"] = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
  AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4', 'NATION_5')
  AND EXISTS (SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R')
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
"""

# q22: rich dormant customers per nation (scalar avg subquery + NOT EXISTS).
Q["q22_dormant_rich"] = """
SELECT c_nationkey, COUNT(*) AS numcust,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal)
                   FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_nationkey ORDER BY c_nationkey
"""

for name, sql in Q.items():
    try:
        rows = con.execute(sql).fetchall()
        cols = [c[0] for c in con.description]
        print(f"== {name}: {len(rows)} rows  cols={cols}")
        for r in rows[:3]:
            print("   ", r)
    except Exception as e:
        print(f"== {name}: ERROR {e}")
