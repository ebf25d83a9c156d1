#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mimicking the driver:
run each oracle SQL in DuckDB over the same testdata parquet, load the
Spark result parquet, sort columns by name + rows, compare values.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb, pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamp-ish columns to ns, stringify everything for a
    # robust order-insensitive compare
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def cmp_cell(a, b) -> bool:
    # STRICT, mimicking the driver's exact value hash: an int on one side
    # and a float on the other (e.g. DuckDB SUM(BIGINT)->HUGEINT->float64)
    # stringifies differently ("2279" vs "2279.0") and MUST fail here.
    if pd.isna(a) and pd.isna(b):
        return True
    fa, fb = isinstance(a, float), isinstance(b, float)
    if fa != fb:
        return False
    if fa and fb:
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return str(a) == str(b)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        try:
            want = norm(con.execute(sql).fetchdf())
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_RESULT"
            continue
        got = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        if list(got.columns) != list(want.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(got.columns)} duck={list(want.columns)}"
            continue
        if len(got) != len(want):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(got)} duck={len(want)}"
            continue
        bad = None
        for col in got.columns:
            for i, (a, b) in enumerate(zip(got[col], want[col])):
                if not cmp_cell(a, b):
                    bad = f"VALUE_MISMATCH col={col} row={i} spark={a!r} duck={b!r}"
                    break
            if bad:
                break
        results[name] = bad or "OK"
    n_ok = sum(1 for v in results.values() if v == "OK")
    for name, v in sorted(results.items()):
        print(f"{'PASS' if v == 'OK' else 'FAIL'} {name}: {v}")
    # queries without oracle → rows-only
    declared = set(oracle)
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        qn = d.rstrip("/").split("/")[-1]
        if qn not in declared:
            n = sum(len(pd.read_parquet(f)) for f in glob.glob(d + "*.parquet"))
            print(f"INFO {qn}: no oracle, rows={n}")
    print(f"\n{n_ok}/{len(results)} oracles pass")
    return 0 if n_ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
