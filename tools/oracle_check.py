#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run each oracle SQL
in DuckDB over the testdata parquet and compare against the parquet the
Verify main dumped. Columns sorted by name before compare; rows compared
in emitted order and (fallback) sorted order. Dev-only tool — the shipped
Scala library has no Python dependency."""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df

def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return str(a) == str(b)

def frames_equal(a, b):
    if list(a.columns) != list(b.columns) or a.shape != b.shape:
        return False, f"shape/cols mismatch: {a.shape}{list(a.columns)} vs {b.shape}{list(b.columns)}"
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if not cell_eq(x, y):
                return False, f"col {c} row {i}: {x!r} != {y!r}"
    return True, ""

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        try:
            spark_df = norm(con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf())
            duck_df = norm(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        ok, why = frames_equal(spark_df, duck_df)
        if not ok:
            ss = spark_df.sort_values(by=list(spark_df.columns), ignore_index=True) if len(spark_df) else spark_df
            ds = duck_df.sort_values(by=list(duck_df.columns), ignore_index=True) if len(duck_df) else duck_df
            ok2, _ = frames_equal(ss, ds)
            tag = " (matches after sort — ordering only)" if ok2 else ""
            print(f"FAIL {name}: {why}{tag}")
            failures += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
    # queries without oracle → rows-only check
    import os
    for d in sorted(glob.glob(f"{out}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name in oracle:
            continue
        files = glob.glob(f"{d}/*.parquet")
        n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
        print(f"{'PASS' if n > 0 else 'WARN'} {name}: rows-only ({n} rows)")
    print(f"\n{failures} failures")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
