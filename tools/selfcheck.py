#!/usr/bin/env python
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python tools/selfcheck.py <sfDir> <verifyOutDir> [name...]

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB against the
parquet tables in <sfDir>, loads the Spark result parquet from
<verifyOutDir>/<name>/, sorts columns by name + rows by all columns, and
compares cell values (exact for non-floats, 1e-9 relative for floats —
plus a strict-exact report so we know which queries rely on tolerance).
"""
import json
import os, math, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

def cells_equal(a, b, tol):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        if tol == 0:
            return a == b
        return a == b or abs(a - b) <= tol * max(1.0, abs(a), abs(b))
    return str(a) == str(b)

def compare(spark_df, duck_df, tol):
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return f"COLS spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
    if len(spark_df) != len(duck_df):
        return f"ROWS spark={len(spark_df)} duck={len(duck_df)}"
    a, b = norm(spark_df), norm(duck_df)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            x = None if (x is pd.NaT or (isinstance(x, float) and pd.isna(x) and not isinstance(y, float))) else x
            y = None if (y is pd.NaT or (isinstance(y, float) and pd.isna(y) and not isinstance(x, float))) else y
            if x is not None and hasattr(x, "to_pydatetime"):
                x = x.to_pydatetime()
            if y is not None and hasattr(y, "to_pydatetime"):
                y = y.to_pydatetime()
            if not cells_equal(x, y, tol):
                return f"CELL col={col} row={i} spark={x!r} duck={y!r}"
    return None

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    # Stale-dump guard (round 20): graft.Verify stamps <out>/run_started
    # before writing any dump. A query that throws during Verify leaves the
    # PREVIOUS run's dump in place; comparing it would silently pass a
    # broken query (this masked one real failure in round 19). Any dump
    # older than the marker is a loud FAIL, and a missing marker means the
    # dump dir predates the guard — re-run graft.Verify.
    marker = f"{out_dir}/run_started"
    if not os.path.exists(marker):
        sys.exit(f"FATAL {out_dir}/run_started missing: dumps predate the "
                 "stale-dump guard; re-run graft.Verify into this dir")
    run_started = os.path.getmtime(marker)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if os.path.getmtime(f"{out_dir}/oracle_sql.json") < run_started:
        sys.exit("FATAL oracle_sql.json predates run_started: "
                 "the Verify run did not complete; re-run graft.Verify")
    con = duckdb.connect()
    for t in TABLES:
        # a table is either a single parquet file (driver testdata) or a
        # Spark-written directory of part files (ScaleBench corpus)
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    n_pass = n_exact = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        newest = max(os.path.getmtime(f) for f in files)
        if newest < run_started:
            print(f"FAIL {name}: STALE dump (written "
                  f"{run_started - newest:.0f}s before this Verify run "
                  "started — the query likely threw during Verify)")
            n_fail += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        err = compare(spark_df, duck_df, 1e-9)
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            strict = compare(spark_df, duck_df, 0)
            if strict:
                print(f"PASS {name} (tolerance only: {strict})")
            else:
                n_exact += 1
                print(f"PASS {name} (exact)")
            n_pass += 1
    print(f"\n{n_pass} pass ({n_exact} exact), {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
