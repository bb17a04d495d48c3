#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over <sfDir>/*.parquet tables, and
compares after sorting columns by name and rows by all columns.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(f)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for qdir in sorted(glob.glob(f"{out_dir}/*/")):
    name = os.path.basename(qdir.rstrip("/"))
    spark_df = None
    try:
        spark_df = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
    except Exception as e:
        results[name] = f"SPARK-READ-FAIL {e}"
        continue
    if name not in oracle:
        results[name] = f"rows-only rows={len(spark_df)}" + (" EMPTY!" if len(spark_df) == 0 else "")
        continue
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        results[name] = f"ORACLE-FAIL {str(e)[:300]}"
        continue

    def norm(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)

    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        results[name] = f"SCHEMA-MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
    elif len(a) != len(b):
        results[name] = f"ROWCOUNT spark={len(a)} duck={len(b)}"
    else:
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            results[name] = f"OK rows={len(a)}"
        except AssertionError as e:
            # find first differing cell for debugging
            diff = None
            for c in a.columns:
                neq = a[c] != b[c]
                try:
                    both_nan = a[c].isna() & b[c].isna()
                    neq = neq & ~both_nan
                except Exception:
                    pass
                if neq.any():
                    i = neq.idxmax()
                    diff = f"col={c} row={i} spark={a[c][i]!r} duck={b[c][i]!r}"
                    break
            results[name] = f"VALUE-MISMATCH {diff}"

bad = 0
for k in sorted(results):
    ok = results[k].startswith("OK") or results[k].startswith("rows-only rows")
    if "EMPTY" in results[k]:
        ok = False
    if not ok:
        bad += 1
    print(("PASS " if ok else "FAIL ") + k + ": " + results[k])
print(f"\n{len(results)-bad}/{len(results)} pass")
sys.exit(1 if bad else 0)
