#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs DuckDB on each SparkEntry.oracleSql entry (tables = parquet files in the
sf dir, registered as views by name) and compares against the Spark result
parquet written by graft.Verify. Columns sorted by name, rows sorted by all
columns, values compared exactly (strict superset of any reasonable hash
compare). Usage:
    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    spark_dir = f"{out_dir}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"[MISS] {name}: no spark output"); fails.append(name); continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
        want = con.execute(sql).df()
    except Exception as e:
        print(f"[ERR ] {name}: {e}"); fails.append(name); continue
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        print(f"[COLS] {name}: spark={list(got.columns)} oracle={list(want.columns)}")
        fails.append(name); continue
    if len(got) != len(want):
        print(f"[ROWS] {name}: spark={len(got)} oracle={len(want)}")
        fails.append(name); continue
    # Driver-hash hazard scan: the driver's gate reads the SPARK parquet
    # via pandas/pyarrow, where DECIMAL arrives as Python Decimal (never
    # hash-equal to DuckDB's floats) and array columns crash sort_values
    # (round-1 h2). duckdb's .df() coerces DECIMAL to float64, hiding the
    # hazard — so the scan must go through pandas.read_parquet, the same
    # path the driver takes.
    import decimal
    import numpy as np
    hazard = None
    try:
        praw = pd.read_parquet(spark_dir)
    except Exception as e:
        print(f"[HAZ ] {name}: pandas cannot read spark output: {e}")
        fails.append(name); continue
    for c in praw.columns:
        s = praw[c].dropna()
        if len(s) and isinstance(
                s.iloc[0], (decimal.Decimal, np.ndarray, list, dict)):
            hazard = (c, type(s.iloc[0]).__name__)
            break
    if hazard:
        c, t = hazard
        print(f"[HAZ ] {name}: spark col={c} is {t} via pandas — "
              f"driver hash will fail")
        fails.append(name); continue
    key = list(got.columns)
    g = got.sort_values(key, na_position="last").reset_index(drop=True)
    w = want.sort_values(key, na_position="last").reset_index(drop=True)
    # normalize dtypes for compare (decimal objects vs floats etc.)
    mismatch = None
    for c in key:
        gv, wv = g[c], w[c]
        try:
            eq = (gv.astype(str) == wv.astype(str))
        except Exception:
            eq = gv == wv
        if not eq.all():
            i = (~eq).idxmax()
            mismatch = (c, i, gv[i], wv[i], (~eq).sum())
            break
    if mismatch:
        c, i, a, b, n = mismatch
        print(f"[VALS] {name}: col={c} row={i} spark={a!r} oracle={b!r} ({n} diffs)")
        fails.append(name)
    else:
        print(f"[ OK ] {name}: {len(got)} rows x {len(key)} cols exact match")

print(f"\n{len(oracle)-len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
