#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify output
against the DuckDB oracles (sorted columns + sorted rows, exact compare).
Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.sql(f"CREATE VIEW {t} AS FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, passes, skips = [], [], []
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    got = con.sql(f"FROM '{d}/*.parquet'").df()
    got = got.reindex(sorted(got.columns), axis=1)
    if name not in oracle:
        skips.append(f"{name}: no oracle ({len(got)} rows)")
        continue
    try:
        want = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append(f"{name}: ORACLE SQL ERROR: {e}")
        continue
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        fails.append(f"{name}: columns differ: got {list(got.columns)} want {list(want.columns)}")
        continue
    gs = got.sort_values(by=list(got.columns), ignore_index=True)
    ws = want.sort_values(by=list(want.columns), ignore_index=True)
    if len(gs) != len(ws):
        fails.append(f"{name}: row count {len(gs)} vs {len(ws)}")
        continue
    try:
        import pandas as pd
        pd.testing.assert_frame_equal(gs, ws, check_dtype=False, check_exact=True)
        passes.append(name)
    except AssertionError as e:
        fails.append(f"{name}: VALUES differ: {str(e)[:500]}")

print(f"PASS {len(passes)}: {' '.join(passes)}")
for s in skips:
    print("SKIP", s)
for f in fails:
    print("FAIL", f)
sys.exit(1 if fails else 0)
