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
    p = f"{sfdir}/{t}.parquet"
    # GenScale writes Spark directory-layout stores; the testdata ships
    # single files — register either
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.sql(f"CREATE VIEW {t} AS FROM '{src}'")

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
    # type parity (a stricter driver compare would fail on dtype drift even
    # when values match — e.g. int32 row_number vs BIGINT, DATE vs TIMESTAMP)
    import pyarrow.parquet as _pq
    pq_file = next(p for p in os.listdir(d) if p.endswith(".parquet"))
    spark_types = {f.name: str(f.type) for f in _pq.read_schema(os.path.join(d, pq_file))}
    rel = con.sql(oracle[name])
    duck_types = dict(zip(rel.columns, [str(t) for t in rel.types]))
    norm = {"int64": "BIGINT", "int32": "INTEGER", "double": "DOUBLE",
            "float": "FLOAT", "string": "VARCHAR", "large_string": "VARCHAR",
            "bool": "BOOLEAN"}
    tmismatch = []
    for c, st in spark_types.items():
        s = norm.get(st, st)
        if st.startswith("decimal"):
            s = st.replace("decimal128", "DECIMAL").replace(" ", "")
        if st.startswith("timestamp"):
            s = "TIMESTAMP"
        d2 = duck_types.get(c, "?").replace(" ", "")
        if d2.startswith("TIMESTAMP"):
            d2 = "TIMESTAMP"
        if s != d2:
            tmismatch.append(f"{c}: {st} vs {duck_types.get(c)}")
    if tmismatch:
        fails.append(f"{name}: TYPES differ: {'; '.join(tmismatch)}")
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
