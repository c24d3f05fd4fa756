#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate:
run each oracle SQL in DuckDB over the sf tables and compare against the
parquet written by graft.Verify (sorted rows, exact values).

Usage: python3 tools/local_check.py [sfdir] [verify_out]
(Run `sbt "runMain graft.Verify <sfdir> <out>"` first.)
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails, passes, skips = [], [], []
for name in sorted(os.listdir(out)):
    dirp = f"{out}/{name}"
    if not os.path.isdir(dirp):
        continue
    got = con.execute(f"SELECT * FROM '{dirp}/*.parquet'").fetchdf()
    if name not in oracle:
        skips.append((name, len(got)))
        continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"columns differ: got {list(got.columns)} vs {list(exp.columns)}"))
        continue
    gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    if len(gs) != len(es):
        fails.append((name, f"row count: got {len(gs)} vs {len(es)}"))
        continue
    # exact compare (the driver hashes values; we want bit-exactness)
    try:
        pd.testing.assert_frame_equal(gs, es, check_dtype=False, check_exact=True)
        passes.append((name, len(gs)))
    except AssertionError as e:
        fails.append((name, str(e).split("\n")[0] + " | " + str(e).split("\n")[-1]))

for n, c in passes:
    print(f"PASS  {n} ({c} rows)")
for n, c in skips:
    print(f"SKIP  {n} (rows-only, {c} rows)")
for n, msg in fails:
    print(f"FAIL  {n}: {msg}")
print(f"\n{len(passes)} pass, {len(skips)} rows-only, {len(fails)} fail")
sys.exit(1 if fails else 0)
