#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: load each Verify output parquet,
run the matching oracle SQL in DuckDB over the same sf dir's tables, sort columns by
name + rows, and compare values exactly. Usage: check_oracle.py <sfDir> <verifyOutDir>."""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for q, sql in sorted(oracle.items()):
    rd = f"{out_dir}/{q}"
    if not os.path.isdir(rd):
        print(f"[MISS ] {q}: no spark output"); fails += 1; continue
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{rd}/*.parquet")])
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"[ERR  ] {q}: {e}"); fails += 1; continue
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    d = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(s.columns) != list(d.columns):
        print(f"[SCHEMA] {q}: spark={list(s.columns)} duck={list(d.columns)}"); fails += 1; continue
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    d = d.sort_values(by=list(d.columns)).reset_index(drop=True)
    if len(s) != len(d):
        print(f"[ROWS ] {q}: spark={len(s)} duck={len(d)}"); fails += 1; continue
    # Driver parity: the hash compare is dtype-sensitive (a DuckDB HUGEINT reaches
    # pandas as float64 and hashes "3.0" vs spark's int64 "3"), so flag numeric-kind
    # mismatches (int vs float) even when values compare equal as objects.
    kind_mismatch = [c for c in s.columns if s[c].dtype.kind != d[c].dtype.kind]
    if kind_mismatch:
        print(f"[DTYPE] {q}: kind differs on {[(c, str(s[c].dtype), str(d[c].dtype)) for c in kind_mismatch]}")
        fails += 1
        continue
    try:
        eq = s.astype(object).equals(d.astype(object))
    except Exception:
        eq = False
    if not eq:
        diff = (s != d).any(axis=1)
        print(f"[VALUE] {q}: {int(diff.sum())}/{len(s)} rows differ; first:")
        print(pd.concat([s[diff].head(3).add_prefix("s_"), d[diff].head(3).add_prefix("d_")], axis=1))
        fails += 1
    else:
        print(f"[OK   ] {q}: {len(s)} rows")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
