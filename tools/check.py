#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output vs
DuckDB oracle on the same parquet tables. Usage:
  python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = []
for name in sorted(oracle):
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        fails.append((name, "missing spark output"))
        continue
    got = canon(pd.read_parquet(spark_path))
    want = canon(con.sql(oracle[name]).df())
    status = []
    if list(got.columns) != list(want.columns):
        status.append(f"cols spark={list(got.columns)} duck={list(want.columns)}")
    elif len(got) != len(want):
        status.append(f"rows spark={len(got)} duck={len(want)}")
    else:
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                if a.dtype != b.dtype:
                    status.append(f"dtype[{c}] spark={a.dtype} duck={b.dtype}")
                eq = (a.astype(str).fillna("<null>") == b.astype(str).fillna("<null>"))
                if not eq.all():
                    i = (~eq).idxmax()
                    status.append(f"val[{c}] row{i}: spark={a[i]!r} duck={b[i]!r} "
                                  f"(+{(~eq).sum()-1} more)")
            except Exception as e:
                status.append(f"cmp[{c}] {e}")
    if status:
        fails.append((name, "; ".join(status)))
        print(f"FAIL {name}: {fails[-1][1]}")
    else:
        print(f"OK   {name} ({len(got)} rows)")

# rows-only queries (no oracle)
for p in sorted(glob.glob(f"{out_dir}/q*")):
    name = os.path.basename(p)
    if name not in oracle and os.path.isdir(p):
        n = len(pd.read_parquet(p))
        print(f"ROWS {name}: {n}")

print(f"\n{len(fails)} failures / {len(oracle)} oracle queries")
sys.exit(1 if fails else 0)
