#!/usr/bin/env python3
"""Replicate the driver's DuckDB oracle comparison over a Verify output dir.

Usage: python3 tools/oracle_check.py /tmp/vout /root/testdata/sf0.01
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

vout, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[: -len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(vout, "oracle_sql.json")))
ok, bad, skipped = [], [], []
for name, sql in sorted(oracle.items()):
    outdir = os.path.join(vout, name)
    if not os.path.isdir(outdir):
        skipped.append((name, "no output dir"))
        continue
    try:
        got = pd.read_parquet(outdir)
        want = con.execute(sql).df()
    except Exception as e:
        bad.append((name, f"exec error: {e}"))
        continue
    if len(got) != len(want):
        bad.append((name, f"rows {len(got)} != {len(want)}"))
        continue
    gcols = sorted(got.columns)
    wcols = sorted(want.columns)
    if gcols != wcols:
        bad.append((name, f"schema {gcols} != {wcols}"))
        continue
    g = got[gcols].sort_values(gcols).reset_index(drop=True)
    w = want[gcols].sort_values(gcols).reset_index(drop=True)
    mismatch = None
    for c in gcols:
        gv, wv = g[c], w[c]
        if gv.dtype.kind == "f" or wv.dtype.kind == "f":
            if not np.allclose(gv.astype(float), wv.astype(float),
                               rtol=0, atol=1e-9, equal_nan=True):
                mismatch = c
                break
        else:
            if not (gv.astype(str).values == wv.astype(str).values).all():
                mismatch = c
                break
    if mismatch:
        bad.append((name, f"column {mismatch} differs"))
    else:
        ok.append(name)

print(f"OK: {len(ok)}  BAD: {len(bad)}  SKIPPED: {len(skipped)}")
for n, why in bad:
    print(f"  BAD {n}: {why}")
for n, why in skipped:
    print(f"  SKIP {n}: {why}")
sys.exit(1 if bad else 0)
