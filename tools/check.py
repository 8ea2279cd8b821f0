#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL
in DuckDB against the fixture tables and compare (column-name-sorted,
row-sorted, exact) with the parquet the Verify main dumped.

Usage: python3 tools/check.py [sfDir] [verifyOutDir]
"""
import sys, os, glob, json
import duckdb
import pandas as pd
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
n_pass = n_fail = 0
# Verify writes per-query exceptions here; a failed query dumps no
# parquet dir, so without this it would vanish from the report
fail_path = f"{out}/_failures.json"
failed = set()
if os.path.exists(fail_path):
    for name, msg in sorted(json.load(open(fail_path)).items()):
        print(f"FAIL {name}: query threw: {msg}")
        n_fail += 1
        failed.add(name)
for name in sorted(os.listdir(out)):
    if name in failed:
        # already counted above; any dir of that name is a partial
        # write (or stale from a prior Verify into the same outDir) —
        # comparing it would double-count and muddy the report
        continue
    resdir = os.path.join(out, name)
    if not os.path.isdir(resdir):
        continue
    files = glob.glob(f"{resdir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no result parquet")
        n_fail += 1
        continue
    got = con.sql(f"SELECT * FROM '{resdir}/*.parquet'").df()
    if name not in oracle:
        print(f"----  {name}: no oracle ({len(got)} rows)")
        continue
    try:
        want = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        n_fail += 1
        continue
    # array-typed cells (numpy arrays / lists) are unhashable — canonicalize
    for df in (got, want):
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].map(
                    lambda v: tuple(v.tolist()) if isinstance(v, np.ndarray)
                    else tuple(v) if isinstance(v, list) else v)
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        print(f"FAIL {name}: columns {gc} vs {wc}")
        n_fail += 1
        continue
    g = got[gc].sort_values(gc, kind="mergesort").reset_index(drop=True)
    w = want[wc].sort_values(wc, kind="mergesort").reset_index(drop=True)
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
        n_fail += 1
        continue
    bad = []
    for c in gc:
        a, b = g[c], w[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            eq = np.isclose(a.astype(float), b.astype(float),
                            rtol=0, atol=0, equal_nan=True)
            exact = eq.all()
        else:
            try:
                exact = (a.astype(object).where(pd.notna(a), None)
                         == b.astype(object).where(pd.notna(b), None)).all()
            except Exception:
                exact = False
        if not exact:
            bad.append(c)
    if bad:
        print(f"FAIL {name}: value mismatch in {bad}")
        for c in bad[:2]:
            diff = g[c] != w[c]
            idx = diff[diff].index[:3]
            for i in idx:
                print(f"   row{i} {c}: got={g[c][i]!r} want={w[c][i]!r}")
        n_fail += 1
    else:
        print(f"PASS  {name} ({len(g)} rows)")
        n_pass += 1
print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} oracles")
sys.exit(1 if n_fail else 0)
