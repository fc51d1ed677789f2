#!/usr/bin/env python3
"""Subset variant of compare.py: compare only the named queries against
their DuckDB oracles (third arg, comma-separated). Useful when a change
touches a few gates and the full oracle side (shingle self-joins) is
too slow to re-run whole — e.g. targeted sf1.0 re-verification.
Usage: python3 tools/cmp_subset.py <sfdir> <verify_outdir> <q1,q2,...>
"""
import sys, json, glob, os
import duckdb
sfdir, outdir = sys.argv[1], sys.argv[2]
subset = sys.argv[3].split(",")
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = True
for q in subset:
    sql = oracle[q]
    sp = con.sql(f"SELECT * FROM read_parquet('{outdir}/{q}/*.parquet')").df()
    du = con.sql(sql).df()
    sp = sp[sorted(sp.columns)]; du = du[sorted(du.columns)]
    if list(sp.columns) != list(du.columns):
        print(f"{q}: SCHEMA MISMATCH {list(sp.columns)} vs {list(du.columns)}"); ok=False; continue
    if len(sp) != len(du):
        print(f"{q}: ROWS {len(sp)} vs {len(du)}"); ok=False; continue
    sps = sp.astype(str).apply(lambda r: "\x01".join(r), axis=1).sort_values().tolist()
    dus = du.astype(str).apply(lambda r: "\x01".join(r), axis=1).sort_values().tolist()
    if sps != dus:
        print(f"{q}: HASH MISMATCH rows={len(sp)}")
        for a,b in [(a,b) for a,b in zip(sps,dus) if a!=b][:3]: print(f"  spark: {a!r}\n  duck : {b!r}")
        ok=False; continue
    print(f"{q}: OK rows={len(sp)}")
sys.exit(0 if ok else 1)
