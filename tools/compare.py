#!/usr/bin/env python3
"""Local replica of the driver's correctness compare: run each oracle SQL
in DuckDB over the sfDir parquet tables, compare row/schema/hash with the
Spark parquet dumps from graft.Verify. Dev-loop tool only (driver-side
python allowed for validation)."""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
# optional 3rd arg: comma-separated query subset — compare only those
# (for targeted re-verification when the full oracle side, e.g. the
# sf1.0 shingle self-joins, is too slow to re-run whole)
subset = None
if len(sys.argv) > 3:
    subset = {q.strip() for q in sys.argv[3].split(",") if q.strip()}
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
# a misspelled subset name must fail loudly, not skip silently — a
# compare that matched nothing would print nothing and exit 0 (green)
if subset is not None and (not subset or subset - set(oracle)):
    sys.exit(f"subset names not in oracle_sql.json: "
             f"{sorted(subset - set(oracle)) or '(empty subset)'}")
ok = True
for q, sql in sorted(oracle.items()):
    if subset is not None and q not in subset:
        continue
    spark_dir = f"{outdir}/{q}"
    if not os.path.isdir(spark_dir):
        print(f"{q}: MISSING spark output"); ok = False; continue
    sp = con.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
    try:
        du = con.sql(sql).df()
    except Exception as e:
        print(f"{q}: ORACLE SQL ERROR {e}"); ok = False; continue
    sp = sp[sorted(sp.columns)]
    du = du[sorted(du.columns)]
    if list(sp.columns) != list(du.columns):
        print(f"{q}: SCHEMA MISMATCH {list(sp.columns)} vs {list(du.columns)}")
        ok = False; continue
    if len(sp) != len(du):
        print(f"{q}: ROWS {len(sp)} vs {len(du)}"); ok = False; continue
    if len(sp) == 0:
        print(f"{q}: OK rows=0 (empty both sides)"); continue
    sps = sp.astype(str).apply(lambda r: "\x01".join(r), axis=1).sort_values().tolist()
    dus = du.astype(str).apply(lambda r: "\x01".join(r), axis=1).sort_values().tolist()
    if sps != dus:
        diff = [(a, b) for a, b in zip(sps, dus) if a != b][:5]
        print(f"{q}: HASH MISMATCH rows={len(sp)}; first diffs:")
        for a, b in diff:
            print(f"  spark: {a!r}\n  duck : {b!r}")
        ok = False; continue
    print(f"{q}: OK rows={len(sp)}")
sys.exit(0 if ok else 1)
