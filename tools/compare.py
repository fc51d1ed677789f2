#!/usr/bin/env python3
"""Local replica of the driver's correctness compare: run each oracle SQL
in DuckDB over the sfDir parquet tables, compare row/schema/hash with the
Spark parquet dumps from graft.Verify. Dev-loop tool only (driver-side
python allowed for validation)."""
import sys, json, glob, os
import duckdb

args = [a for a in sys.argv[1:] if not a.startswith("--")]
# --json=PATH: also write the driver-artifact-shaped per-query dict
# (rows_match/schema_match/hash_match/spark_rows/oracle_rows/err) — the
# standing CORRECTNESS_sf1_r{N}.json sweeps commit this
json_out = next((a.split("=", 1)[1] for a in sys.argv[1:]
                 if a.startswith("--json=")), None)
sfdir, outdir = args[0], args[1]
# optional 3rd arg: comma-separated query subset — compare only those
# (for targeted re-verification when the full oracle side, e.g. the
# sf1.0 shingle self-joins, is too slow to re-run whole)
subset = None
if len(args) > 2:
    subset = {q.strip() for q in args[2].split(",") if q.strip()}
results = {}
def record(q, rows_match, schema_match, hash_match, sp_rows, du_rows, err=None):
    results[q] = {"rows_match": rows_match, "schema_match": schema_match,
                  "hash_match": hash_match, "spark_rows": sp_rows,
                  "oracle_rows": du_rows, "err": err}
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
        print(f"{q}: MISSING spark output"); ok = False
        record(q, False, False, False, 0, 0, "missing spark output"); continue
    sp = con.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
    try:
        du = con.sql(sql).df()
    except Exception as e:
        print(f"{q}: ORACLE SQL ERROR {e}"); ok = False
        record(q, False, False, False, len(sp), 0, f"oracle sql: {e}"[:200])
        continue
    sp = sp[sorted(sp.columns)]
    du = du[sorted(du.columns)]
    if list(sp.columns) != list(du.columns):
        print(f"{q}: SCHEMA MISMATCH {list(sp.columns)} vs {list(du.columns)}")
        ok = False
        record(q, len(sp) == len(du), False, False, len(sp), len(du)); continue
    if len(sp) != len(du):
        print(f"{q}: ROWS {len(sp)} vs {len(du)}"); ok = False
        record(q, False, True, False, len(sp), len(du)); continue
    if len(sp) == 0:
        print(f"{q}: OK rows=0 (empty both sides)")
        record(q, True, True, True, 0, 0); continue
    sps = sp.astype(str).apply(lambda r: "\x01".join(r), axis=1).sort_values().tolist()
    dus = du.astype(str).apply(lambda r: "\x01".join(r), axis=1).sort_values().tolist()
    if sps != dus:
        diff = [(a, b) for a, b in zip(sps, dus) if a != b][:5]
        print(f"{q}: HASH MISMATCH rows={len(sp)}; first diffs:")
        for a, b in diff:
            print(f"  spark: {a!r}\n  duck : {b!r}")
        ok = False
        record(q, True, True, False, len(sp), len(du)); continue
    print(f"{q}: OK rows={len(sp)}")
    record(q, True, True, True, len(sp), len(du))
if json_out:
    with open(json_out, "w") as f:
        json.dump(results, f, indent=0, sort_keys=True)
    print(f"wrote {json_out} ({len(results)} queries)")
sys.exit(0 if ok else 1)
