#!/usr/bin/env python3
"""Dev-only test-data generator (driver-side tooling, like compare.py —
NOT part of the Scala library). Synthesizes a larger-scale testdata
directory with the same schemas and statistical shape as the driver's
/root/testdata/sf* tables, so the Verify + DuckDB compare can be run
one decade above the largest driver-provided scale (the "sf1.0 sweep"
of VERDICT round 3, missing item #3).

Shape mimicked from the driver tables (inspected at sf0.001/0.01/0.1):
  - documents: bag-of-tech-words text (15-90 words), ~5% near-dup pairs
    (1-word perturbation of an earlier long doc -> Jaccard ~0.9-0.99,
    small simhash hamming), lang skewed to 'en', source src0..src19
  - embeddings: 128-dim float vectors ~N(0, 0.12) with an enforced
    threshold margin (no random pair above cosine 0.45 — see
    gen_embeddings), labels 0..9, planted near-dup pairs (cosine ~0.999)
    every 500 vectors
  - events: 30 days of exponential arrivals, 5 event types, JSON props
  - TPC-ish star tables with the driver's column sets and ratios

Row counts default to 10x sf0.1 EXCEPT embeddings (1.5x rows at 2x
dim): the DuckDB verification oracles for the embedding family are
O(n^2 * d) all-pairs recomputations — at 20k vectors the ORACLE (not
the operator) needs ~25G intermediate rows. The operators under test
scale; the ground-truth recomputation is the bound.

Usage: python3 tools/gen_sf.py /tmp/sf1.0 [scale=10]
Deterministic: fixed seed, no external data.
"""
import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ("spark join stream order merge column group customer part value "
         "window big scan table vector row key data batch line sort fast "
         "slow small hash agg filter query the a and of is to in on "
         "index shuffle cache").split()
LANGS = ["en", "en", "en", "zh", "fr", "es", "de"]  # en-skewed like driver
ETYPES = ["view", "click", "purchase", "error", "signup"]


def write(outdir, name, table):
    # ~10+ row groups per table: a 100 TB production table scans as
    # thousands of splits, so the sweep should exercise multi-partition
    # scans too (a single row group serializes every narrow chain onto
    # one core, which only distorts the sweep's wall-clock)
    rg = max(1000, table.num_rows // 10)
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"),
                   row_group_size=rg)
    print(f"{name}: {table.num_rows} rows (row_group={rg})")


def gen_documents(rng, n):
    texts = []
    words_cache = []
    for i in range(n):
        if i % 20 == 5 and i >= 5 and len(words_cache[i - 5]) >= 40:
            # near-dup: 1-word perturbation of doc i-5
            ws = list(words_cache[i - 5])
            ws[int(rng.integers(0, len(ws)))] = VOCAB[int(rng.integers(0, len(VOCAB)))]
        else:
            ln = int(rng.integers(15, 91))
            ws = [VOCAB[int(k)] for k in rng.integers(0, len(VOCAB), ln)]
        words_cache.append(ws)
        texts.append(" ".join(ws))
    langs = [LANGS[int(k)] for k in rng.integers(0, len(LANGS), n)]
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs),
        "source": pa.array([f"src{i % 20}" for i in range(n)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def gen_embeddings(rng, n, dim=128):
    # THRESHOLD MARGIN BY CONSTRUCTION: production near-dup thresholds
    # sit with margin above the corpus noise floor — a fixture whose
    # random pairs graze the exact 0.5 threshold turns the gate into a
    # coin flip on the blocking LSH's boundary recall (measured: one
    # cos-0.516 pair in 95 borderline pairs missed at d=64/n=4000; the
    # boundary-recall property itself is measured in DatapipeSpec, not
    # here). d=128 puts random cosines at sigma~0.088, and base vectors
    # are redrawn until no base pair exceeds 0.40; planted dups sit at
    # ~0.999, so [0.45, 0.99] stays empty and blocking recall at the
    # planted pairs is ~1-1e-12.
    vecs = rng.normal(0, 0.12, (n, dim))
    for _ in range(50):
        u = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        cos = u @ u.T
        np.fill_diagonal(cos, 0.0)
        bad = np.unique(np.argwhere(np.triu(cos, 1) > 0.40)[:, 1])
        if len(bad) == 0:
            break
        vecs[bad] = rng.normal(0, 0.12, (len(bad), dim))
    else:
        raise AssertionError("margin rejection did not converge")
    for i in range(499, n, 500):  # planted near-dup of i-499
        vecs[i] = vecs[i - 499] + rng.normal(0, 0.005, dim)
    u = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cos = np.triu(u @ u.T, 1)
    inmargin = ((cos > 0.45) & (cos < 0.99)).sum()
    assert inmargin == 0, f"{inmargin} pairs inside the forbidden margin"
    vecs = vecs.astype(np.float32)
    return pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n), pa.int32()),
    })


def gen_events(rng, n, users):
    total_us = 30 * 86400 * 1_000_000
    gaps = rng.exponential(total_us / n, n)
    ts = np.datetime64("2024-01-01T00:00:00", "us") + \
        np.cumsum(gaps).astype("timedelta64[us]")
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, users, n), pa.int64()),
        "event_type": pa.array([ETYPES[int(k)] for k in
                                rng.integers(0, len(ETYPES), n)]),
        "value": pa.array(np.round(rng.uniform(0, 200, n), 2)),
        "props": pa.array([json.dumps({"k": int(k)})
                           for k in rng.integers(0, 100, n)]),
    })


def main():
    outdir = sys.argv[1]
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    os.makedirs(outdir, exist_ok=True)
    # documents/embeddings/events each get their own stream (rng_for
    # 1..3), so regenerating one of THOSE never shifts another. The five
    # TPC-ish tables below all draw sequentially from the single
    # rng_for(0) stream, so they reproduce only as a block in this
    # order — change any TPC table's size or order and every later TPC
    # table's content shifts. The recorded sf1.0 sweep used exactly
    # this script at scale=10; regenerate all-or-nothing to reproduce it.
    def rng_for(k):
        return np.random.default_rng(777 + k)
    rng = rng_for(0)
    n_docs = int(5000 * scale)
    # embeddings are oracle-bound (see header): 1.5x rows at 2x dim
    # keeps the O(n^2 d) DuckDB recomputation at the same cost as 10x
    # of the driver's d=64 would allow
    n_emb = int(2000 * (1.5 if scale >= 10 else scale))
    n_events = int(100000 * scale)
    n_orders = int(150000 * scale)
    n_li = int(600000 * scale)
    n_cust = int(15000 * scale)
    n_supp = int(1000 * scale)
    n_part = int(20000 * scale)

    write(outdir, "documents", gen_documents(rng_for(1), n_docs))
    write(outdir, "embeddings", gen_embeddings(rng_for(2), n_emb))
    write(outdir, "events", gen_events(rng_for(3), n_events, int(1500 * scale)))

    write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(["AFRICA", "AMERICA", "ASIA", "EUROPE",
                            "MIDDLE EAST"])}))
    write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))
    write(outdir, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_cust), 2)),
        "c_mktsegment": pa.array([["BUILDING", "AUTOMOBILE", "MACHINERY",
                                   "HOUSEHOLD", "FURNITURE"][int(k)]
                                  for k in rng.integers(0, 5, n_cust)])}))
    write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_supp), 2))}))
    write(outdir, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": pa.array([f"{['small','large','plated','brushed'][i % 4]} "
                            f"{['ring','box','case','drum'][(i // 4) % 4]}"
                            for i in range(n_part)]),
        "p_brand": pa.array([f"Brand#{int(k)}" for k in
                             rng.integers(0, 5, n_part)]),
        "p_type": pa.array([["ECONOMY", "STANDARD", "PROMO"][int(k)]
                            for k in rng.integers(0, 3, n_part)]),
        "p_size": pa.array(rng.integers(1, 50, n_part), pa.int32()),
        "p_retailprice": pa.array(np.round(rng.uniform(800, 2000, n_part), 2))}))
    write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(range(n_orders), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_orders), pa.int64()),
        "o_orderstatus": pa.array([["O", "F", "P"][int(k)] for k in
                                   rng.integers(0, 3, n_orders)]),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 400000, n_orders), 2)),
        "o_orderdate": pa.array(
            np.datetime64("1996-01-01") +
            rng.integers(0, 1500, n_orders).astype("timedelta64[D]"),
            pa.timestamp("us")),
        "o_orderpriority": pa.array([f"{int(k)+1}-X" for k in
                                     rng.integers(0, 5, n_orders)])}))
    write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_orders, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(float)),
        "l_extendedprice": pa.array(np.round(rng.uniform(1000, 100000, n_li), 2)),
        "l_discount": pa.array(np.round(rng.uniform(0, 0.1, n_li), 2)),
        "l_tax": pa.array(np.round(rng.uniform(0, 0.08, n_li), 2)),
        "l_returnflag": pa.array([["A", "N", "R"][int(k)] for k in
                                  rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array([["F", "O"][int(k)] for k in
                                  rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(
            np.datetime64("1996-01-01") +
            rng.integers(0, 1600, n_li).astype("timedelta64[D]"),
            pa.timestamp("us"))}))


if __name__ == "__main__":
    main()
