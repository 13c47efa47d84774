#!/usr/bin/env python3
"""Synthesize a LARGER scale factor of the driver testdata for local
performance A/B work (the driver's round-end measurement has run at
sf=1.0, a directory that is not present between sessions).

This is a statistical twin, not a byte replica: every table mirrors the
schemas, cardinality ratios and value distributions measured on the real
/root/testdata/sf0.1 (documents: 30-word uniform vocab, 10-99 word docs,
5%% near-dup docs = another doc's text + " dup", ~0.16%% exact-dup pairs,
41/15/15/15/14 lang split, 20 even sources; embeddings: float32 unit
vectors dim 64, 10 labels; events/lineitem/orders/...: TPC-H-ish uniform
draws at 10x the sf0.1 counts). Output parquet uses the same
pyarrow-default row-group layout + snappy the driver files show.

Usage:  python tools/gen_scaled_sf.py [sf] [outdir]
        (defaults: sf=1.0, outdir=/root/testdata_synth/sf<sf>)

NEVER writes into /root/testdata (read-only driver data); the bench and
oracle contracts are unaffected — this feeds $SPARK_GRAFT_SF_DIR for
local measurement only.
"""

from __future__ import annotations

import datetime
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
PTYPES = ["LARGE", "MEDIUM", "ECONOMY", "PROMO", "SMALL", "STANDARD"]
SEGMENTS = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def _write(outdir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"), compression="snappy")
    print(f"  {name}: {table.num_rows} rows")


def gen_documents(rng: np.random.Generator, n_docs: int) -> pa.Table:
    lens = rng.integers(10, 100, size=n_docs)
    texts = [
        " ".join(np.take(VOCAB, rng.integers(0, len(VOCAB), size=ln)))
        for ln in lens
    ]
    # 5% near-dup docs: replace with another doc's text + " dup"
    n_near = n_docs // 20
    tgt = rng.choice(n_docs, size=n_near, replace=False)
    for t in tgt:
        src = int(rng.integers(0, n_docs))
        if src != t:
            texts[t] = texts[src] + " dup"
    # ~0.16% exact-dup pairs
    n_exact = int(round(0.0016 * n_docs))
    for _ in range(n_exact):
        i, j = rng.integers(0, n_docs, size=2)
        if i != j:
            texts[int(j)] = texts[int(i)]
    langs = rng.choice(LANGS, size=n_docs, p=LANG_P)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs.tolist(), pa.string()),
            "source": pa.array([f"src{i % 20}" for i in range(n_docs)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(rng: np.random.Generator, n: int, dim: int = 64) -> pa.Table:
    v = rng.standard_normal((n, dim)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(v.tolist(), pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, size=n), pa.int32()),
        }
    )


def gen_events(rng: np.random.Generator, n: int) -> pa.Table:
    base = datetime.datetime(2024, 1, 1).timestamp()
    span = 30 * 86400.0
    ts = np.sort(base + rng.random(n) * span)
    n_users = max(1, n // 67)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array((ts * 1e6).astype(np.int64), pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, n_users, size=n), pa.int64()),
            "event_type": pa.array(
                np.take(["signup", "purchase", "view", "click", "error"],
                        rng.integers(0, 5, size=n)).tolist(), pa.string()),
            "value": pa.array(np.round(rng.exponential(50.0, size=n), 2), pa.float64()),
            "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, size=n)], pa.string()),
        }
    )


def _days(rng, n, start, end):
    d0 = datetime.datetime(*start)
    span = (datetime.datetime(*end) - d0).days
    offs = rng.integers(0, span + 1, size=n)
    us = (np.int64(d0.timestamp() * 1e6)) + offs.astype(np.int64) * 86400_000_000
    return pa.array(us, pa.timestamp("us"))


def main() -> None:
    sf_arg = sys.argv[1] if len(sys.argv) > 1 else "1.0"
    sf = float(sf_arg)
    outdir = sys.argv[2] if len(sys.argv) > 2 else f"/root/testdata_synth/sf{sf_arg}"
    real = os.path.realpath(outdir)
    protected = os.path.realpath("/root/testdata")
    assert real != protected and not real.startswith(protected + os.sep), (
        "never write into driver testdata"
    )
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(42)
    mult = sf / 0.1  # counts below are the measured sf0.1 counts

    _write(outdir, "region", pa.table({
        "r_regionkey": pa.array(np.arange(5), pa.int64()),
        "r_name": pa.array(REGIONS, pa.string())}))
    _write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(np.arange(25), pa.int64()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)], pa.string()),
        "n_regionkey": pa.array(np.arange(25) % 5, pa.int64())}))

    n_supp = int(1000 * mult)
    _write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)], pa.string()),
        "s_nationkey": pa.array(rng.integers(0, 25, size=n_supp), pa.int64()),
        "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_supp), 2), pa.float64())}))

    n_part = int(20000 * mult)
    _write(outdir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array([f"{ADJS[int(a)]} {NOUNS[int(b)]}" for a, b in zip(
            rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))], pa.string()),
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(1, 26, n_part)], pa.string()),
        "p_type": pa.array(np.take(PTYPES, rng.integers(0, 6, n_part)).tolist(), pa.string()),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int64()),
        "p_retailprice": pa.array(np.round(rng.uniform(900, 1000, n_part), 2), pa.float64())}))

    n_cust = int(15000 * mult)
    _write(outdir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)], pa.string()),
        "c_nationkey": pa.array(rng.integers(0, 25, size=n_cust), pa.int64()),
        "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_cust), 2), pa.float64()),
        "c_mktsegment": pa.array(np.take(SEGMENTS, rng.integers(0, 5, n_cust)).tolist(), pa.string())}))

    n_ord = int(150000 * mult)
    _write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, size=n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.take(["P", "O", "F"], rng.integers(0, 3, n_ord)).tolist(), pa.string()),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 500000, n_ord), 2), pa.float64()),
        "o_orderdate": _days(rng, n_ord, (1995, 1, 1), (2001, 8, 1)),
        "o_orderpriority": pa.array(np.take(PRIORITIES, rng.integers(0, 5, n_ord)).tolist(), pa.string())}))

    n_li = int(600000 * mult)
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, size=n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, size=n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, size=n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, size=n_li), pa.int64()),
        "l_quantity": pa.array(rng.integers(1, 51, size=n_li).astype(np.float64), pa.float64()),
        "l_extendedprice": pa.array(np.round(rng.uniform(900, 105000, n_li), 2), pa.float64()),
        "l_discount": pa.array(np.round(rng.integers(0, 11, n_li) * 0.01, 2), pa.float64()),
        "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) * 0.01, 2), pa.float64()),
        "l_returnflag": pa.array(np.take(["N", "R", "A"], rng.integers(0, 3, n_li)).tolist(), pa.string()),
        "l_linestatus": pa.array(np.take(["F", "O"], rng.integers(0, 2, n_li)).tolist(), pa.string()),
        "l_shipdate": _days(rng, n_li, (1995, 1, 2), (2001, 11, 4))}))

    _write(outdir, "events", gen_events(rng, int(100000 * mult)))
    _write(outdir, "documents", gen_documents(rng, int(5000 * mult)))
    _write(outdir, "embeddings", gen_embeddings(rng, int(2000 * mult)))
    # bench.py checks for this sentinel before running
    open(os.path.join(outdir, "_DONE"), "w").close()
    print(f"wrote {outdir}")


if __name__ == "__main__":
    main()
