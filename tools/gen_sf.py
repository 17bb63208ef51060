"""Deterministic scale-factor generator for the round-5 sf1 scale curves.

The driver testdata tops out at sf0.1 (~600k-row lineitem — fits in
cache), so the 100x scale claims needed one more decade (VERDICT round-4
ask #4). The driver's own generator isn't available to re-run, so this
one is DISTRIBUTION-matched to the shipped corpus, not byte-matched:
same schemas, same categorical domains, same value ranges, same row-count
ratios (profiled from /root/testdata/sf0.01 — see the constants), same
planted near-dup rate in documents. Scale curves generated here are
self-consistent across decades (one generator for every point); the
sf0.1 point is cross-checked against the driver corpus in SCALING.md §9
to show the generator is representative. Seeded per (table) — rerun
reproduces identical files.

Usage: python tools/gen_sf.py SF OUT_DIR     # e.g. 1 /root/repo/.localdata/sf1
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# row counts at sf=1 (10x the shipped sf0.1; embeddings follow the
# corpus's own 4x-per-decade ratio: 500 @ 0.01, 2000 @ 0.1)
ROWS = {
    "lineitem": 6_000_000, "orders": 1_500_000, "customer": 150_000,
    "supplier": 10_000, "part": 200_000, "events": 1_000_000,
    "documents": 50_000, "embeddings": 8_000,
}

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = (["en"] * 43 + ["de"] * 15 + ["es"] * 14 + ["fr"] * 13 + ["zh"] * 15)
VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]
ADJ = ["small", "red", "blue", "hot", "large", "green", "cold", "shiny"]
NOUN = ["ring", "widget", "bolt", "gear", "gizmo", "cog", "washer", "pin"]

DAY_US = 86_400_000_000


def _rng(table: str) -> np.random.Generator:
    import zlib

    # crc32, not hash(): str hashing is salted per process and would
    # break the generator's rerun-identical contract
    return np.random.default_rng(zlib.crc32(f"zs-gen:{table}".encode()))


def _ts_col(days_base: str, us: np.ndarray) -> pa.Array:
    base = np.datetime64(days_base, "us")
    return pa.array(base + us.astype("timedelta64[us]"),
                    type=pa.timestamp("us"))


def gen(sf: float, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    n = {t: max(1, int(r * sf)) for t, r in ROWS.items()}

    pq.write_table(pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }), f"{out}/region.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }), f"{out}/nation.parquet")

    g = _rng("customer")
    k = n["customer"]
    pq.write_table(pa.table({
        "c_custkey": pa.array(range(k), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(k)],
        "c_nationkey": pa.array(g.integers(0, 25, k), pa.int32()),
        "c_acctbal": np.round(g.uniform(-1000, 10000, k), 2),
        "c_mktsegment": [SEGMENTS[i] for i in g.integers(0, 5, k)],
    }), f"{out}/customer.parquet")

    g = _rng("supplier")
    k = n["supplier"]
    pq.write_table(pa.table({
        "s_suppkey": pa.array(range(k), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(k)],
        "s_nationkey": pa.array(g.integers(0, 25, k), pa.int32()),
        "s_acctbal": np.round(g.uniform(-1000, 10000, k), 2),
    }), f"{out}/supplier.parquet")

    g = _rng("part")
    k = n["part"]
    pq.write_table(pa.table({
        "p_partkey": pa.array(range(k), pa.int64()),
        "p_name": [f"{ADJ[int(a)]} {NOUN[int(b)]}" for a, b in
                   zip(g.integers(0, 8, k), g.integers(0, 8, k))],
        "p_brand": [f"Brand#{i + 1}" for i in g.integers(0, 25, k)],
        "p_type": [PTYPES[i] for i in g.integers(0, 6, k)],
        "p_size": pa.array(g.integers(1, 51, k), pa.int32()),
        "p_retailprice": np.round(g.uniform(900, 1000, k), 1),
    }), f"{out}/part.parquet")

    g = _rng("orders")
    k = n["orders"]
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(k), pa.int64()),
        "o_custkey": pa.array(g.integers(0, n["customer"], k), pa.int64()),
        "o_orderstatus": [("P", "O", "F")[i] for i in g.integers(0, 3, k)],
        "o_totalprice": np.round(g.uniform(1000, 500000, k), 2),
        "o_orderdate": _ts_col(
            "1995-01-01", g.integers(0, 2405, k) * DAY_US),
        "o_orderpriority": [PRIORITIES[i] for i in g.integers(0, 5, k)],
    }), f"{out}/orders.parquet")

    g = _rng("lineitem")
    k = n["lineitem"]
    disc = g.integers(0, 11, k) / 100.0
    pq.write_table(pa.table({
        "l_orderkey": pa.array(g.integers(0, n["orders"], k), pa.int64()),
        "l_partkey": pa.array(g.integers(0, n["part"], k), pa.int64()),
        "l_suppkey": pa.array(g.integers(0, n["supplier"], k), pa.int64()),
        "l_linenumber": pa.array(g.integers(1, 8, k), pa.int32()),
        "l_quantity": g.integers(1, 51, k).astype("float64"),
        "l_extendedprice": np.round(g.uniform(900, 105000, k), 2),
        "l_discount": disc,
        "l_tax": g.integers(0, 9, k) / 100.0,
        "l_returnflag": [("A", "N", "R")[i] for i in g.integers(0, 3, k)],
        "l_linestatus": [("O", "F")[i] for i in g.integers(0, 2, k)],
        "l_shipdate": _ts_col(
            "1995-01-01", g.integers(0, 2500, k) * DAY_US),
    }), f"{out}/lineitem.parquet")

    g = _rng("events")
    k = n["events"]
    us = np.sort(g.integers(0, 30 * DAY_US, k))
    pq.write_table(pa.table({
        "event_id": pa.array(range(k), pa.int64()),
        "ts": _ts_col("2024-01-01", us),
        "user_id": pa.array(
            g.integers(0, max(2, k // 67), k), pa.int64()),
        "event_type": [ETYPES[i] for i in g.integers(0, 5, k)],
        "value": np.round(g.uniform(0, 490, k), 2),
        "props": [json.dumps({"k": int(v)}) for v in g.integers(0, 100, k)],
    }), f"{out}/events.parquet")

    g = _rng("documents")
    k = n["documents"]
    texts: list[str] = []
    vocab = np.array(VOCAB)
    for i in range(k):
        if i > 16 and g.random() < 0.05:  # planted near-dup (~5%, as shipped)
            j = int(g.integers(0, i))
            texts.append(texts[j] + " " + vocab[int(g.integers(0, 31))])
        else:
            ln = int(g.integers(8, 76))
            texts.append(" ".join(vocab[g.integers(0, 31, ln)]))
    pq.write_table(pa.table({
        "doc_id": pa.array(range(k), pa.int64()),
        "text": texts,
        "lang": [LANGS[i] for i in g.integers(0, len(LANGS), k)],
        "source": [f"src{i}" for i in g.integers(0, 20, k)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), f"{out}/documents.parquet")

    g = _rng("embeddings")
    k = n["embeddings"]
    m = g.normal(0, 1, (k, 64))
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(k), pa.int64()),
        "embedding": pa.array([row.astype("float32") for row in m],
                              pa.list_(pa.float32())),
        "label": pa.array(g.integers(0, 10, k), pa.int32()),
    }), f"{out}/embeddings.parquet")
    print(f"gen_sf: wrote sf={sf} to {out} "
          f"({', '.join(f'{t}={n[t]}' for t in sorted(n))})")


if __name__ == "__main__":
    gen(float(sys.argv[1]), sys.argv[2])
