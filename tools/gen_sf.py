#!/usr/bin/env python3
"""Seeded regeneration of the driver's synthetic table set (TESTDATA.md
schemas) for the oracle sweep: same 10 tables, same schemas (column names,
arrow types), comparable distributions, but a FRESH random seed and an
arbitrary scale factor. The sweep (tools/sweep.py) runs the full Verify +
DuckDB gatecheck per seed — more independent data draws is the cheapest way
to find the next data-edge bug (q55's inclusive-merge and the sf1 overflow
bugs both came from data, not specs).

The generator is deliberately structure-rich where the gates need edges:
documents get exact duplicates (~4%) and near-duplicates (~6%, 1-2 token
substitutions) for the dedup/LSH gates; embeddings get 10 unit-norm
clusters plus near-identical pairs for the ANN/near-dup gates; events get
microsecond timestamps over 30 days for the streaming/session gates.

Usage: gen_sf.py <dstDir> <seed> <sf>     (sf=0.01 ~ 60k lineitem rows)
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DST, SEED, SF = sys.argv[1], int(sys.argv[2]), float(sys.argv[3])
os.makedirs(DST, exist_ok=True)
rng = np.random.default_rng(SEED)


def n_of(base):  # driver row counts scale linearly in sf
    return max(1, int(round(base * SF / 0.01)))


def write(name, cols):
    tbl = pa.table(cols)
    pq.write_table(tbl, f"{DST}/{name}.parquet")
    print(f"{name}: {tbl.num_rows} rows")


def ts_us(base, spread_days, n, midnight=False):
    """timestamp[us] array: base + uniform(spread) (midnight-truncated for
    date-like columns, microsecond-resolution otherwise)."""
    base = np.datetime64(base, "us")
    if midnight:
        off = rng.integers(0, spread_days, n) * 86_400_000_000
    else:
        off = rng.integers(0, spread_days * 86_400_000_000, n)
    return base + off.astype("timedelta64[us]")


# ---- dims ----------------------------------------------------------------
write("region", {
    "r_regionkey": pa.array(range(5), pa.int32()),
    "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
})
write("nation", {
    "n_nationkey": pa.array(range(25), pa.int32()),
    "n_name": [f"NATION_{i}" for i in range(25)],
    "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
})

N_CUST, N_SUPP, N_PART, N_ORD, N_LINE = (
    n_of(1500), n_of(100), n_of(2000), n_of(15000), n_of(60000))

write("customer", {
    "c_custkey": pa.array(range(N_CUST), pa.int64()),
    "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
    "c_nationkey": pa.array(rng.integers(0, 25, N_CUST), pa.int32()),
    "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, N_CUST), 2),
    "c_mktsegment": pa.array(np.array(
        ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"]
    )[rng.integers(0, 5, N_CUST)]),
})
write("supplier", {
    "s_suppkey": pa.array(range(N_SUPP), pa.int64()),
    "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
    "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP), pa.int32()),
    "s_acctbal": np.round(rng.uniform(0, 9999.99, N_SUPP), 2),
})

ADJ = ["small", "large", "red", "blue", "new", "old", "hot", "cold"]
NOUN = ["widget", "gizmo", "anvil", "bolt", "ring", "rod", "plate", "gear"]
TYPES = ["ECONOMY", "SMALL", "MEDIUM", "LARGE", "STANDARD", "PROMO"]
write("part", {
    "p_partkey": pa.array(range(N_PART), pa.int64()),
    "p_name": [f"{ADJ[int(a)]} {NOUN[int(b)]}" for a, b in
               zip(rng.integers(0, 8, N_PART), rng.integers(0, 8, N_PART))],
    "p_brand": [f"Brand#{int(b)}" for b in rng.integers(1, 26, N_PART)],
    "p_type": pa.array(np.array(TYPES)[rng.integers(0, 6, N_PART)]),
    "p_size": pa.array(rng.integers(1, 51, N_PART), pa.int32()),
    "p_retailprice": np.round(rng.uniform(900, 2100, N_PART), 2),
})

write("orders", {
    "o_orderkey": pa.array(range(N_ORD), pa.int64()),
    "o_custkey": pa.array(rng.integers(0, N_CUST, N_ORD), pa.int64()),
    "o_orderstatus": pa.array(np.array(["F", "O", "P"])[rng.integers(0, 3, N_ORD)]),
    "o_totalprice": np.round(rng.uniform(1000, 500000, N_ORD), 2),
    "o_orderdate": ts_us("1995-01-01", 2405, N_ORD, midnight=True),
    "o_orderpriority": pa.array(np.array(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    )[rng.integers(0, 5, N_ORD)]),
})

write("lineitem", {
    "l_orderkey": pa.array(rng.integers(0, N_ORD, N_LINE), pa.int64()),
    "l_partkey": pa.array(rng.integers(0, N_PART, N_LINE), pa.int64()),
    "l_suppkey": pa.array(rng.integers(0, N_SUPP, N_LINE), pa.int64()),
    "l_linenumber": pa.array(rng.integers(1, 8, N_LINE), pa.int32()),
    "l_quantity": rng.integers(1, 51, N_LINE).astype(np.float64),
    "l_extendedprice": np.round(rng.uniform(900, 105000, N_LINE), 2),
    "l_discount": np.round(rng.integers(0, 11, N_LINE) * 0.01, 2),
    "l_tax": np.round(rng.integers(0, 9, N_LINE) * 0.01, 2),
    "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, N_LINE)]),
    "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, N_LINE)]),
    "l_shipdate": ts_us("1995-01-02", 2498, N_LINE, midnight=True),
})

# ---- events (streaming/session gates) ------------------------------------
N_EVT, N_USER = n_of(10000), n_of(150)
write("events", {
    "event_id": pa.array(range(N_EVT), pa.int64()),
    "ts": np.sort(ts_us("2024-01-01", 30, N_EVT)),
    "user_id": pa.array(rng.integers(0, N_USER, N_EVT), pa.int64()),
    "event_type": pa.array(np.array(
        ["click", "view", "purchase", "signup", "error"])[rng.integers(0, 5, N_EVT)]),
    "value": np.round(rng.uniform(0.01, 490.02, N_EVT), 2),
    "props": [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, N_EVT)],
})

# ---- documents: word salad + dup/near-dup structure ----------------------
VOCAB = ["the", "a", "data", "spark", "table", "join", "row", "column", "agg",
         "scan", "filter", "sort", "hash", "merge", "window", "batch",
         "stream", "query", "key", "value", "part", "line", "order",
         "customer", "group", "fast", "slow", "small", "big", "dup", "vector"]
LANGS = ["en", "zh", "es", "de", "fr"]
N_DOC = n_of(500)
texts, base_texts = [], []
for i in range(N_DOC):
    r = rng.random()
    if i > 10 and r < 0.04:           # exact duplicate of an earlier doc
        texts.append(base_texts[int(rng.integers(0, len(base_texts)))])
        continue
    if i > 10 and r < 0.10:           # near-duplicate: swap 1-2 tokens
        words = base_texts[int(rng.integers(0, len(base_texts)))].split(" ")
        for _ in range(int(rng.integers(1, 3))):
            words[int(rng.integers(0, len(words)))] = VOCAB[int(rng.integers(0, 31))]
        texts.append(" ".join(words))
        continue
    n = int(rng.integers(8, 110))
    t = " ".join(VOCAB[int(w)] for w in rng.integers(0, 31, n))
    texts.append(t)
    base_texts.append(t)
write("documents", {
    "doc_id": pa.array(range(N_DOC), pa.int64()),
    "text": texts,
    "lang": pa.array(np.array(LANGS)[
        rng.choice(5, N_DOC, p=[0.44, 0.14, 0.14, 0.14, 0.14])]),
    "source": [f"src{int(s)}" for s in rng.integers(0, 20, N_DOC)],
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
})

# ---- embeddings: 10 unit-norm clusters + near-identical pairs ------------
N_EMB, DIM = n_of(500), 64
centers = rng.standard_normal((10, DIM))
centers /= np.linalg.norm(centers, axis=1, keepdims=True)
labels = rng.integers(0, 10, N_EMB)
vecs = centers[labels] + 0.35 * rng.standard_normal((N_EMB, DIM))
# ~2% near-identical pairs: copy an earlier row + tiny perturbation
for i in range(N_EMB):
    if i > 20 and rng.random() < 0.02:
        j = int(rng.integers(0, i))
        vecs[i] = vecs[j] + 0.005 * rng.standard_normal(DIM)
        labels[i] = labels[j]
vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
vecs32 = vecs.astype(np.float32)
write("embeddings", {
    "vec_id": pa.array(range(N_EMB), pa.int64()),
    "embedding": pa.array([v for v in vecs32.tolist()],
                          pa.list_(pa.float32())),
    "label": pa.array(labels, pa.int32()),
})
