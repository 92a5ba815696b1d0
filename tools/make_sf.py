#!/usr/bin/env python3
"""Deterministic scale-up of the driver's synthetic tables: replicate a
source scale `factor` times with per-replica key offsets (K = 1e8 per
replica), keeping every cross-table key relationship consistent. Dims
(region/nation) copy as-is. Used to produce sf1 from sf0.1 for the
scale-decade correctness + bench evidence (same data DuckDB oracles see).

Usage: make_sf.py <srcDir> <dstDir> <factor>
"""
import sys

import duckdb

SRC, DST, FACTOR = sys.argv[1], sys.argv[2], int(sys.argv[3])
K = 100_000_000

# table -> list of BIGINT key columns to offset per replica
OFFSETS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

con = duckdb.connect()
import os
os.makedirs(DST, exist_ok=True)
for table, keys in OFFSETS.items():
    src = f"{SRC}/{table}.parquet"
    dst = f"{DST}/{table}.parquet"
    cols = [c[0] for c in con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
    if not keys:
        con.execute(f"COPY (SELECT * FROM '{src}') TO '{dst}' (FORMAT PARQUET)")
    else:
        sel = ", ".join(
            f"{c} + r.k * {K} AS {c}" if c in keys else c for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM '{src}', "
            f"(SELECT unnest(generate_series(0, {FACTOR - 1})) AS k) r "
            f"ORDER BY r.k, {keys[0]}) TO '{dst}' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
    print(f"{table}: {n} rows")
