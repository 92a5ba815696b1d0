#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/gatecheck.py <sfdir> <outdir> [query ...]

Expects `sbt "runMain graft.Verify <sfdir> <outdir>"` to have been run
already (this script runs DuckDB oracles from <outdir>/oracle_sql.json and
compares against <outdir>/<name>/ parquet). Compares rows, schema (column
names sorted), and a type-sensitive value hash, like the driver.
"""
import json
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def canon(tbl: pa.Table):
    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    # sort rows by all columns for order-insensitive compare
    rows = [tuple(str(tbl.column(c)[i].as_py()) for c in cols) for i in range(tbl.num_rows)]
    rows.sort()
    types = [str(tbl.schema.field(c).type) for c in cols]
    return cols, types, rows


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
        except Exception:
            pass
    fails = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark_tbl = pq.read_table(f"{outdir}/{name}")
        except Exception as e:
            print(f"{name}: SPARK-READ-FAIL {e}")
            fails += 1
            continue
        try:
            ora_tbl = con.execute(sql).arrow()
        except Exception as e:
            print(f"{name}: ORACLE-FAIL {e}")
            fails += 1
            continue
        sc, st, sr = canon(spark_tbl)
        oc, ot, orows = canon(ora_tbl)
        ok_rows = len(sr) == len(orows)
        ok_schema = sc == oc
        ok_hash = sr == orows
        ok_types = st == ot
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        extra = "" if ok_types else f" [type-diff spark={st} oracle={ot}]"
        if status == "FAIL" or extra:
            fails += 1
            print(f"{name}: {status} rows={len(sr)}/{len(orows)} schema={ok_schema} hash={ok_hash}{extra}")
            if not ok_hash and ok_rows and ok_schema:
                for a, b in zip(sr, orows):
                    if a != b:
                        print(f"  first diff: spark={a} oracle={b}")
                        break
        else:
            print(f"{name}: OK ({len(sr)} rows)")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
