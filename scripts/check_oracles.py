#!/usr/bin/env python3
"""Local replica of the driver's correctness harness: run every queries()
entry on Spark and its oracle_sql() on DuckDB at a given sf, compare
row-count + schema-ish + order-insensitive value hash.

Usage: python scripts/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "|".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from pdfminer_six_spark.spark.session import build_session

    spark = build_session(app_name="oracle-check", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            cols = sdf.columns
            rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(rows)} rows ({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            rel = con.sql(oracles[name])
            orows = rel.fetchall()
            ocols = [d[0] for d in rel.description]
        except Exception as e:
            print(f"FAIL  {name}: oracle error {e}")
            n_fail += 1
            continue
        ok_count = len(rows) == len(orows)
        ok_cols = sorted(cols) == sorted(ocols)
        ok_hash = table_hash(rows, cols) == table_hash(orows, ocols)
        if ok_count and ok_cols and ok_hash:
            print(f"PASS  {name}: {len(rows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(
                f"FAIL  {name}: rows {len(rows)}/{len(orows)} cols_ok={ok_cols}"
                f" hash_ok={ok_hash}"
            )
            if not ok_cols:
                print(f"      spark cols: {sorted(cols)}")
                print(f"      duck  cols: {sorted(ocols)}")
            else:
                sset = {tuple(norm_cell(c) for c in r) for r in rows}
                oset = {tuple(norm_cell(c) for c in r) for r in orows}
                so = sorted(cols)
                ordx = sorted(range(len(cols)), key=lambda i: cols[i])
                oordx = sorted(range(len(ocols)), key=lambda i: ocols[i])
                sset = {tuple(norm_cell(r[i]) for i in ordx) for r in rows}
                oset = {tuple(norm_cell(r[i]) for i in oordx) for r in orows}
                print("      only-spark:", list(sset - oset)[:3])
                print("      only-duck :", list(oset - sset)[:3])
            n_fail += 1
    print(f"\npass={n_pass} fail={n_fail} rows_only={n_rowsonly}")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
