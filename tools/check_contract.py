"""Mimic the driver's correctness gate: run each __spark_entry__ query on
Spark and its oracle on DuckDB at a given sf dir; compare row count, schema
width, and an order-insensitive value hash (columns sorted by name, rows
sorted by their string representation).

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df_pandas):
    import numpy as np
    import pandas as pd

    df = df_pandas.copy()
    df = df[sorted(df.columns)]
    def cell(v):
        if v is None or (isinstance(v, float) and np.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            # dtype-faithful: NEVER collapse integral floats to ints. A
            # float64-typed oracle column must hash differently from an
            # int64 Spark column (1.0 vs 1) exactly as the driver sees it —
            # the old collapse masked the 3-round sessionize red
            # (VERDICT r3 "What's wrong" 1-2).
            return repr(v)
        if isinstance(v, (np.floating,)):
            return cell(float(v))
        if isinstance(v, (np.integer,)):
            return str(int(v))
        return str(v)
    rows = ["\x01".join(cell(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest(), len(rows), list(df.columns)


def dtype_kinds(df_pandas):
    """Per-column numpy dtype kind, sorted by column name ('i' int, 'f' float,
    'O' object, 'M' datetime, 'b' bool); unsigned folds into 'i'."""
    return {
        c: ("i" if df_pandas[c].dtype.kind in ("i", "u") else df_pandas[c].dtype.kind)
        for c in sorted(df_pandas.columns)
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from kenlm_rs_spark.spark.session import get_spark

    spark = get_spark("contract-check", master="local[16]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        sh, sn, scols = normalize(sdf)
        oh, on, ocols = normalize(odf)
        skinds, okinds = dtype_kinds(sdf), dtype_kinds(odf)
        if scols != ocols:
            print(f"FAIL  {name}: columns {scols} != {ocols}")
            n_fail += 1
        elif skinds != okinds:
            diff = {c: (skinds[c], okinds[c]) for c in skinds if skinds[c] != okinds[c]}
            print(f"FAIL  {name}: dtype kind mismatch spark!=oracle {diff}")
            n_fail += 1
        elif sn != on:
            print(f"FAIL  {name}: rows {sn} != {on}")
            n_fail += 1
        elif sh != oh:
            print(f"FAIL  {name}: value hash mismatch ({sn} rows)")
            # show a small diff sample
            import pandas as pd
            s_rows = set(map(tuple, sdf[sorted(sdf.columns)].astype(str).itertuples(index=False)))
            o_rows = set(map(tuple, odf[sorted(odf.columns)].astype(str).itertuples(index=False)))
            for r in list(s_rows - o_rows)[:3]:
                print("   spark-only:", r)
            for r in list(o_rows - s_rows)[:3]:
                print("   oracle-only:", r)
            n_fail += 1
        else:
            print(f"PASS  {name}: {sn} rows, hash ok [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
