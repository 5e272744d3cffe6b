"""Simulate the driver's correctness gate: vanilla SparkSession, sf0.01,
every queries() entry side-by-side with its oracle_sql() in DuckDB
(row count + column names + order-insensitive value compare).

Usage: python scripts/driver_sim.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as e  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return v


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )  # deliberately vanilla — the driver controls the session, not us

    df = e.entry(spark)
    n = df.count()
    print(f"entry(): {n} rows, schema={df.columns}")
    assert n > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    print(f"{len(qs)} queries, {len(oracles)} oracles, sf_dir={sf}")
    fails = []
    for name in sorted(qs):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sp = qs[name](spark, sf).toPandas()
        except Exception as ex:
            print(f"  {name}: SPARK ERROR {str(ex)[:200]}")
            fails.append(name)
            continue
        if name not in oracles:
            print(f"  {name}: rows-only, {len(sp)} rows ({time.time() - t0:.1f}s)")
            continue
        du = con.execute(oracles[name]).fetchdf()
        ok_cols = sorted(map(str.lower, sp.columns)) == sorted(map(str.lower, du.columns))
        ok_n = len(sp) == len(du)
        ok_vals = False
        if ok_cols and ok_n:
            key = lambda t: tuple((x is None, str(x)) for x in t)
            a = sorted(
                (tuple(canon(x) for x in r)
                 for r in sp[sorted(sp.columns)].itertuples(index=False, name=None)),
                key=key,
            )
            b = sorted(
                (tuple(canon(x) for x in r)
                 for r in du[sorted(du.columns)].itertuples(index=False, name=None)),
                key=key,
            )
            ok_vals = a == b
            if not ok_vals:
                print("    first diffs:", [(x, y) for x, y in zip(a, b) if x != y][:2])
        ok = ok_cols and ok_n and ok_vals
        if not ok:
            fails.append(name)
        print(
            f"  {name}: {'OK' if ok else f'FAIL cols={ok_cols} n={ok_n} vals={ok_vals}'}"
            f" ({len(sp)} rows, {time.time() - t0:.1f}s)"
        )
    print("FAILS:", fails if fails else "none")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
