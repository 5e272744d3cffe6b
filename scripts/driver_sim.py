"""Simulate the driver's correctness gate: vanilla SparkSession, sf0.01,
every queries() entry side-by-side with its oracle_sql() in DuckDB.

Comparison mirrors the driver's semantics (VERDICT.md round 1):
- columns sorted by name, rows sorted, then values compared as CANONICAL
  STRINGS — so an int 4 vs float 4.0 mismatch FAILS here like it fails the
  driver's string-hash (round-1 ``math_funcs`` red).
- every cell must be a scalar: a list/array/dict cell (e.g. a DuckDB MAP
  extraction returning LIST) raises, like the driver's canonicalizer
  crashed on round-1 ``map_funcs``.

Usage: python scripts/driver_sim.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os
import sys
import time

import duckdb
import numpy as np
from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as e  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


class NonScalarCell(Exception):
    pass


def canon(v) -> str:
    """Canonical string for one cell. Type-class prefixed so int 4 and
    float 4.0 differ (the driver hashes representations, not values)."""
    if isinstance(v, (list, tuple, set, dict, np.ndarray)):
        raise NonScalarCell(f"non-scalar cell of type {type(v).__name__}: {v!r:.80}")
    if isinstance(v, np.generic):
        v = v.item()
    if v is None:
        return "<NULL>"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:NaN"
        if math.isinf(v):
            return "f:Inf" if v > 0 else "f:-Inf"
        return f"f:{round(v, 9)!r}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v}"
    if isinstance(v, bytes):
        return f"x:{v.hex()}"
    if isinstance(v, str):
        return f"s:{v}"
    if isinstance(v, (dt.datetime, dt.date, dt.time)):
        # pd.Timestamp subclasses datetime; str() formats match across engines
        if v != v:  # NaT
            return "<NULL>"
        return f"t:{v}"
    return f"o:{v!r}"


def canon_frame(df):
    """Sorted list of canonical-string row tuples, columns sorted by name."""
    cols = sorted(df.columns)
    rows = []
    for r in df[cols].itertuples(index=False, name=None):
        out = []
        for x in r:
            try:
                if x is not None and not isinstance(x, (list, np.ndarray, dict)) and pdna(x):
                    out.append("<NULL>")
                    continue
            except (TypeError, ValueError):
                pass
            out.append(canon(x))
        rows.append(tuple(out))
    rows.sort()
    return rows


def pdna(x) -> bool:
    import pandas as pd

    res = pd.isna(x)
    return bool(res) if isinstance(res, (bool, np.bool_)) else False


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
    for name in qs:  # driver order — a prefix cap checks the front first
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
        try:
            du = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"  {name}: ORACLE ERROR {str(ex)[:200]}")
            fails.append(name)
            continue
        ok_cols = sorted(map(str.lower, sp.columns)) == sorted(map(str.lower, du.columns))
        ok_n = len(sp) == len(du)
        ok_vals = False
        if ok_cols and ok_n:
            try:
                a = canon_frame(sp)
            except NonScalarCell as ex:
                print(f"  {name}: SPARK NON-SCALAR CELL {ex}")
                fails.append(name)
                continue
            try:
                b = canon_frame(du)
            except NonScalarCell as ex:
                print(f"  {name}: ORACLE NON-SCALAR CELL {ex}")
                fails.append(name)
                continue
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
