"""Self-check harness mirroring the driver's DuckDB-oracle comparison:
row count + column names + order-insensitive value comparison. Used by
tests/test_queries_oracle.py so every registered query is verified locally
before the driver ever sees it."""

from __future__ import annotations

import math

import duckdb

from kafka_etl_consumer_spark.sources.tables import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse ulp noise the in-query round() should already have removed
        return round(v, 9)
    if isinstance(v, list):
        return tuple(_canon_cell(x) for x in v)
    return v


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_canon_cell(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


def compare(spark_df, con, sql: str, name: str = "") -> None:
    sp = spark_df.toPandas()
    du = con.execute(sql).fetchdf()
    assert sorted(map(str.lower, sp.columns)) == sorted(map(str.lower, du.columns)), (
        f"{name}: column mismatch spark={sorted(sp.columns)} duckdb={sorted(du.columns)}"
    )
    assert len(sp) == len(du), f"{name}: row count spark={len(sp)} duckdb={len(du)}"
    sp_rows = _canon_rows(list(sp.columns), sp.itertuples(index=False, name=None))
    du_rows = _canon_rows(list(du.columns), du.itertuples(index=False, name=None))
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(sp_rows, du_rows)) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first: {mismatches[:3]}"
