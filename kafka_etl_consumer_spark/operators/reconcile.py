"""Table reconciliation: order-insensitive checksums and keyed diffs.

The operations a 100 TB migration/replication actually runs: "is the copy
identical?" must not require sorting or moving either table. Both
operators reduce each row to a 60-bit deterministic hash
(functions/hashing.py — md5-derived, identical in the DuckDB oracle) and
then aggregate with ORDER-INSENSITIVE combiners, so the answer is
independent of partitioning, task order, and engine.

Scale shape: one narrow map (row → hash) + one single-row aggregate for
the checksum (partial sums collapse map-side — bytes cross the wire, not
rows); the diff is one full-outer join on the key — the only shuffle, on
the key both tables would already be bucketed by in a real migration.

The reference has no verification surface at all (write-and-forget,
ETLTask.java:197); this is part of the operational completeness the
engine adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.functions.hashing import hash64, hash64_sql

# Unit separator — cannot appear in the data's own string forms, so the
# concatenation is unambiguous (no "a|b" vs "a" + "|b" collisions).
_SEP = "\x1f"
_NULL = "<NULL>"


def row_fingerprint(cols: list[Column | str]) -> Column:
    """60-bit hash of the canonical row string: each column coalesced to
    ``<NULL>``, joined with the 0x1f unit separator. Pass pre-formatted
    string expressions for DOUBLE columns (``format_string('%.2f', c)``) —
    raw double→string casts differ between engines (Spark '1.0E7' vs
    DuckDB '10000000.0')."""
    parts = [
        F.coalesce((F.col(c) if isinstance(c, str) else c).cast("string"), F.lit(_NULL))
        for c in cols
    ]
    return hash64(F.concat_ws(_SEP, *parts))


def row_fingerprint_sql(col_exprs: list[str]) -> str:
    """DuckDB SQL computing the identical fingerprint."""
    parts = ", ".join(f"coalesce(CAST({e} AS VARCHAR), '{_NULL}')" for e in col_exprs)
    return hash64_sql(f"concat_ws(chr(31), {parts})")


# Mersenne 2^61 - 1: the exact decimal sum folds into BIGINT range, so
# the signature survives pandas/Arrow transfers that lose DECIMAL(38)
# precision (DuckDB's fetchdf renders DECIMAL(38,0) as float64).
CHECKSUM_MOD = 2_305_843_009_213_693_951


def table_checksum(df: DataFrame, cols: list[Column | str]) -> DataFrame:
    """ONE row: (n_rows, checksum_sum, checksum_xor) — an order-insensitive
    content signature. Two independent combiners (exact decimal SUM with
    38-digit headroom ≈ 8e19 rows before overflow, folded mod 2^61-1 into
    BIGINT, and BIT_XOR) so a colliding pair would have to fool both.
    Equal signatures on both sides of a copy ⇒ same multiset of rows,
    checked without sorting, sampling, or moving either table."""
    h = row_fingerprint(cols)
    return df.select(h.alias("__h")).agg(
        F.count("*").alias("n_rows"),
        F.pmod(F.sum(F.col("__h").cast("decimal(38,0)")), F.lit(CHECKSUM_MOD))
        .cast("long")
        .alias("checksum_sum"),
        F.bit_xor("__h").alias("checksum_xor"),
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[Column | str],
) -> DataFrame:
    """Per-key change status between two table versions:
    (keys..., status ∈ added|removed|changed|same).

    One full-outer join on ``keys`` (the only shuffle; co-located if both
    sides are bucketed by the key, as landed tables should be), comparing
    60-bit row fingerprints over ``compare_cols``. Aggregate downstream
    for the summary, or filter ``status != 'same'`` for the change feed.
    """
    o = old.select(*keys, row_fingerprint(compare_cols).alias("__fp_old"))
    n = new.select(*keys, row_fingerprint(compare_cols).alias("__fp_new"))
    joined = o.join(n, keys, "full_outer")
    status = (
        F.when(F.col("__fp_old").isNull(), F.lit("added"))
        .when(F.col("__fp_new").isNull(), F.lit("removed"))
        .when(F.col("__fp_old") == F.col("__fp_new"), F.lit("same"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*keys, status.alias("status"))
