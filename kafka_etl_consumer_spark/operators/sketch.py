"""Sketch operators: approximate distinct counting with deterministic,
cross-engine-verifiable results.

``theta_distinct`` is the fixed-threshold θ-sketch idea (the KMV family):
hash every value uniformly into [0, 2⁶⁰); keep only hashes below
2⁶⁰/scale; then ``distinct(kept) × scale`` estimates the true distinct
count with relative error ≈ 1/√kept. Because the hash is the engine's
deterministic md5-based hash64 (functions/hashing.py), the estimate is
bit-reproducible in DuckDB — an approximate algorithm with an EXACT oracle.

Scale story vs exact countDistinct: the filter drops (scale-1)/scale of the
data BEFORE the distinct's shuffle — at scale=256, the distinct shuffle
carries ~0.4% of the values. Spark's built-in approx_count_distinct (HLL)
is the production default where cross-run determinism isn't contractual;
this operator is for pipelines that must reproduce counts exactly across
engines/runs (audits, incremental dedup accounting).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.functions.hashing import hash64

_HASH_SPACE = 1 << 60  # hash64 yields 60-bit values


def theta_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    scale: int = 256,
) -> DataFrame:
    """Per-group approximate distinct count of ``value_col``.

    Returns group cols + ``est_distinct`` (double). ``scale``: sampling
    factor; kept-set size ≈ distinct/scale, relative error ≈ √(scale/distinct).
    """
    threshold = _HASH_SPACE // scale
    h = hash64(F.col(value_col).cast("string"))
    kept = df.filter(h < threshold)
    agg = F.countDistinct(value_col).cast("double") * float(scale)
    if group_cols:
        return kept.groupBy(*group_cols).agg(agg.alias("est_distinct"))
    return kept.agg(agg.alias("est_distinct"))
