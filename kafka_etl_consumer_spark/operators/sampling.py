"""Deterministic sampling for training-mix construction.

Training pipelines rarely sample uniformly: they up-weight rare, valuable
strata (purchases, long documents, low-resource languages) and down-weight
the torrent (views, boilerplate). ``stratified_sample`` is that rebalance
as one narrow filter.

Determinism is the point — ``TABLESAMPLE``/``rand()`` resample differently
per run, engine, AND task retry (a retried partition would emit different
rows: silent corruption under Spark's recompute-on-failure model). Hashing
the row key instead makes the sample a pure function of the data: stable
across runs and engines (md5 — functions/hashing.py), reproducible in the
DuckDB oracle, and auditable at 100 TB (re-running any slice reproduces
its sampling decisions; the same property the dedup family relies on,
SCALE.md "Determinism under verification").

Scale shape: the per-row predicate is a narrow map evaluated in
whole-stage codegen — no shuffle, no sort, combinable with pushed-down
scan filters. Changing the mix = changing literals, not re-shuffling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.functions.hashing import hash64, hash64_sql


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key: Column,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each row iff ``hash64(key) % 1000 < fraction(stratum) * 1000``
    — per-stratum inclusion with ≈0.1% granularity. Strata absent from
    ``fractions`` fall back to ``default_fraction`` (0 = drop, the common
    "keep only what I listed" mix)."""
    permille = F.lit(int(default_fraction * 1000))
    for v, frac in sorted(fractions.items()):
        permille = F.when(F.col(strata_col) == v, F.lit(int(frac * 1000))).otherwise(
            permille
        )
    return df.filter(hash64(key) % 1000 < permille)


def stratified_sample_sql(
    strata_col: str,
    fractions: dict[str, float],
    key_expr: str,
    default_fraction: float = 0.0,
) -> str:
    """The WHERE-clause text computing the identical predicate in DuckDB."""
    branches = "".join(
        f"WHEN '{v}' THEN {int(frac * 1000)} "
        for v, frac in sorted(fractions.items())
    )
    case = f"CASE {strata_col} {branches}ELSE {int(default_fraction * 1000)} END"
    return f"({hash64_sql(key_expr)}) % 1000 < {case}"
