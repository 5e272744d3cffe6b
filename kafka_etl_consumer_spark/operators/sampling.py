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

from pyspark.sql import Column, DataFrame, Window
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


def group_reservoir(
    df: DataFrame, strata_col: str, k: int, key: Column
) -> DataFrame:
    """Exactly ``min(k, group size)`` rows per stratum — the fixed-SIZE
    companion to ``stratified_sample``'s fixed-RATE keep (a per-class eval
    slice or few-shot pool wants "20 per class", not "0.1% of each class").

    The "reservoir" is deterministic: rank rows inside each stratum by
    ``(hash64(key), key)`` — a uniform, retry-stable random order that both
    engines reproduce — and keep rank <= k. The ``key`` tiebreak makes the
    order total even under hash collisions.

    Scale shape: one shuffle on the stratum key; the ``row_number() <= k``
    filter plans as WindowGroupLimit (Spark >= 3.5), so every MAP task
    pre-prunes to k rows per stratum before the exchange — a hot stratum
    ships ~k rows per upstream partition, not its full torrent.
    """
    order = [hash64(key).asc(), key.asc()]
    w = Window.partitionBy(strata_col).orderBy(*order)
    return df.withColumn("sample_rank", F.row_number().over(w)).filter(
        F.col("sample_rank") <= k
    )


def weighted_reservoir_k(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str,
) -> DataFrame:
    """Fixed-size weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis A-ES): each row draws priority u^(1/w) with u uniform in (0,1)
    and w its weight; the global top-k priorities are the sample. Inclusion
    probability scales with weight, the size is exactly k — the missing
    combination between ``stratified_sample`` (weighted RATE, random size)
    and ``group_reservoir`` (fixed size, uniform).

    u derives from ``hash64(key)`` — deterministic across runs/engines/
    retries like everything in this module. Priorities are ROUNDED to 6
    decimals with the key as tiebreak before the cut, so the selected set
    is stable even where ln/pow differ by an ulp between engines.

    Rows with weight <= 0 are excluded (zero-weight rows can never win).

    Scale shape: priority is a narrow map; the cut is
    TakeOrderedAndProject — per-partition top-k heaps, the driver merges
    partitions×k rows; the corpus never shuffles.
    """
    key = F.col(key_col)
    w = F.col(weight_col).cast("double")
    # u in (0,1): (h + 0.5) / 2^60
    u = (hash64(key).cast("double") + F.lit(0.5)) / F.lit(float(2**60))
    prio = F.round(F.pow(u, F.lit(1.0) / w), 6).alias("priority")
    return (
        df.filter(w > 0)
        .select("*", prio)
        .orderBy(F.desc("priority"), key.asc())
        .limit(k)
    )
