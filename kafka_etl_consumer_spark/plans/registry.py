"""Shared query registry. Query modules register (Spark callable, DuckDB
oracle SQL) pairs; __spark_entry__ exposes the dicts to the driver."""

from __future__ import annotations

from collections.abc import Callable
from textwrap import dedent

from pyspark.sql import DataFrame, SparkSession

from kafka_etl_consumer_spark.sources.tables import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = dedent(oracle).strip()
        return fn

    return deco


def scalar_barrier(df: DataFrame, **exprs) -> DataFrame:
    """Append computed columns behind a Generate barrier
    (``explode(array(struct(...)))`` yields exactly one row per input row)
    so CollapseProject cannot inline each expression tree into every
    downstream reference.

    Why it matters: closed-form statistics compose big scalar
    approximations — the A&S probit (~100 expression nodes) fed into the
    Cornish-Fisher t-quantile (references its argument ~20×) fed into a
    critical value used several times. Built as plain Columns, Catalyst's
    CollapseProject substitutes the full tree at EVERY reference, so the
    optimized plan holds 10^4-10^5 effective nodes: measured on
    stats_grubbs_max at sf0.1, 1.2 s in the optimizer plus >3 s in codegen
    for a 5-ROW post-aggregation table (guide §7.3's "very large plans
    spend minutes in planning" in miniature — and all of it serial DRIVER
    time that a 100 TB cluster cannot parallelize). A Generate node is a
    projection fence: downstream references stay AttributeReferences, the
    tree exists once, and the per-row cost of exploding a 1-element array
    is nil next to evaluating the duplicated tree. Same trick
    operators/dedup.py uses for hashed shingles (measured 2-8× there).
    Numerically a no-op: each subexpression computes the identical IEEE
    value once instead of several times."""
    from pyspark.sql import functions as F

    packed = F.explode(
        F.array(F.struct(*[e.alias(n) for n, e in exprs.items()]))
    ).alias("__sb")
    return (
        df.select("*", packed)
        .select("*", *[F.col(f"__sb.{n}").alias(n) for n in exprs])
        .drop("__sb")
    )


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # let AQE re-plan (coalesce/skew-split) inside cached subplans too —
    # otherwise every .cache() in an operator pins the full static shuffle
    # partition count (measured 2x wall-clock on dedup_minhash)
    spark.conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    # size the shuffle width to the machine, not Spark's static 200: the
    # driver runs these queries on a VANILLA session, where 200-partition
    # exchanges turn iterative plans (connected components, pagerank) into
    # thousands of near-empty tasks. AQE coalesces most of it but not the
    # per-stage scheduling floor (measured 2x on dedup_canonical_pick).
    # Runtime conf only — a real cluster deployment sets its own width.
    cores = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(max(8, cores)))
    return load_table(spark, sf_dir, name)
