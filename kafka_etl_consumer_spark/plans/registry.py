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
