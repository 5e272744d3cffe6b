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
    return load_table(spark, sf_dir, name)
