"""Continuous-aggregate refresh: the second refresh must recompute ONLY
buckets at/after the frontier, and the rollup must always equal the
from-scratch aggregation of all raw data seen so far."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_etl_consumer_spark.operators.rollup import refresh_rollup

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _raw(spark, specs):
    return spark.createDataFrame(
        [Row(ts=T0 + dt.timedelta(minutes=m), event_type=e, value=float(v)) for m, e, v in specs],
        SCHEMA,
    )


def _expected(df):
    return sorted(
        map(
            tuple,
            df.groupBy(F.window("ts", "1 hour")["start"].alias("bucket"), "event_type")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sv"))
            .collect(),
        )
    )


def test_incremental_refresh(spark, tmp_path):
    path = str(tmp_path / "rollup")
    aggs = [F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sv")]

    batch1 = _raw(spark, [(0, "a", 1), (10, "a", 2), (70, "b", 3)])  # hours 0,1
    n = refresh_rollup(spark, batch1, path, "ts", "1 hour", ["event_type"], aggs)
    assert n == 2  # first run builds both buckets
    got = spark.read.parquet(path).select("bucket", "event_type", "n", "sv")
    assert sorted(map(tuple, got.collect())) == _expected(batch1)

    # hour 1 grows (late-open bucket), hour 2 appears; hour 0 untouched
    batch2 = batch1.unionByName(_raw(spark, [(80, "b", 4), (130, "a", 5)]))
    n = refresh_rollup(spark, batch2, path, "ts", "1 hour", ["event_type"], aggs)
    assert n == 2  # only hours 1 and 2 recomputed, NOT hour 0
    got = spark.read.parquet(path).select("bucket", "event_type", "n", "sv")
    assert sorted(map(tuple, got.collect())) == _expected(batch2)

    # nothing new → zero work
    assert refresh_rollup(spark, batch2, path, "ts", "1 hour", ["event_type"], aggs) == 1
    # (the frontier bucket itself is always re-verified — exactly one)
