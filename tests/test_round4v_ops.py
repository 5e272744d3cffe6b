"""Batch-34 invariant tests: hand-computed lead-time p95, aging bucket
placement incl. the trailing-30 cut, exact linear trend slope."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row


def test_supplier_lead_time_hand_computed(spark, tmp_path):
    od = dt.datetime(2024, 1, 1)
    spark.createDataFrame(
        [Row(o_orderkey=1, o_orderdate=od)]
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [
            Row(l_orderkey=1, l_suppkey=7, l_shipdate=od + dt.timedelta(days=2)),
            Row(l_orderkey=1, l_suppkey=7, l_shipdate=od + dt.timedelta(days=4)),
        ]
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline29 import (
        supplier_lead_time,
    )

    r = supplier_lead_time(spark, str(tmp_path)).collect()[0]
    assert (r.suppkey, r.n_lines, r.max_lead_days) == (7, 2, 4)
    assert r.mean_lead_days == 3.0
    # linear interpolation between 2 and 4 at 0.95
    assert r.p95_lead_days == 3.9


def test_aging_buckets_and_trailing_cut(spark, tmp_path):
    h = dt.datetime(2024, 6, 30)
    d = dt.timedelta
    spark.createDataFrame(
        [
            Row(o_orderkey=1, o_orderdate=h - d(days=20)),   # age 20 -> 0-30
            Row(o_orderkey=2, o_orderdate=h - d(days=70)),   # age 70 -> 61-90
            Row(o_orderkey=3, o_orderdate=h - d(days=200)),  # shipped long ago
        ]
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [
            Row(l_orderkey=1, l_suppkey=1, l_shipdate=h),           # defines horizon
            Row(l_orderkey=2, l_suppkey=1, l_shipdate=h - d(days=10)),
            Row(l_orderkey=3, l_suppkey=1, l_shipdate=h - d(days=40)),  # cut
        ]
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline29 import (
        orders_aging_buckets,
    )

    got = sorted(
        (r.bucket, r.n_orders, r.min_age, r.max_age)
        for r in orders_aging_buckets(spark, str(tmp_path)).collect()
    )
    assert got == [("0-30", 1, 20, 20), ("61-90", 1, 70, 70)]


def test_value_trend_exact_linear_slope(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    rows = []
    # customer 1: value = 100 + 2.5 * day -> slope exactly 2.5; 5 orders
    for i, day in enumerate([0, 10, 20, 30, 40]):
        rows.append((i, 1, base + dt.timedelta(days=day), 100.0 + 2.5 * day))
    # customer 2: only 4 orders -> filtered out
    for i, day in enumerate([0, 1, 2, 3]):
        rows.append((10 + i, 2, base + dt.timedelta(days=day), 50.0))
    spark.createDataFrame(
        [
            Row(o_orderkey=k, o_custkey=c, o_orderdate=d, o_totalprice=p)
            for k, c, d, p in rows
        ]
    ).write.parquet(str(tmp_path / "orders.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline29 import (
        customer_value_trend_topk,
    )

    got = [
        (r.custkey, r.n_orders, r.slope_per_day)
        for r in customer_value_trend_topk(spark, str(tmp_path)).collect()
    ]
    assert got == [(1, 5, 2.5)]
