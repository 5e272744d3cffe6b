"""Batch-22 invariant tests: hand-computed co-purchase cosines (with a
duplicate lineitem row proving the order-part dedup), backlog sweep with
a same-day open/close, peak-hour tie broken by lower hour."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import Row


def test_item_cosine_hand_computed(spark, tmp_path):
    rows = [
        (1, 1), (1, 2),
        (2, 1), (2, 2),
        (3, 1), (3, 3),
        (3, 3),  # duplicate (order, part) row must NOT inflate counts
    ]
    spark.createDataFrame(
        [Row(l_orderkey=o, l_partkey=p, l_shipdate=dt.datetime(2024, 1, 2)) for o, p in rows]
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline17 import (
        recsys_item_cosine,
    )

    got = [
        (r.pi, r.pj, r.co_orders, r.ni, r.nj, r.cosine)
        for r in recsys_item_cosine(spark, str(tmp_path)).collect()
    ]
    # cos(1,2) = 2/sqrt(3*2) ~ .8165 ranks above cos(1,3) = 1/sqrt(3)
    assert got == [
        (1, 2, 2, 3, 2, round(2 / math.sqrt(6), 6)),
        (1, 3, 1, 3, 1, round(1 / math.sqrt(3), 6)),
    ]


def test_backlog_same_day_open_close(spark, tmp_path):
    d = dt.datetime(2024, 1, 1)
    spark.createDataFrame(
        [
            Row(o_orderkey=1, o_orderdate=d),
            Row(o_orderkey=2, o_orderdate=d + dt.timedelta(days=1)),
        ]
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [
            # order 1: two shipments, closes at the LAST one (day 2)
            Row(l_orderkey=1, l_partkey=1, l_shipdate=d + dt.timedelta(days=1)),
            Row(l_orderkey=1, l_partkey=2, l_shipdate=d + dt.timedelta(days=2)),
            # order 2: opens and closes on day 1
            Row(l_orderkey=2, l_partkey=1, l_shipdate=d + dt.timedelta(days=1)),
        ]
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline17 import (
        orders_open_backlog,
    )

    got = sorted(
        (r.d, r.n_opened, r.n_closed, r.open_eod)
        for r in orders_open_backlog(spark, str(tmp_path)).collect()
    )
    assert got == [
        ("2024-01-01", 1, 0, 1),
        ("2024-01-02", 1, 1, 1),
        ("2024-01-03", 0, 1, 0),
    ]


def test_hour_completeness_tie_breaks_low_hour(spark, tmp_path):
    d = dt.datetime(2024, 6, 1)
    rows = (
        [(1, 10), (1, 20)]  # hour 1: 2 events
        + [(2, 5), (2, 15)]  # hour 2: 2 events (tie with hour 1)
        + [(5, 0)]  # hour 5: 1 event
    )
    spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=d + dt.timedelta(hours=h, minutes=m),
                user_id=i,
                event_type="view",
                value=1.0,
                props="{}",
            )
            for i, (h, m) in enumerate(rows)
        ]
    ).write.parquet(str(tmp_path / "events.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline17 import (
        audit_hour_completeness,
    )

    r = audit_hour_completeness(spark, str(tmp_path)).collect()
    assert len(r) == 1
    r = r[0]
    assert (r.event_type, r.d) == ("view", "2024-06-01")
    assert (r.hours_present, r.hours_missing) == (3, 21)
    assert (r.peak_hour, r.peak_count, r.day_events) == (1, 2, 5)
