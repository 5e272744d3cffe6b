"""Batch-35 invariant tests: hand-computed audience Jaccard, grain
reconciliation of the one-pass multi-granularity rollup."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row


def test_audience_overlap_hand_computed(spark, tmp_path):
    # viewers {1,2,3}, purchasers {2,3,4,5}: inter 2, union 5 -> 0.4
    rows = [(u, "view") for u in (1, 2, 3)] + [
        (u, "purchase") for u in (2, 3, 4, 5)
    ]
    # duplicate events must not inflate the sets
    rows += [(1, "view"), (2, "purchase")]
    spark.createDataFrame(
        [
            Row(event_id=i, ts=dt.datetime(2024, 1, 2), user_id=u,
                event_type=et, value=1.0, props="{}")
            for i, (u, et) in enumerate(rows)
        ]
    ).write.parquet(str(tmp_path / "events.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline30 import (
        events_audience_overlap,
    )

    got = [
        (r.type_a, r.type_b, r.n_a, r.n_b, r.n_both, r.jaccard)
        for r in events_audience_overlap(spark, str(tmp_path)).collect()
    ]
    assert got == [("purchase", "view", 4, 3, 2, 0.4)]


def test_multi_grain_reconciles_to_the_cent(spark, tmp_path):
    rows = [
        (1, dt.datetime(1998, 3, 2), 10.10),   # Mon, week 1998-03-02
        (2, dt.datetime(1998, 3, 3), 20.20),   # same week
        (3, dt.datetime(1998, 3, 10), 30.30),  # next week, same month
        (4, dt.datetime(1997, 12, 31), 99.99),  # filtered (pre-1998)
    ]
    spark.createDataFrame(
        [
            Row(o_orderkey=k, o_orderdate=d, o_totalprice=p)
            for k, d, p in rows
        ]
    ).write.parquet(str(tmp_path / "orders.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline30 import (
        revenue_multi_grain,
    )

    out = revenue_multi_grain(spark, str(tmp_path)).collect()
    by_grain = {}
    for r in out:
        by_grain.setdefault(r.grain, []).append((r.bucket, r.n_orders, r.revenue))
    assert sorted(by_grain["day"]) == [
        ("1998-03-02", 1, 10.10),
        ("1998-03-03", 1, 20.20),
        ("1998-03-10", 1, 30.30),
    ]
    assert sorted(by_grain["week"]) == [
        ("1998-03-02", 2, 30.30),
        ("1998-03-09", 1, 30.30),
    ]
    assert sorted(by_grain["month"]) == [("1998-03-01", 3, 60.60)]
    # every grain reconciles to the same total, to the cent
    for g in ("day", "week", "month"):
        assert round(sum(rev for _, _, rev in by_grain[g]), 2) == 60.60
