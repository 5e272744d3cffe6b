"""Batch-19 invariant tests: Kaplan-Meier against a hand-computed curve
(event + censored mix), LTV triangle against a hand-computed cohort."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row


def _mk_orders(spark, tmp_path, rows):
    spark.createDataFrame(
        [
            Row(
                o_orderkey=i,
                o_custkey=c,
                o_orderdate=d,
                o_totalprice=p,
                o_orderstatus="F",
            )
            for i, (c, d, p) in enumerate(rows)
        ]
    ).write.parquet(str(tmp_path / "orders.parquet"))


def test_km_hand_computed_curve(spark, tmp_path):
    d0 = dt.date(2024, 1, 1)
    # cust 1: day0 + day10 -> dur 10 event; cust 2: day0 + day5 -> dur 5
    # event; cust 3: day0 only -> censored at horizon day10; cust 4:
    # day2 + day4 -> dur 2 event.
    _mk_orders(
        spark,
        tmp_path,
        [
            (1, d0, 1.0),
            (1, d0 + dt.timedelta(days=10), 1.0),
            (2, d0, 1.0),
            (2, d0 + dt.timedelta(days=5), 1.0),
            (3, d0, 1.0),
            (4, d0 + dt.timedelta(days=2), 1.0),
            (4, d0 + dt.timedelta(days=4), 1.0),
        ],
    )
    from kafka_etl_consumer_spark.plans.queries_pipeline14 import (
        stats_survival_km,
    )

    got = sorted(
        (r.t_days, r.n_risk, r.n_events, r.survival)
        for r in stats_survival_km(spark, str(tmp_path)).collect()
    )
    # S(2)=3/4, S(5)=3/4*2/3=1/2, S(10)=1/2*1/2=1/4 (cust 3 censored AT
    # t=10 stays in the risk set for the t=10 interval)
    assert got == [(2, 4, 1, 0.75), (5, 3, 1, 0.5), (10, 2, 1, 0.25)]


def test_km_all_events_reaches_zero(spark, tmp_path):
    d0 = dt.date(2024, 1, 1)
    # both customers repeat -> last interval exhausts the risk set, the
    # sticky dead flag must pin survival to exactly 0.0 (not exp(ln 0))
    _mk_orders(
        spark,
        tmp_path,
        [
            (1, d0, 1.0),
            (1, d0 + dt.timedelta(days=3), 1.0),
            (2, d0, 1.0),
            (2, d0 + dt.timedelta(days=3), 1.0),
        ],
    )
    from kafka_etl_consumer_spark.plans.queries_pipeline14 import (
        stats_survival_km,
    )

    got = [
        (r.t_days, r.n_risk, r.n_events, r.survival)
        for r in stats_survival_km(spark, str(tmp_path)).collect()
    ]
    assert got == [(3, 2, 2, 0.0)]


def test_ltv_hand_computed_triangle(spark, tmp_path):
    # cust A: Jan $10 then Mar $20 -> cohort Jan, k=0 rev 10, k=2 rev 20,
    # cumulative per-customer 10 then 30; cust B: two Feb orders -> one
    # k=0 cell of 12.
    _mk_orders(
        spark,
        tmp_path,
        [
            (1, dt.date(2024, 1, 15), 10.0),
            (1, dt.date(2024, 3, 10), 20.0),
            (2, dt.date(2024, 2, 1), 5.0),
            (2, dt.date(2024, 2, 20), 7.0),
        ],
    )
    from kafka_etl_consumer_spark.plans.queries_pipeline14 import (
        orders_cohort_ltv,
    )

    got = sorted(
        (r.cohort, r.k, r.cohort_size, r.revenue, r.cum_ltv_per_customer)
        for r in orders_cohort_ltv(spark, str(tmp_path)).collect()
    )
    assert got == [
        ("2024-01-01", 0, 1, 10.0, 10.0),
        ("2024-01-01", 2, 1, 20.0, 30.0),
        ("2024-02-01", 0, 1, 12.0, 12.0),
    ]
