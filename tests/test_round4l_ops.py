"""Batch-24 invariant tests: Mann-Whitney vs a hand-worked tied-rank
example, Wilson interval vs the closed form, perfectly-separating
score's lift table."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import Row


def _mk_events(spark, tmp_path, rows):
    spark.createDataFrame(
        [
            Row(event_id=i, ts=ts, user_id=u, event_type=et, value=v, props="{}")
            for i, (u, ts, et, v) in enumerate(rows)
        ]
    ).write.parquet(str(tmp_path / "events.parquet"))


def test_mannwhitney_hand_worked_ties(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 2)
    # group A (even users): 1, 2, 2; group B (odd): 2, 3
    rows = [
        (0, t0, "view", 1.0),
        (2, t0, "view", 2.0),
        (4, t0, "view", 2.0),
        (1, t0, "view", 2.0),
        (3, t0, "view", 3.0),
    ]
    _mk_events(spark, tmp_path, rows)
    from kafka_etl_consumer_spark.plans.queries_pipeline19 import (
        stats_mannwhitney_u,
    )

    r = stats_mannwhitney_u(spark, str(tmp_path)).collect()[0]
    # tied 2s share rank (2+3+4)/3 = 3; R1 = 1+3+3 = 7; U1 = 7-6 = 1
    assert (r.n_a, r.n_b, r.u_stat) == (3, 2, 1.0)
    # sigma = sqrt(0.5 * (6 - 24/20)) = sqrt(2.4); z = (1-3)/sigma
    z = -2.0 / math.sqrt(2.4)
    assert abs(r.z_stat - round(z, 6)) < 1e-9
    assert abs(r.p_two_sided - math.erfc(abs(z) / math.sqrt(2))) < 1e-5


def test_wilson_closed_form(spark, tmp_path):
    spark.createDataFrame(
        [
            Row(o_orderkey=i, o_orderpriority="1-URGENT",
                o_orderstatus="F" if i == 0 else "O")
            for i in range(4)
        ]
    ).write.parquet(str(tmp_path / "orders.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline19 import stats_wilson_ci

    r = stats_wilson_ci(spark, str(tmp_path)).collect()[0]
    assert (r.n, r.n_success, r.p_hat) == (4, 1, 0.25)
    n, ph, z2 = 4.0, 0.25, 1.96 * 1.96
    center = (ph + z2 / (2 * n)) / (1 + z2 / n)
    half = 1.96 * math.sqrt(ph * (1 - ph) / n + z2 / (4 * n * n)) / (1 + z2 / n)
    assert abs(r.ci_lo - round(center - half, 6)) < 1e-9
    assert abs(r.ci_hi - round(center + half, 6)) < 1e-9
    assert 0.0 < r.ci_lo < 0.25 < r.ci_hi < 1.0


def test_lift_perfectly_separating_score(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 2)
    rows = []
    for u in range(1, 21):
        rows += [(u, t0, "view", 1.0)] * u  # score = user id
        if u > 10:  # exactly the high-score half converts
            rows.append((u, t0, "purchase", 200.0))
    _mk_events(spark, tmp_path, rows)
    from kafka_etl_consumer_spark.plans.queries_pipeline19 import (
        eval_lift_deciles,
    )

    got = {r.decile: r for r in eval_lift_deciles(spark, str(tmp_path)).collect()}
    assert len(got) == 10
    for d in range(1, 6):
        assert (got[d].n_users, got[d].n_conv) == (2, 2)
        assert got[d].lift == 2.0
        assert got[d].cum_gain == round(2 * d / 10, 6)
    for d in range(6, 11):
        assert (got[d].n_conv, got[d].lift) == (0, 0.0)
        assert got[d].cum_gain == 1.0
