"""Batch-20 invariant tests: FK audit with a planted orphan, z-test vs
a Python reference, CUPED perfect-covariate collapse, U-shaped credits
hand-computed for 1/2/4-touch paths and a direct conversion."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import Row


def _mk_star(spark, tmp_path):
    """Minimal star schema with ONE planted orphan: lineitem row 99
    references order 999 which does not exist (twice, same key)."""
    spark.createDataFrame([Row(r_regionkey=0)]).write.parquet(
        str(tmp_path / "region.parquet")
    )
    spark.createDataFrame([Row(n_nationkey=0, n_regionkey=0)]).write.parquet(
        str(tmp_path / "nation.parquet")
    )
    spark.createDataFrame([Row(c_custkey=1, c_nationkey=0)]).write.parquet(
        str(tmp_path / "customer.parquet")
    )
    spark.createDataFrame([Row(s_suppkey=1, s_nationkey=0)]).write.parquet(
        str(tmp_path / "supplier.parquet")
    )
    spark.createDataFrame([Row(p_partkey=1)]).write.parquet(
        str(tmp_path / "part.parquet")
    )
    spark.createDataFrame([Row(o_orderkey=1, o_custkey=1)]).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    spark.createDataFrame(
        [
            Row(l_orderkey=1, l_partkey=1, l_suppkey=1),
            Row(l_orderkey=999, l_partkey=1, l_suppkey=1),
            Row(l_orderkey=999, l_partkey=1, l_suppkey=1),
        ]
    ).write.parquet(str(tmp_path / "lineitem.parquet"))


def test_fk_orphans_planted(spark, tmp_path):
    from kafka_etl_consumer_spark.plans.queries_pipeline15 import (
        audit_fk_orphans,
    )

    _mk_star(spark, tmp_path)
    rows = {
        r.edge: (r.child_rows, r.orphan_rows, r.orphan_keys)
        for r in audit_fk_orphans(spark, str(tmp_path)).collect()
    }
    assert len(rows) == 7
    # two orphan rows, ONE distinct orphan key
    assert rows["lineitem.l_orderkey->orders.o_orderkey"] == (3, 2, 1)
    for edge, (child, orows, okeys) in rows.items():
        if edge != "lineitem.l_orderkey->orders.o_orderkey":
            assert (orows, okeys) == (0, 0), edge


def _mk_events(spark, tmp_path, rows):
    spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=ts,
                user_id=u,
                event_type=et,
                value=v,
                props="{}",
            )
            for i, (u, ts, et, v) in enumerate(rows)
        ]
    ).write.parquet(str(tmp_path / "events.parquet"))


def test_prop_ztest_matches_python(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 2)
    # even users: 2 of 3 convert; odd users: 1 of 3 convert
    rows = [
        (0, t0, "purchase", 200.0),
        (2, t0, "purchase", 300.0),
        (4, t0, "purchase", 10.0),
        (1, t0, "purchase", 400.0),
        (3, t0, "view", 500.0),  # high value but not a purchase
        (5, t0, "purchase", 100.0),
    ]
    _mk_events(spark, tmp_path, rows)
    from kafka_etl_consumer_spark.plans.queries_pipeline15 import (
        stats_prop_ztest,
    )

    r = stats_prop_ztest(spark, str(tmp_path)).collect()[0]
    assert (r.n_a, r.conv_a, r.n_b, r.conv_b) == (3, 2, 3, 1)
    n0, x0, n1, x1 = 3.0, 2.0, 3.0, 1.0
    pp = (x0 + x1) / (n0 + n1)
    z = (x1 / n1 - x0 / n0) / math.sqrt(pp * (1 - pp) * (1 / n0 + 1 / n1))
    assert abs(r.z_stat - round(z, 6)) < 1e-9
    p = math.erfc(abs(z) / math.sqrt(2))
    # A&S 7.1.26 polynomial is within 1.5e-7 of true erfc
    assert abs(r.p_two_sided - p) < 1e-5


def test_cuped_perfect_covariate_collapses_variance(spark, tmp_path):
    pre = dt.datetime(2024, 1, 5)
    post = dt.datetime(2024, 1, 20)
    rows = []
    # user u makes u pre-purchases and 2u post-purchases: y = 2x exactly,
    # so theta = 2 and y_cuped is CONSTANT across users -> sd 0
    for u in range(1, 5):
        rows += [(u, pre, "purchase", 1.0)] * u
        rows += [(u, post, "purchase", 1.0)] * (2 * u)
    _mk_events(spark, tmp_path, rows)
    from kafka_etl_consumer_spark.plans.queries_pipeline15 import (
        stats_cuped_adjust,
    )

    got = {r.variant: r for r in stats_cuped_adjust(spark, str(tmp_path)).collect()}
    assert set(got) == {0, 1}
    for r in got.values():
        assert r.theta == 2.0
        assert r.sd_y_cuped == 0.0
        # adjusted mean equals theta * pooled mean_x = 2 * 2.5 = 5.0
        assert r.mean_y_cuped == 5.0
    assert got[0].sd_y > 0  # raw metric does vary


def test_ushape_hand_computed_credits(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 2)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1: four touches view,click,view,signup then purchase ->
        # 0.4 view, 0.2/2=0.1 click, 0.1 view, 0.4 signup
        (1, t0 + 0 * m, "view", 1.0),
        (1, t0 + 1 * m, "click", 1.0),
        (1, t0 + 2 * m, "view", 1.0),
        (1, t0 + 3 * m, "signup", 1.0),
        (1, t0 + 4 * m, "purchase", 1.0),
        # user 2: two touches click,click -> 0.5 each
        (2, t0 + 0 * m, "click", 1.0),
        (2, t0 + 1 * m, "click", 1.0),
        (2, t0 + 2 * m, "purchase", 1.0),
        # user 3: one touch view -> 1.0
        (3, t0 + 0 * m, "view", 1.0),
        (3, t0 + 1 * m, "purchase", 1.0),
        # user 4: direct conversion (touch AFTER the purchase is ignored)
        (4, t0 + 0 * m, "purchase", 1.0),
        (4, t0 + 1 * m, "view", 1.0),
    ]
    _mk_events(spark, tmp_path, rows)
    from kafka_etl_consumer_spark.plans.queries_pipeline15 import (
        attribution_u_shaped,
    )

    got = {
        r.channel: (r.credit, r.n_touches)
        for r in attribution_u_shaped(spark, str(tmp_path)).collect()
    }
    assert got == {
        "view": (1.5, 3),  # 0.4 + 0.1 (middle) + 1.0
        "click": (1.1, 3),  # 0.1 (middle) + 0.5 + 0.5
        "signup": (0.4, 1),
        "(direct)": (1.0, 0),
    }
    # conservation: total credit == number of converting users
    assert abs(sum(c for c, _ in got.values()) - 4.0) < 1e-9
