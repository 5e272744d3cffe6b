"""Batch-31 invariant tests: SRM fires on a rigged split, delta CI
covers a constant-ratio metric with zero width, entropy endpoints
(uniform -> 1.0, constant -> 0)."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import Row


def _mk_events(spark, tmp_path, rows):
    spark.createDataFrame(
        [
            Row(event_id=i, ts=dt.datetime(2024, 1, 2), user_id=u,
                event_type=et, value=1.0, props="{}")
            for i, (u, et) in enumerate(rows)
        ]
    ).write.parquet(str(tmp_path / "events.parquet"))


def test_srm_fires_on_rigged_split(spark, tmp_path):
    # 90 even users vs 10 odd users: chi2 = 80^2/100 = 64 -> p ~ 1e-15
    rows = [(2 * u, "view") for u in range(90)] + [
        (2 * u + 1, "view") for u in range(10)
    ]
    _mk_events(spark, tmp_path, rows)
    from kafka_etl_consumer_spark.plans.queries_pipeline26 import stats_srm_check

    r = stats_srm_check(spark, str(tmp_path)).collect()[0]
    assert (r.n_variant_a, r.n_variant_b) == (90, 10)
    assert r.chi2 == 64.0
    assert r.srm_detected is True and r.p_value < 1e-9

    # balanced split: no SRM
    rows = [(u, "view") for u in range(100)]
    _mk_events(spark, tmp_path / "ok", rows)
    r = stats_srm_check(spark, str(tmp_path / "ok")).collect()[0]
    assert r.chi2 == 0.0 and r.srm_detected is False


def test_ratio_ci_zero_width_for_constant_ratio(spark, tmp_path):
    # every user: 1 purchase per 2 views -> ratio exactly 0.5 with ZERO
    # delta-method variance (x = theta*y identically)
    rows = []
    for u in range(8):
        views = 2 * (u % 3 + 1)
        rows += [(u, "view")] * views
        rows += [(u, "purchase")] * (views // 2)
    _mk_events(spark, tmp_path, rows)
    from kafka_etl_consumer_spark.plans.queries_pipeline26 import (
        stats_ratio_delta_ci,
    )

    for r in stats_ratio_delta_ci(spark, str(tmp_path)).collect():
        assert r.ratio == 0.5
        assert r.se == 0.0
        assert r.ci_lo == 0.5 and r.ci_hi == 0.5


def test_column_entropy_endpoints(spark, tmp_path):
    # orders: status uniform over 4 values -> norm entropy 1.0;
    # priority constant -> entropy 0
    spark.createDataFrame(
        [
            Row(o_orderkey=i, o_orderstatus=f"S{i % 4}", o_orderpriority="P")
            for i in range(16)
        ]
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [Row(c_custkey=1, c_mktsegment="A")]
    ).write.parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [Row(p_partkey=1, p_brand="B", p_type="T")]
    ).write.parquet(str(tmp_path / "part.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline26 import (
        profile_column_entropy,
    )

    got = {r.col_name: r for r in profile_column_entropy(spark, str(tmp_path)).collect()}
    st = got["orders.o_orderstatus"]
    assert (st.n_values, st.n_distinct) == (16, 4)
    assert st.entropy_bits == 2.0 and st.norm_entropy == 1.0
    pr = got["orders.o_orderpriority"]
    assert (pr.n_distinct, pr.entropy_bits, pr.norm_entropy) == (1, 0.0, 0.0)
    assert len(got) == 5
