"""Round-4 batch-14 invariant tests: the properties the DuckDB oracles
can't express directly — brute-force parity on crafted inputs, algebraic
reconstruction identities, and known-graph-theory ground truths."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row


def test_rolling7_matches_bruteforce(spark, tmp_path):
    # users on scattered days, including a gap larger than the window so
    # the trailing count genuinely drops back down
    base = dt.datetime(2024, 3, 1)
    rows = []
    days_users = {
        0: [1, 2],
        1: [2, 3],
        5: [1],
        6: [4],
        14: [1, 5],  # > 7-day gap: days 13 windows must not see day 6
    }
    eid = 0
    for off, users in days_users.items():
        for u in users:
            rows.append(
                Row(
                    event_id=eid,
                    ts=base + dt.timedelta(days=off, hours=u),
                    user_id=u,
                    event_type="view",
                    value=1.0,
                    props="{}",
                )
            )
            eid += 1
    spark.createDataFrame(rows).write.parquet(str(tmp_path / "events.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline9 import (
        rolling_distinct_users_7d,
    )

    got = {
        r.day: (r.dau, r.rolling7_users)
        for r in rolling_distinct_users_7d(spark, str(tmp_path)).collect()
    }
    # brute force over every covered day
    all_days = sorted(days_users)
    max_day = max(all_days)
    expected = {}
    for d in range(0, max_day + 1):
        dau = len(days_users.get(d, []))
        window = {
            u
            for off in range(d - 6, d + 1)
            for u in days_users.get(off, [])
        }
        if window:
            day = (base + dt.timedelta(days=d)).strftime("%Y-%m-%d")
            expected[day] = (dau, len(window))
    assert got == expected


def test_assortativity_star_graph_is_minus_one(spark, tmp_path):
    # co-order pairs (hub, leaf_i): a pure star — Newman r = -1 exactly
    rows = [
        Row(l_orderkey=20 * (i + 1), l_partkey=p)
        for i in range(5)
        for p in (1, i + 2)
    ]
    spark.createDataFrame(rows).write.parquet(str(tmp_path / "lineitem.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline9 import (
        graph_degree_assortativity,
    )

    out = graph_degree_assortativity(spark, str(tmp_path)).collect()[0]
    assert out.n_directed_edges == 10
    assert out.assortativity == pytest.approx(-1.0, abs=1e-6)


def test_decompose_reconstructs_series(spark):
    from kafka_etl_consumer_spark.plans.queries_pipeline9 import (
        ts_decompose_additive,
    )

    rows = ts_decompose_additive(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 30
    for r in rows:
        # y = trend + seasonal + resid up to the 6dp rounding applied twice
        assert r.y == pytest.approx(
            r.trend + r.seasonal + r.resid, abs=5e-6
        ), r
    # seasonal components are centered: the 7 dow values sum to ~0
    dow_seasonal = {r.dow: r.seasonal for r in rows}
    assert sum(dow_seasonal.values()) == pytest.approx(0.0, abs=5e-6)


def test_calibration_bins_partition_the_corpus(spark):
    from kafka_etl_consumer_spark.plans.queries_pipeline9 import (
        eval_calibration_bins,
    )

    rows = eval_calibration_bins(spark, "/root/testdata/sf0.001").collect()
    n_emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).count()
    assert sum(r.n for r in rows) == n_emb
    # every row carries the same ECE and it equals the n-weighted gap mean
    eces = {r.ece for r in rows}
    assert len(eces) == 1
    want = sum(r.n * r.gap for r in rows) / sum(r.n for r in rows)
    assert rows[0].ece == pytest.approx(want, abs=5e-6)
    for r in rows:
        assert 0 <= r.pos_rate <= 1
        assert 0 <= r.avg_conf <= 1


def test_ndcg_is_nondegenerate_and_bounded(spark):
    from kafka_etl_consumer_spark.plans.queries_pipeline9 import eval_ndcg_rank

    rows = {r.k: r for r in eval_ndcg_rank(spark, "/root/testdata/sf0.001").collect()}
    assert set(rows) == {5, 10}
    for r in rows.values():
        assert 0.0 < r.ndcg < 1.0  # ranking must be neither perfect nor empty
        assert r.dcg <= r.idcg


def test_compaction_bins_are_contiguous_and_capacity_shaped(spark):
    from kafka_etl_consumer_spark.plans.queries_pipeline9 import (
        _COMPACT_TARGET,
        compaction_bin_plan,
    )

    rows = sorted(
        compaction_bin_plan(spark, "/root/testdata/sf0.01").collect(),
        key=lambda r: r.bin_id,
    )
    assert [r.bin_id for r in rows] == list(range(len(rows)))
    # bins cover disjoint, ordered day ranges
    for a, b in zip(rows, rows[1:]):
        assert a.day_max < b.day_min
    # every bin except the last crosses the capacity threshold when its
    # last day lands (that's what triggers the next cut)
    for r in rows[:-1]:
        assert r.total_rows >= 1  # non-empty
    total = sum(r.total_rows for r in rows)
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet").count()
    assert total == orders
    # no bin (except possibly a single-giant-day bin) wildly exceeds target:
    # a bin stops growing once it crosses target, so size < target + max-day
    from pyspark.sql import functions as F

    day_max = (
        spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    for r in rows:
        assert r.total_rows < _COMPACT_TARGET + day_max


def test_transition_entropy_bounds(spark):
    from kafka_etl_consumer_spark.plans.queries_pipeline9 import (
        event_transition_entropy,
    )

    rows = event_transition_entropy(spark, "/root/testdata/sf0.001").collect()
    assert rows
    import math

    for r in rows:
        assert 0 <= r.entropy_bits <= math.log2(5) + 1e-9  # <=5 next states
        assert r.branching_factor == pytest.approx(
            2**r.entropy_bits, rel=1e-4
        )
