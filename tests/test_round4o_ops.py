"""Batch-27 invariant tests: hard negatives exclude same-label twins,
power grid vs the closed form, BH rejects the separated test only."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import Row


def test_hard_negatives_exclude_same_label(spark, tmp_path):
    rows = [
        Row(vec_id=0, label=0, embedding=[1.0, 0.0]),
        Row(vec_id=100, label=1, embedding=[1.0, 0.0]),   # cos 1.0
        Row(vec_id=101, label=1, embedding=[0.9, 0.1]),   # cos ~.994
        Row(vec_id=102, label=1, embedding=[0.0, 1.0]),   # cos 0
        Row(vec_id=103, label=0, embedding=[1.0, 0.0]),   # same label: excluded
    ]
    spark.createDataFrame(rows).write.parquet(str(tmp_path / "embeddings.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline22 import (
        mine_hard_negatives,
    )

    got = [
        (r.q_vec_id, r.vec_id, r.neg_label, r.score)
        for r in mine_hard_negatives(spark, str(tmp_path))
        .orderBy("q_vec_id", "vec_id")
        .collect()
        if r.q_vec_id == 0
    ]
    ids = [v for _, v, _, _ in got]
    assert sorted(ids) == [100, 101, 102]  # 103 (same label) never appears
    scores = {v: s for _, v, _, s in got}
    assert scores[100] == 1.0 and scores[102] == 0.0
    assert 0.99 < scores[101] < 1.0


def test_power_grid_closed_form(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 2)
    rows = [
        Row(event_id=0, ts=t0, user_id=1, event_type="view", value=1.0, props="{}"),
        Row(event_id=1, ts=t0, user_id=2, event_type="purchase", value=1.0, props="{}"),
        Row(event_id=2, ts=t0, user_id=2, event_type="purchase", value=1.0, props="{}"),
    ]
    spark.createDataFrame(rows).write.parquet(str(tmp_path / "events.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline22 import (
        stats_power_mde_grid,
    )

    got = {r.mde: r for r in stats_power_mde_grid(spark, str(tmp_path)).collect()}
    # y = [0, 2] -> var_pop = 1.0
    assert got[1.0].var_y == 1.0 and got[1.0].n_observed == 2
    base = (1.96 + 0.8416) ** 2 * 2
    for mde in (0.5, 1.0, 2.0):
        assert got[mde].n_per_arm == math.ceil(base / mde**2)


def test_fdr_rejects_only_separated_type(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 2)
    rows, eid = [], 0
    for u in range(10):
        for j in range(10):  # 'shift': even users 1.0, odd users 100.0
            rows.append(
                Row(event_id=eid, ts=t0, user_id=u, event_type="shift",
                    value=1.0 if u % 2 == 0 else 100.0, props="{}")
            )
            eid += 1
        # 'same': identical-ish distribution across parities
        rows.append(
            Row(event_id=eid, ts=t0, user_id=u, event_type="same",
                value=float(u % 3), props="{}")
        )
        eid += 1
    spark.createDataFrame(rows).write.parquet(str(tmp_path / "events.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline22 import stats_fdr_bh

    got = {r.event_type: r for r in stats_fdr_bh(spark, str(tmp_path)).collect()}
    assert got["shift"].rejected is True and got["shift"].p_rank == 1
    assert got["same"].rejected is False
    assert got["shift"].p_two_sided < 0.001 < got["same"].p_two_sided
