"""Batch-25 invariant tests: hand-computed best-F1 sweep, Spearman
endpoints (+1 / -1), planted duplicate-class histogram."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row


def _mk_events(spark, tmp_path, rows):
    spark.createDataFrame(
        [
            Row(event_id=i, ts=ts, user_id=u, event_type=et, value=v, props="{}")
            for i, (u, ts, et, v) in enumerate(rows)
        ]
    ).write.parquet(str(tmp_path / "events.parquet"))


def _score_label_rows(pairs):
    t0 = dt.datetime(2024, 1, 2)
    rows = []
    for u, (views, conv) in enumerate(pairs, start=1):
        rows += [(u, t0, "view", 1.0)] * views
        if conv:
            rows.append((u, t0, "purchase", 200.0))
    return rows


def test_f1_sweep_hand_computed(spark, tmp_path):
    # scores 1..6, converters at 4,5,6 plus noise at score 1:
    # t=4 gives tp=3 fp=0 fn=1 -> F1 = 6/7, the max
    pairs = [(1, True), (2, False), (3, False), (4, True), (5, True), (6, True)]
    _mk_events(spark, tmp_path, _score_label_rows(pairs))
    from kafka_etl_consumer_spark.plans.queries_pipeline20 import (
        eval_f1_best_threshold,
    )

    r = eval_f1_best_threshold(spark, str(tmp_path)).collect()[0]
    assert (r.threshold, r.tp, r.fp, r.fn) == (4, 3, 0, 1)
    assert (r.precision_at_t, r.recall_at_t) == (1.0, 0.75)
    assert r.f1 == round(6 / 7, 6)


def test_spearman_monotone_endpoints(spark, tmp_path):
    from kafka_etl_consumer_spark.plans.queries_pipeline20 import (
        stats_spearman_corr,
    )

    t0 = dt.datetime(2024, 1, 2)
    # y strictly increases with x -> rho = +1 even though the relation
    # (x, x^2) is nonlinear
    rows = []
    for u in range(1, 7):
        rows += [(u, t0, "view", 1.0)] * u
        rows += [(u, t0, "purchase", 1.0)] * (u * u)
    _mk_events(spark, tmp_path, rows)
    r = stats_spearman_corr(spark, str(tmp_path)).collect()[0]
    assert (r.n_users, r.spearman_rho) == (6, 1.0)

    # y strictly decreases with x -> rho = -1
    rows = []
    for u in range(1, 7):
        rows += [(u, t0, "view", 1.0)] * u
        rows += [(u, t0, "purchase", 1.0)] * (7 - u)
    _mk_events(spark, tmp_path / "anti", rows)
    r = stats_spearman_corr(spark, str(tmp_path / "anti")).collect()[0]
    assert (r.n_users, r.spearman_rho) == (6, -1.0)


def test_dup_class_histogram_planted(spark, tmp_path):
    texts = ["a a a", "a a a", "a a a", "b b", "b b", "c"]
    spark.createDataFrame(
        [Row(doc_id=i, text=t, source="s", lang="en") for i, t in enumerate(texts)]
    ).write.parquet(str(tmp_path / "documents.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline20 import (
        dedup_class_histogram,
    )

    got = sorted(
        (r.class_size, r.n_classes, r.n_docs)
        for r in dedup_class_histogram(spark, str(tmp_path)).collect()
    )
    assert got == [(1, 1, 1), (2, 1, 2), (3, 1, 3)]
