"""Batch-29 invariant tests: hand-computed average precision, symbol-
density code routing, dup-invoice blocking/window semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row


def test_average_precision_hand_computed(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 2)
    pairs = [(1, True), (2, False), (3, False), (4, True), (5, True), (6, True)]
    rows = []
    for u, (views, conv) in enumerate(pairs, start=1):
        rows += [(u, "view", 1.0)] * views
        if conv:
            rows.append((u, "purchase", 200.0))
    spark.createDataFrame(
        [
            Row(event_id=i, ts=t0, user_id=u, event_type=et, value=v, props="{}")
            for i, (u, et, v) in enumerate(rows)
        ]
    ).write.parquet(str(tmp_path / "events.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline24 import eval_pr_auc

    r = eval_pr_auc(spark, str(tmp_path)).collect()[0]
    assert (r.n_users, r.n_pos) == (6, 4)
    assert r.prevalence == round(4 / 6, 6)
    # AP = .25*(1/1) + .25*(2/2) + .25*(3/3) + .25*(4/6)
    assert r.avg_precision == round(0.75 + 0.25 * 4 / 6, 6)


def test_code_detect_routes_symbol_dense_docs(spark, tmp_path):
    code = "if (x == 1) { y[0] = 2; }"
    prose = "the quick brown fox jumps over the lazy dog"
    spark.createDataFrame(
        [
            Row(doc_id=0, text=code, source="code", lang="en"),
            Row(doc_id=1, text=prose, source="prose", lang="en"),
            Row(doc_id=2, text=prose, source="prose", lang="en"),
        ]
    ).write.parquet(str(tmp_path / "documents.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline24 import (
        text_code_detect,
    )

    got = {r.source: r for r in text_code_detect(spark, str(tmp_path)).collect()}
    n_sym = sum(code.count(ch) for ch in "{};=<>()[]#")
    assert got["code"].n_code_docs == 1
    assert got["code"].total_symbols == n_sym
    assert got["code"].avg_symbol_ratio == round(n_sym / len(code), 6)
    assert got["prose"].n_code_docs == 0 and got["prose"].total_symbols == 0


def test_dup_invoices_blocking_and_window(spark, tmp_path):
    d0 = dt.datetime(2024, 1, 1)
    rows = [
        # cust 1: same bucket (floor(p/5000)=2), 10 days apart -> PAIR
        (1, 1, 12000.0, d0),
        (2, 1, 13000.0, d0 + dt.timedelta(days=10)),
        # same bucket but 200 days later -> outside window
        (3, 1, 12000.0, d0 + dt.timedelta(days=200)),
        # cust 2: close in time but different buckets (0 vs 1)
        (4, 2, 3000.0, d0),
        (5, 2, 9000.0, d0 + dt.timedelta(days=1)),
    ]
    spark.createDataFrame(
        [
            Row(o_orderkey=k, o_custkey=c, o_totalprice=p, o_orderdate=d)
            for k, c, p, d in rows
        ]
    ).write.parquet(str(tmp_path / "orders.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline24 import (
        orders_duplicate_invoices,
    )

    got = [
        (r.custkey, r.key_a, r.key_b, r.price_bucket, r.days_apart)
        for r in orders_duplicate_invoices(spark, str(tmp_path)).collect()
    ]
    assert got == [(1, 1, 2, 2, 10)]
