"""Batch-28 invariant tests: windowed funnel outcome classes, session
path truncation/ordering, MinHash estimator exactness on identical and
disjoint docs."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row


def _mk_events(spark, tmp_path, rows):
    spark.createDataFrame(
        [
            Row(event_id=i, ts=ts, user_id=u, event_type=et, value=1.0, props="{}")
            for i, (u, ts, et) in enumerate(rows)
        ]
    ).write.parquet(str(tmp_path / "events.parquet"))


def test_funnel_window_outcome_classes(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    d = dt.timedelta
    rows = [
        # user 1: converts on day 3 -> in window
        (1, t0, "signup"), (1, t0 + d(days=3), "purchase"),
        # user 2: converts on day 10 -> late
        (2, t0, "signup"), (2, t0 + d(days=10), "purchase"),
        # user 3: purchase BEFORE signup only -> not converted
        (3, t0 - d(days=1), "purchase"), (3, t0, "signup"),
        # user 4: never purchases
        (4, t0, "signup"),
        # user 5: purchases but never signed up -> not in funnel
        (5, t0, "purchase"),
    ]
    _mk_events(spark, tmp_path, rows)
    from kafka_etl_consumer_spark.plans.queries_pipeline23 import (
        funnel_conversion_window,
    )

    r = funnel_conversion_window(spark, str(tmp_path)).collect()[0]
    assert (r.n_signup_users, r.n_converted_7d, r.n_converted_late) == (4, 1, 1)
    assert r.conv_rate_7d == 0.25


def test_session_paths_split_order_truncate(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = []
    # user 1, session A: view>click; 31-min gap; session B: view>click
    rows += [(1, t0, "view"), (1, t0 + m, "click")]
    rows += [(1, t0 + 32 * m, "view"), (1, t0 + 33 * m, "click")]
    # user 2: one session of 10 events -> path truncates to first 8
    for j in range(10):
        rows.append((2, t0 + j * m, "view"))
    _mk_events(spark, tmp_path, rows)
    from kafka_etl_consumer_spark.plans.queries_pipeline23 import (
        session_path_topk,
    )

    got = {r.path: r.n_sessions for r in session_path_topk(spark, str(tmp_path)).collect()}
    assert got == {
        "view>click": 2,
        ">".join(["view"] * 8): 1,  # 10 events, capped at 8 steps
    }


def test_minhash_estimator_identical_docs_zero_error(spark, tmp_path):
    # identical docs: signatures match on all 24 hashes AND true
    # jaccard is 1 -> error exactly 0; pair count = C(3,2)
    texts = ["alpha beta gamma delta epsilon zeta"] * 3
    spark.createDataFrame(
        [Row(doc_id=i, text=t, source="s", lang="en") for i, t in enumerate(texts)]
    ).write.parquet(str(tmp_path / "documents.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline23 import (
        dedup_minhash_est_error,
    )

    r = dedup_minhash_est_error(spark, str(tmp_path)).collect()[0]
    assert r.n_pairs == 3
    assert r.mean_abs_err == 0.0 and r.max_abs_err == 0.0
