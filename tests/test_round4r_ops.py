"""Batch-30 invariant tests: the planted cut is the only shot boundary;
theta set ops are exact when every element survives the threshold."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row


def test_shot_bounds_planted_cut_only(spark, tmp_path):
    spark.createDataFrame(
        [Row(doc_id=i, text="x", source="s", lang="en") for i in (3, 17, 40)]
    ).write.parquet(str(tmp_path / "documents.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline25 import (
        multimodal_shot_bounds,
    )

    got = {
        r.doc_id: (r.n_frames, r.n_boundaries, r.first_boundary_frame)
        for r in multimodal_shot_bounds(spark, str(tmp_path)).collect()
    }
    # base stays < 80 so bytes never wrap: exactly ONE boundary per
    # clip, at the planted cut frame doc_id % 11 + 1
    assert got == {d: (12, 1, d % 11 + 1) for d in (3, 17, 40)}


def test_theta_set_ops_exact_and_consistent(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 2)
    rows = []
    # viewers: users 0-9; purchasers: users 5-14 -> union 15, inter 5
    for u in range(10):
        rows.append((u, "view"))
    for u in range(5, 15):
        rows.append((u, "purchase"))
    spark.createDataFrame(
        [
            Row(event_id=i, ts=t0, user_id=u, event_type=et, value=1.0, props="{}")
            for i, (u, et) in enumerate(rows)
        ]
    ).write.parquet(str(tmp_path / "events.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline25 import (
        sketch_theta_set_ops,
    )

    r = sketch_theta_set_ops(spark, str(tmp_path)).collect()[0]
    assert (r.exact_union, r.exact_intersect) == (15, 5)
    assert r.exact_jaccard == round(5 / 15, 6)
    # the estimate must stay a multiple of the 256 scale and the
    # estimated Jaccard (if any keys survive) must lie in [0, 1]
    assert r.est_union % 256 == 0 and r.est_intersect % 256 == 0
    assert r.est_intersect <= r.est_union
    if r.est_jaccard is not None:
        assert 0.0 <= r.est_jaccard <= 1.0
