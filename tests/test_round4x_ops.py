"""Batch-36 invariant tests: skyline dominance against a brute-force
reference, duplicate-point collapse, hour-profile shares."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row


def test_skyline_matches_bruteforce(spark, tmp_path):
    pts = [
        (1, 10.0, 5), (2, 10.0, 3), (3, 12.0, 2), (4, 12.0, 4),
        (5, 9.0, 9), (6, 15.0, 1), (7, 15.0, 1),  # duplicate point
        (8, 20.0, 8),
    ]
    spark.createDataFrame(
        [Row(p_partkey=k, p_retailprice=pr, p_size=s) for k, pr, s in pts]
    ).write.parquet(str(tmp_path / "part.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline31 import (
        skyline_parts_2d,
    )

    got = sorted(
        (r.price, r.size, r.keeper_partkey, r.n_parts)
        for r in skyline_parts_2d(spark, str(tmp_path)).collect()
    )

    # brute force on distinct points: p dominated iff q <= p in both
    # dims with one strict
    uniq = sorted({(pr, s) for _, pr, s in pts})
    frontier = [
        (pr, s)
        for pr, s in uniq
        if not any(
            (q[0] <= pr and q[1] <= s and (q[0] < pr or q[1] < s))
            for q in uniq
        )
    ]
    assert [(p, s) for p, s, _, _ in got] == sorted(frontier)
    # the duplicated frontier point carries both parts and the min key
    dup = [g for g in got if g[0] == 15.0]
    assert dup == [(15.0, 1, 6, 2)]


def test_hour_profile_shares_sum_to_one(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    rows = [(1, base + dt.timedelta(hours=2, minutes=m)) for m in range(3)]
    rows += [(2, base + dt.timedelta(hours=23))]
    spark.createDataFrame(
        [
            Row(event_id=i, ts=ts, user_id=u, event_type="view", value=1.0,
                props="{}")
            for i, (u, ts) in enumerate(rows)
        ]
    ).write.parquet(str(tmp_path / "events.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline31 import (
        events_hour_profile,
    )

    got = {
        r.hour: (r.n, r.share_of_type)
        for r in events_hour_profile(spark, str(tmp_path)).collect()
    }
    assert got == {2: (3, 0.75), 23: (1, 0.25)}
