"""Batch-23 invariant tests: Holt-Winters locks onto a pure periodic
series (level = mean, trend = 0, forecast = true next value), and
short series are dropped."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row


def _mk_events(spark, tmp_path, series):
    rows, eid = [], 0
    base = dt.datetime(2024, 4, 1)
    for etype, counts in series.items():
        for off, n in enumerate(counts):
            for j in range(n):
                rows.append(
                    Row(event_id=eid, ts=base + dt.timedelta(days=off, minutes=j),
                        user_id=j, event_type=etype, value=1.0, props="{}")
                )
                eid += 1
    spark.createDataFrame(rows).write.parquet(str(tmp_path / "events.parquet"))


def test_hw_pure_periodic_series(spark, tmp_path):
    pattern = [8, 12, 10, 14, 9, 11, 6]  # mean 10, weekly cycle
    counts = pattern * 3  # 21 days
    _mk_events(spark, tmp_path, {"view": counts, "tiny": [1, 2, 3]})
    from kafka_etl_consumer_spark.plans.queries_pipeline18 import (
        ts_holtwinters_additive,
    )

    got = {r.event_type: r for r in ts_holtwinters_additive(spark, str(tmp_path)).collect()}
    # series shorter than period+1 is dropped, not misfit
    assert set(got) == {"view"}
    r = got["view"]
    assert r.n_days == 21
    # a perfectly periodic series is a fixed point of the additive HW
    # recursion: level pins to the seasonal mean, trend to 0, and the
    # one-step forecast reproduces the next true value (day 22 -> 8)
    assert abs(r.level - 10.0) < 1e-6
    assert abs(r.trend) < 1e-6
    assert abs(r.forecast_1 - 8.0) < 1e-6
