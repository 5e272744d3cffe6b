"""Batch-33 invariant tests: Fano/burstiness endpoints, exact half-life
decay, IQR fence flags only the spike day."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row


def _mk_daily(spark, tmp_path, series, etype="view"):
    rows, eid = [], 0
    base = dt.datetime(2024, 2, 1)
    for off, n in enumerate(series):
        for k in range(n):
            rows.append(
                Row(event_id=eid, ts=base + dt.timedelta(days=off, minutes=k),
                    user_id=k, event_type=etype, value=1.0, props="{}")
            )
            eid += 1
    spark.createDataFrame(rows).write.parquet(str(tmp_path / "events.parquet"))


def test_fano_constant_series_endpoint(spark, tmp_path):
    _mk_daily(spark, tmp_path, [4, 4, 4])
    from kafka_etl_consumer_spark.plans.queries_pipeline28 import (
        ts_burstiness_fano,
    )

    r = ts_burstiness_fano(spark, str(tmp_path)).collect()[0]
    # zero variance: Fano 0, burstiness exactly -1 (perfectly regular)
    assert (r.n_days, r.mean_daily) == (3, 4.0)
    assert r.fano_factor == 0.0 and r.burstiness == -1.0


def test_decay_exact_half_life(spark, tmp_path):
    h = dt.datetime(2024, 2, 10)
    rows = [
        Row(event_id=0, ts=h, user_id=1, event_type="view", value=1.0, props="{}"),
        Row(event_id=1, ts=h - dt.timedelta(days=7), user_id=2,
            event_type="view", value=1.0, props="{}"),
    ]
    spark.createDataFrame(rows).write.parquet(str(tmp_path / "events.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline28 import (
        user_decay_engagement,
    )

    got = {r.user_id: r.decay_score for r in user_decay_engagement(spark, str(tmp_path)).collect()}
    assert got[1] == 1.0       # at the horizon: no decay
    assert got[2] == 0.5       # exactly one half-life earlier


def test_iqr_flags_only_spike_day(spark, tmp_path):
    _mk_daily(spark, tmp_path, [10] * 6 + [100])
    from kafka_etl_consumer_spark.plans.queries_pipeline28 import (
        ts_daily_anomaly_iqr,
    )

    got = [
        (r.d, r.n_events, r.side)
        for r in ts_daily_anomaly_iqr(spark, str(tmp_path)).collect()
    ]
    assert got == [("2024-02-07", 100, "high")]
