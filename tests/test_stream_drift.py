"""Streaming Page-Hinkley monitor: state must carry the recurrence
across micro-batches, and the final emission must agree with the batch
``ts_page_hinkley`` query on the same (rounded) daily-mean series — the
batch/stream parity contract every streaming operator here honors."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_etl_consumer_spark.plans import QUERIES
from kafka_etl_consumer_spark.streaming.drift import page_hinkley_monitor

SCHEMA = T.StructType(
    [
        T.StructField("series", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("m", T.DoubleType()),
    ]
)


def _daily_series(spark, sf_dir):
    """The exact reduction ts_page_hinkley performs before its prefix
    passes: per-day mean of events.value, rounded to 6dp, day-ordered."""
    from kafka_etl_consumer_spark.plans.registry import _t

    rows = (
        _t(spark, sf_dir, "events")
        .select(F.to_date(F.date_trunc("day", "ts")).alias("d"), "value")
        .groupBy("d")
        .agg(F.round(F.avg("value"), 6).alias("m"))
        .orderBy("d")
        .collect()
    )
    return [(r.d, float(r.m)) for r in rows]


def test_stream_matches_batch_twin(spark, sf_dir, tmp_path):
    series = _daily_series(spark, sf_dir)
    assert len(series) >= 5
    batch = QUERIES["ts_page_hinkley"](spark, sf_dir).collect()[0]

    src = str(tmp_path / "src")

    def stage(chunk):
        rows = [
            Row(
                series="daily_value",
                ts=dt.datetime.combine(d, dt.time(0, 0)),
                m=m,
            )
            for d, m in chunk
        ]
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    # split the series across two files => two micro-batches: the
    # recurrence must resume from stored state, not restart
    cut = len(series) // 2
    stage(series[:cut])
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(src)
    )
    out = page_hinkley_monitor(stream, key_col="series", ts_col="ts", value_col="m")
    q = (
        out.writeStream.format("memory")
        .queryName("ph_monitor")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        stage(series[cut:])
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM ph_monitor ORDER BY n_obs"
        ).collect()
    finally:
        q.stop()

    assert [r.n_obs for r in rows] == [cut, len(series)]
    final = rows[-1]
    # parity with the batch query: same peak statistic, same verdict
    assert round(final.max_ph, 6) == float(batch.max_ph)
    assert final.drift_detected == bool(batch.drift_detected)
    if batch.alarm_day is not None:
        # alarm_seq is the 1-based index of the alarm day in day order
        days = [d.isoformat() for d, _ in series]
        assert final.alarm_seq == days.index(batch.alarm_day) + 1
    else:
        assert final.alarm_seq == 0
    # the mid-stream emission must reflect a PARTIAL series (running
    # state), not the full answer
    assert rows[0].n_obs == cut


def test_drift_tws_matches_v1(spark, tmp_path):
    # v2 (transformWithStateInPandas) must emit the same final state as
    # the v1 path on the injected-drift series. Same protobuf/RocksDB env
    # gate as test_stateful.test_transform_with_state_matches_v1
    # (CAPABILITIES.md activation map).
    import pytest

    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithState state server needs protobuf",
    )
    from kafka_etl_consumer_spark.streaming.drift import page_hinkley_monitor_tws

    base = dt.datetime(2024, 1, 1)
    series = [50.0] * 10 + [70.0] * 5
    src = str(tmp_path / "src_tws")
    rows = [
        Row(series="s", ts=base + dt.timedelta(days=i), m=v)
        for i, v in enumerate(series)
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(src)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        out = page_hinkley_monitor_tws(
            stream, key_col="series", ts_col="ts", value_col="m"
        )
        q = (
            out.writeStream.format("memory")
            .queryName("ph_tws")
            .outputMode("update")
            .start()
        )
        try:
            q.processAllAvailable()
            final = spark.sql(
                "SELECT * FROM ph_tws ORDER BY n_obs DESC LIMIT 1"
            ).collect()[0]
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    assert final.drift_detected is True
    assert 11 <= final.alarm_seq <= 15
    assert final.max_ph > 5.0


def test_stream_detects_injected_drift(spark, tmp_path):
    # a flat series then a level shift must set drift_detected with the
    # alarm inside the shifted region
    base = dt.datetime(2024, 1, 1)
    series = [50.0] * 10 + [70.0] * 5
    src = str(tmp_path / "src")
    rows = [
        Row(series="s", ts=base + dt.timedelta(days=i), m=v)
        for i, v in enumerate(series)
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = page_hinkley_monitor(stream, key_col="series", ts_col="ts", value_col="m")
    q = (
        out.writeStream.format("memory")
        .queryName("ph_inject")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        final = spark.sql(
            "SELECT * FROM ph_inject ORDER BY n_obs DESC LIMIT 1"
        ).collect()[0]
    finally:
        q.stop()
    assert final.drift_detected is True
    assert 11 <= final.alarm_seq <= 15
    assert final.max_ph > 5.0
