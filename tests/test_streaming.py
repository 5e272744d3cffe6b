"""Streaming semantics tests: event-time windows + watermark late-data
policy + stateful dedup, driven through real StreamingQuery objects on a
file source (one staged file per micro-batch via maxFilesPerTrigger)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_etl_consumer_spark.streaming.windows import (
    session_agg,
    streaming_dedup,
    tumbling_agg,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)

T0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _rows(*specs):
    return [
        Row(event_id=i, ts=T0 + dt.timedelta(minutes=m), user_id=u, value=float(v))
        for (i, m, u, v) in specs
    ]


def _stage(spark, path, rows, n=1):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_tumbling_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode tumbling agg: a row arriving behind the watermark is
    dropped — the event-time-correct behavior the reference lacks
    (it would land the late row in the currently-open directory)."""
    src = str(tmp_path / "src")
    # batch 1: two rows in the 10:00 window
    _stage(spark, src, _rows((1, 1, 1, 1.0), (2, 2, 1, 1.0)))
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(src)
    )
    out = tumbling_agg(
        stream, "ts", "5 minutes", [F.count("*").alias("n")], watermark="10 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("tumbling_wm")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: jump event time +60min → watermark passes the 10:00 window
        _stage(spark, src, _rows((3, 60, 1, 1.0)))
        q.processAllAvailable()
        # batch 3: LATE row for the (already finalized) 10:00 window + fresh row
        _stage(spark, src, _rows((4, 3, 1, 99.0), (5, 61, 1, 1.0)))
        q.processAllAvailable()
        # batch 4: advance further so the 11:00 window finalizes too
        _stage(spark, src, _rows((6, 180, 1, 1.0)))
        q.processAllAvailable()
        got = {
            r.window_start: r.n for r in spark.sql("SELECT * FROM tumbling_wm").collect()
        }
    finally:
        q.stop()
    # the 10:00-10:05 window must have exactly 2 events: the late row (id=4)
    # was dropped, NOT counted
    assert got[T0 + dt.timedelta(minutes=0)] == 2
    # events 3 (+60min) and 5 (+61min) share the [11:00,11:05) window
    assert got[T0 + dt.timedelta(minutes=60)] == 2


def test_streaming_session_window(spark, tmp_path):
    src = str(tmp_path / "src")
    # user 1: events at +0,+10 (one session), +90 (new session)
    _stage(spark, src, _rows((1, 0, 1, 1.0), (2, 10, 1, 1.0), (3, 90, 1, 1.0)))
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = session_agg(
        stream,
        "ts",
        "30 minutes",
        [F.count("*").alias("n")],
        group_cols=["user_id"],
        watermark="10 minutes",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM sessions ORDER BY session_start").collect()
    finally:
        q.stop()
    assert [(r.session_start, r.n) for r in rows] == [
        (T0, 2),
        (T0 + dt.timedelta(minutes=90), 1),
    ]


def test_streaming_dedup_within_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    # duplicate event_ids within the watermark window
    _stage(
        spark,
        src,
        _rows((1, 0, 1, 1.0), (1, 1, 1, 1.0), (2, 2, 1, 1.0), (2, 2, 1, 1.0), (3, 3, 2, 5.0)),
    )
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = streaming_dedup(stream, ["event_id"], ts_col="ts", watermark="30 minutes")
    q = out.writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try:
        q.processAllAvailable()
        n = spark.sql("SELECT count(DISTINCT event_id) AS n, count(*) AS total FROM dedup").first()
    finally:
        q.stop()
    assert (n.n, n.total) == (3, 3)


def test_streaming_ohlc_bars_match_batch(spark, tmp_path):
    """resample_bars runs unchanged on a stream (complete-mode windowed
    agg with min_by/max_by state) and the final bars equal the batch
    computation over the same rows — the streaming twin of
    ts_resample_ohlc."""
    from kafka_etl_consumer_spark.operators.timeseries import resample_bars

    src = str(tmp_path / "src")
    batch1 = _rows((1, 1, 1, 10.0), (2, 2, 1, 30.0), (3, 3, 2, 20.0))
    batch2 = _rows((4, 4, 1, 5.0), (5, 370, 1, 7.0))  # second 6h bucket
    _stage(spark, src, batch1)
    _stage(spark, src, batch2)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(src)
    )
    bars = resample_bars(stream, every="6 hours", group_cols=["user_id"])
    q = (
        bars.writeStream.format("memory")
        .queryName("ohlc_stream")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.user_id, r.bucket_ts): (r.open, r.high, r.low, r.close, r.n)
        for r in spark.sql("SELECT * FROM ohlc_stream").collect()
    }
    want = {
        (r.user_id, r.bucket_ts): (r.open, r.high, r.low, r.close, r.n)
        for r in resample_bars(
            spark.createDataFrame(batch1 + batch2, SCHEMA),
            every="6 hours",
            group_cols=["user_id"],
        ).collect()
    }
    assert got == want
    # and the bar itself is right: user 1 bucket 1 opened at 10, closed at 5
    u1 = [v for (u, _), v in want.items() if u == 1]
    assert (10.0, 30.0, 5.0, 5.0, 3) in u1


def test_streaming_growth_accounting_matches_batch(spark, tmp_path):
    """The streaming first-seen table, accumulated across 3 micro-batches
    with repeat users, must yield the same (day, new, cumulative) curve
    as the batch user_growth_accounting rollup over the full feed."""
    from kafka_etl_consumer_spark.streaming.windows import (
        growth_curve,
        streaming_first_seen,
    )

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    day = 24 * 60
    batches = [
        _rows((0, 0, 1, 1), (1, 5, 2, 1)),                      # day 0: users 1,2
        _rows((2, 10, 1, 1), (3, day + 5, 3, 1)),               # repeat 1; day 1: user 3
        _rows((4, day + 10, 2, 1), (5, 2 * day + 1, 4, 1)),     # repeat 2; day 2: user 4
    ]
    for b in batches:
        _stage(spark, src, b)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = streaming_first_seen(stream, sink, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r.day: (r.new_users, r.cumulative_users)
        for r in growth_curve(spark, sink).collect()
    }
    assert got == {
        "2024-01-01": (2, 2),
        "2024-01-02": (1, 3),
        "2024-01-03": (1, 4),
    }

    # restart with a NEW batch over the same checkpoint: state survives —
    # user 1 stays first-seen on day 0, only genuinely new user 5 lands
    _stage(spark, src, _rows((6, 3 * day + 2, 1, 1), (7, 3 * day + 3, 5, 1)))
    stream2 = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q2 = streaming_first_seen(stream2, sink, ckpt)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got2 = {
        r.day: (r.new_users, r.cumulative_users)
        for r in growth_curve(spark, sink).collect()
    }
    assert got2["2024-01-04"] == (1, 5)
    assert got2["2024-01-01"] == (2, 2)
