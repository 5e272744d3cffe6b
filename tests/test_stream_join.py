"""Stream-stream join: matches only within the time tolerance, across
micro-batches (right row arriving in a later batch still matches a
buffered left row)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import types as T

from kafka_etl_consumer_spark.streaming.joins import stream_stream_join

L_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("lts", T.TimestampType()),
        T.StructField("lval", T.StringType()),
    ]
)
R_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("rts", T.TimestampType()),
        T.StructField("rval", T.StringType()),
    ]
)
T0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _stage(spark, path, schema, rows):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)


def test_stream_stream_join_within_tolerance(spark, tmp_path):
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    m = dt.timedelta
    # left: k=1@10:00, k=2@10:00 ; right batch 1: k=1@10:05 (match, in range)
    _stage(spark, lsrc, L_SCHEMA, [Row(k=1, lts=T0, lval="a"), Row(k=2, lts=T0, lval="b")])
    _stage(spark, rsrc, R_SCHEMA, [Row(k=1, rts=T0 + m(minutes=5), rval="x")])

    joined = stream_stream_join(
        spark.readStream.schema(L_SCHEMA).parquet(lsrc),
        spark.readStream.schema(R_SCHEMA).parquet(rsrc),
        on="k",
        left_ts="lts",
        right_ts="rts",
        watermark="10 minutes",
        tolerance="15 minutes",
    )
    q = joined.writeStream.format("memory").queryName("ssj").outputMode("append").start()
    try:
        q.processAllAvailable()
        # batch 2 on the right: k=2 arrives LATER but within tolerance →
        # must match the buffered left row; k=1@11:00 is out of range
        _stage(
            spark,
            rsrc,
            R_SCHEMA,
            [Row(k=2, rts=T0 + m(minutes=14), rval="y"),
             Row(k=1, rts=T0 + m(minutes=60), rval="z")],
        )
        q.processAllAvailable()
        rows = spark.sql("SELECT k, lval, rval FROM ssj").collect()
    finally:
        q.stop()
    assert sorted((r.k, r.lval, r.rval) for r in rows) == [(1, "a", "x"), (2, "b", "y")]


def test_stream_stream_left_outer_emits_null_after_watermark(spark, tmp_path):
    """Outer semantics: an unmatched left row is emitted null-padded only
    once the watermark PROVES no match can still arrive (delay, then
    emission — never absence)."""
    lsrc, rsrc = str(tmp_path / "lo"), str(tmp_path / "ro")
    m = dt.timedelta
    # left k=1@10:00 will never match; right has only an unrelated key
    _stage(spark, lsrc, L_SCHEMA, [Row(k=1, lts=T0, lval="lonely")])
    _stage(spark, rsrc, R_SCHEMA, [Row(k=9, rts=T0, rval="other")])

    joined = stream_stream_join(
        spark.readStream.schema(L_SCHEMA).parquet(lsrc),
        spark.readStream.schema(R_SCHEMA).parquet(rsrc),
        on="k",
        left_ts="lts",
        right_ts="rts",
        watermark="10 minutes",
        tolerance="15 minutes",
        how="left_outer",
    )
    q = joined.writeStream.format("memory").queryName("ssjo").outputMode("append").start()
    try:
        q.processAllAvailable()
        # advance BOTH watermarks far past lts + tolerance (+delay):
        # k=1's match window closes, so the null-padded row must emit
        far = T0 + m(minutes=60)
        _stage(spark, lsrc, L_SCHEMA, [Row(k=5, lts=far, lval="late")])
        _stage(spark, rsrc, R_SCHEMA, [Row(k=5, rts=far, rval="late-r")])
        q.processAllAvailable()
        # one more micro-batch so the state-eviction pass runs
        _stage(spark, rsrc, R_SCHEMA, [Row(k=6, rts=far + m(minutes=5), rval="tick")])
        q.processAllAvailable()
        rows = spark.sql("SELECT k, lval, rval FROM ssjo").collect()
    finally:
        q.stop()
    got = sorted((r.k, r.lval, r.rval) for r in rows)
    assert (1, "lonely", None) in got            # outer row, null-padded
    assert (5, "late", "late-r") in got          # normal in-window match
