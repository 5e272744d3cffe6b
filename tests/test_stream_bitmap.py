"""Incremental bitmap-presence maintenance on a stream: a foreachBatch
sink OR-merges per-batch hour bitmaps into a state table, and the
accumulated state equals the batch bitmap over all data ever seen —
bit_or is associative/commutative, the same mergeable-state contract the
HLL register test pins (tests/test_stream_hll.py)."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _bitmap(df):
    return df.select(
        "event_type", F.hour("ts").cast("bigint").alias("hr")
    ).groupBy("event_type").agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), hr)")).alias("bm")
    )


def _stage(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_streaming_bitmap_state_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    base = dt.datetime(2024, 1, 1)

    batch1 = [
        Row(event_type="view", ts=base + dt.timedelta(hours=h)) for h in (0, 3, 7)
    ]
    batch2 = [
        Row(event_type="view", ts=base + dt.timedelta(hours=h)) for h in (3, 22)
    ] + [Row(event_type="click", ts=base + dt.timedelta(hours=5))]
    _stage(spark, src, batch1)
    _stage(spark, src, batch2)

    def merge_batch(batch_df, batch_id):
        sess = batch_df.sparkSession
        bm = _bitmap(batch_df)
        if os.path.exists(os.path.join(state, "_SUCCESS")):
            prev = sess.read.parquet(state)
            bm = (
                prev.unionByName(bm)
                .groupBy("event_type")
                .agg(F.bit_or("bm").alias("bm"))
            )
        bm.localCheckpoint().write.mode("overwrite").parquet(state)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = stream.writeStream.foreachBatch(merge_batch).option(
        "checkpointLocation", ckpt
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r.event_type: r.bm for r in spark.read.parquet(state).collect()
    }
    want = {
        r.event_type: r.bm
        for r in _bitmap(
            spark.createDataFrame(batch1 + batch2, SCHEMA)
        ).collect()
    }
    assert got == want
    assert got["view"] == (1 << 0) | (1 << 3) | (1 << 7) | (1 << 22)
    assert got["click"] == 1 << 5
