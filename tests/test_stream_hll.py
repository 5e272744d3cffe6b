"""Incremental HLL maintenance on a stream: a foreachBatch sink keeps a
register table (max-merged per micro-batch), and the estimate recomputed
from that state equals the batch HLL over all data ever seen — the
mergeable-sketch contract under streaming."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import types as T

from kafka_etl_consumer_spark.operators.sketch import (
    hll_distinct,
    hll_estimate_from_registers,
    hll_merge_registers,
    hll_registers,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("user_id", T.LongType()),
    ]
)


def _stage(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_streaming_hll_registers_match_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    batch1 = [Row(event_type="view", user_id=i) for i in range(0, 400)]
    batch2 = [Row(event_type="view", user_id=i) for i in range(200, 700)] + [
        Row(event_type="click", user_id=i) for i in range(0, 50)
    ]
    _stage(spark, src, batch1)
    _stage(spark, src, batch2)

    def merge_batch(batch_df, batch_id):
        sess = batch_df.sparkSession
        regs = hll_registers(batch_df, "user_id", ["event_type"])
        if os.path.exists(os.path.join(state, "_SUCCESS")):
            prev = sess.read.parquet(state)
            regs = hll_merge_registers(prev, regs, ["event_type"])
        # write-new-then-swap would mirror streaming/upsert.py; a plain
        # rewrite through a temp path keeps this test focused on merge math
        tmp = state + f"_b{batch_id}"
        regs.write.mode("overwrite").parquet(tmp)
        sess.read.parquet(tmp).write.mode("overwrite").parquet(state)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {
        r.event_type: r.hll_estimate
        for r in hll_estimate_from_registers(
            spark.read.parquet(state), ["event_type"]
        ).collect()
    }
    full = spark.createDataFrame(batch1 + batch2, SCHEMA)
    batch = {
        r.event_type: r.hll_estimate
        for r in hll_distinct(full, "user_id", ["event_type"]).collect()
    }
    assert streamed == batch  # register state is exactly mergeable
    # and the estimates are sane: ~700 views, ~50 clicks at 13% rel error
    assert 450 < streamed["view"] < 950
    assert 25 < streamed["click"] < 80
