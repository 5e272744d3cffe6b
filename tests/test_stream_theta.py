"""Streaming maintenance twin for the theta (KMV) sketch: a foreachBatch
sink union-merges kept-key states across micro-batches, and the
estimate recomputed from the accumulated state equals the batch sketch
over all data ever seen — plus the set-algebra property that makes
theta worth maintaining (the kept-key union IS the union sketch)."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import types as T

from kafka_etl_consumer_spark.operators.sketch import (
    theta_distinct,
    theta_estimate_from_kept,
    theta_kept_keys,
    theta_merge_kept,
)

SCHEMA = T.StructType([T.StructField("uid", T.LongType())])
SCALE = 4  # small scale so tiny fixtures keep some keys


def _stage(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _accumulating_sink(state):
    def apply(batch_df, batch_id):
        sess = batch_df.sparkSession
        cur = theta_kept_keys(batch_df, "uid", scale=SCALE)
        if os.path.exists(os.path.join(state, "_SUCCESS")):
            cur = theta_merge_kept(sess.read.parquet(state), cur)
        tmp = state + f"_b{batch_id}"
        cur.write.mode("overwrite").parquet(tmp)
        sess.read.parquet(tmp).write.mode("overwrite").parquet(state)

    return apply


def test_streaming_theta_kept_state_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    b1 = [Row(uid=i) for i in range(0, 400)]
    b2 = [Row(uid=i) for i in range(200, 700)]  # overlaps batch 1
    _stage(spark, src, b1)
    _stage(spark, src, b2)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(_accumulating_sink(state))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = theta_estimate_from_kept(
        spark.read.parquet(state), scale=SCALE
    ).collect()[0]["est_distinct"]
    batch = theta_distinct(
        spark.createDataFrame(b1 + b2, SCHEMA), "uid", scale=SCALE
    ).collect()[0]["est_distinct"]
    assert streamed == batch

    # kept-set union == sketch of the union: the set-algebra property
    ka = theta_kept_keys(spark.createDataFrame(b1, SCHEMA), "uid", scale=SCALE)
    kb = theta_kept_keys(spark.createDataFrame(b2, SCHEMA), "uid", scale=SCALE)
    merged = theta_estimate_from_kept(theta_merge_kept(ka, kb), scale=SCALE)
    assert merged.collect()[0]["est_distinct"] == batch
