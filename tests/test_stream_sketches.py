"""Streaming maintenance twins for the ADD/UNION-mergeable sketches:
a foreachBatch sink accumulates CMS counters (per-cell ADD) and Bloom
bit-sets (UNION), and the estimates recomputed from the accumulated
state equal the batch sketches built over all data ever seen — the
mergeable-sketch contract under streaming (companion to
test_stream_hll.py's max-merge registers)."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import types as T

from kafka_etl_consumer_spark.operators.sketch import (
    bloom_bits,
    bloom_merge_bits,
    bloom_might_contain,
    cms_counters,
    cms_estimate,
    cms_estimate_from_counters,
    cms_merge_counters,
)

SCHEMA = T.StructType([T.StructField("tok", T.StringType())])


def _stage(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _accumulating_sink(state, build, merge):
    def apply(batch_df, batch_id):
        sess = batch_df.sparkSession
        cur = build(batch_df)
        if os.path.exists(os.path.join(state, "_SUCCESS")):
            cur = merge(sess.read.parquet(state), cur)
        tmp = state + f"_b{batch_id}"
        cur.write.mode("overwrite").parquet(tmp)
        sess.read.parquet(tmp).write.mode("overwrite").parquet(state)

    return apply


def test_streaming_cms_counters_match_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    b1 = [Row(tok=f"t{i % 7}") for i in range(200)]
    b2 = [Row(tok=f"t{i % 11}") for i in range(300)]
    _stage(spark, src, b1)
    _stage(spark, src, b2)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            _accumulating_sink(
                state, lambda df: cms_counters(df, "tok"), cms_merge_counters
            )
        )
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    cands = spark.createDataFrame([Row(tok=f"t{i}") for i in range(11)], SCHEMA)
    from_state = {
        r.tok: r.cms_est
        for r in cms_estimate_from_counters(
            cands, spark.read.parquet(state), "tok"
        ).collect()
    }
    all_rows = spark.createDataFrame(b1 + b2, SCHEMA)
    from_batch = {
        r.tok: r.cms_est for r in cms_estimate(all_rows, "tok", cands).collect()
    }
    assert from_state == from_batch
    # CMS never under-counts: estimate >= true frequency
    truth = {}
    for r in b1 + b2:
        truth[r.tok] = truth.get(r.tok, 0) + 1
    assert all(from_state[t] >= truth.get(t, 0) for t in from_state)


def test_streaming_bloom_bits_match_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    b1 = [Row(tok=f"w{i}") for i in range(0, 60)]
    b2 = [Row(tok=f"w{i}") for i in range(40, 120)]
    _stage(spark, src, b1)
    _stage(spark, src, b2)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            _accumulating_sink(
                state, lambda df: bloom_bits(df, "tok"), bloom_merge_bits
            )
        )
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    queries = spark.createDataFrame(
        [Row(tok=f"w{i}") for i in range(0, 150)], SCHEMA
    )
    from_state = {
        r.tok: r.bloom_hit
        for r in bloom_might_contain(
            queries, "tok", spark.read.parquet(state)
        ).collect()
    }
    all_rows = spark.createDataFrame(b1 + b2, SCHEMA)
    from_batch = {
        r.tok: r.bloom_hit
        for r in bloom_might_contain(
            queries, "tok", bloom_bits(all_rows, "tok")
        ).collect()
    }
    assert from_state == from_batch
    # no false negatives: every inserted token must hit
    assert all(from_state[f"w{i}"] for i in range(120))
