"""IngestMetricsListener: per-batch throughput records from a real
StreamingQuery — the machine-readable ops surface the reference lacks
(its poll loop only logs, ETLTask.java:259,283 of the reference)."""

from __future__ import annotations

import time

from pyspark.sql import types as T

from kafka_etl_consumer_spark.streaming.metrics import IngestMetricsListener

SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.DoubleType())]
)


def test_listener_records_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    spark.createDataFrame([(i, float(i)) for i in range(40)], SCHEMA).coalesce(
        2
    ).write.parquet(src)

    listener = IngestMetricsListener()
    spark.streams.addListener(listener)
    try:
        q = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.queryName("metrics-test")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        # listener bus is async: give it a beat to drain
        deadline = time.time() + 15
        while time.time() < deadline and sum(
            m.num_input_rows for m in listener.records
        ) < 40:
            time.sleep(0.3)
    finally:
        spark.streams.removeListener(listener)

    rows_seen = sum(m.num_input_rows for m in listener.records)
    assert rows_seen == 40  # every input row accounted for across batches
    named = [m for m in listener.records if m.query_name == "metrics-test"]
    assert named and all(m.batch_duration_ms >= 0 for m in named)

    df = listener.to_df(spark)
    assert df.count() == len(listener.records)
    assert df.schema["num_input_rows"].dataType.simpleString() == "bigint"
