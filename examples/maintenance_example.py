"""Table lifecycle on plain parquet: compact small files, Z-order for
multi-dimensional pruning, erase keys (GDPR), and time-travel the
streaming MERGE snapshot's lineage.

    python examples/maintenance_example.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_etl_consumer_spark.maintenance import (
    compact_parquet,
    forget_keys,
    zorder_parquet,
)
from kafka_etl_consumer_spark.session import get_spark
from kafka_etl_consumer_spark.streaming.upsert import (
    current_snapshot,
    snapshot_at,
    snapshot_versions,
    stream_merge_upsert,
)


def main() -> None:
    spark = get_spark(app_name="maintenance-example")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="maintenance_example_")

    # --- a deliberately fragmented landed table ---------------------------
    table = os.path.join(root, "events")
    for shard in range(8):  # 8 tiny files, the streaming-sink pathology
        (
            spark.range(shard * 5_000, (shard + 1) * 5_000)
            .select(
                F.col("id").alias("event_id"),
                (F.col("id") % 997).alias("user_id"),
                (F.hash(F.col("id")) % 10_000).alias("x"),
                (F.hash(F.col("id") + 7) % 10_000).alias("y"),
                (F.col("id") % 7).alias("d"),
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(table)
        )

    n_files = compact_parquet(spark, table, target_file_mb=8)
    print(f"compacted into {n_files} file(s)")

    zout = os.path.join(root, "events_zordered")
    n_z = zorder_parquet(spark, table, ["x", "y"], zout, target_file_mb=1)
    print(f"z-ordered rewrite: {n_z} files — box filters on (x, y) now prune")

    # --- right to be forgotten --------------------------------------------
    part_table = os.path.join(root, "events_by_d")
    spark.read.parquet(table).write.partitionBy("d").parquet(part_table)
    doomed = spark.createDataFrame([Row(user_id=11), Row(user_id=500)])
    audit = forget_keys(spark, part_table, "user_id", doomed, partition_col="d")
    print(f"erasure audit: {audit}")

    # --- streaming MERGE snapshot + lineage time travel -------------------
    src = os.path.join(root, "changes")
    snap = os.path.join(root, "accounts")
    ckpt = os.path.join(root, "ckpt")
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("val", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("deleted", T.BooleanType()),
        ]
    )
    for seq, val in ((1, "opened"), (2, "upgraded")):
        spark.createDataFrame(
            [Row(k=1, val=val, seq=seq, deleted=False)], schema
        ).coalesce(1).write.mode("append").parquet(src)
    q = stream_merge_upsert(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src),
        snap,
        ["k"],
        ckpt,
        delete_col="deleted",
        order_col="seq",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    lineage = snapshot_versions(spark, snap)
    now = current_snapshot(spark, snap).collect()[0].val
    then = snapshot_at(spark, snap, lineage[1]).collect()[0].val
    print(f"lineage {lineage}: now={now!r}, one commit ago={then!r}")

    # --- bronze -> silver backfill after a schema fix ----------------------
    from pyspark.sql import Row as _Row

    from kafka_etl_consumer_spark.avro_codec import encode_record, parse_schema
    from kafka_etl_consumer_spark.fixtures import (
        ITEM_VIEW_EVENT_AVSC,
        ITEM_VIEW_EVENT_TOPIC,
        item_view_events,
    )
    from kafka_etl_consumer_spark.schema.registry import DictSchemaRegistry
    from kafka_etl_consumer_spark.streaming.ingest import backfill_decoded

    raw_dir = os.path.join(root, "bronze")
    avsc = parse_schema(ITEM_VIEW_EVENT_AVSC)
    bronze_rows = [
        _Row(
            topic=ITEM_VIEW_EVENT_TOPIC,
            value=bytearray(encode_record(avsc, ev)),
            dt0="2026-08-01",
        )
        for ev in item_view_events(6)
    ]
    env = T.StructType(
        [
            T.StructField("topic", T.StringType()),
            T.StructField("value", T.BinaryType()),
            T.StructField("dt0", T.StringType()),
        ]
    )
    spark.createDataFrame(bronze_rows, env).write.partitionBy("dt0").parquet(
        os.path.join(raw_dir, ITEM_VIEW_EVENT_TOPIC)
    )
    silver_dir = os.path.join(root, "silver")
    reg = DictSchemaRegistry({ITEM_VIEW_EVENT_TOPIC: ITEM_VIEW_EVENT_AVSC})
    n = backfill_decoded(
        spark, raw_dir, reg, silver_dir, ITEM_VIEW_EVENT_TOPIC,
        partitions=["2026-08-01"],
    )
    print(f"backfilled {n} rows into dt0=2026-08-01 (dynamic partition overwrite)")

    spark.stop()


if __name__ == "__main__":
    main()
