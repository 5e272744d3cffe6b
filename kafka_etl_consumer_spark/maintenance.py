"""Table maintenance: small-file compaction.

The reference's minute-level file rolling (ETLTask.java:285-296 of the
reference) — and any streaming parquet sink with a short trigger — produces
one small file per topic-partition per interval: ~1440 files/partition/day.
Small files poison downstream scans (one task + one NameNode/S3 round-trip
each, row groups far below parquet.block.size). Compaction rewrites a
landed directory into target-sized files; run it periodically on closed
(past-date) partitions.

Scale: the rewrite is one job — scan (splits sized by
spark.sql.files.maxPartitionBytes) → repartition to ceil(bytes/target) →
write. Never compact the partition currently being written (the streaming
sink's _spark_metadata would not know the new files); with the reference
layout, compact only date directories older than the roll interval.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession


def dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 256,
    compression: str = "snappy",
) -> int:
    """Rewrite one parquet directory into ~``target_file_mb`` files.
    Returns the new file count. The rewrite goes through a sibling temp
    directory + atomic-ish rename so readers never see a half-written mix.

    Sizing note: parquet re-compresses, so output size ≈ input size; file
    count = ceil(input_bytes / target). 256 MiB matches the reference's
    row-group posture (ETLTask.java:147 of the reference)."""
    n_bytes = dir_bytes(path)
    n_files = max(1, math.ceil(n_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    tmp = f"{path}__compacting"
    (
        df.repartition(n_files)
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(tmp)
    )
    backup = f"{path}__precompact"
    os.rename(path, backup)
    os.rename(tmp, path)
    import shutil

    shutil.rmtree(backup)
    return len([f for f in os.listdir(path) if f.endswith(".parquet")])
