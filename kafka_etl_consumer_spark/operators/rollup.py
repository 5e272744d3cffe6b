"""Continuous aggregate (hypertable-rollup) pattern: a materialized
time-bucketed rollup table that refreshes INCREMENTALLY — only buckets the
raw table has grown past since the last refresh are recomputed.

The reference's minute-directory layout (ETLTask.java:213-219 of the
reference) exists so downstream jobs can do exactly this; here it's an
engine operator. Pattern (TimescaleDB continuous aggregates, Druid rollup):

    refresh: frontier = max finalized bucket in the rollup
             recompute buckets >= frontier from raw (the frontier bucket
             itself is recomputed — it may have been partial last time)
             overwrite those partitions only

Scale: each refresh scans ONLY raw data in open buckets (partition-pruned
by the bucket column when raw is date-partitioned) and rewrites only the
affected rollup partitions (dynamic partition overwrite). A full-history
rebuild never happens after the first run. Late data older than the
frontier is NOT folded in — pair with an event-time-partitioned ingest and
a lateness bound (watermark) if late arrivals must be captured, or
periodically re-run with frontier pushed back by the lateness bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def time_bucket(ts_col: str, duration: str) -> Column:
    """Stable bucket column (window start) for a tumbling duration."""
    return F.window(F.col(ts_col), duration)["start"]


def refresh_rollup(
    spark: SparkSession,
    raw: DataFrame,
    rollup_path: str,
    ts_col: str,
    duration: str,
    group_cols: list[str],
    aggs: list[Column],
) -> int:
    """Incrementally refresh the rollup at ``rollup_path``. Returns the
    number of buckets recomputed this call.

    The rollup schema is (bucket, *group_cols, *agg columns), partitioned
    by bucket so the selective overwrite rewrites only changed partitions
    (requires spark.sql.sources.partitionOverwriteMode=dynamic, set here
    for the write)."""
    bucket = time_bucket(ts_col, duration).alias("bucket")
    try:
        existing = spark.read.parquet(rollup_path)
        frontier = existing.agg(F.max("bucket")).first()[0]
    except Exception:
        frontier = None  # first run: full build

    fresh_raw = raw if frontier is None else raw.filter(bucket >= F.lit(frontier))
    fresh = fresh_raw.groupBy(bucket, *group_cols).agg(*aggs)

    n_buckets = fresh.select("bucket").distinct().count()
    if n_buckets == 0:
        return 0
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            fresh.write.mode("overwrite")
            .partitionBy("bucket")
            .option("compression", "snappy")
            .parquet(rollup_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    return n_buckets
