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
from pyspark.sql import functions as F


def drop_stream_sink_log(spark: SparkSession, table_path: str) -> bool:
    """Delete a FileStreamSink ``_spark_metadata`` log made STALE by an
    in-place rewrite (dynamic partition overwrite replaces files the log
    names, so metadata-aware readers FileNotFound). Returns True if a
    log existed. The table then reads as a plain listing; see
    backfill_decoded's docstring for the restart contract
    (``spark.sql.streaming.fileStreamSink.ignoreMetadata``).

    Contract (ADVICE r5): the log may be deliberately HIDING uncommitted
    task output left at final paths by aborted micro-batches; deleting
    it surfaces those files to plain-listing readers as ghost rows.
    Callers must reconcile the directory against the log FIRST —
    :func:`vacuum_streaming_sink` with ``delete=True`` — as
    ``forget_keys`` and ``backfill_decoded`` both do before calling
    this."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    meta = jvm.org.apache.hadoop.fs.Path(f"{table_path}/_spark_metadata")
    fs = meta.getFileSystem(jsc.hadoopConfiguration())
    if fs.exists(meta):
        fs.delete(meta, True)
        return True
    return False


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


# ---------------------------------------------------------------------------
# Z-order clustering (multi-dimensional data skipping)
# ---------------------------------------------------------------------------

def zorder_parquet(
    spark: SparkSession,
    path: str,
    cols: list[str],
    out_path: str,
    target_file_mb: int = 256,
    compression: str = "snappy",
    writer_options: dict | None = None,
) -> int:
    """Rewrite a parquet directory clustered along a Z-curve over ``cols``
    so row-group min/max statistics prune scans filtered on ANY of those
    columns (a plain sort only helps the leading column). This is the
    engine's OPTIMIZE ... ZORDER BY.

    Each numeric column is bucketed onto a uniform 2^16 grid between its
    min and max (one stats pass; swap in approxQuantile boundaries for
    heavily skewed columns), bucket ids are bit-interleaved into a Morton
    value, and the table is range-partitioned + sorted by it. Cost shape
    at any scale = one global sort (stats pass + range shuffle); files
    come out target-sized like compact_parquet. Returns the output file
    count.
    """
    import glob as _glob
    import math as _math

    from kafka_etl_consumer_spark.functions.zorder import with_zorder

    df = spark.read.parquet(path)
    n_files = max(1, _math.ceil(dir_bytes(path) / (target_file_mb * 1024 * 1024)))
    (
        with_zorder(df, cols)  # shared Morton core (functions/zorder.py):
        # min/max stats via a broadcast one-row agg (no driver collect),
        # spread-bit interleave for 2-3 dims, per-bit form for 4+
        .repartitionByRange(n_files, "__zorder")
        .sortWithinPartitions("__zorder")
        .drop("__zorder")
        .write.mode("overwrite")
        .option("compression", compression)
        .options(**(writer_options or {}))
        .parquet(out_path)
    )
    return len(_glob.glob(os.path.join(out_path, "part-*.parquet")))


def committed_sink_files(sink_path: str) -> set[str]:
    """File paths committed in a streaming file sink's ``_spark_metadata``
    log (the exactly-once manifest readers trust). Format on disk: one
    UTF-8 file per batch — a ``v1`` version header line then one JSON
    object per committed file with its ``path``; periodic ``.compact``
    files fold the full history and supersede the per-batch logs they
    cover."""
    import json

    log_dir = os.path.join(sink_path, "_spark_metadata")
    if not os.path.isdir(log_dir):
        raise FileNotFoundError(f"no _spark_metadata under {sink_path}")
    entries = [f for f in os.listdir(log_dir) if not f.startswith(".")]
    compacts = sorted(
        (f for f in entries if f.endswith(".compact")),
        key=lambda f: int(f.split(".")[0]),
    )
    # a .compact file folds everything up to its batch id — read it plus
    # any later per-batch logs
    floor = int(compacts[-1].split(".")[0]) if compacts else -1
    keep = ([compacts[-1]] if compacts else []) + [
        f for f in entries
        if not f.endswith(".compact") and f.isdigit() and int(f) > floor
    ]
    committed: set[str] = set()
    for name in keep:
        with open(os.path.join(log_dir, name), encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line or line.startswith("v"):
                    continue
                rec = json.loads(line)
                p = rec.get("path", "")
                committed.add(p.removeprefix("file://").removeprefix("file:"))
    return committed


def vacuum_streaming_sink(sink_path: str, delete: bool = False) -> list[str]:
    """Orphaned data files in a streaming file sink: on-disk parquet not
    present in the ``_spark_metadata`` commit log (leftovers of failed or
    zombie task attempts). Spark readers skip them via the manifest, but
    EXTERNAL readers (DuckDB, Trino, plain parquet globs — exactly the
    cross-engine access this repo's oracles model) would read phantom
    rows — so vacuuming is what makes the directory safe to hand to
    non-Spark consumers. Returns the orphan list; ``delete=True`` removes
    them. Never deletes the manifest itself or non-parquet files.

    At scale this is a listing problem, not a data problem: one object
    listing + a set difference against the (small) manifest; run it with
    compaction on closed partitions.
    """
    committed = committed_sink_files(sink_path)
    orphans: list[str] = []
    for root, dirs, files in os.walk(sink_path):
        dirs[:] = [d for d in dirs if d != "_spark_metadata"]
        for f in files:
            if not f.endswith(".parquet") or f.startswith(("_", ".")):
                continue
            full = os.path.abspath(os.path.join(root, f))
            if full not in committed:
                orphans.append(full)
    if delete:
        for p in orphans:
            os.remove(p)
    return sorted(orphans)


# ---------------------------------------------------------------------------
# Targeted key deletion (right-to-be-forgotten)
# ---------------------------------------------------------------------------


def forget_keys(
    spark: SparkSession,
    table_path: str,
    key_col: str,
    keys_df,
    partition_col: str | None = None,
) -> dict:
    """Hard-delete every row whose ``key_col`` appears in ``keys_df``
    (a DataFrame with one column of the same name) from the parquet table
    at ``table_path`` — the GDPR/CCPA erasure primitive for an immutable
    format: you cannot delete rows in place, you rewrite the files that
    contain them.

    Scale: when the table is partitioned (``partition_col``), ONLY the
    partitions that contain a doomed key are rewritten — the key set
    broadcasts, a semi-join on the partition values picks the dirty
    partitions, and dynamic partition overwrite swaps exactly those
    directories (same machinery operators/rollup.py uses); the rest of
    the table's bytes are never read or written. Unpartitioned tables
    rewrite fully (documented cost — partition anything you may have to
    forget from). The anti-join itself is broadcast (erasure batches are
    small by nature).

    Returns an audit dict: rows_before, rows_deleted, rows_after,
    partitions_rewritten (-1 = full rewrite), orphans_vacuumed, and
    residual_matches (post-erasure count of surviving doomed keys —
    asserted 0 by the tests). Run it on a quiesced table (no concurrent
    writer), like compaction. On a streaming-written table the in-place
    partition overwrite invalidates the FileStreamSink
    ``_spark_metadata`` log; the log is dropped afterward
    (:func:`drop_stream_sink_log` — same contract as
    streaming.ingest.backfill_decoded; the full-rewrite branch sheds it
    naturally via the directory swap).

    Orphan reconciliation (ADVICE r5): this function reads the table
    THROUGH the sink log, so files the log deliberately hides —
    uncommitted output of aborted micro-batches left at final paths —
    hold rows the erasure scan never sees. Dropping the log afterward
    would make those ghosts visible to plain-listing readers, possibly
    CONTAINING just-forgotten keys. So before any rewrite, on-disk
    parquet not named by the log is vacuumed (:func:`vacuum_streaming_
    sink`); only then is the log-filtered view equal to the listing
    view and the post-rewrite log drop safe.
    """
    orphans_vacuumed = 0
    if os.path.isdir(os.path.join(table_path, "_spark_metadata")):
        orphans_vacuumed = len(vacuum_streaming_sink(table_path, delete=True))
    df = spark.read.parquet(table_path)
    keys = F.broadcast(keys_df.select(key_col).distinct())
    rows_before = df.count()

    if partition_col is not None:
        dirty = (
            df.join(keys, key_col, "left_semi")
            .select(partition_col)
            .distinct()
        )
        dirty_vals = [r[0] for r in dirty.collect()]  # partition VALUES only
        if not dirty_vals:
            return {
                "rows_before": rows_before,
                "rows_deleted": 0,
                "rows_after": rows_before,
                "partitions_rewritten": 0,
                "orphans_vacuumed": orphans_vacuumed,
                "residual_matches": 0,
            }
        cleaned = (
            df.filter(F.col(partition_col).isin(dirty_vals))
            .join(keys, key_col, "left_anti")
        )
        # materialize the surviving rows BEFORE the overwrite job starts:
        # the plan reads the very files the commit will delete, and a task
        # retried after commit begins would find its input gone. The
        # checkpoint is bounded by the dirty partitions, not the table.
        cleaned = cleaned.localCheckpoint(eager=True)
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                cleaned.write.mode("overwrite")
                .partitionBy(partition_col)
                .option("compression", "snappy")
                .parquet(table_path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        # in-place partition overwrite on a streaming-written table makes
        # the sink log stale — drop it (same contract as backfill_decoded)
        drop_stream_sink_log(spark, table_path)
        # a dirty partition whose EVERY row matched produces no surviving
        # rows, so dynamic overwrite never touches its directory and the
        # erasure would silently fail for it (ADVICE r5): delete those
        # directories explicitly. Values here are the simple scalars the
        # hive layout encodes verbatim (dates/ints); an escaping-needing
        # partition value would need the Spark-side escaper.
        import shutil

        survivors = {r[0] for r in cleaned.select(partition_col).distinct().collect()}
        for val in dirty_vals:
            if val not in survivors:
                gone = os.path.join(table_path, f"{partition_col}={val}")
                if os.path.isdir(gone):
                    shutil.rmtree(gone)
        rewritten = len(dirty_vals)
    else:
        cleaned = df.join(keys, key_col, "left_anti")
        tmp = f"{table_path}__forgetting"
        cleaned.write.mode("overwrite").option("compression", "snappy").parquet(tmp)
        backup = f"{table_path}__preforget"
        os.rename(table_path, backup)
        os.rename(tmp, table_path)
        import shutil

        shutil.rmtree(backup)
        rewritten = -1

    # an erasure that matched EVERY row of EVERY partition leaves no
    # parquet files at all — a plain read would fail schema inference;
    # that outcome is a fully-successful erasure, not an error
    has_files = any(
        f.endswith(".parquet") and not f.startswith(("_", "."))
        for _, _, files in os.walk(table_path)
        for f in files
    )
    if not has_files:
        return {
            "rows_before": rows_before,
            "rows_deleted": rows_before,
            "rows_after": 0,
            "partitions_rewritten": rewritten,
            "orphans_vacuumed": orphans_vacuumed,
            "residual_matches": 0,
        }
    after = spark.read.parquet(table_path)
    rows_after = after.count()
    residual = after.join(keys, key_col, "left_semi").count()
    return {
        "rows_before": rows_before,
        "rows_deleted": rows_before - rows_after,
        "rows_after": rows_after,
        "partitions_rewritten": rewritten,
        "orphans_vacuumed": orphans_vacuumed,
        "residual_matches": residual,
    }
