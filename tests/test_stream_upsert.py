"""Streaming MERGE sink tests: a change stream continuously maintains a
keyed snapshot table (streaming/upsert.py), including last-write-wins
within a batch, deletes, and replay idempotence."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_etl_consumer_spark.streaming.upsert import (
    current_snapshot,
    stream_merge_upsert,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("val", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ]
)


def _stage(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _snapshot_dict(spark, table):
    snap = current_snapshot(spark, table)
    return {r.k: (r.val, r.seq) for r in snap.collect()}


def test_stream_merge_upsert_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: inserts, including two changes to k=2 (seq decides)
    _stage(
        spark,
        src,
        [
            Row(k=1, val="a", seq=1, deleted=False),
            Row(k=2, val="old", seq=2, deleted=False),
            Row(k=2, val="new", seq=3, deleted=False),
        ],
    )
    # batch 2: update k=1, delete k=2, insert k=3
    _stage(
        spark,
        src,
        [
            Row(k=1, val="a2", seq=4, deleted=False),
            Row(k=2, val="gone", seq=5, deleted=True),
            Row(k=3, val="c", seq=6, deleted=False),
        ],
    )

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = stream_merge_upsert(
        stream, table, ["k"], ckpt, delete_col="deleted", order_col="seq"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert _snapshot_dict(spark, table) == {1: ("a2", 4), 3: ("c", 6)}


def test_stream_merge_upsert_restart_continues(spark, tmp_path):
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    _stage(spark, src, [Row(k=1, val="a", seq=1, deleted=False)])
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = stream_merge_upsert(
        stream, table, ["k"], ckpt, delete_col="deleted", order_col="seq"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert _snapshot_dict(spark, table) == {1: ("a", 1)}

    # restart against the same checkpoint with new data: the snapshot
    # advances, it doesn't reset (state lives in the table + marker)
    _stage(spark, src, [Row(k=1, val="b", seq=2, deleted=False)])
    stream2 = spark.readStream.schema(SCHEMA).parquet(src)
    q2 = stream_merge_upsert(
        stream2, table, ["k"], ckpt, delete_col="deleted", order_col="seq"
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert _snapshot_dict(spark, table) == {1: ("b", 2)}


def test_replayed_batch_converges(spark, tmp_path):
    """A batch replay (same batch_id, same input) must rewrite the same
    version directory and re-point the marker to identical state."""
    table = str(tmp_path / "table")
    df = spark.createDataFrame(
        [Row(k=1, val="a", seq=1, deleted=False)], SCHEMA
    )
    from kafka_etl_consumer_spark.streaming import upsert as U

    def run_once():
        # simulate foreachBatch calling with batch_id=0 twice
        cur = U.current_snapshot(spark, table)
        merged = df.where(~F.col("deleted")).select("k", "val", "seq")
        if cur is not None:
            from kafka_etl_consumer_spark.operators.scd import merge_type1

            merged = merge_type1(cur, df, ["k"], "deleted")
        version = U._fresh_version_name(spark, table, 0)
        merged.write.mode("overwrite").parquet(table + "/" + version)
        U._write_marker(spark, table, version)
        return version

    assert run_once() == "_v0"
    first = _snapshot_dict(spark, table)
    # replay writes a FRESH directory — never the one a concurrent merge
    # plan may still be reading — and converges to identical state
    assert run_once() == "_v0_r1"
    assert _snapshot_dict(spark, table) == first == {1: ("a", 1)}


def test_superseded_versions_garbage_collected(spark, tmp_path):
    """Storage must not grow one table copy per batch: after each marker
    repoint, older _v* directories beyond retain_versions are deleted."""
    import os

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    for seq in (1, 2, 3):
        _stage(spark, src, [Row(k=1, val=f"v{seq}", seq=seq, deleted=False)])

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = stream_merge_upsert(
        stream, table, ["k"], ckpt, delete_col="deleted", order_col="seq",
        retain_versions=0,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    versions = sorted(d for d in os.listdir(table) if d.startswith("_v"))
    assert versions == ["_v2"], versions  # only the active snapshot remains
    assert _snapshot_dict(spark, table) == {1: ("v3", 3)}


def test_default_gc_keeps_reader_grace_version(spark, tmp_path):
    """Default retain_versions=1: the immediately superseded snapshot
    survives as a grace window for readers that resolved the marker just
    before the swap (deleting it mid-read would FileNotFound them)."""
    import os

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    for seq in (1, 2, 3):
        _stage(spark, src, [Row(k=1, val=f"v{seq}", seq=seq, deleted=False)])

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = stream_merge_upsert(
        stream, table, ["k"], ckpt, delete_col="deleted", order_col="seq"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    versions = sorted(d for d in os.listdir(table) if d.startswith("_v"))
    assert versions == ["_v1", "_v2"], versions  # active + one grace version
    assert _snapshot_dict(spark, table) == {1: ("v3", 3)}


def test_crash_replay_gc_keeps_committed_grace_not_partial(spark, tmp_path):
    """The round-4 GC fix: after a crash mid-write of _v1 (marker still on
    _v0), the replay commits _v1_r1. GC must delete the half-written _v1
    (the NEWEST directory by mtime, but never committed) and retain _v0 —
    the snapshot concurrent readers that followed the marker may still be
    scanning. An mtime ranking got this exactly backwards."""
    import os

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    # batch 0 commits _v0 normally
    _stage(spark, src, [Row(k=1, val="v1", seq=1, deleted=False)])
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = stream_merge_upsert(
        stream, table, ["k"], ckpt, delete_col="deleted", order_col="seq"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(d for d in os.listdir(table) if d.startswith("_v")) == ["_v0"]

    # simulate the crash: _v1 exists half-written, marker still on _v0
    os.makedirs(os.path.join(table, "_v1"))
    with open(os.path.join(table, "_v1", "part-garbage.parquet"), "wb") as f:
        f.write(b"not a parquet file")

    # replay of batch 1: a fresh run over the same checkpoint re-delivers
    # the pending file as batch 1 and must commit to _v1_r1
    _stage(spark, src, [Row(k=1, val="v2", seq=2, deleted=False)])
    stream2 = spark.readStream.schema(SCHEMA).parquet(src)
    q2 = stream_merge_upsert(
        stream2, table, ["k"], ckpt, delete_col="deleted", order_col="seq"
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    versions = sorted(d for d in os.listdir(table) if d.startswith("_v"))
    # retain_versions=1 default: active commit + the COMMITTED _v0 grace
    # version; the uncommitted partial _v1 is gone
    assert versions == ["_v0", "_v1_r1"], versions
    assert _snapshot_dict(spark, table) == {1: ("v2", 2)}


def test_snapshot_time_travel_within_retention(spark, tmp_path):
    """snapshot_at reads the previous committed version (reader-grace
    window as time travel); names outside the lineage raise."""
    import pytest

    from kafka_etl_consumer_spark.streaming.upsert import (
        snapshot_at,
        snapshot_versions,
    )

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    for seq in (1, 2):
        _stage(spark, src, [Row(k=1, val=f"v{seq}", seq=seq, deleted=False)])
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = stream_merge_upsert(
        stream, table, ["k"], ckpt, delete_col="deleted", order_col="seq"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    lineage = snapshot_versions(spark, table)
    assert lineage == ["_v1", "_v0"]  # current + one grace version
    assert {r.k: r.val for r in snapshot_at(spark, table, "_v1").collect()} == {1: "v2"}
    assert {r.k: r.val for r in snapshot_at(spark, table, "_v0").collect()} == {1: "v1"}
    with pytest.raises(ValueError, match="lineage"):
        snapshot_at(spark, table, "_v99")
