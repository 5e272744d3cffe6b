"""Streaming Misra-Gries monitor: the k-counter summary must honor the
MG THEOREM against exact counts — containment of every true heavy
hitter and the n/(k+1) undercount bound — across micro-batch splits and
a checkpoint restart. These are invariants of the algorithm, not
tolerances, so the assertions are exact."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_etl_consumer_spark.streaming.heavy_hitters import misra_gries_monitor

SCHEMA = T.StructType(
    [
        T.StructField("series", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("item", T.StringType()),
    ]
)

BASE = dt.datetime(2024, 1, 1)


def _stream(items):
    """Deterministic ts order = list order."""
    return [
        Row(series="s", ts=BASE + dt.timedelta(seconds=i), item=it)
        for i, it in enumerate(items)
    ]


def _zipfish(n_per_rank=(60, 30, 15, 8, 4), tail=40):
    """A skewed item stream: a few heavy items + a long distinct tail,
    interleaved deterministically so heavy items spread through the
    stream (adversarial for a counter summary)."""
    items = []
    for rank, cnt in enumerate(n_per_rank):
        items += [f"hot{rank}"] * cnt
    items += [f"cold{i}" for i in range(tail)]
    # deterministic interleave: stride by a constant coprime to len
    n = len(items)
    stride = 7
    assert n % stride != 0
    return [items[(i * stride) % n] for i in range(n)]


def _mg_theorem_check(items_seen, summary, k):
    """Assert containment + error bounds of an MG summary vs exact."""
    import collections

    exact = collections.Counter(items_seen)
    n = len(items_seen)
    bound = n // (k + 1)
    est = dict(summary)
    # upper bound: estimates never exceed the true count
    for it, c in est.items():
        assert c <= exact[it], (it, c, exact[it])
        assert exact[it] - c <= bound, (it, c, exact[it], bound)
    # containment: every item with true count > n/(k+1) must be present
    for it, c in exact.items():
        if c > bound:
            assert it in est, (it, c, bound, sorted(est))


def test_mg_theorem_across_two_batches(spark, tmp_path):
    items = _zipfish()
    cut = len(items) // 2
    k = 6
    src = str(tmp_path / "src_mg")

    def stage(chunk, offset):
        rows = [
            Row(series="s", ts=BASE + dt.timedelta(seconds=offset + i), item=it)
            for i, it in enumerate(chunk)
        ]
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stage(items[:cut], 0)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = misra_gries_monitor(
        stream, key_col="series", ts_col="ts", item_col="item", k=k
    )
    q = (
        out.writeStream.format("memory")
        .queryName("mg_monitor")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        stage(items[cut:], cut)
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM mg_monitor ORDER BY n_processed"
        ).collect()
    finally:
        q.stop()

    assert [r.n_processed for r in rows] == [cut, len(items)]
    # theorem must hold at BOTH emission points (prefix and full stream)
    mid, fin = rows
    _mg_theorem_check(items[:cut], zip(mid.items, mid.counts), k)
    _mg_theorem_check(items, zip(fin.items, fin.counts), k)
    assert fin.err_bound == len(items) // (k + 1)
    # the top-2 hot items dominate any n/(k+1) bound here — must be first
    assert set(fin.items[:2]) == {"hot0", "hot1"}
    # emission ordering contract: counts non-increasing
    assert list(fin.counts) == sorted(fin.counts, reverse=True)


def test_mg_state_bounded_and_python_parity(spark, tmp_path):
    """State never exceeds k counters, and the engine's summary equals a
    reference MG run on the same ordered stream (same decrement rule)."""
    items = _zipfish(n_per_rank=(25, 12, 6), tail=30)
    k = 4
    src = str(tmp_path / "src_mg2")
    rows = _stream(items)
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = misra_gries_monitor(
        stream, key_col="series", ts_col="ts", item_col="item", k=k
    )
    q = (
        out.writeStream.format("memory")
        .queryName("mg_parity")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        fin = spark.sql(
            "SELECT * FROM mg_parity ORDER BY n_processed DESC LIMIT 1"
        ).collect()[0]
    finally:
        q.stop()

    # reference MG
    summary: dict[str, int] = {}
    for x in items:
        if x in summary:
            summary[x] += 1
        elif len(summary) < k:
            summary[x] = 1
        else:
            for it in list(summary):
                summary[it] -= 1
                if summary[it] == 0:
                    del summary[it]
    ordered = sorted(summary.items(), key=lambda kv: (-kv[1], kv[0]))
    assert len(fin.items) <= k
    assert list(zip(fin.items, fin.counts)) == ordered


def test_mg_restart_recovers_state(spark, tmp_path):
    items = _zipfish()
    cut = len(items) // 2
    k = 6
    src = str(tmp_path / "src_mg3")
    ckpt = str(tmp_path / "ckpt_mg3")
    sink = str(tmp_path / "sink_mg3")

    def stage(chunk, offset):
        rows = [
            Row(series="s", ts=BASE + dt.timedelta(seconds=offset + i), item=it)
            for i, it in enumerate(chunk)
        ]
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def start():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        out = misra_gries_monitor(
            stream, key_col="series", ts_col="ts", item_col="item", k=k
        )

        def dump(batch_df, batch_id):
            batch_df.write.mode("append").parquet(sink)

        return (
            out.writeStream.foreachBatch(dump)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .start()
        )

    stage(items[:cut], 0)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    stage(items[cut:], cut)
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    fin = (
        spark.read.parquet(sink)
        .orderBy(F.col("n_processed").desc())
        .limit(1)
        .collect()[0]
    )
    assert fin.n_processed == len(items)
    _mg_theorem_check(items, zip(fin.items, fin.counts), k)
    assert set(fin.items[:2]) == {"hot0", "hot1"}
