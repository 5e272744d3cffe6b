"""Round-4 regression tests: hot-key safety of corpus_ngram_novelty.

The per-shingle aggregation buffer is now constant-size (min + count);
a shingle present in EVERY document (license boilerplate at corpus
scale) must neither blow up an aggregation buffer nor change results.
Verified against a brute-force Python reference on crafted docs."""

from __future__ import annotations

import re

from pyspark.sql import Row


def _py_novelty(texts):
    # mirror functions.text.tokens + 3-word shingles
    toks = {i: re.findall(r"[a-z0-9]+", t.lower()) for i, t in enumerate(texts)}
    shingles = {
        i: {
            " ".join(ts[j : j + 3])
            for j in range(len(ts) - 2)
        }
        for i, ts in toks.items()
    }
    first = {}
    for i in sorted(shingles):
        for sh in shingles[i]:
            first.setdefault(sh, i)
    out = {}
    for i, shs in shingles.items():
        if not shs:
            continue
        novel = sum(1 for sh in shs if first[sh] == i)
        out[i] = (len(shs), round(novel / len(shs), 6))
    return out


def test_novelty_viral_shingle_matches_bruteforce(spark, tmp_path):
    # "common boiler plate" appears in EVERY doc — the hot-shingle case.
    # doc 0 owns everything; doc 3 is a pure copy (novel_frac 0.0).
    texts = [
        "common boiler plate alpha beta gamma delta",
        "common boiler plate epsilon zeta eta",
        "common boiler plate alpha beta gamma theta",
        "common boiler plate",
        "totally fresh words appear only here common boiler plate",
    ]
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
            for i, t in enumerate(texts)
        ]
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline7 import (
        corpus_ngram_novelty,
    )

    got = {
        r.doc_id: (r.n_shingles, r.novel_frac)
        for r in corpus_ngram_novelty(spark, str(tmp_path)).collect()
    }
    assert got == _py_novelty(texts)
    assert got[3][1] == 0.0  # pure-copy doc survives via the left join


def _kcore_py(edges, k):
    # reference peeling: iteratively drop vertices with degree < k
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < k:
                for n in adj[v]:
                    adj[n].discard(v)
                del adj[v]
                changed = True
    return {v: len(ns) for v, ns in adj.items()}


def test_kcore_matches_bruteforce(spark):
    """Chain (peels away), 4-cycle (2-core, dies at k=3), 4-clique
    (3-core), and a pendant hanging off the clique (peels at k>=2 and
    must trigger a SECOND peel round for its neighbor's degree)."""
    from kafka_etl_consumer_spark.operators.graph import kcore

    edges = [
        (1, 2), (2, 3), (3, 4),              # chain
        (10, 11), (11, 12), (12, 13), (13, 10),  # 4-cycle
        (20, 21), (20, 22), (20, 23), (21, 22), (21, 23), (22, 23),  # clique
        (23, 30),                             # pendant off the clique
    ]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    for k in (2, 3):
        got = {r.u: r.core_degree for r in kcore(df, k).collect()}
        assert got == _kcore_py(edges, k), f"k={k}"
    assert kcore(df, 5).count() == 0  # whole graph peels away


def test_asof_tolerance_merge_rank_parity_and_semantics(spark):
    """Tolerance rejects the NEAREST match when stale (it must not fall
    back to an even-older in-window row — there is none by monotonicity);
    merge and rank strategies agree; inner mode drops rejected rows."""
    from pyspark.sql import Row

    from kafka_etl_consumer_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [Row(k=1, lts=100.0, lid=1),   # nearest right at 95 (gap 5, in tol)
         Row(k=1, lts=200.0, lid=2),   # nearest right at 150 (gap 50, stale)
         Row(k=2, lts=50.0, lid=3)]    # no right at all
    )
    right = spark.createDataFrame(
        [Row(k=1, rts=95.0, rv="a"), Row(k=1, rts=150.0, rv="b")]
    )
    for strategy in ("merge", "rank"):
        got = {
            r.lid: r.rv
            for r in asof_join(
                left, right, on="k", left_ts="lts", right_ts="rts",
                strategy=strategy, tolerance=10.0,
                left_unique=["lid"],
            ).collect()
        }
        assert got == {1: "a", 2: None, 3: None}, strategy
    inner = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        how="inner", tolerance=10.0,
    )
    assert [r.lid for r in inner.collect()] == [1]


def test_forget_keys_partitioned_rewrites_only_dirty(spark, tmp_path):
    """GDPR erasure: doomed keys vanish, audit counts reconcile, only the
    dirty partition's file set changes, and a no-op erasure rewrites
    nothing."""
    import glob

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from kafka_etl_consumer_spark.maintenance import forget_keys

    table = str(tmp_path / "t")
    rows = [Row(user_id=u, d=d, v=u * 10 + d) for d in (1, 2, 3) for u in range(1, 7)]
    rows.append(Row(user_id=99, d=3, v=0))  # the doomed key, only in d=3
    spark.createDataFrame(rows).write.partitionBy("d").parquet(table)
    files_before = {
        d: sorted(glob.glob(f"{table}/d={d}/*.parquet")) for d in (1, 2, 3)
    }

    audit = forget_keys(
        spark, table, "user_id",
        spark.createDataFrame([Row(user_id=99)]), partition_col="d",
    )
    assert audit == {
        "rows_before": 19, "rows_deleted": 1, "rows_after": 18,
        "partitions_rewritten": 1, "orphans_vacuumed": 0,
        "residual_matches": 0,
    }
    left = spark.read.parquet(table)
    assert left.filter(F.col("user_id") == 99).count() == 0
    assert left.count() == 18
    # d=1/d=2 never touched (exact same files); d=3 rewritten (new names)
    assert sorted(glob.glob(f"{table}/d=1/*.parquet")) == files_before[1]
    assert sorted(glob.glob(f"{table}/d=2/*.parquet")) == files_before[2]
    assert sorted(glob.glob(f"{table}/d=3/*.parquet")) != files_before[3]

    # no-op erasure: zero dirty partitions, zero rewrites
    audit2 = forget_keys(
        spark, table, "user_id",
        spark.createDataFrame([Row(user_id=1234)]), partition_col="d",
    )
    assert audit2["rows_deleted"] == 0 and audit2["partitions_rewritten"] == 0


def test_forget_keys_untouched_partitions_keep_exact_files(spark, tmp_path):
    import glob

    from pyspark.sql import Row

    from kafka_etl_consumer_spark.maintenance import forget_keys

    table = str(tmp_path / "t")
    rows = [Row(user_id=u, d=d) for d in (1, 2) for u in (d * 10, d * 10 + 1)]
    spark.createDataFrame(rows).write.partitionBy("d").parquet(table)
    before_d2 = sorted(glob.glob(f"{table}/d=2/*.parquet"))
    forget_keys(spark, table, "user_id",
                spark.createDataFrame([Row(user_id=10)]), partition_col="d")
    assert sorted(glob.glob(f"{table}/d=2/*.parquet")) == before_d2
    got = {(r.user_id, r.d) for r in spark.read.parquet(table).collect()}
    assert got == {(11, 1), (20, 2), (21, 2)}


def test_forget_keys_unpartitioned_full_rewrite(spark, tmp_path):
    from pyspark.sql import Row

    from kafka_etl_consumer_spark.maintenance import forget_keys

    table = str(tmp_path / "t")
    spark.createDataFrame([Row(user_id=u, v=u) for u in range(10)]).write.parquet(table)
    audit = forget_keys(
        spark, table, "user_id",
        spark.createDataFrame([Row(user_id=3), Row(user_id=7)]),
    )
    assert audit == {"rows_before": 10, "rows_deleted": 2, "rows_after": 8,
                     "partitions_rewritten": -1, "orphans_vacuumed": 0,
                     "residual_matches": 0}
    assert {r.user_id for r in spark.read.parquet(table).collect()} == set(range(10)) - {3, 7}


def test_forget_keys_drops_stale_stream_sink_log(spark, tmp_path):
    # a partitioned in-place erasure on a streaming-written table must
    # remove the FileStreamSink log the overwrite just invalidated
    # (metadata-aware readers would FileNotFound on replaced files)
    import os

    from pyspark.sql import Row

    from kafka_etl_consumer_spark.maintenance import forget_keys

    table = str(tmp_path / "t")
    rows = [Row(user_id=u, d=d, v=u) for d in (1, 2) for u in range(1, 5)]
    spark.createDataFrame(rows).write.partitionBy("d").parquet(table)
    import glob as _glob
    import json as _json

    os.makedirs(f"{table}/_spark_metadata", exist_ok=True)
    entries = [
        _json.dumps(
            {
                "path": f"file://{f}",
                "size": os.path.getsize(f),
                "isDir": False,
                "modificationTime": 0,
                "blockReplication": 1,
                "blockSize": 134217728,
                "action": "add",
            }
        )
        for f in sorted(_glob.glob(f"{table}/d=*/*.parquet"))
    ]
    with open(f"{table}/_spark_metadata/0", "w") as f:
        f.write("v1\n" + "\n".join(entries) + "\n")

    forget_keys(
        spark, table, "user_id",
        spark.createDataFrame([Row(user_id=1)]), partition_col="d",
    )
    assert not os.path.exists(f"{table}/_spark_metadata")


def test_forget_keys_vacuums_log_hidden_orphans_before_log_drop(spark, tmp_path):
    """ADVICE r5 (medium): files the sink log HIDES — uncommitted output of
    aborted micro-batches at final paths — must be vacuumed before the log
    is dropped, or they surface to plain-listing readers afterward,
    possibly containing just-forgotten keys."""
    import glob as _glob
    import json as _json
    import os

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from kafka_etl_consumer_spark.maintenance import forget_keys

    table = str(tmp_path / "t")
    rows = [Row(user_id=u, d=d, v=u) for d in (1, 2) for u in range(1, 5)]
    spark.createDataFrame(rows).write.partitionBy("d").parquet(table)
    committed = sorted(_glob.glob(f"{table}/d=*/*.parquet"))
    # an aborted-batch leftover in a CLEAN partition, holding the doomed
    # key: the log-filtered erasure scan never sees it
    ghost_dir = f"{table}/d=2"
    spark.createDataFrame([Row(user_id=1, v=999)]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "ghost"))
    ghost_src = _glob.glob(str(tmp_path / "ghost" / "*.parquet"))[0]
    ghost = os.path.join(ghost_dir, "part-99999-ghost.parquet")
    os.replace(ghost_src, ghost)

    os.makedirs(f"{table}/_spark_metadata", exist_ok=True)
    entries = [
        _json.dumps({"path": f"file://{f}", "size": os.path.getsize(f),
                     "isDir": False, "modificationTime": 0,
                     "blockReplication": 1, "blockSize": 134217728,
                     "action": "add"})
        for f in committed
    ]
    with open(f"{table}/_spark_metadata/0", "w") as f:
        f.write("v1\n" + "\n".join(entries) + "\n")

    audit = forget_keys(
        spark, table, "user_id",
        spark.createDataFrame([Row(user_id=1)]), partition_col="d",
    )
    assert audit["orphans_vacuumed"] == 1
    assert audit["residual_matches"] == 0
    assert not os.path.exists(ghost)
    # plain-listing read after the log drop: no ghost, no doomed key
    left = spark.read.parquet(table)
    assert left.filter(F.col("user_id") == 1).count() == 0
    assert left.filter(F.col("v") == 999).count() == 0


def test_forget_keys_deletes_fully_erased_partition(spark, tmp_path):
    """ADVICE r5 (low): a dirty partition whose every row matches produces
    zero surviving rows — dynamic overwrite would never touch it; the
    directory must be deleted explicitly and the audit must reconcile."""
    import os

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from kafka_etl_consumer_spark.maintenance import forget_keys

    table = str(tmp_path / "t")
    rows = [Row(user_id=u, d=1, v=u) for u in (1, 2, 3)] + [
        Row(user_id=9, d=2, v=9), Row(user_id=8, d=2, v=8)
    ]
    spark.createDataFrame(rows).write.partitionBy("d").parquet(table)

    audit = forget_keys(
        spark, table, "user_id",
        spark.createDataFrame([Row(user_id=9), Row(user_id=8)]),
        partition_col="d",
    )
    assert not os.path.isdir(f"{table}/d=2")
    assert audit["rows_deleted"] == 2 and audit["rows_after"] == 3
    assert audit["residual_matches"] == 0
    left = spark.read.parquet(table)
    assert left.filter(F.col("d") == 2).count() == 0
    assert left.count() == 3


def test_forget_keys_total_erasure_leaves_readable_state(spark, tmp_path):
    """Erasing EVERY row of EVERY partition leaves no parquet files —
    the audit must report the fully-successful erasure instead of
    failing schema inference on the empty directory."""
    from pyspark.sql import Row

    from kafka_etl_consumer_spark.maintenance import forget_keys

    table = str(tmp_path / "t")
    rows = [Row(user_id=u, d=d, v=u) for d in (1, 2) for u in (d, d + 10)]
    spark.createDataFrame(rows).write.partitionBy("d").parquet(table)
    audit = forget_keys(
        spark, table, "user_id",
        spark.createDataFrame([Row(user_id=u) for u in (1, 2, 11, 12)]),
        partition_col="d",
    )
    assert audit["rows_before"] == 4 and audit["rows_after"] == 0
    assert audit["rows_deleted"] == 4 and audit["residual_matches"] == 0
