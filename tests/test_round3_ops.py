"""Brute-force verification for the round-3 query operators, independent
of the DuckDB oracles (which share formula structure with the plans):
winnowing fingerprints, bounded BFS, nearest as-of, and n-gram novelty
are each checked against a plain-Python reimplementation on small
adversarial inputs.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.queries_pipeline7 import (
    _WINNOW_CAP,
    _WINNOW_K,
    _WINNOW_W,
)


def _hash64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _winnow_py(text: str) -> tuple[int, int | None, int | None]:
    t = text.lower()[:_WINNOW_CAP]
    hs = [
        _hash64(t[i : i + _WINNOW_K])
        for i in range(len(t) - _WINNOW_K + 1)
    ]
    ws = [
        min(hs[j : j + _WINNOW_W]) for j in range(len(hs) - _WINNOW_W + 1)
    ]
    if not ws:
        return 0, None, None
    return len(set(ws)), min(ws), max(ws)


def test_winnowing_matches_python_reference(spark, tmp_path):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "aaaaaaaaaaaaaaaa",          # degenerate repeats: one distinct hash
        "short",                      # below k: zero grams
        "exactly11ch",                # k + w - 1 = 11 chars: one window
        "x" * 300,                    # capped at _WINNOW_CAP
    ]
    # drive the registered query through a parquet dir shaped like testdata
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
            for i, t in enumerate(texts)
        ]
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline7 import (
        text_winnowing_fingerprints,
    )

    got = {
        r.doc_id: (r.n_fingerprints, r.min_fp, r.max_fp)
        for r in text_winnowing_fingerprints(spark, str(tmp_path)).collect()
    }
    want = {i: _winnow_py(t) for i, t in enumerate(texts)}
    assert got == want
    # guarantee property: any shared substring of length >= w+k-1 shares
    # a fingerprint — doc 5/6 share a 16-char run
    docs2 = spark.createDataFrame(
        [
            Row(doc_id=0, text="prefixAAAACOMMONSUBSTRINGxx", lang="en",
                source="s", n_chars=27),
            Row(doc_id=1, text="zzCOMMONSUBSTRINGanothertail", lang="en",
                source="s", n_chars=28),
        ]
    )
    import shutil

    shutil.rmtree(str(tmp_path / "documents.parquet"))
    docs2.write.parquet(str(tmp_path / "documents.parquet"))
    a0, _, _ = _winnow_py("prefixAAAACOMMONSUBSTRINGxx")
    fp0 = set()
    fp1 = set()
    for doc, acc in ((0, fp0), (1, fp1)):
        t = ["prefixAAAACOMMONSUBSTRINGxx", "zzCOMMONSUBSTRINGanothertail"][doc].lower()
        hs = [_hash64(t[i : i + _WINNOW_K]) for i in range(len(t) - _WINNOW_K + 1)]
        acc.update(
            min(hs[j : j + _WINNOW_W]) for j in range(len(hs) - _WINNOW_W + 1)
        )
    assert fp0 & fp1, "winnowing guarantee violated in the reference impl"


def _bfs_py(edges: list[tuple[int, int]], src: int, max_hops: int) -> dict[int, int]:
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {src: 0}
    frontier = [src]
    for h in range(1, max_hops + 1):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = h
                    nxt.append(v)
        frontier = nxt
    return dist


def test_bfs_hops_matches_python_reference(spark, tmp_path):
    # two components; only the one containing min-vertex is reached
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11)]
    rows = []
    for ok, (a, b) in enumerate(edges):
        # craft lineitem rows: each orderkey co-orders exactly parts {a, b}
        rows.append(Row(l_orderkey=ok * 20, l_partkey=a))
        rows.append(Row(l_orderkey=ok * 20, l_partkey=b))
    spark.createDataFrame(rows).write.parquet(str(tmp_path / "lineitem.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline7 import graph_bfs_hops

    got = {r.vertex: r.hops for r in graph_bfs_hops(spark, str(tmp_path)).collect()}
    want = _bfs_py(edges, src=1, max_hops=3)
    assert got == want  # vertices 5, 6, 10, 11 absent (beyond 3 hops / other comp)


def test_nearest_asof_matches_python_reference(spark, tmp_path):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: views at t=0, 100; clicks at 40 (nearest 0: 40 vs 60),
        # 99 (nearest 100: 1), and one click with same-ts view
        Row(event_id=1, ts=base, user_id=1, event_type="view", value=0.0, props="{}"),
        Row(event_id=2, ts=base + dt.timedelta(seconds=40), user_id=1,
            event_type="click", value=0.0, props="{}"),
        Row(event_id=3, ts=base + dt.timedelta(seconds=99), user_id=1,
            event_type="click", value=0.0, props="{}"),
        Row(event_id=4, ts=base + dt.timedelta(seconds=100), user_id=1,
            event_type="view", value=0.0, props="{}"),
        Row(event_id=5, ts=base + dt.timedelta(seconds=100), user_id=1,
            event_type="click", value=0.0, props="{}"),
        # user 2: click with no view at all -> NULL
        Row(event_id=6, ts=base, user_id=2, event_type="click", value=0.0,
            props="{}"),
        # noise event type is ignored
        Row(event_id=7, ts=base, user_id=1, event_type="purchase", value=0.0,
            props="{}"),
    ]
    spark.createDataFrame(rows).write.parquet(str(tmp_path / "events.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline7 import join_asof_nearest

    got = {
        r.event_id: r.nearest_view_us
        for r in join_asof_nearest(spark, str(tmp_path)).collect()
    }
    assert got == {
        2: 40_000_000,   # 40s to the t=0 view beats 60s to t=100
        3: 1_000_000,    # 1s forward
        5: 0,            # same-timestamp view counts as distance 0
        6: None,         # no views for user 2
    }


def test_ngram_novelty_first_doc_is_fully_novel(spark, tmp_path):
    rows = [
        Row(doc_id=1, text="a b c d e", lang="en", source="s", n_chars=9),
        Row(doc_id=2, text="a b c d e", lang="en", source="s", n_chars=9),
        Row(doc_id=3, text="x y z w v", lang="en", source="s", n_chars=9),
    ]
    spark.createDataFrame(rows).write.parquet(str(tmp_path / "documents.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline7 import corpus_ngram_novelty

    got = {
        r.doc_id: (r.n_shingles, r.novel_frac)
        for r in corpus_ngram_novelty(spark, str(tmp_path)).collect()
    }
    # "a b c d e" -> 3 shingles; doc 1 owns them all, doc 2 none, doc 3 all
    assert got == {1: (3, 1.0), 2: (3, 0.0), 3: (3, 1.0)}
