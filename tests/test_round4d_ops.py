"""Batch-16 invariant tests: phrase matching vs a regex reference,
k-center greedy properties, modularity identities, backtest sanity."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Row


def test_phrase_match_against_python_reference(spark, tmp_path):
    texts = [
        "the hash join beats the merge sort today",
        "hash join hash join hash join",        # overlapping repeats
        "sort merge is not merge sort",          # order matters
        "hash joins are plural",                 # 'joins' != 'join'
        "no phrases here at all",
    ]
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
            for i, t in enumerate(texts)
        ]
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline11 import (
        search_phrase_match,
    )

    got = {
        (r.phrase, r.doc_id): (r.n_occ, r.first_pos)
        for r in search_phrase_match(spark, str(tmp_path)).collect()
    }
    want = {}
    for i, t in enumerate(texts):
        toks = re.findall(r"[a-z0-9]+", t.lower())
        bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        for ph in ("hash join", "merge sort"):
            n = sum(1 for b in bigrams if b == ph)
            if n:
                want[(ph, i)] = (n, bigrams.index(ph) + 1)
    assert got == want


def test_kcenter_radius_is_nonincreasing_and_centers_distinct(spark):
    from kafka_etl_consumer_spark.plans.queries_pipeline11 import (
        sample_coreset_kcenter,
    )

    rows = sorted(
        sample_coreset_kcenter(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r.r,
    )
    assert [r.r for r in rows] == list(range(8))
    centers = [r.center_vec_id for r in rows]
    assert len(set(centers)) == 8  # greedy never re-picks a center
    radii = [r.radius for r in rows[1:]]
    for a, b in zip(radii, radii[1:]):
        assert b <= a + 1e-9, (a, b)  # coverage radius shrinks monotonically


def test_kcenter_matches_bruteforce_greedy(spark):
    import numpy as np

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).collect()
    }
    ids = sorted(emb)
    mind = {
        i: round(float(((emb[i] - emb[0]) ** 2).sum()), 6) for i in ids
    }
    picks = [(0, 0, 0.0)]
    for r in range(1, 8):
        cid = min(ids, key=lambda i: (-mind[i], i))
        picks.append((r, cid, mind[cid]))
        for i in ids:
            mind[i] = min(
                mind[i], round(float(((emb[i] - emb[cid]) ** 2).sum()), 6)
            )
    from kafka_etl_consumer_spark.plans.queries_pipeline11 import (
        sample_coreset_kcenter,
    )

    got = sorted(
        (r.r, r.center_vec_id, r.radius)
        for r in sample_coreset_kcenter(spark, "/root/testdata/sf0.001").collect()
    )
    for (gr, gc, grad), (wr, wc, wrad) in zip(got, picks):
        assert (gr, gc) == (wr, wc)
        assert grad == pytest.approx(wrad, abs=1e-6)


def test_modularity_identities(spark):
    from pyspark.sql import functions as F

    from kafka_etl_consumer_spark.plans.queries_pipeline11 import (
        graph_modularity,
    )

    rows = graph_modularity(spark, "/root/testdata/sf0.001").collect()
    assert rows
    # one global Q repeated on every row, within [-1, 1]
    qs = {r.modularity for r in rows}
    assert len(qs) == 1
    assert -1.0 <= rows[0].modularity <= 1.0
    # sum of degree_sum over communities = 2m; internal edges <= m
    li = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .filter(F.col("l_orderkey") % 10 == 0)
        .select("l_orderkey", "l_partkey")
    )
    e = (
        li.alias("x")
        .join(li.alias("y"), "l_orderkey")
        .filter(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select("x.l_partkey", "y.l_partkey")
        .distinct()
    )
    m = e.count()
    assert sum(r.degree_sum for r in rows) == 2 * m
    assert sum(r.internal_edges for r in rows) <= m
    # contributions sum to Q (integer-sum identity)
    assert sum(r.contribution for r in rows) == pytest.approx(
        rows[0].modularity, abs=5e-5
    )


def test_snaive_backtest_shape(spark):
    from kafka_etl_consumer_spark.plans.queries_pipeline11 import (
        ts_snaive_backtest,
    )

    rows = {r.model: r for r in ts_snaive_backtest(spark, "/root/testdata/sf0.001").collect()}
    assert set(rows) == {"naive1", "snaive7"}
    for r in rows.values():
        assert r.n_days == 14
        assert r.mae >= 0 and r.rmse >= r.mae  # RMSE >= MAE always
        assert r.mape >= 0
