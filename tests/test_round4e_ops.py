"""Batch-17 invariant tests: matryoshka identity/ladder, LCP vs a Python
reference (incl. prefix containment and exact duplicates), permutation
p-value bounds."""

from __future__ import annotations

import pytest
from pyspark.sql import Row


def test_matryoshka_full_dim_is_identity(spark):
    from kafka_etl_consumer_spark.plans.queries_pipeline12 import (
        embedding_matryoshka_eval,
    )

    rows = {
        r.dims: r
        for r in embedding_matryoshka_eval(spark, "/root/testdata/sf0.001").collect()
    }
    assert set(rows) == {8, 16, 32, 64}
    assert rows[64].spearman == pytest.approx(1.0)
    assert rows[64].top10_overlap == 10
    # more dims never hurt rank agreement on this data (weak ladder check)
    assert rows[8].spearman <= rows[32].spearman <= rows[64].spearman
    for r in rows.values():
        assert -1.0 <= r.spearman <= 1.0
        assert 0 <= r.top10_overlap <= 10


def test_lcp_matches_python_reference(spark, tmp_path):
    texts = [
        "alpha beta gamma delta",
        "alpha beta gamma delta epsilon",  # strict prefix containment
        "alpha beta gamma delta",          # exact duplicate of doc 0
        "alpha beta x different tail",
        "zz totally disjoint",
    ]
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
            for i, t in enumerate(texts)
        ]
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline12 import (
        text_lcp_neardup,
    )

    got = sorted(
        (r.doc_id_a, r.doc_id_b, r.lcp_chars, r.min_len)
        for r in text_lcp_neardup(spark, str(tmp_path)).collect()
    )

    def lcp(a, b):
        n = 0
        for x, y in zip(a, b):
            if x != y:
                break
            n += 1
        return n

    order = sorted(range(len(texts)), key=lambda i: (texts[i], i))
    want = sorted(
        (
            order[j - 1],
            order[j],
            lcp(texts[order[j - 1]], texts[order[j]]),
            min(len(texts[order[j - 1]]), len(texts[order[j]])),
        )
        for j in range(1, len(order))
    )
    assert got == want
    # the exact-dup pair and the prefix pair both report lcp == min_len
    full = [(a, b) for a, b, l, m in got if l == m]
    assert len(full) == 2


def test_permutation_pvalue_bounds(spark):
    from kafka_etl_consumer_spark.plans.queries_pipeline12 import (
        stats_permutation_test,
    )

    r = stats_permutation_test(spark, "/root/testdata/sf0.001").collect()[0]
    assert r.n_perms == 40
    # +1 smoothing bounds: 1/41 <= p <= 1
    assert 1 / 41 - 1e-9 <= r.p_value <= 1.0
    assert r.mean_abs_perm_diff >= 0
