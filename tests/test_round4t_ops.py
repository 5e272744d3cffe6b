"""Batch-32 invariant tests: Markov stationary limit vs closed form,
normalization merges variant texts, complete-block hubness degrees."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row


def test_markov_stationary_two_state_chain(spark, tmp_path):
    # one user, sequence A A B A A B A (A=view, B=purchase):
    # P(A->A)=1/2, P(A->B)=1/2, P(B->A)=1 -> stationary (2/3, 1/3);
    # 16 iterations from uniform converge within (1/2)^16
    types = ["view", "view", "purchase", "view", "view", "purchase", "view"]
    spark.createDataFrame(
        [
            Row(event_id=i, ts=dt.datetime(2024, 1, 2), user_id=1,
                event_type=t, value=1.0, props="{}")
            for i, t in enumerate(types)
        ]
    ).write.parquet(str(tmp_path / "events.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline27 import (
        markov_stationary_dist,
    )

    got = {r.event_type: r.stationary_p for r in markov_stationary_dist(spark, str(tmp_path)).collect()}
    assert set(got) == {"view", "purchase"}
    assert abs(got["view"] - 2 / 3) < 1e-4
    assert abs(got["purchase"] - 1 / 3) < 1e-4
    assert abs(got["view"] + got["purchase"] - 1.0) < 1e-9


def test_normalized_dedup_merges_variants(spark, tmp_path):
    texts = ["Hello, World!", "hello world", "HELLO  WORLD", "other doc"]
    spark.createDataFrame(
        [Row(doc_id=i, text=t, source="s", lang="en") for i, t in enumerate(texts)]
    ).write.parquet(str(tmp_path / "documents.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline27 import (
        dedup_exact_normalized,
    )

    got = sorted(
        (r.keeper_doc_id, r.n_copies, r.n_raw_variants)
        for r in dedup_exact_normalized(spark, str(tmp_path)).collect()
    )
    # the three "hello world" variants merge into one class keeping
    # doc 0, with 3 distinct RAW fingerprints absorbed
    assert got == [(0, 3, 3), (3, 1, 1)]


def test_hubness_complete_block_uniform_degree(spark, tmp_path):
    # 4 vectors in one label: with k=3 each picks ALL other 3, so every
    # in-degree is exactly 3
    vecs = [[1.0, 0.0], [0.9, 0.1], [0.8, 0.2], [0.7, 0.3]]
    spark.createDataFrame(
        [Row(vec_id=i, label=0, embedding=v) for i, v in enumerate(vecs)]
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline27 import (
        embedding_hubness,
    )

    got = [
        (r.in_degree, r.n_vectors)
        for r in embedding_hubness(spark, str(tmp_path)).collect()
    ]
    assert got == [(3, 4)]
