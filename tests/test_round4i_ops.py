"""Batch-21 invariant tests: silhouette sign on separated/mislabeled
clusters, Heaps beta on fully-novel and fully-saturated corpora, exact
xcorr=1 at the planted lag."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row


def _mk_embeddings(spark, tmp_path, rows):
    spark.createDataFrame(
        [Row(vec_id=i, label=lb, embedding=vec) for i, (lb, vec) in enumerate(rows)]
    ).write.parquet(str(tmp_path / "embeddings.parquet"))


def test_silhouette_separated_vs_mislabeled(spark, tmp_path):
    lo = [[0.0, 0.0], [0.1, 0.0], [0.0, 0.1], [0.1, 0.1]]
    hi = [[10.0, 10.0], [10.1, 10.0], [10.0, 10.1], [10.1, 10.1]]
    rows = [(0, v) for v in lo] + [(1, v) for v in hi]
    # plant one label-0 point deep inside cluster 1
    rows.append((0, [10.05, 10.05]))
    _mk_embeddings(spark, tmp_path, rows)
    from kafka_etl_consumer_spark.plans.queries_pipeline16 import (
        cluster_silhouette,
    )

    got = {r.label: r for r in cluster_silhouette(spark, str(tmp_path)).collect()}
    assert got[1].frac_negative == 0.0
    assert got[1].mean_silhouette > 0.9
    # the planted point sits next to centroid 1 -> negative silhouette
    assert got[0].frac_negative == round(1 / 5, 6)
    assert got[0].n_vectors == 5 and got[1].n_vectors == 4


def _mk_docs(spark, tmp_path, texts):
    spark.createDataFrame(
        [Row(doc_id=i, text=t, source="s", lang="en") for i, t in enumerate(texts)]
    ).write.parquet(str(tmp_path / "documents.parquet"))


def test_heaps_fully_novel_corpus_beta_one(spark, tmp_path):
    # each doc contributes exactly ONE globally-unique trigram:
    # V(N) = N exactly -> beta = 1, K = 1
    texts = [f"w{3 * i} w{3 * i + 1} w{3 * i + 2}" for i in range(20)]
    _mk_docs(spark, tmp_path, texts)
    from kafka_etl_consumer_spark.plans.queries_pipeline16 import text_heaps_law

    r = text_heaps_law(spark, str(tmp_path)).collect()[0]
    assert (r.n_docs, r.total_trigrams, r.vocab) == (20, 20, 20)
    assert r.heaps_beta == 1.0
    assert r.heaps_k == 1.0


def test_heaps_saturated_corpus_beta_zero(spark, tmp_path):
    _mk_docs(spark, tmp_path, ["a b c"] * 15)
    from kafka_etl_consumer_spark.plans.queries_pipeline16 import text_heaps_law

    r = text_heaps_law(spark, str(tmp_path)).collect()[0]
    assert (r.vocab, r.heaps_beta, r.heaps_k) == (1, 0.0, 1.0)


def test_xcorr_planted_two_day_lead(spark, tmp_path):
    # purchases replay the view curve exactly two days later -> r(+2)=1
    base = dt.datetime(2024, 3, 1)
    curve = [1, 3, 2, 5, 4, 7, 6, 9, 8, 2]
    rows, eid = [], 0
    for off, n in enumerate(curve):
        for k in range(n):
            rows.append(
                Row(event_id=eid, ts=base + dt.timedelta(days=off, minutes=k),
                    user_id=k, event_type="view", value=1.0, props="{}")
            )
            eid += 1
        for k in range(n):
            rows.append(
                Row(event_id=eid, ts=base + dt.timedelta(days=off + 2, minutes=k),
                    user_id=k, event_type="purchase", value=1.0, props="{}")
            )
            eid += 1
    spark.createDataFrame(rows).write.parquet(str(tmp_path / "events.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline16 import ts_xcorr_lags

    got = {r.lag: r.xcorr for r in ts_xcorr_lags(spark, str(tmp_path)).collect()}
    assert got[2] == 1.0
    assert all(v < 1.0 for lag, v in got.items() if lag != 2)
