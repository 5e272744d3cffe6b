"""Unit tests for batch-5 analytics: funnel step ordering and the NLP
corpus statistics (TF-IDF, PMI)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from kafka_etl_consumer_spark.operators.nlp import pmi_collocations, tfidf_top_terms
from kafka_etl_consumer_spark.plans.queries_analytics import funnel_steps


def test_funnel_requires_step_order(spark, tmp_path):
    # user 1 completes view->click->purchase in order; user 2 clicks BEFORE
    # the first view (must not count as step 2); user 3 views only.
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        (1, 1, "view", t(0)),
        (2, 1, "click", t(5)),
        (3, 1, "purchase", t(9)),
        (4, 2, "click", t(0)),
        (5, 2, "view", t(5)),
        (6, 3, "view", t(1)),
    ]
    df = spark.createDataFrame(
        [(e, u, k, ts, 0.0, "{}") for e, u, k, ts in rows],
        "event_id long, user_id long, event_type string, ts timestamp, value double, props string",
    )
    sf = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    out = funnel_steps(spark, sf).collect()[0]
    assert out["n_view"] == 3
    assert out["n_click"] == 1  # only user 1 clicked AFTER first view
    assert out["n_purchase"] == 1
    assert out["avg_view_to_click_s"] == pytest.approx(300.0)
    assert out["avg_click_to_purchase_s"] == pytest.approx(240.0)


def test_tfidf_ranks_distinctive_terms(spark):
    df = spark.createDataFrame(
        [
            (1, "common common zebra"),
            (2, "common common yak"),
            (3, "common common common"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(df, k=1)
    rows = {r["doc_id"]: r for r in out.collect()}
    # 'common' appears in all 3 docs -> idf = ln(1) = 0; the unique animal
    # wins despite lower tf
    assert rows[1]["token"] == "zebra"
    assert rows[2]["token"] == "yak"
    assert rows[1]["score"] == pytest.approx(math.log(3.0), abs=1e-6)
    # doc 3 has only zero-idf terms; its top-1 is 'common' with score 0
    assert rows[3]["token"] == "common" and rows[3]["score"] == 0.0


def test_pmi_prefers_exclusive_pairs(spark):
    # "strong coffee" always co-occur; "the cat" share words with other
    # bigrams, so PMI(strong, coffee) must rank highest
    docs = ["strong coffee"] * 5 + ["the cat", "the dog", "a cat", "a dog"] * 5
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    out = pmi_collocations(df, min_count=5, k=3).collect()
    assert (out[0]["w1"], out[0]["w2"]) == ("strong", "coffee")
    assert out[0]["n_pair"] == 5
    assert all(out[0]["pmi"] >= r["pmi"] for r in out)
