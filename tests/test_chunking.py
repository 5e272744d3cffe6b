"""Unit tests for operators/chunking.py (token-window chunking +
n-gram benchmark contamination)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.operators.chunking import (
    chunk_documents,
    ngram_contamination,
)


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_chunk_boundaries(spark):
    # 10 tokens, size 4, stride 3 -> starts 1,4,7 (last start = n-size+stride)
    text = " ".join(f"t{i}" for i in range(10))
    out = chunk_documents(
        _docs(spark, [(1, text)]), size=4, stride=3
    ).orderBy("chunk_idx")
    rows = out.collect()
    assert [r.chunk_idx for r in rows] == [0, 1, 2]
    assert [r.n_tokens for r in rows] == [4, 4, 4]
    assert rows[0].chunk_text == "t0 t1 t2 t3"
    assert rows[2].chunk_text == "t6 t7 t8 t9"


def test_chunk_tail_shorter_and_single(spark):
    # 11 tokens, size 4, stride 3 -> starts 1,4,7,10; tail has 2 tokens
    text = " ".join(f"t{i}" for i in range(11))
    rows = (
        chunk_documents(_docs(spark, [(1, text), (2, "a b"), (3, "")]), size=4, stride=3)
        .orderBy("doc_id", "chunk_idx")
        .collect()
    )
    d1 = [r for r in rows if r.doc_id == 1]
    assert [r.n_tokens for r in d1] == [4, 4, 4, 2]
    assert d1[-1].chunk_text == "t9 t10"
    # short doc -> exactly one chunk; empty doc -> one empty chunk
    d2 = [r for r in rows if r.doc_id == 2]
    assert len(d2) == 1 and d2[0].chunk_text == "a b" and d2[0].n_tokens == 2
    d3 = [r for r in rows if r.doc_id == 3]
    assert len(d3) == 1 and d3[0].chunk_text == "" and d3[0].n_tokens == 0


def test_chunk_full_token_coverage(spark):
    # every token index appears in at least one chunk (no gaps at any n)
    for n in (1, 4, 5, 7, 12, 13):
        text = " ".join(f"t{i}" for i in range(n))
        got = (
            chunk_documents(_docs(spark, [(1, text)]), size=4, stride=3)
            .select(F.explode(F.split("chunk_text", " ")).alias("t"))
            .where(F.col("t") != "")
            .distinct()
            .count()
        )
        assert got == n, f"n={n}: covered {got}"


def test_chunk_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "a")]), size=4, stride=5)


def test_contamination_counts_and_flag(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon")])
    train = _docs(
        spark,
        [
            (1, "alpha beta gamma delta zeta"),  # shares 2 distinct 3-grams
            (2, "zeta eta theta iota kappa"),  # shares none
        ],
    )
    out = {
        r.doc_id: r
        for r in ngram_contamination(train, bench, k=3, threshold=2).collect()
    }
    assert out[1].n_shared == 2 and out[1].contaminated is True
    assert out[2].n_shared == 0 and out[2].contaminated is False
