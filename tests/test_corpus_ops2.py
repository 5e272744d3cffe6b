"""Unit tests for the batch-4 corpus operators: PII redaction, repetition
profile, sequence packing, embedding int8 quantization."""

from __future__ import annotations

import pytest

from kafka_etl_consumer_spark.operators.embeddings import quantize_int8
from kafka_etl_consumer_spark.operators.packing import pack_sequences
from kafka_etl_consumer_spark.operators.text import pii_redact, repetition_profile


def test_pii_redact_masks_all_three_kinds(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@sub.example.org thanks"),
            (2, "call +44-800-1234 or ping 192.168.0.17 now"),
            (3, "clean text with no identifiers at all"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_redact(df).collect()}
    assert (rows[1]["n_email"], rows[1]["n_phone"], rows[1]["n_ipv4"]) == (1, 0, 0)
    assert rows[1]["clean"] == "mail me at <EMAIL> thanks"
    assert (rows[2]["n_email"], rows[2]["n_phone"], rows[2]["n_ipv4"]) == (0, 1, 1)
    assert rows[2]["clean"] == "call <PHONE> or ping <IP> now"
    assert rows[3]["clean"] == "clean text with no identifiers at all"


def test_repetition_profile_flags_repeats(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),  # one token repeated
            (2, "all words here are unique tokens"),
            (3, "x"),  # too short for any shingle
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_profile(df).collect()}
    # 3 bigrams, all "spam spam" -> 2/3 duplicated; top token is 4/4
    assert rows[1]["dup_2gram_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert rows[1]["top_token_frac"] == 1.0
    assert rows[2]["dup_2gram_frac"] == 0.0
    assert rows[2]["dup_3gram_frac"] == 0.0
    assert rows[2]["top_token_frac"] == pytest.approx(1 / 6, abs=1e-6)
    assert rows[3]["n_tokens"] == 1
    assert rows[3]["dup_2gram_frac"] == 0.0  # empty shingle array, not null


def test_pack_sequences_chunks_by_budget(spark):
    # single shard (n_shards=1): docs of 60 tokens each, budget 100 ->
    # offsets 0,60,120,... pack boundaries straddle as concat-then-chunk
    df = spark.createDataFrame(
        [(i, 60) for i in range(5)], "doc_id long, n_toks long"
    )
    out = {
        r["pack_id"]: r
        for r in pack_sequences(df, "n_toks", "doc_id", budget=100, n_shards=1).collect()
    }
    # offsets 0,60,120,180,240 -> packs 0,0,1,1,2
    assert [out[p]["n_docs"] for p in sorted(out)] == [2, 2, 1]
    assert out[0]["first_doc"] == 0 and out[0]["last_doc"] == 1
    assert out[2]["pack_tokens"] == 60
    assert sum(r["pack_tokens"] for r in out.values()) == 300


def test_quantize_int8_bounds_and_error(spark):
    df = spark.createDataFrame(
        [
            (1, [0.0, 5.0, 1.0]),
            (2, [10.0, 5.0, -1.0]),
            (3, [5.0, 5.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    for r in rows.values():
        assert -128 <= r["q_min"] <= r["q_max"] <= 127
        # max-range dims quantize exactly at the extremes; mae stays below
        # half a quantization step of the widest dim (11/255/2)
        assert r["mae"] <= 11.0 / 255.0 / 2 + 1e-9
    # dim 2 is constant (5.0) -> quantizes to 0 everywhere; vec 1 hits the
    # min of dim 1 (0.0 -> -128) and vec 2 the max (10.0 -> 127)
    assert rows[1]["q_min"] == -128
    assert rows[2]["q_max"] == 127
