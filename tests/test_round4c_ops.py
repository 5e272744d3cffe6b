"""Batch-15 invariant tests: BPE merge semantics against a Python
reference implementation (including the overlapping-pair rule), IVF-PQ
candidate quality vs brute force, and Poisson bootstrap weight sanity."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import Row


def _py_bpe(texts, rounds):
    """Reference BPE trainer: word-freq table, count adjacent pairs
    (overlaps counted), merge argmax left-to-right non-overlapping."""
    wf = Counter()
    for t in texts:
        wf.update(re.findall(r"[a-z0-9]+", t.lower()))
    seqs = {w: list(w) for w in wf}
    merges = []
    for r in range(rounds):
        pc = Counter()
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wf[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((r, f"{best[0]} {best[1]}", best[0] + best[1], pc[best]))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges


def _run_bpe(spark, tmp_path, texts):
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
            for i, t in enumerate(texts)
        ]
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline10 import (
        corpus_bpe_merges,
    )

    return sorted(
        (r.r, r.pair, r.merged, r.n)
        for r in corpus_bpe_merges(spark, str(tmp_path)).collect()
    )


def test_bpe_matches_python_reference_with_overlaps(spark, tmp_path):
    # 'aaa' exercises the overlapping-pair rule: (a,a) counts twice but
    # merges once per occurrence run; 'abab' double-merges; later rounds
    # must merge multi-char symbols ('ab'+'ab').
    texts = [
        "aaa abab abab banana bandana",
        "aaa abab cabbage banana",
        "the cat bat rat sat",
    ]
    got = _run_bpe(spark, tmp_path, texts)
    want = sorted(_py_bpe(texts, 8))
    assert got == want


def test_bpe_tiebreak_is_lexicographic(spark, tmp_path):
    # 'xy' and 'yz' both appear exactly twice -> round 0 must pick 'x y'
    texts = ["xyz xyz"]
    got = _run_bpe(spark, tmp_path, texts)
    assert got[0][1] == "x y"
    assert got == sorted(_py_bpe(texts, 8))


def test_ivfpq_candidates_are_honest_neighbors(spark):
    """IVF-PQ's top-10 must substantially agree with brute-force cosine:
    the ADC + shortlist pipeline degrades recall gracefully, it must not
    return garbage (which a codes/dtable indexing bug would)."""
    from pyspark.sql import functions as F

    from kafka_etl_consumer_spark.operators import similarity as S

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
    )
    approx = S.ivfpq_ann_topk(e.select("vec_id", "embedding"), q, k=10)
    exact = S.cosine_topk(e.select("vec_id", "embedding"), q, k=10)
    ivf = S.ivf_ann_topk(e.select("vec_id", "embedding"), q, k=10)
    a = {(r.q_vec_id, r.vec_id) for r in approx.collect()}
    x = {(r.q_vec_id, r.vec_id) for r in exact.collect()}
    iv = {(r.q_vec_id, r.vec_id) for r in ivf.collect()}
    assert len(a) == 50  # 5 queries x 10
    # the PQ/ADC + shortlist stage's own ceiling is IVF-Flat (identical
    # index, exact distances): require it recovers most of that ceiling,
    # and a sane floor against brute force
    ivf_recall = len(a & iv) / len(iv)
    assert ivf_recall >= 0.7, f"ADC stage lost the IVF candidates: {ivf_recall}"
    recall = len(a & x) / len(x)
    assert recall >= 0.4, f"IVF-PQ recall vs brute force too low: {recall}"


def test_ivfpq_inline_codes_match_pq_assign(spark):
    """The narrow higher-order argmin inside ivfpq_ann_topk must assign
    the IDENTICAL codes as operators/embeddings.pq_assign (same rounding,
    same tie rule) — they are two formulations of one definition."""
    from pyspark.sql import functions as F

    from kafka_etl_consumer_spark.operators.embeddings import pq_assign

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    want = {
        (r.vec_id, r.subspace): r.code
        for r in pq_assign(e, dims=64, subspaces=8, codebook_size=4).collect()
    }

    # reproduce the inline form the operator builds
    from kafka_etl_consumer_spark.operators.similarity import (
        hash_ranked_centroids,
        ivfpq_ann_topk,  # noqa: F401  (import proves public surface)
    )

    sub = 8
    subs = spark.range(8).select(F.col("id").cast("int").alias("s"))
    pqb = (
        e.filter(F.col("vec_id") < 4)
        .select(
            F.col("vec_id").cast("int").alias("code"),
            F.col("embedding").cast("array<double>").alias("__e"),
        )
        .crossJoin(subs)
        .select("s", "code", F.slice("__e", F.col("s") * sub + 1, sub).alias("cent"))
    )
    pqrow = pqb.agg(
        F.array_sort(F.collect_list(F.struct("s", "code", "cent"))).alias("__pqbook")
    )

    def sqdist(vec_slice, cent):
        return F.round(
            F.aggregate(
                F.zip_with(vec_slice, cent, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            9,
        )

    def code_for(vec, s):
        cands = F.filter(F.col("__pqbook"), lambda c: c["s"] == s)
        scored = F.transform(
            cands,
            lambda c: F.struct(
                sqdist(F.slice(vec, s * sub + 1, sub), c["cent"]).alias("d"),
                c["code"].alias("code"),
            ),
        )
        return F.array_min(scored)["code"]

    codes = F.array(*[code_for(F.col("emb"), s) for s in range(8)])
    got_rows = (
        e.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
        .crossJoin(F.broadcast(pqrow))
        .select("vec_id", codes.alias("codes"))
        .collect()
    )
    got = {
        (r.vec_id, s): c for r in got_rows for s, c in enumerate(r.codes)
    }
    assert got == want


def test_bootstrap_weights_average_to_one(spark):
    """Poisson(1) weights must average ~1 so resamples have ~n rows —
    a wrong CDF threshold or hash normalization shows up here."""
    from kafka_etl_consumer_spark.plans.queries_pipeline10 import (
        stats_bootstrap_ci,
    )

    row = stats_bootstrap_ci(spark, "/root/testdata/sf0.01").collect()[0]
    assert row.n_resamples == 40
    assert row.lo95 < row.point_mean < row.hi95
    # CI half-width should be a few bootstrap SEs, not orders off
    half = (row.hi95 - row.lo95) / 2
    assert 1.0 * row.boot_se < half * 3
    assert half < 6 * row.boot_se
