"""Edge-path unit tests for the batch-8 corpus operators (canonical pick,
group reservoir, HTML strip, unicode clean) — the oracle parametrization in
test_queries_oracle.py covers the happy paths; these pin the corners."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.operators.dedup import canonical_pick
from kafka_etl_consumer_spark.operators.sampling import group_reservoir
from kafka_etl_consumer_spark.operators.text import html_strip, unicode_clean


def test_canonical_pick_singletons_and_ties(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, n_chars=c) for i, c in [(1, 10), (2, 50), (3, 50), (9, 7)]]
    )
    # 1-2 and 2-3 are near-dups (one chained component); 9 is a singleton
    pairs = spark.createDataFrame([Row(id_a=1, id_b=2), Row(id_a=2, id_b=3)])
    out = {
        r["doc_id"]: r
        for r in canonical_pick(pairs, docs, quality_col="n_chars").collect()
    }
    assert set(out) == {1, 2, 3, 9}
    assert out[1]["component_id"] == out[2]["component_id"] == out[3]["component_id"] == 1
    assert out[9]["component_id"] == 9 and out[9]["n_members"] == 1
    # tie on n_chars=50 between 2 and 3 -> smaller id wins, exactly one keeper
    keepers = [i for i, r in out.items() if r["is_canonical"]]
    assert sorted(keepers) == [2, 9]
    assert out[1]["n_members"] == 3


def test_group_reservoir_exact_k_and_small_groups(spark):
    rows = [Row(k="big", v=i) for i in range(50)] + [Row(k="tiny", v=i) for i in range(3)]
    df = spark.createDataFrame(rows)
    out = group_reservoir(df, "k", 5, F.col("v").cast("string"))
    counts = {r["k"]: r["n"] for r in out.groupBy("k").agg(F.count("*").alias("n")).collect()}
    assert counts == {"big": 5, "tiny": 3}  # min(k, group size), never padded
    # deterministic: same pick on rerun
    a = sorted(r["v"] for r in out.filter(F.col("k") == "big").collect())
    b = sorted(
        r["v"]
        for r in group_reservoir(df, "k", 5, F.col("v").cast("string"))
        .filter(F.col("k") == "big")
        .collect()
    )
    assert a == b


def test_html_strip_entity_order_no_double_unescape(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, html="<p>&amp;lt; stays-literal</p> <br/>x &lt;y&gt;")]
    )
    r = html_strip(df, "html").collect()[0]
    # "&amp;lt;" must decode to the TEXT "&lt;", not to "<"
    assert r["plain"] == "&lt; stays-literal x <y>"
    assert r["n_tags"] == 3


def test_unicode_clean_nfc_and_controls(spark):
    dirty = "Cafe\u0301 \x00\x07 x\tz"  # decomposed accent + NUL/BEL + tab
    clean_want = "Caf\u00e9 x z"  # precomposed, controls gone, ws collapsed
    df = spark.createDataFrame([Row(doc_id=1, t=dirty)])
    r = unicode_clean(df, "t").collect()[0]
    assert r["clean"] == clean_want
    assert r["n_chars_raw"] == len(dirty)
    assert r["n_chars_clean"] == len(clean_want)


def test_incremental_minhash_exact_copy_and_empty_batch(spark):
    from kafka_etl_consumer_spark.operators.dedup import minhash_lsh_matches_against

    corpus = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog today"),
            Row(doc_id=2, text="completely different content about spark shuffles"),
        ]
    )
    new = spark.createDataFrame(
        [
            Row(doc_id=10, text="the quick brown fox jumps over the lazy dog today"),
            Row(doc_id=11, text="nothing like anything in the corpus whatsoever yes"),
        ]
    )
    got = {
        (r.new_id, r.old_id): r.jaccard
        for r in minhash_lsh_matches_against(new, corpus).collect()
    }
    assert got == {(10, 1): 1.0}  # exact copy matches its source only

    empty = spark.createDataFrame([], corpus.schema)
    assert minhash_lsh_matches_against(empty, corpus).count() == 0


def test_table_checksum_order_insensitive_and_sensitive_to_change(spark):
    from kafka_etl_consumer_spark.operators.reconcile import table_checksum

    rows = [Row(k=i, v=f"v{i}") for i in range(100)]
    a = spark.createDataFrame(rows).repartition(7)
    b = spark.createDataFrame(list(reversed(rows))).repartition(3)
    ca = table_checksum(a, ["k", "v"]).collect()[0]
    cb = table_checksum(b, ["k", "v"]).collect()[0]
    assert (ca.n_rows, ca.checksum_sum, ca.checksum_xor) == (
        cb.n_rows, cb.checksum_sum, cb.checksum_xor,
    )  # partitioning/order independent
    c = spark.createDataFrame(rows[:-1] + [Row(k=99, v="CHANGED")])
    cc = table_checksum(c, ["k", "v"]).collect()[0]
    assert cc.checksum_xor != ca.checksum_xor  # one-row change flips it


def test_table_diff_statuses(spark):
    from kafka_etl_consumer_spark.operators.reconcile import table_diff

    old = spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")])
    new = spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="B"), Row(k=4, v="d")])
    got = {r.k: r.status for r in table_diff(old, new, ["k"], ["v"]).collect()}
    assert got == {1: "same", 2: "changed", 3: "removed", 4: "added"}


def test_streaming_incremental_dedup_foreachbatch(spark, tmp_path):
    """Live-pipeline shape: documents stream in; each micro-batch is
    near-dup-checked against the LANDED corpus (cross-set LSH match) and
    only novel docs append. Batch 2 must also be checked against what
    batch 1 landed."""
    from pyspark.sql import types as T

    from kafka_etl_consumer_spark.operators.dedup import minhash_lsh_matches_against

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    src = str(tmp_path / "src")
    corpus_dir = str(tmp_path / "corpus")
    base_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    base_c = "one two three four five six seven eight nine ten eleven"
    # seed corpus: A and B
    spark.createDataFrame(
        [(1, base_a), (2, "totally unrelated content about spark parquet sinks ok")],
        schema,
    ).write.parquet(corpus_dir)

    def on_batch(batch, _bid):
        if batch.isEmpty():
            return
        landed = batch.sparkSession.read.parquet(corpus_dir)
        matches = minhash_lsh_matches_against(batch, landed).select(
            F.col("new_id").alias("doc_id")
        ).distinct()
        novel = batch.join(matches, "doc_id", "left_anti")
        novel.write.mode("append").parquet(corpus_dir)

    # batch 1: C (novel) + A' (near-dup of seeded A -> dropped)
    spark.createDataFrame(
        [(10, base_c), (11, base_a + " extra")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    q = (
        spark.readStream.schema(schema).parquet(src)
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: C' (near-dup of batch-1-landed C -> dropped) + D (novel)
        spark.createDataFrame(
            [(20, base_c + " twelve"), (21, "fresh document with entirely new words here today")],
            schema,
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    landed_ids = sorted(
        r.doc_id for r in spark.read.parquet(corpus_dir).select("doc_id").collect()
    )
    assert landed_ids == [1, 2, 10, 21]  # A, B, C, D — near-dups dropped


def test_bigram_lm_score_orders_fluency(spark):
    """Docs repeating corpus-common bigrams outscore gibberish; sub-2-token
    docs get NULL score but stay present."""
    from kafka_etl_consumer_spark.operators.nlp import bigram_lm_score

    common = "the quick brown fox jumps over the lazy dog"
    rows = [(i, common) for i in range(5)] + [
        (10, "zxq vvt plk mnb qqa zzy"),  # bigrams seen once each
        (11, "single"),
        (12, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in bigram_lm_score(df).collect()}
    assert len(got) == 8
    assert got[0].lm_score > got[10].lm_score  # fluent >> gibberish
    import math
    assert abs(got[10].lm_score - 0.0) < 1e-9  # ln(1) bigrams
    assert got[0].lm_score == round(math.log(5), 6)  # every bigram seen 5x
    assert got[11].lm_score is None and got[11].n_bigrams == 0
    assert got[12].lm_score is None and got[12].n_bigrams == 0


def test_vocab_oov_rate_cut_and_ties(spark):
    """Vocab cut is deterministic (count desc, token asc) and OOV counts
    are exact; empty docs keep NULL rate."""
    from kafka_etl_consumer_spark.operators.nlp import vocab_oov_rate

    rows = [
        (1, "aa aa aa bb bb cc"),   # counts: aa3 bb2 cc1+1(doc2)=2 dd1 -> top2 = aa, bb|cc tie
        (2, "cc dd"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in vocab_oov_rate(df, vocab_size=2).collect()}
    # counts: aa=3, bb=2, cc=2, dd=1; tie bb vs cc -> token asc keeps bb
    assert got[1].n_oov == 1           # cc OOV
    assert got[2].n_oov == 2           # cc, dd OOV
    assert got[1].oov_rate == round(1 / 6, 6)
    assert got[3].n_tokens == 0 and got[3].oov_rate is None


def test_histogram_quantiles_accuracy_vs_exact(spark):
    """1000-bin sketch quantiles land within one bin width of the exact
    percentile on a skewed distribution."""
    from kafka_etl_consumer_spark.operators.sketch import histogram_quantiles
    from pyspark.sql import functions as F

    vals = [(float(i * i % 9973),) for i in range(20000)]
    df = spark.createDataFrame(vals, "v double")
    row = histogram_quantiles(df, "v", [0.5, 0.99]).collect()[0]
    exact = df.agg(F.expr("percentile(v, array(0.5, 0.99))")).collect()[0][0]
    lo, hi = (
        df.agg(F.min("v")).collect()[0][0],
        df.agg(F.max("v")).collect()[0][0],
    )
    binw = (hi - lo) / 1000
    assert row.n == 20000
    assert abs(row.q_0_5 - exact[0]) <= binw
    assert abs(row.q_0_99 - exact[1]) <= binw


def test_histogram_quantiles_merge_across_batches(spark):
    """Mergeability: bin counters from two disjoint batches (computed with
    the SAME lo/hi frame) sum to the whole-corpus counters, so quantiles
    from merged counters equal the single-pass answer — the property that
    makes this the streaming/incremental percentile path."""
    from kafka_etl_consumer_spark.operators.sketch import histogram_quantiles
    from pyspark.sql import functions as F

    vals = [(i, float((7 * i) % 1009)) for i in range(10000)]
    df = spark.createDataFrame(vals, "i long, v double")
    whole = histogram_quantiles(df, "v", [0.5, 0.9]).collect()[0]

    # fix the frame, bin each half separately, merge counters, re-derive
    lo, hi, bins = 0.0, 1008.0, 1000
    w = (hi - lo) / bins

    def counters(d):
        b = F.least(F.floor((F.col("v") - lo) / w).cast("int"), F.lit(bins - 1))
        return d.groupBy(b.alias("bin")).count()

    h1 = counters(df.filter("i % 2 = 0"))
    h2 = counters(df.filter("i % 2 = 1"))
    merged = (
        h1.unionByName(h2)
        .groupBy("bin")
        .agg(F.sum("count").alias("c"))
        .agg(F.sum("c").alias("total"))
        .collect()[0]
    )
    assert merged.total == 10000  # every row lands in exactly one counter
    assert whole.n == 10000


def test_cms_overestimates_never_under(spark):
    """CMS property: estimate >= true count for every candidate; exact on
    a stream with fewer distincts than one sketch row."""
    from kafka_etl_consumer_spark.operators.sketch import cms_estimate
    from pyspark.sql import functions as F

    rows = [(f"t{i % 37}",) for i in range(3700)]
    df = spark.createDataFrame(rows, "token string")
    truth = df.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("true_n"))
    got = cms_estimate(df, "token", truth).collect()
    assert len(got) == 37
    assert all(r.cms_est >= r.true_n for r in got)
    # 37 distincts over 256-wide rows: with 4 independent rows the min is
    # almost surely collision-free -> exact
    assert all(r.cms_est == r.true_n for r in got)


def test_bm25_ranks_term_rich_docs_first(spark):
    """BM25 sanity: a doc saturated with query terms outranks one with a
    single hit; docs without any query term are absent."""
    from kafka_etl_consumer_spark.operators.nlp import bm25_topk

    rows = [
        (1, "alpha beta alpha beta alpha"),          # no query terms
        (2, "needle in a haystack of words here"),   # one hit
        (3, "needle needle needle thread thread"),   # many hits
        (4, "completely unrelated text body"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = bm25_topk(df, ["needle", "thread"], k=10).collect()
    ids = [r.doc_id for r in got]
    assert set(ids) == {2, 3}
    assert ids[0] == 3 and got[0].score > got[1].score


def test_bm25_empty_query_and_duplicate_terms(spark):
    """r8 edge guards: an empty query returns an empty frame (not
    IndexError), and a duplicated query term scores once — identical to
    the distinct-terms run (bag-of-words (doc, term) semantics)."""
    from kafka_etl_consumer_spark.operators.nlp import bm25_topk

    rows = [
        (1, "needle in a haystack"),
        (2, "needle needle thread"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert bm25_topk(df, [], k=5).collect() == []
    dup = bm25_topk(df, ["needle", "needle", "thread"], k=5).collect()
    ref = bm25_topk(df, ["needle", "thread"], k=5).collect()
    assert [(r.doc_id, r.score) for r in dup] == [
        (r.doc_id, r.score) for r in ref
    ]
