"""Query surface batch 44 (round 7): retrieval-eval completion and two
published LLM-corpus-curation filters.

- eval_mrr_map_at10 — MRR@10 and MAP@10 over a multi-query retrieval
  run (per-term tf ranking, graded against a tf>=3 relevance set).
  Completes the retrieval-metric family: eval_retrieval_pr (P/R@k),
  eval_ndcg_rank (graded gain), and now the two rank-position metrics
  every search dashboard reports.
- text_gopher_rules — the Gopher paper's document-quality rule battery
  (Rae et al. 2021, §A1.1: word count bounds, mean word length,
  symbol-to-word ratio, alphabetic-word fraction, stopword floor) as
  per-rule fail counts + corpus pass rate. The published counterpart
  to the repo's ad-hoc text_quality heuristics.
- corpus_dsir_weights — DSIR importance-resampling weights (Xie et al.
  2023): per-document sum of log(p_target(b)/p_raw(b)) over hashed
  token-feature buckets, reported as a bounded 10-bin histogram. The
  standard "reweight raw crawl toward a target domain" primitive.

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283 of mykidong/kafka-etl-consumer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.functions.hashing import hash64, hash64_sql
from kafka_etl_consumer_spark.functions.text import tokens, tokens_sql
from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# eval_mrr_map_at10 — MRR@10 / MAP@10 of per-term tf rankings
# ---------------------------------------------------------------------------

_MRR_TERMS = ["vector", "hash", "join", "scan"]
_MRR_K = 10
_MRR_REL_TF = 3  # a doc is relevant to term t iff tf(doc, t) >= 3

_MRR_TERMS_SQL = ", ".join(f"'{t}'" for t in _MRR_TERMS)

_MRR_ORACLE = f"""
WITH hits AS (
  SELECT doc_id, t
  FROM (SELECT doc_id, unnest({tokens_sql("text")}) AS t FROM documents)
  WHERE t IN ({_MRR_TERMS_SQL})
),
tf AS (SELECT t AS term, doc_id, count(*) AS tf FROM hits GROUP BY 1, 2),
nrel AS (SELECT term, count(*) AS n_rel FROM tf
         WHERE tf >= {_MRR_REL_TF} GROUP BY term),
ranked AS (
  SELECT term, doc_id, tf,
         CAST(tf >= {_MRR_REL_TF} AS INT) AS rel,
         row_number() OVER (PARTITION BY term
                            ORDER BY tf DESC, doc_id) AS rn
  FROM tf
),
topk AS (SELECT * FROM ranked WHERE rn <= {_MRR_K}),
cum AS (
  SELECT term, rn, rel,
         sum(rel) OVER (PARTITION BY term ORDER BY rn) AS cum_rel
  FROM topk
),
ap AS (
  SELECT term,
         min(CASE WHEN rel = 1 THEN rn END) AS first_rel,
         sum(CASE WHEN rel = 1
               THEN cum_rel / CAST(rn AS DOUBLE) END) AS prec_sum
  FROM cum GROUP BY term
),
per_q AS (
  SELECT ap.term,
         coalesce(1.0 / first_rel, 0.0) AS rr,
         CASE WHEN coalesce(nrel.n_rel, 0) = 0 THEN 0.0
              ELSE coalesce(prec_sum, 0.0)
                     / least(nrel.n_rel, {_MRR_K}) END AS ap_at_k
  FROM ap LEFT JOIN nrel USING (term)
)
SELECT CAST(count(*) AS BIGINT) AS n_queries,
       round(avg(rr), 6) AS mrr_at_10,
       round(avg(ap_at_k), 6) AS map_at_10
FROM per_q
"""


@register("eval_mrr_map_at10", _MRR_ORACLE)
def eval_mrr_map_at10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@10 and MAP@10 over a 4-query retrieval run: each query term
    ranks documents by term frequency (DESC, doc_id tiebreak); the
    relevance set is tf >= 3. Completes the retrieval-evaluation family
    (P/R@k, NDCG, now the rank-position pair every search system
    reports). Scale: the token explode is term-filtered BEFORE the
    (term, doc) count shuffle; the per-term top-10 is a rank<=k filter
    Spark rewrites to WindowGroupLimit (map-side top-k per partition,
    never a full sort); everything after runs on the <= 40-row topk
    grid. AP uses the min(R, k) denominator (TREC convention); a query
    with tf rows but zero relevant docs contributes AP = 0 to the MAP
    average (not a silently-dropped NULL)."""
    docs = _t(spark, sf_dir, "documents")
    hits = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("t")
    ).filter(F.col("t").isin(_MRR_TERMS))
    tf = hits.groupBy(F.col("t").alias("term"), "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    nrel = tf.filter(F.col("tf") >= _MRR_REL_TF).groupBy("term").agg(
        F.count(F.lit(1)).alias("n_rel")
    )
    w = Window.partitionBy("term").orderBy(F.col("tf").desc(), F.col("doc_id"))
    ranked = tf.select(
        "term",
        (F.col("tf") >= _MRR_REL_TF).cast("int").alias("rel"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") <= _MRR_K)
    cum = Window.partitionBy("term").orderBy("rn")
    ap = (
        ranked.withColumn("cum_rel", F.sum("rel").over(cum))
        .groupBy("term")
        .agg(
            F.min(F.when(F.col("rel") == 1, F.col("rn"))).alias("first_rel"),
            F.sum(
                F.when(
                    F.col("rel") == 1,
                    F.col("cum_rel") / F.col("rn").cast("double"),
                )
            ).alias("prec_sum"),
        )
    )
    per_q = ap.join(nrel, "term", "left").select(
        F.coalesce(F.lit(1.0) / F.col("first_rel"), F.lit(0.0)).alias("rr"),
        # a query with hits but NO relevant docs contributes AP = 0 (TREC
        # min(R,k) convention) instead of a 0/0 NULL silently dropped
        # from the MAP average
        F.when(F.coalesce(F.col("n_rel"), F.lit(0)) == 0, F.lit(0.0))
        .otherwise(
            F.coalesce(F.col("prec_sum"), F.lit(0.0))
            / F.least(F.col("n_rel"), F.lit(_MRR_K))
        )
        .alias("ap_at_k"),
    )
    return per_q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.round(F.avg("rr"), 6).alias("mrr_at_10"),
        F.round(F.avg("ap_at_k"), 6).alias("map_at_10"),
    )


# ---------------------------------------------------------------------------
# text_gopher_rules — the Gopher quality-filter rule battery
# ---------------------------------------------------------------------------

_GOPHER_STOPWORDS = ["the", "and", "of", "to", "with", "that"]
_GOPHER_SW_SQL = ", ".join(f"'{s}'" for s in _GOPHER_STOPWORDS)

_GOPHER_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {tokens_sql("text")} AS toks FROM documents
),
m AS (
  SELECT doc_id,
         len(toks) AS n_words,
         list_sum(list_transform(toks, t -> len(t)))
           / CAST(len(toks) AS DOUBLE) AS mean_wlen,
         len(list_filter(toks, t -> regexp_matches(t, '#')))
           / CAST(len(toks) AS DOUBLE) AS symbol_ratio,
         len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
           / CAST(len(toks) AS DOUBLE) AS alpha_frac,
         len(list_filter(toks, t -> t IN ({_GOPHER_SW_SQL}))) AS n_stop
  FROM d
),
r AS (
  SELECT CAST(n_words BETWEEN 50 AND 100000 AS INT) AS ok_wc,
         CAST(mean_wlen BETWEEN 3 AND 10 AS INT) AS ok_wlen,
         CAST(symbol_ratio < 0.1 AS INT) AS ok_sym,
         CAST(alpha_frac >= 0.8 AS INT) AS ok_alpha,
         CAST(n_stop >= 2 AS INT) AS ok_stop
  FROM m
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(1 - ok_wc) AS BIGINT) AS fail_word_count,
       CAST(sum(1 - ok_wlen) AS BIGINT) AS fail_mean_word_len,
       CAST(sum(1 - ok_sym) AS BIGINT) AS fail_symbol_ratio,
       CAST(sum(1 - ok_alpha) AS BIGINT) AS fail_alpha_frac,
       CAST(sum(1 - ok_stop) AS BIGINT) AS fail_stopwords,
       CAST(sum(ok_wc * ok_wlen * ok_sym * ok_alpha * ok_stop) AS BIGINT)
         AS n_pass,
       round(avg(ok_wc * ok_wlen * ok_sym * ok_alpha * ok_stop), 6)
         AS pass_rate
FROM r
"""


@register("text_gopher_rules", _GOPHER_ORACLE)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher corpus-quality rule battery (Rae et al. 2021, §A1.1):
    word count in [50, 1e5], mean word length in [3, 10], symbol-to-word
    ratio < 0.1, >=80% of words contain an alphabetic character, and at
    least 2 stopwords — reported as per-rule fail counts plus the
    all-rules pass rate. The published counterpart to text_quality's
    ad-hoc heuristics; together they are the batch quality gate of an
    LLM ingest pipeline. Scale: every rule is a narrow in-row map over
    the token array (JVM higher-order functions, zero shuffle), folded
    by ONE corpus-wide aggregate."""
    d = _t(spark, sf_dir, "documents").select(tokens(F.col("text")).alias("toks"))
    n = F.size("toks").cast("double")
    m = d.select(
        F.size("toks").alias("n_words"),
        (
            F.aggregate(
                F.transform(F.col("toks"), lambda t: F.length(t)),
                F.lit(0),
                lambda acc, v: acc + v,
            )
            / n
        ).alias("mean_wlen"),
        (
            F.size(F.filter(F.col("toks"), lambda t: t.rlike("[#]"))) / n
        ).alias("symbol_ratio"),
        (
            F.size(F.filter(F.col("toks"), lambda t: t.rlike("[a-z]"))) / n
        ).alias("alpha_frac"),
        F.size(
            F.filter(
                F.col("toks"),
                lambda t: t.isin(_GOPHER_STOPWORDS),
            )
        ).alias("n_stop"),
    )
    r = m.select(
        F.col("n_words").between(50, 100000).cast("int").alias("ok_wc"),
        F.col("mean_wlen").between(3, 10).cast("int").alias("ok_wlen"),
        (F.col("symbol_ratio") < 0.1).cast("int").alias("ok_sym"),
        (F.col("alpha_frac") >= 0.8).cast("int").alias("ok_alpha"),
        (F.col("n_stop") >= 2).cast("int").alias("ok_stop"),
    )
    ok_all = (
        F.col("ok_wc")
        * F.col("ok_wlen")
        * F.col("ok_sym")
        * F.col("ok_alpha")
        * F.col("ok_stop")
    )
    return r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(1 - F.col("ok_wc")).cast("bigint").alias("fail_word_count"),
        F.sum(1 - F.col("ok_wlen")).cast("bigint").alias("fail_mean_word_len"),
        F.sum(1 - F.col("ok_sym")).cast("bigint").alias("fail_symbol_ratio"),
        F.sum(1 - F.col("ok_alpha")).cast("bigint").alias("fail_alpha_frac"),
        F.sum(1 - F.col("ok_stop")).cast("bigint").alias("fail_stopwords"),
        F.sum(ok_all).cast("bigint").alias("n_pass"),
        F.round(F.avg(ok_all), 6).alias("pass_rate"),
    )


# ---------------------------------------------------------------------------
# corpus_dsir_weights — DSIR importance-resampling weights, binned
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 64
_DSIR_TARGET_LANG = "en"
_DSIR_BINS = 10

_DSIR_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, unnest({tokens_sql("text")}) AS t FROM documents
),
feat AS (
  SELECT doc_id, lang, {hash64_sql("t")} % {_DSIR_BUCKETS} AS b,
         count(*) AS cnt
  FROM toks GROUP BY 1, 2, 3
),
raw_c AS (SELECT b, sum(cnt) AS c FROM feat GROUP BY b),
tgt_c AS (SELECT b, sum(cnt) AS c FROM feat
          WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY b),
tot AS (SELECT (SELECT sum(c) FROM raw_c) AS n_raw,
               (SELECT sum(c) FROM tgt_c) AS n_tgt),
ratio AS (
  SELECT raw_c.b,
         round(ln(((coalesce(tgt_c.c, 0) + 1)
                   / CAST(n_tgt + {_DSIR_BUCKETS} AS DOUBLE))
                  / ((raw_c.c + 1)
                     / CAST(n_raw + {_DSIR_BUCKETS} AS DOUBLE))), 6)
           AS log_ratio
  FROM raw_c LEFT JOIN tgt_c USING (b) CROSS JOIN tot
),
w AS (
  SELECT feat.doc_id, round(sum(feat.cnt * ratio.log_ratio), 6) AS wt
  FROM feat JOIN ratio USING (b)
  GROUP BY feat.doc_id
),
bounds AS (SELECT min(wt) AS lo, max(wt) AS hi FROM w),
binned AS (
  SELECT least({_DSIR_BINS} - 1,
               CAST(floor((wt - lo) / (hi - lo) * {_DSIR_BINS}) AS INT))
           AS bin
  FROM w CROSS JOIN bounds
)
SELECT CAST(bin AS INT) AS bin,
       CAST(count(*) AS BIGINT) AS n_docs
FROM binned GROUP BY bin ORDER BY bin
"""


@register("corpus_dsir_weights", _DSIR_ORACLE)
def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance-resampling weights (Xie et al. 2023): hashed
    unigram features (md5-derived bucket in [0, 64)), add-one-smoothed
    bucket distributions for the target domain (lang = 'en') vs the raw
    corpus, and per-document weight = sum of cnt * log-ratio over the
    doc's (bucket, count) profile — reported as a 10-bin equal-width
    histogram of the weights. The standard "resample raw crawl toward a
    target domain" curation primitive. Scale: ONE tokenize+explode pass
    pre-aggregated to (doc, lang, bucket) counts — the corpus-width
    subplan all three downstream branches share (exchange planned once
    and reused) instead of re-exploding the corpus per branch; the
    bucket distributions are 64-row aggregates broadcast back as the
    log-ratio table; per-doc weights are one hash agg on doc_id; the
    histogram bins on broadcast min/max bounds — no total-order
    operation anywhere. Log-ratios round to 6dp and BOTH engines sum
    the same cnt * ratio term set, so tie structure is cross-engine
    identical."""
    toks = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("t")
    )
    # ONE tokenize+explode pass: pre-aggregate to (doc, lang, bucket)
    # counts — the corpus-scan-width subplan every downstream branch
    # (raw distribution, target distribution, per-doc weights) shares,
    # so the exchange is planned once and reused instead of re-running
    # the explode per branch (3 corpus scans -> 1 at 100 TB).
    feat = (
        toks.select(
            "doc_id", "lang", (hash64(F.col("t")) % _DSIR_BUCKETS).alias("b")
        )
        .groupBy("doc_id", "lang", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    raw_c = feat.groupBy("b").agg(F.sum("cnt").alias("c_raw"))
    tgt_c = (
        feat.filter(F.col("lang") == _DSIR_TARGET_LANG)
        .groupBy("b")
        .agg(F.sum("cnt").alias("c_tgt"))
    )
    tot = raw_c.join(tgt_c, "b", "left").agg(
        F.sum("c_raw").alias("n_raw"), F.sum("c_tgt").alias("n_tgt")
    )
    ratio = (
        raw_c.join(tgt_c, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.round(
                F.log(
                    (
                        (F.coalesce(F.col("c_tgt"), F.lit(0)) + 1)
                        / (F.col("n_tgt") + _DSIR_BUCKETS).cast("double")
                    )
                    / (
                        (F.col("c_raw") + 1)
                        / (F.col("n_raw") + _DSIR_BUCKETS).cast("double")
                    )
                ),
                6,
            ).alias("log_ratio"),
        )
    )
    w = (
        feat.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("cnt") * F.col("log_ratio")), 6).alias("wt"))
    )
    bounds = w.agg(F.min("wt").alias("lo"), F.max("wt").alias("hi"))
    binned = w.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.lit(_DSIR_BINS - 1),
            F.floor(
                (F.col("wt") - F.col("lo"))
                / (F.col("hi") - F.col("lo"))
                * _DSIR_BINS
            ).cast("int"),
        ).alias("bin")
    )
    return (
        binned.groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .select(F.col("bin").cast("int").alias("bin"), "n_docs")
        .orderBy("bin")
    )
