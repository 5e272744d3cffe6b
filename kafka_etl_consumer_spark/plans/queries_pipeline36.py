"""Query surface batch 40 (round 7): regression-as-aggregation, survey
sampling, Bayesian A/B, sequential testing on the shard substrate, and
corpus/embedding accounting a training-data pipeline runs at 100 TB.

- ml_ols_normal_eq — multi-feature OLS via the normal equations: ONE
  hash aggregate of sufficient statistics (sums of products), Cramer's
  3x3 solve on the single result row. The 100 TB shape of a linear
  probe: no per-row residual pass, no driver-side matrix library.
- ts_fourier_seasonal_fit — weekly seasonality as a harmonic OLS fit
  (y ~ a + b sin + c cos over day-of-week) on the bounded daily grid;
  same Cramer core, shared textually with ml_ols_normal_eq so both
  engines run the identical IEEE expression order.
- embedding_isotropy — mean pairwise cosine of the normalized corpus
  WITHOUT the O(n^2) pair join: sum-of-vectors identity
  mean_cos = (||sum u||^2 - n) / (n (n-1)), one per-dimension sum.
- corpus_domain_reweight — DoReMi-flavored softmax source weights from
  per-source mean quality on the bounded source grid.
- text_token_fertility — tokens/word and bytes/token per language with
  a deterministic subword rule (ceil(len/4)), integer-exact in both
  engines.
- stats_bayes_ab_beta — Beta-posterior A/B with the large-n normal
  approximation of P(B > A) (closed form; the grid/MC integration the
  small-n case wants is a bounded-grid variant, not a scale problem).
- sample_horvitz_thompson — Poisson sampling with size-proportional
  inclusion probabilities (deterministic md5 uniform, same rows in
  every engine/retry) and the HT estimator audit vs the true total.
- eval_pinball_quantiles — quantile-forecast backtest: train-half
  quantiles broadcast onto the eval half, mean pinball loss per
  (event_type, q).
- stats_sprt_boundary — Wald SPRT on an event stream: the cumulative
  log-likelihood ratio is a running sum under a TOTAL order, so it
  runs on operators/shard.py sharded_prefix_sums (no single-partition
  window at data grain); the crossing test reduces to the integer
  random walk |2*cum_x - n| >= 3, immune to last-ulp log jitter.

Each oracle replays the same formula text, so cross-engine value
hashes compare exactly. The reference has no analytics surface
(pass-through ETL, ETLTask.java:261-283 of mykidong/kafka-etl-consumer).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.functions.hashing import hash64, hash64_sql
from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# Shared Cramer 3x3 solve over OLS sufficient statistics. The SAME text
# runs as F.expr in Spark and inline in the DuckDB oracle, so the IEEE
# expression order is identical in both engines. Aliases expected on the
# input row: n s1 s2 sy s11 s22 s12 s1y s2y syy (all DOUBLE except n).
# ---------------------------------------------------------------------------

_CRAMER = {
    "det": (
        "n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)"
        " + s2 * (s1 * s12 - s11 * s2)"
    ),
    "det0": (
        "sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)"
        " + s2 * (s1y * s12 - s11 * s2y)"
    ),
    "det1": (
        "n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)"
        " + s2 * (s1 * s2y - s1y * s2)"
    ),
    "det2": (
        "n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)"
        " + sy * (s1 * s12 - s11 * s2)"
    ),
}

_BETAS = (
    "(det0 / det) AS b0, (det1 / det) AS b1, (det2 / det) AS b2, "
    "n AS nn, sy AS sy2, s1y AS s1y2, s2y AS s2y2, syy AS syy2"
)

_R2 = (
    "1 - (syy2 - b0 * sy2 - b1 * s1y2 - b2 * s2y2)"
    " / (syy2 - sy2 * sy2 / nn)"
)


def _cramer_sql(sums_cte: str, n_out: str) -> str:
    """DuckDB text: sums CTE -> dets -> betas -> final row."""
    return f"""
WITH sums AS ({sums_cte}),
dets AS (
  SELECT *, {_CRAMER["det"]} AS det, {_CRAMER["det0"]} AS det0,
         {_CRAMER["det1"]} AS det1, {_CRAMER["det2"]} AS det2
  FROM sums
),
betas AS (SELECT {_BETAS} FROM dets)
SELECT CAST(nn AS BIGINT) AS {n_out},
       round(b0, 4) AS beta0, round(b1, 4) AS beta1,
       round(b2, 4) AS beta2, round({_R2}, 4) AS r2
FROM betas
"""


def _cramer_spark(sums: DataFrame, n_out: str) -> DataFrame:
    dets = sums.select(
        "*",
        F.expr(_CRAMER["det"]).alias("det"),
        F.expr(_CRAMER["det0"]).alias("det0"),
        F.expr(_CRAMER["det1"]).alias("det1"),
        F.expr(_CRAMER["det2"]).alias("det2"),
    )
    betas = dets.selectExpr(*[e.strip() for e in _BETAS.split(",")])
    return betas.select(
        F.col("nn").cast("bigint").alias(n_out),
        F.round("b0", 4).alias("beta0"),
        F.round("b1", 4).alias("beta1"),
        F.round("b2", 4).alias("beta2"),
        F.round(F.expr(_R2), 4).alias("r2"),
    )


_OLS_SUMS = """
SELECT CAST(count(*) AS DOUBLE) AS n,
       sum(l_quantity) AS s1, sum(l_discount) AS s2,
       sum(l_extendedprice) AS sy,
       sum(l_quantity * l_quantity) AS s11,
       sum(l_discount * l_discount) AS s22,
       sum(l_quantity * l_discount) AS s12,
       sum(l_quantity * l_extendedprice) AS s1y,
       sum(l_discount * l_extendedprice) AS s2y,
       sum(l_extendedprice * l_extendedprice) AS syy
FROM lineitem
"""


@register("ml_ols_normal_eq", _cramer_sql(_OLS_SUMS, "n_rows"))
def ml_ols_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS fit l_extendedprice ~ 1 + l_quantity + l_discount via the
    normal equations: the sufficient statistics (9 sums of products)
    come from ONE map-side-combined hash aggregate — the whole fit is
    a single reduction at any data size — and the 3x3 system solves by
    Cramer's rule on the one-row result. This is how a linear probe /
    calibration regression runs at 100 TB: no iterative optimizer, no
    per-row second pass (R^2 uses the closed form b'X'y).
    Reference has no regression surface (pass-through ETL)."""
    li = _t(spark, sf_dir, "lineitem")
    q, d, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    sums = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(q).alias("s1"),
        F.sum(d).alias("s2"),
        F.sum(y).alias("sy"),
        F.sum(q * q).alias("s11"),
        F.sum(d * d).alias("s22"),
        F.sum(q * d).alias("s12"),
        F.sum(q * y).alias("s1y"),
        F.sum(d * y).alias("s2y"),
        F.sum(y * y).alias("syy"),
    )
    return _cramer_spark(sums, "n_rows")


_FOURIER_SUMS = """
SELECT CAST(count(*) AS DOUBLE) AS n,
       sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
       sum(x1 * x1) AS s11, sum(x2 * x2) AS s22, sum(x1 * x2) AS s12,
       sum(x1 * y) AS s1y, sum(x2 * y) AS s2y, sum(y * y) AS syy
FROM (
  SELECT sin(2 * pi() * dow / 7) AS x1, cos(2 * pi() * dow / 7) AS x2, y
  FROM (
    SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                % 7 AS DOUBLE) AS dow,
           sum(o_totalprice) AS y
    FROM orders GROUP BY CAST(o_orderdate AS DATE)
  )
)
"""

_FOURIER_ORACLE = f"""
WITH fit AS ({_cramer_sql(_FOURIER_SUMS, "n_days")})
SELECT n_days, beta0, beta1, beta2,
       round(sqrt(beta1 * beta1 + beta2 * beta2), 4) AS amplitude, r2
FROM fit
"""


@register("ts_fourier_seasonal_fit", _FOURIER_ORACLE)
def ts_fourier_seasonal_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality of daily order revenue as a harmonic
    regression y ~ a + b sin(2 pi dow/7) + c cos(2 pi dow/7) — the
    first Fourier term of a Prophet-style decomposition, fitted with
    the SAME normal-equation aggregate as ml_ols_normal_eq (the Cramer
    text is shared, so both queries and both engines agree bitwise on
    expression order). Day-of-week via epoch-day % 7 (engine-neutral,
    unlike dayofweek()'s differing week starts). Scale: the daily grid
    is bounded (one row per date), and the fit itself is one more
    one-row aggregate. Amplitude = sqrt(b^2 + c^2) gives the seasonal
    swing in revenue units."""
    o = _t(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("y"))
        .select(
            (F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")) % 7)
            .cast("double")
            .alias("dow"),
            "y",
        )
    )
    two_pi = F.lit(2) * F.lit(math.pi)
    feat = daily.select(
        F.sin(two_pi * F.col("dow") / F.lit(7)).alias("x1"),
        F.cos(two_pi * F.col("dow") / F.lit(7)).alias("x2"),
        "y",
    )
    x1, x2, y = F.col("x1"), F.col("x2"), F.col("y")
    sums = feat.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x1).alias("s1"),
        F.sum(x2).alias("s2"),
        F.sum(y).alias("sy"),
        F.sum(x1 * x1).alias("s11"),
        F.sum(x2 * x2).alias("s22"),
        F.sum(x1 * x2).alias("s12"),
        F.sum(x1 * y).alias("s1y"),
        F.sum(x2 * y).alias("s2y"),
        F.sum(y * y).alias("syy"),
    )
    fit = _cramer_spark(sums, "n_days")
    return fit.select(
        "n_days",
        "beta0",
        "beta1",
        "beta2",
        F.round(
            F.sqrt(F.col("beta1") * F.col("beta1") + F.col("beta2") * F.col("beta2")),
            4,
        ).alias("amplitude"),
        "r2",
    )


_ISOTROPY_ORACLE = """
WITH nv AS (
  SELECT sqrt(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
         embedding
  FROM embeddings
),
ex AS (
  SELECT generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) / nrm AS u
  FROM nv
),
dims AS (SELECT pos, sum(u) AS s, CAST(count(*) AS BIGINT) AS c
         FROM ex GROUP BY pos),
tot AS (SELECT sum(s * s) AS ssq, max(c) AS n,
               CAST(count(*) AS BIGINT) AS dim
        FROM dims)
SELECT n AS n_vecs, dim,
       round((ssq - n) / (n * (n - 1.0)), 6) AS mean_pairwise_cos,
       round(sqrt(ssq) / n, 6) AS mean_vector_norm
FROM tot
"""


@register("embedding_isotropy", _ISOTROPY_ORACLE)
def embedding_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotropy audit of the embedding corpus: the mean pairwise cosine
    among L2-normalized vectors via the sum identity
    mean_cos = (||sum_i u_i||^2 - n) / (n (n-1)) — O(n d) instead of
    the O(n^2 d) pair join, which is the only form that exists at
    100 TB. High mean cosine = anisotropic cone (common degeneracy of
    encoder outputs; Ethayarajh 2019), which poisons cosine-based dedup
    and ANN recall. Plan shape: one narrow posexplode -> per-dimension
    hash agg (|dim| rows) -> one-row reduction; the mean-vector norm
    comes free."""
    e = _t(spark, sf_dir, "embeddings")
    nrm = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda a, x: a + x.cast("double") * x.cast("double"),
        )
    )
    ex = e.select(nrm.alias("nrm"), F.posexplode("embedding").alias("pos", "x")).select(
        (F.col("pos") + 1).alias("pos"), (F.col("x").cast("double") / F.col("nrm")).alias("u")
    )
    dims = ex.groupBy("pos").agg(
        F.sum("u").alias("s"), F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = dims.agg(
        F.sum(F.col("s") * F.col("s")).alias("ssq"),
        F.max("c").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("dim"),
    )
    return tot.select(
        F.col("n").alias("n_vecs"),
        "dim",
        F.round(
            (F.col("ssq") - F.col("n")) / (F.col("n") * (F.col("n") - F.lit(1.0))), 6
        ).alias("mean_pairwise_cos"),
        F.round(F.sqrt("ssq") / F.col("n"), 6).alias("mean_vector_norm"),
    )


_REWEIGHT_ORACLE = """
WITH per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         avg(n_chars) / 1000.0 AS q
  FROM documents GROUP BY source
),
sm AS (
  SELECT *, exp(q) / sum(exp(q)) OVER () AS w,
         sum(n_docs) OVER () AS total
  FROM per
)
SELECT source, n_docs, round(q, 6) AS mean_quality,
       round(w, 6) AS weight,
       round(w * total, 2) AS effective_docs
FROM sm
"""


@register("corpus_domain_reweight", _REWEIGHT_ORACLE)
def corpus_domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Softmax domain weights from per-source mean quality (DoReMi-style
    reweighting with temperature 1, quality proxied by mean length/1000):
    w_s = exp(q_s) / sum exp(q_s), effective_docs = w_s * N. The windows
    run over the BOUNDED per-source grid (|sources| rows after one hash
    agg), so the plan is one aggregate + a grid-sized window at any
    corpus size — the per-document pass never sorts or shuffles beyond
    the groupBy."""
    d = _t(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (F.avg("n_chars") / F.lit(1000.0)).alias("q"),
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    sm = per.select(
        "*",
        (F.exp("q") / F.sum(F.exp("q")).over(w_all)).alias("w"),
        F.sum("n_docs").over(w_all).alias("total"),
    )
    return sm.select(
        "source",
        "n_docs",
        F.round("q", 6).alias("mean_quality"),
        F.round("w", 6).alias("weight"),
        F.round(F.col("w") * F.col("total"), 2).alias("effective_docs"),
    )


_FERTILITY_ORACLE = """
WITH per AS (
  SELECT lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
         CAST(list_sum(list_transform(string_split(text, ' '),
                                      w -> (length(w) + 3) // 4))
              AS BIGINT) AS toks,
         CAST(strlen(text) AS BIGINT) AS bytes
  FROM documents
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(words) AS BIGINT) AS words,
       CAST(sum(toks) AS BIGINT) AS subword_tokens,
       CAST(sum(bytes) AS BIGINT) AS bytes,
       round(CAST(sum(toks) AS DOUBLE) / sum(words), 6) AS fertility,
       round(CAST(sum(bytes) AS DOUBLE) / sum(toks), 6) AS bytes_per_token
FROM per GROUP BY lang
"""


@register("text_token_fertility", _FERTILITY_ORACLE)
def text_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit per language: subword tokens per word
    and bytes per token, with a deterministic fixed-width subword rule
    (ceil(len(word)/4) — integer arithmetic, so both engines agree
    exactly; a real BPE slots into the same shape, see corpus_bpe_merges
    for the trained-merge path). Fertility is the metric that decides
    per-language sampling budgets: a language at 2x fertility pays 2x
    the context window per word. Plan: narrow per-row map (JVM
    higher-order functions, no UDF) then one bounded-grid hash agg."""
    d = _t(spark, sf_dir, "documents")
    toks = F.aggregate(
        F.split("text", " "),
        F.lit(0).cast("bigint"),
        lambda a, w: a + ((F.length(w) + F.lit(3)) / F.lit(4)).cast("bigint"),
    )
    per = d.select(
        "lang",
        F.size(F.split("text", " ")).cast("bigint").alias("words"),
        toks.alias("toks"),
        F.octet_length("text").cast("bigint").alias("bytes"),
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("words").cast("bigint").alias("words"),
        F.sum("toks").cast("bigint").alias("subword_tokens"),
        F.sum("bytes").cast("bigint").alias("bytes"),
        F.round(F.sum("toks").cast("double") / F.sum("words"), 6).alias("fertility"),
        F.round(F.sum("bytes").cast("double") / F.sum("toks"), 6).alias(
            "bytes_per_token"
        ),
    )


# Abramowitz-Stegun 7.1.26 erf polynomial — the same constants and text
# as stats_mannwhitney_u_binned, so cross-engine values agree exactly.
_PHI = """
0.5 * (1 + (CASE WHEN z >= 0 THEN 1 ELSE -1 END)
       * (1 - ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
                - 0.284496736) * t + 0.254829592) * t * exp(-az * az)))
"""

_BAYES_ORACLE = f"""
WITH base AS (
  SELECT event_type, user_id % 2 AS grp,
         CASE WHEN value > 50 THEN 1 ELSE 0 END AS x
  FROM events
),
g AS (
  SELECT event_type,
         CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN grp = 0 THEN x ELSE 0 END) AS BIGINT) AS s_a,
         CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN grp = 1 THEN x ELSE 0 END) AS BIGINT) AS s_b
  FROM base GROUP BY event_type
),
post AS (
  SELECT *,
         (1 + s_a) / CAST(2 + n_a AS DOUBLE) AS ma,
         (1 + s_b) / CAST(2 + n_b AS DOUBLE) AS mb,
         (1.0 + s_a) * (1 + n_a - s_a)
           / (CAST(2 + n_a AS DOUBLE) * (2 + n_a) * (3 + n_a)) AS va,
         (1.0 + s_b) * (1 + n_b - s_b)
           / (CAST(2 + n_b AS DOUBLE) * (2 + n_b) * (3 + n_b)) AS vb
  FROM g
),
zs AS (SELECT *, (mb - ma) / sqrt(va + vb) AS z FROM post),
e AS (SELECT *, abs(z) / sqrt(2) AS az,
             1 / (1 + 0.3275911 * (abs(z) / sqrt(2))) AS t FROM zs)
SELECT event_type, n_a, s_a, n_b, s_b,
       round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
       round({_PHI}, 6) AS p_b_gt_a
FROM e
"""


@register("stats_bayes_ab_beta", _BAYES_ORACLE)
def stats_bayes_ab_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian A/B per event type: Beta(1+s, 1+n-s) posteriors for the
    two arms (deterministic user-parity split, success = value > 50) and
    P(B > A) under the normal approximation of the posterior difference
    — the closed form that needs only the four counts, i.e. ONE hash
    aggregate at any scale (the exact small-n answer is a bounded-grid
    numeric integration, a grid problem, not a data problem). The
    normal CDF uses the repo's standard A-S erf polynomial so both
    engines agree exactly."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        (F.col("user_id") % 2).alias("grp"),
        F.when(F.col("value") > 50, 1).otherwise(0).alias("x"),
    )
    g = base.groupBy("event_type").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("grp") == 0, F.col("x")).otherwise(0))
        .cast("bigint")
        .alias("s_a"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("grp") == 1, F.col("x")).otherwise(0))
        .cast("bigint")
        .alias("s_b"),
    )
    post = g.selectExpr(
        "*",
        "(1 + s_a) / CAST(2 + n_a AS DOUBLE) AS ma",
        "(1 + s_b) / CAST(2 + n_b AS DOUBLE) AS mb",
        "(1.0 + s_a) * (1 + n_a - s_a)"
        " / (CAST(2 + n_a AS DOUBLE) * (2 + n_a) * (3 + n_a)) AS va",
        "(1.0 + s_b) * (1 + n_b - s_b)"
        " / (CAST(2 + n_b AS DOUBLE) * (2 + n_b) * (3 + n_b)) AS vb",
    )
    zs = post.selectExpr("*", "(mb - ma) / sqrt(va + vb) AS z")
    e = zs.selectExpr(
        "*",
        "abs(z) / sqrt(2) AS az",
        "1 / (1 + 0.3275911 * (abs(z) / sqrt(2))) AS t",
    )
    return e.selectExpr(
        "event_type",
        "n_a",
        "s_a",
        "n_b",
        "s_b",
        "round(ma, 6) AS mean_a",
        "round(mb, 6) AS mean_b",
        f"round({_PHI}, 6) AS p_b_gt_a",
    )


_HT_ORACLE = f"""
WITH base AS (
  SELECT n_chars,
         least(CAST(1 AS DOUBLE),
               (CAST(n_chars AS DOUBLE) + 50) / 1000.0) AS pi,
         CAST({hash64_sql("CAST(doc_id AS VARCHAR)")} % 1000000 AS DOUBLE)
           / 1000000.0 AS u
  FROM documents
)
SELECT CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN u < pi THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       CAST(sum(n_chars) AS BIGINT) AS true_chars,
       round(sum(CASE WHEN u < pi THEN n_chars / pi ELSE 0 END), 2)
         AS ht_chars,
       round(abs(sum(CASE WHEN u < pi THEN n_chars / pi ELSE 0 END)
                 - sum(n_chars)) / sum(n_chars), 6) AS rel_err
FROM base
"""


@register("sample_horvitz_thompson", _HT_ORACLE)
def sample_horvitz_thompson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson (size-proportional) sampling with the Horvitz-Thompson
    total estimator audited against the true total: every doc enters
    with probability pi ~ its length (clamped to [0.05, 1]), sampled
    rows are inverse-probability weighted, and HT's unbiasedness shows
    as a small rel_err. Inclusion uses the repo's deterministic md5
    uniform (functions/hashing.py), so the SAME sample materializes in
    every engine, run, and retry — the property that makes sampled
    dashboards reproducible and this oracle exact. One narrow map +
    one aggregate; no shuffle beyond the final reduction."""
    d = _t(spark, sf_dir, "documents")
    pi = F.least(
        F.lit(1.0), (F.col("n_chars").cast("double") + F.lit(50)) / F.lit(1000.0)
    )
    u = (hash64(F.col("doc_id").cast("string")) % 1000000).cast("double") / F.lit(
        1000000.0
    )
    base = d.select("n_chars", pi.alias("pi"), u.alias("u"))
    inc = F.col("u") < F.col("pi")
    ht = F.sum(F.when(inc, F.col("n_chars") / F.col("pi")).otherwise(0.0))
    return base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum(F.when(inc, 1).otherwise(0)).cast("bigint").alias("n_sampled"),
        F.sum("n_chars").cast("bigint").alias("true_chars"),
        F.round(ht, 2).alias("ht_chars"),
        F.round(
            F.abs(ht - F.sum("n_chars")) / F.sum("n_chars"), 6
        ).alias("rel_err"),
    )


_PINBALL_ORACLE = """
WITH tr AS (
  SELECT event_type,
         quantile_cont(value, 0.1) AS q10,
         quantile_cont(value, 0.5) AS q50,
         quantile_cont(value, 0.9) AS q90
  FROM events WHERE event_id % 2 = 0 GROUP BY event_type
),
grid AS (
  SELECT event_type, CAST(0.1 AS DOUBLE) AS q, q10 AS forecast FROM tr
  UNION ALL
  SELECT event_type, CAST(0.5 AS DOUBLE), q50 FROM tr
  UNION ALL
  SELECT event_type, CAST(0.9 AS DOUBLE), q90 FROM tr
),
te AS (SELECT event_type, value FROM events WHERE event_id % 2 = 1)
SELECT g.event_type, g.q, round(g.forecast, 6) AS forecast,
       round(avg(greatest(g.q * (te.value - g.forecast),
                          (g.q - 1) * (te.value - g.forecast))), 6)
         AS pinball
FROM grid g JOIN te ON te.event_type = g.event_type
GROUP BY g.event_type, g.q, g.forecast
"""


@register("eval_pinball_quantiles", _PINBALL_ORACLE)
def eval_pinball_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-forecast backtest: q10/q50/q90 fitted on the train half
    (deterministic event-id parity split) and scored on the eval half
    with mean pinball loss L_q = max(q e, (q-1) e) — the metric
    quantile forecasts are graded on. Scale shape: the forecast grid is
    |event_types| x 3 rows and BROADCASTS onto the eval scan, so the
    only full-data work is one narrow scan + one hash agg; the train
    quantiles are one exact percentile agg per type (Spark percentile
    == DuckDB quantile_cont, the repo convention)."""
    ev = _t(spark, sf_dir, "events")
    tr = ev.filter(F.col("event_id") % 2 == 0).groupBy("event_type").agg(
        F.percentile("value", 0.1).alias("q10"),
        F.percentile("value", 0.5).alias("q50"),
        F.percentile("value", 0.9).alias("q90"),
    )
    grid = tr.select(
        "event_type",
        F.expr(
            "stack(3, CAST(0.1 AS DOUBLE), q10, CAST(0.5 AS DOUBLE), q50,"
            " CAST(0.9 AS DOUBLE), q90) AS (q, forecast)"
        ),
    )
    te = ev.filter(F.col("event_id") % 2 == 1).select("event_type", "value")
    err = F.col("value") - F.col("forecast")
    loss = F.greatest(F.col("q") * err, (F.col("q") - 1) * err)
    return (
        te.join(F.broadcast(grid), "event_type")
        .groupBy("event_type", "q", "forecast")
        .agg(F.round(F.avg(loss), 6).alias("pinball"))
        .select(
            "event_type", "q", F.round("forecast", 6).alias("forecast"), "pinball"
        )
    )


_SPRT_ORACLE = """
WITH s AS (
  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
         CASE WHEN value > 50 THEN 1 ELSE 0 END AS x
  FROM events
),
c AS (
  SELECT CAST(sum(x) OVER w AS BIGINT) AS cum_x,
         CAST(count(*) OVER w AS BIGINT) AS cum_n
  FROM s
  WINDOW w AS (ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
d AS (SELECT cum_n, 2 * cum_x - cum_n AS d FROM c),
crossing AS (
  SELECT min(cum_n) AS first_cross_n, arg_min(d, cum_n) AS d_at_cross
  FROM d WHERE abs(d) >= 3
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM s)
SELECT n_total, first_cross_n, d_at_cross,
       CASE WHEN d_at_cross >= 3 THEN 'accept_h1' ELSE 'accept_h0' END
         AS decision,
       round(d_at_cross * ln(CAST(3 AS DOUBLE)), 6) AS llr_at_cross
FROM tot, crossing
"""


@register("stats_sprt_boundary", _SPRT_ORACLE)
def stats_sprt_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald sequential probability ratio test on the event stream in
    arrival order: H0 p=0.25 vs H1 p=0.75 on success = value > 50, with
    alpha = beta = 0.05. For symmetric hypotheses the cumulative LLR is
    (2 cum_x - n) ln 3 and the crossing |LLR| >= ln 19 reduces to the
    INTEGER random walk |2 cum_x - n| >= ceil(ln 19 / ln 3) = 3 — so
    the decision is immune to last-ulp libm differences, and the only
    data-scale work is the running sum, which runs on the shard
    substrate (operators/shard.py sharded_prefix_sums: local cumsums +
    broadcast per-shard offsets, never a single-partition window).
    first_cross_n is how much data the sequential test needed — the
    whole point of SPRT vs the fixed-n tests in this suite."""
    from kafka_etl_consumer_spark.operators.shard import sharded_prefix_sums

    ev = _t(spark, sf_dir, "events")
    s = ev.select(
        "event_id",
        "ts",
        F.when(F.col("value") > 50, 1).otherwise(0).cast("bigint").alias("x"),
        F.lit(1).cast("bigint").alias("one"),
    )
    c = sharded_prefix_sums(s, ["ts", "event_id"], {"x": "cum_x", "one": "cum_n"})
    d = c.select(
        "cum_n", (F.lit(2) * F.col("cum_x") - F.col("cum_n")).alias("d")
    )
    crossing = d.filter(F.abs("d") >= 3).agg(
        F.min("cum_n").alias("first_cross_n"),
        F.min_by("d", "cum_n").alias("d_at_cross"),
    )
    tot = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    return tot.crossJoin(F.broadcast(crossing)).select(
        "n_total",
        "first_cross_n",
        "d_at_cross",
        F.when(F.col("d_at_cross") >= 3, F.lit("accept_h1"))
        .otherwise(F.lit("accept_h0"))
        .alias("decision"),
        F.round(F.col("d_at_cross") * F.log(F.lit(3).cast("double")), 6).alias(
            "llr_at_cross"
        ),
    )
