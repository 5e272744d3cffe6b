"""Query surface batch 41 (round 7, second wave): annotation agreement,
time-series diagnostics, and two "ML training by aggregation" operators
— each a shape a training-data pipeline actually runs at 100 TB, each
with an exact DuckDB oracle.

- stats_cohens_kappa — inter-annotator agreement between two binary
  labelers (chance-corrected); pure integer counts, ONE hash aggregate.
- ts_ljung_box — portmanteau autocorrelation test (Q over lags 1..6)
  on the hourly count series per event type; df=6 is even, so the
  chi-square survival function is the FINITE sum
  exp(-Q/2) * sum_{j<3} (Q/2)^j / j! — exact in both engines, no
  incomplete-gamma library needed.
- ml_decision_stump — the split-finding kernel of tree learners: best
  threshold on `value` for predicting purchases by weighted Gini over
  a 32-bucket histogram. Candidate thresholds live on a FIXED grid, so
  the whole search is one histogram aggregate + a 32-row cumulative
  pass; every number derives from integer counts (bit-deterministic).
- ml_naive_bayes_langid — multinomial Naive Bayes language ID: train
  token counts on the even half of the corpus, classify the odd half,
  report per-language accuracy. Training is ONE exploded-token
  aggregate; classification is an equi-join of test tokens against the
  (lang x token) model with additive smoothing; scores round to 6
  decimals BEFORE the argmax so a last-ulp sum-order difference cannot
  flip the predicted class between engines.

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283 of mykidong/kafka-etl-consumer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.registry import _t, register

_KAPPA_ORACLE = """
WITH base AS (
  SELECT CASE WHEN value > 50 THEN 1 ELSE 0 END AS r1,
         CASE WHEN event_type IN ('purchase', 'click') THEN 1 ELSE 0 END AS r2
  FROM events
),
c AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN r1 = 1 AND r2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN r1 = 1 AND r2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(sum(CASE WHEN r1 = 0 AND r2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
         CAST(sum(CASE WHEN r1 = 0 AND r2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM base
),
k AS (
  SELECT n, a, b, c2, d,
         (a + d) / CAST(n AS DOUBLE) AS po,
         ((a + b) * (a + c2) + (c2 + d) * (b + d))
           / (CAST(n AS DOUBLE) * n) AS pe
  FROM c
)
SELECT n, a AS both_pos, d AS both_neg,
       round(po, 6) AS p_observed, round(pe, 6) AS p_chance,
       round((po - pe) / (1 - pe), 6) AS kappa
FROM k
"""


@register("stats_cohens_kappa", _KAPPA_ORACLE)
def stats_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two binary annotators (here: the
    value-threshold labeler vs the engagement-type labeler) — the
    agreement statistic annotation pipelines gate label quality on,
    chance-corrected so two raters that both say "yes" 90% of the time
    don't look aligned for free. The 2x2 confusion table is ONE hash
    aggregate of integer counts at any corpus size; everything after is
    arithmetic on a single row."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        F.when(F.col("value") > 50, 1).otherwise(0).alias("r1"),
        F.when(F.col("event_type").isin("purchase", "click"), 1)
        .otherwise(0)
        .alias("r2"),
    )
    c = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when((F.col("r1") == 1) & (F.col("r2") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when((F.col("r1") == 1) & (F.col("r2") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
        F.sum(F.when((F.col("r1") == 0) & (F.col("r2") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("c2"),
        F.sum(F.when((F.col("r1") == 0) & (F.col("r2") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("d"),
    )
    k = c.selectExpr(
        "*",
        "(a + d) / CAST(n AS DOUBLE) AS po",
        "((a + b) * (a + c2) + (c2 + d) * (b + d))"
        " / (CAST(n AS DOUBLE) * n) AS pe",
    )
    return k.selectExpr(
        "n",
        "a AS both_pos",
        "d AS both_neg",
        "round(po, 6) AS p_observed",
        "round(pe, 6) AS p_chance",
        "round((po - pe) / (1 - pe), 6) AS kappa",
    )


_LJUNG_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         CAST(count(*) AS DOUBLE) AS c
  FROM events GROUP BY 1, 2
),
dev AS (
  SELECT event_type, h, c - avg(c) OVER (PARTITION BY event_type) AS e
  FROM hourly
),
lagged AS (
  SELECT event_type, e,
         lag(e, 1) OVER w AS e1, lag(e, 2) OVER w AS e2,
         lag(e, 3) OVER w AS e3, lag(e, 4) OVER w AS e4,
         lag(e, 5) OVER w AS e5, lag(e, 6) OVER w AS e6
  FROM dev WINDOW w AS (PARTITION BY event_type ORDER BY h)
),
acf AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n, sum(e * e) AS den,
         sum(e * e1) AS n1, sum(e * e2) AS n2, sum(e * e3) AS n3,
         sum(e * e4) AS n4, sum(e * e5) AS n5, sum(e * e6) AS n6
  FROM lagged GROUP BY event_type
),
q AS (
  SELECT event_type, n,
         n * (n + 2.0) * (
             (n1 / den) * (n1 / den) / (n - 1)
           + (n2 / den) * (n2 / den) / (n - 2)
           + (n3 / den) * (n3 / den) / (n - 3)
           + (n4 / den) * (n4 / den) / (n - 4)
           + (n5 / den) * (n5 / den) / (n - 5)
           + (n6 / den) * (n6 / den) / (n - 6)
         ) AS q
  FROM acf
)
SELECT event_type, n AS n_hours, round(q, 6) AS q_stat,
       round(exp(-q / 2) * (1 + (q / 2) + (q / 2) * (q / 2) / 2), 6)
         AS p_value
FROM q
"""


@register("ts_ljung_box", _LJUNG_ORACLE)
def ts_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test (lags 1..6) on the hourly count series
    per event type: Q = n(n+2) sum rho_k^2/(n-k), the standard "is this
    series white noise" gate before fitting any seasonal/AR model (the
    diagnostic companion to ts_acf_lags, which reports the rho_k
    themselves). Autocovariances use the textbook full-series mean and
    denominator. With df = 6 (even), the chi-square survival function
    collapses to exp(-Q/2) * (1 + Q/2 + (Q/2)^2/2) — a finite sum both
    engines evaluate identically, no incomplete gamma. Scale shape: one
    hash agg to the hourly grain, one window pass over the bounded
    series, one grouped aggregate."""
    ev = _t(spark, sf_dir, "events")
    hourly = (
        ev.select("event_type", F.date_trunc("hour", "ts").alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    dev = hourly.select(
        "event_type",
        "h",
        (F.col("c") - F.avg("c").over(Window.partitionBy("event_type"))).alias("e"),
    )
    w = Window.partitionBy("event_type").orderBy("h")
    lagged = dev.select(
        "event_type",
        "e",
        *[F.lag("e", k).over(w).alias(f"e{k}") for k in range(1, 7)],
    )
    acf = lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("e") * F.col("e")).alias("den"),
        *[
            F.sum(F.col("e") * F.col(f"e{k}")).alias(f"n{k}")
            for k in range(1, 7)
        ],
    )
    q = acf.selectExpr(
        "event_type",
        "n",
        "n * (n + 2.0) * ("
        "  (n1 / den) * (n1 / den) / (n - 1)"
        " + (n2 / den) * (n2 / den) / (n - 2)"
        " + (n3 / den) * (n3 / den) / (n - 3)"
        " + (n4 / den) * (n4 / den) / (n - 4)"
        " + (n5 / den) * (n5 / den) / (n - 5)"
        " + (n6 / den) * (n6 / den) / (n - 6)"
        ") AS q",
    )
    return q.selectExpr(
        "event_type",
        "n AS n_hours",
        "round(q, 6) AS q_stat",
        "round(exp(-q / 2) * (1 + (q / 2) + (q / 2) * (q / 2) / 2), 6)"
        " AS p_value",
    )


_STUMP_ORACLE = """
WITH base AS (
  SELECT value AS x,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
rng AS (SELECT min(x) AS lo, max(x) AS hi FROM base),
hist AS (
  SELECT least(31, CAST(floor((x - lo) / (hi - lo) * 32) AS BIGINT)) AS b,
         CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS p
  FROM base, rng GROUP BY 1
),
cum AS (
  SELECT b,
         CAST(sum(n) OVER (ORDER BY b) AS BIGINT) AS nl,
         CAST(sum(p) OVER (ORDER BY b) AS BIGINT) AS pl,
         CAST(sum(n) OVER () AS BIGINT) AS nt,
         CAST(sum(p) OVER () AS BIGINT) AS pt
  FROM hist
),
splits AS (
  SELECT b, nl, pl, nt - nl AS nr, pt - pl AS pr, nt, pt,
         lo + (b + 1) * (hi - lo) / 32 AS threshold
  FROM cum, rng WHERE nt - nl > 0 AND nl > 0
),
gini AS (
  SELECT threshold,
         (nl * (1 - (CAST(pl AS DOUBLE) / nl) * (CAST(pl AS DOUBLE) / nl)
                  - (CAST(nl - pl AS DOUBLE) / nl) * (CAST(nl - pl AS DOUBLE) / nl))
        + nr * (1 - (CAST(pr AS DOUBLE) / nr) * (CAST(pr AS DOUBLE) / nr)
                  - (CAST(nr - pr AS DOUBLE) / nr) * (CAST(nr - pr AS DOUBLE) / nr))
         ) / nt AS g,
         1 - (CAST(pt AS DOUBLE) / nt) * (CAST(pt AS DOUBLE) / nt)
           - (CAST(nt - pt AS DOUBLE) / nt) * (CAST(nt - pt AS DOUBLE) / nt) AS g0,
         nt
  FROM splits
)
SELECT CAST(nt AS BIGINT) AS n, round(threshold, 6) AS best_threshold,
       round(g, 6) AS gini_split, round(g0, 6) AS gini_root,
       round(g0 - g, 6) AS gini_gain
FROM gini ORDER BY g, threshold LIMIT 1
"""


@register("ml_decision_stump", _STUMP_ORACLE)
def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split finding — the inner loop of every tree/GBDT learner — as
    pure aggregation: best threshold on `value` for predicting
    purchase events by weighted Gini impurity. Candidates come from a
    fixed 32-bucket equi-width grid (one broadcast min/max row), so the
    search is ONE histogram aggregate (the only data-proportional
    stage) + a 32-row cumulative window; this is exactly how
    distributed GBDT implementations (XGBoost hist mode, LightGBM)
    reduce split finding at scale. Every quantity derives from integer
    counts, so the result is bit-deterministic across engines — the
    deterministic tiebreak (lowest threshold) settles equal-impurity
    splits."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        F.col("value").alias("x"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    rng = base.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    hist = (
        base.crossJoin(F.broadcast(rng))
        .select(
            F.least(
                F.lit(31),
                F.floor((F.col("x") - F.col("lo")) / (F.col("hi") - F.col("lo")) * 32),
            )
            .cast("bigint")
            .alias("b"),
            "y",
        )
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("p"),
        )
    )
    w_cum = Window.orderBy("b")  # 32-row grid: bounded by construction
    w_all = Window.partitionBy()
    cum = hist.select(
        "b",
        F.sum("n").over(w_cum).cast("bigint").alias("nl"),
        F.sum("p").over(w_cum).cast("bigint").alias("pl"),
        F.sum("n").over(w_all).cast("bigint").alias("nt"),
        F.sum("p").over(w_all).cast("bigint").alias("pt"),
    )
    splits = (
        cum.crossJoin(F.broadcast(rng))
        .selectExpr(
            "b",
            "nl",
            "pl",
            "nt - nl AS nr",
            "pt - pl AS pr",
            "nt",
            "pt",
            "lo + (b + 1) * (hi - lo) / 32 AS threshold",
        )
        .filter("nt - nl > 0 AND nl > 0")
    )
    gini = splits.selectExpr(
        "threshold",
        "(nl * (1 - (CAST(pl AS DOUBLE) / nl) * (CAST(pl AS DOUBLE) / nl)"
        "         - (CAST(nl - pl AS DOUBLE) / nl) * (CAST(nl - pl AS DOUBLE) / nl))"
        " + nr * (1 - (CAST(pr AS DOUBLE) / nr) * (CAST(pr AS DOUBLE) / nr)"
        "          - (CAST(nr - pr AS DOUBLE) / nr) * (CAST(nr - pr AS DOUBLE) / nr))"
        ") / nt AS g",
        "1 - (CAST(pt AS DOUBLE) / nt) * (CAST(pt AS DOUBLE) / nt)"
        "  - (CAST(nt - pt AS DOUBLE) / nt) * (CAST(nt - pt AS DOUBLE) / nt) AS g0",
        "nt",
    )
    return (
        gini.orderBy("g", "threshold")
        .limit(1)
        .selectExpr(
            "CAST(nt AS BIGINT) AS n",
            "round(threshold, 6) AS best_threshold",
            "round(g, 6) AS gini_split",
            "round(g0, 6) AS gini_root",
            "round(g0 - g, 6) AS gini_gain",
        )
    )


_NB_ORACLE = """
WITH tr AS (
  SELECT lang, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE doc_id % 2 = 0
),
counts AS (
  SELECT lang, tok, CAST(count(*) AS BIGINT) AS c FROM tr GROUP BY 1, 2
),
totals AS (SELECT lang, CAST(sum(c) AS BIGINT) AS tot FROM counts GROUP BY lang),
vocab AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM counts),
priors AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS nd,
         CAST(sum(count(*)) OVER () AS BIGINT) AS ndt
  FROM documents WHERE doc_id % 2 = 0 GROUP BY lang
),
te AS (
  SELECT doc_id, lang AS true_lang, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE doc_id % 2 = 1
),
scored AS (
  SELECT te.doc_id, te.true_lang, t.lang,
         sum(ln((coalesce(c.c, 0) + 1) / CAST(t.tot + v.v AS DOUBLE))) AS ll
  FROM te
  CROSS JOIN totals t
  CROSS JOIN vocab v
  LEFT JOIN counts c ON c.lang = t.lang AND c.tok = te.tok
  GROUP BY 1, 2, 3
),
withprior AS (
  SELECT s.doc_id, s.true_lang, s.lang,
         round(s.ll + ln(CAST(p.nd AS DOUBLE) / p.ndt), 6) AS score
  FROM scored s JOIN priors p ON p.lang = s.lang
),
pred AS (
  SELECT doc_id, true_lang, lang AS pred_lang,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, lang) AS rn
  FROM withprior
)
SELECT true_lang AS lang, CAST(count(*) AS BIGINT) AS n_test,
       CAST(sum(CASE WHEN pred_lang = true_lang THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct,
       round(sum(CASE WHEN pred_lang = true_lang THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS accuracy
FROM pred WHERE rn = 1 GROUP BY true_lang
"""


@register("ml_naive_bayes_langid", _NB_ORACLE)
def ml_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language ID, trained and evaluated inside
    the engine: token counts from the even-doc half (ONE exploded-token
    aggregate — the model is |langs| x |vocab| rows, data-independent in
    width), add-one smoothing, log-prior from class frequencies, and the
    odd-doc half classified by summing log-likelihoods through an
    equi-join against the model. Scores round to 6 decimals BEFORE the
    per-doc argmax (deterministic tiebreak: language name), so a
    sum-order last-ulp cannot flip a prediction between engines. On this
    synthetic corpus the languages share one vocabulary, so accuracy
    hovers near the prior — the point is the training/eval machinery,
    which is exactly the distributed NB/fastText-style pipeline shape.
    The per-doc window is PARTITIONED by doc_id (5 rows each), not a
    global sort."""
    d = _t(spark, sf_dir, "documents")
    tr = d.filter(F.col("doc_id") % 2 == 0).select(
        "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    counts = tr.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    totals = counts.groupBy("lang").agg(F.sum("c").cast("bigint").alias("tot"))
    vocab = counts.agg(F.countDistinct("tok").cast("bigint").alias("v"))
    w_all = Window.partitionBy()
    priors = (
        d.filter(F.col("doc_id") % 2 == 0)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
        .select(
            "lang", "nd", F.sum("nd").over(w_all).cast("bigint").alias("ndt")
        )
    )
    te = d.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        F.explode(F.split("text", " ")).alias("tok"),
    )
    # model join: test tokens x |langs| rows, counts looked up per
    # (lang, tok) with additive smoothing for unseen tokens. The model
    # tables broadcast (|langs| x |vocab| is bounded by the vocabulary).
    m = counts.select(
        F.col("lang").alias("c_lang"), F.col("tok").alias("m_tok"), "c"
    )
    scored = (
        te.crossJoin(
            F.broadcast(totals.select(F.col("lang").alias("m_lang"), "tot"))
        )
        .crossJoin(F.broadcast(vocab))
        .join(
            F.broadcast(m),
            (F.col("c_lang") == F.col("m_lang")) & (F.col("m_tok") == F.col("tok")),
            "left",
        )
        .groupBy("doc_id", "true_lang", "m_lang")
        .agg(
            F.sum(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1)
                    / (F.col("tot") + F.col("v")).cast("double")
                )
            ).alias("ll")
        )
    )
    withprior = scored.join(
        F.broadcast(priors.select(F.col("lang").alias("m_lang"), "nd", "ndt")),
        "m_lang",
    ).select(
        "doc_id",
        "true_lang",
        F.col("m_lang").alias("lang"),
        F.round(
            F.col("ll") + F.log(F.col("nd").cast("double") / F.col("ndt")), 6
        ).alias("score"),
    )
    w_doc = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("lang"))
    pred = withprior.select(
        "doc_id", "true_lang", F.col("lang").alias("pred_lang"),
        F.row_number().over(w_doc).alias("rn"),
    ).filter(F.col("rn") == 1)
    return pred.groupBy(F.col("true_lang").alias("lang")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum(F.when(F.col("pred_lang") == F.col("true_lang"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_correct"),
        F.round(
            F.sum(F.when(F.col("pred_lang") == F.col("true_lang"), 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("accuracy"),
    )
