"""Query surface batch 43 (round 7, final wave): paired-classifier
comparison and heavy-tail diagnostics.

- stats_mcnemar_test — the PAIRED complement to stats_cohens_kappa:
  kappa asks "do two labelers agree", McNemar asks "when they disagree,
  is one systematically better" — the correct test for comparing two
  classifiers on the SAME rows (a two-proportion z on the marginals is
  wrong there). Only the discordant cells matter; continuity-corrected
  chi-square(1) from two integer counts.
- stats_hill_tail_index — Hill estimator of the Pareto tail exponent of
  order values over the top-k order statistics: alpha_hat = 1 / mean
  (ln x_(i) - ln x_(k)). The standard "how heavy is this tail" number
  behind capacity planning and loss modeling; the graph twin
  (graph_degree_powerlaw) fits degree frequencies, this fits a
  continuous amount column. Scale: top-k is TakeOrderedAndProject (no
  global sort), the estimator one bounded aggregate over k rows.

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283 of mykidong/kafka-etl-consumer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.registry import _t, register

# chi-square(1) survival via the repo-standard A-S erf polynomial
_CHI1_P = """
((((1.061405429 * tt - 1.453152027) * tt + 1.421413741) * tt
  - 0.284496736) * tt + 0.254829592) * tt * exp(-aa * aa)
"""

_MCNEMAR_ORACLE = f"""
WITH base AS (
  SELECT CASE WHEN value > 50 THEN 1 ELSE 0 END AS c1,
         CASE WHEN event_type IN ('purchase', 'click') THEN 1 ELSE 0 END AS c2,
         CASE WHEN value > 100 THEN 1 ELSE 0 END AS y
  FROM events
),
cells AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN c1 = y AND c2 <> y THEN 1 ELSE 0 END)
              AS BIGINT) AS b,
         CAST(sum(CASE WHEN c1 <> y AND c2 = y THEN 1 ELSE 0 END)
              AS BIGINT) AS c
  FROM base
),
st AS (
  SELECT n, b, c,
         greatest(abs(CAST(b - c AS DOUBLE)) - 1, 0)
           * greatest(abs(CAST(b - c AS DOUBLE)) - 1, 0)
           / (b + c) AS q
  FROM cells
),
e AS (
  SELECT *, sqrt(q / 2) AS aa, 1 / (1 + 0.3275911 * sqrt(q / 2)) AS tt
  FROM st
)
SELECT n, b AS only_c1_right, c AS only_c2_right,
       round(q, 6) AS mcnemar_stat, round({_CHI1_P}, 6) AS p_value
FROM e
"""


@register("stats_mcnemar_test", _MCNEMAR_ORACLE)
def stats_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test comparing two deterministic classifiers of the
    high-value flag (value > 100) on the SAME events: the
    value-threshold rule vs the engagement-type rule. Only the
    discordant counts b (first right, second wrong) and c (the
    converse) enter the continuity-corrected statistic
    (|b-c|-1)^2/(b+c) — the paired design cancels everything the rows
    share, which is why this (not a two-proportion z) is the right
    test for same-dataset classifier comparisons. ONE integer-count
    hash aggregate at any event volume."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        F.when(F.col("value") > 50, 1).otherwise(0).alias("c1"),
        F.when(F.col("event_type").isin("purchase", "click"), 1)
        .otherwise(0)
        .alias("c2"),
        F.when(F.col("value") > 100, 1).otherwise(0).alias("y"),
    )
    cells = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.when((F.col("c1") == F.col("y")) & (F.col("c2") != F.col("y")), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("b"),
        F.sum(
            F.when((F.col("c1") != F.col("y")) & (F.col("c2") == F.col("y")), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("c"),
    )
    st = cells.selectExpr(
        "n",
        "b",
        "c",
        "greatest(abs(CAST(b - c AS DOUBLE)) - 1, 0)"
        " * greatest(abs(CAST(b - c AS DOUBLE)) - 1, 0) / (b + c) AS q",
    )
    e = st.selectExpr(
        "*", "sqrt(q / 2) AS aa", "1 / (1 + 0.3275911 * sqrt(q / 2)) AS tt"
    )
    return e.selectExpr(
        "n",
        "b AS only_c1_right",
        "c AS only_c2_right",
        "round(q, 6) AS mcnemar_stat",
        f"round({_CHI1_P}, 6) AS p_value",
    )


_HILL_K = 100

_HILL_ORACLE = f"""
WITH topk AS (
  SELECT o_totalprice AS x
  FROM orders
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT {_HILL_K}
),
xmin AS (SELECT min(x) AS xk FROM topk),
est AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         avg(ln(x) - ln(xk)) AS mean_log_excess,
         max(x) AS x_max, min(x) AS x_k
  FROM topk, xmin
)
SELECT k, round(x_k, 2) AS tail_threshold, round(x_max, 2) AS x_max,
       round(1 / mean_log_excess, 6) AS hill_alpha,
       round(1 / (mean_log_excess * sqrt(CAST(k AS DOUBLE))), 6)
         AS alpha_se
FROM est
"""


@register("stats_hill_tail_index", _HILL_ORACLE)
def stats_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the Pareto tail index over the top-100 order
    values: alpha_hat = 1 / mean(ln x_(i) - ln x_(k)), with its
    asymptotic standard error alpha/sqrt(k). The standard heavy-tail
    diagnostic for revenue/latency/loss columns (alpha <= 2 means
    infinite variance — sampling and mean-based dashboards stop being
    trustworthy). The continuous-amount twin of graph_degree_powerlaw's
    discrete degree fit. Scale: the top-k cut is
    TakeOrderedAndProject (no global sort — k rows per partition then
    one merge), and the estimator is one aggregate over the k-row
    result; a deterministic orderkey tiebreak pins the cut when prices
    tie."""
    o = _t(spark, sf_dir, "orders")
    topk = (
        o.select(F.col("o_totalprice").alias("x"), "o_orderkey")
        .orderBy(F.col("x").desc(), F.col("o_orderkey"))
        .limit(_HILL_K)
        .select("x")
    )
    xmin = F.broadcast(topk.agg(F.min("x").alias("xk")))
    est = topk.crossJoin(xmin).agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.avg(F.log("x") - F.log("xk")).alias("mean_log_excess"),
        F.max("x").alias("x_max"),
        F.min("x").alias("x_k"),
    )
    return est.selectExpr(
        "k",
        "round(x_k, 2) AS tail_threshold",
        "round(x_max, 2) AS x_max",
        "round(1 / mean_log_excess, 6) AS hill_alpha",
        "round(1 / (mean_log_excess * sqrt(CAST(k AS DOUBLE))), 6) AS alpha_se",
    )
