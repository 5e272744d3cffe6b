"""Query surface batch 31 (round 4): experiment guardrails, ratio
metrics, information-theoretic profiling.

- sample-ratio-mismatch check — the FIRST guardrail of every A/B
  readout: is the observed variant split consistent with 50/50? A
  failed SRM invalidates the experiment before any metric is read
- delta-method CI for a ratio metric (purchases per view) — ratio
  metrics are the common case (CTR, revenue/session) and naive
  per-user averaging gets their variance wrong; the delta method is
  the standard fix
- per-column entropy profile of the categorical star-schema columns —
  the information-theoretic complement of profile_table's null/distinct
  counts (a skewed 2-value column and a uniform one profile the same
  by distinct count; entropy separates them)

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283); these extend the driver-verified operator
families the brief requires. Every query carries an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# stats_srm_check — chi-square(1) goodness-of-fit of the user split vs
# 50/50: chi2 = (n0-n1)^2 / n, p = erfc(sqrt(chi2)/sqrt(2)) via the
# shared A&S Horner chain.
# ---------------------------------------------------------------------------

_SRM_ORACLE = """
WITH u AS (SELECT DISTINCT user_id FROM events),
g AS (
  SELECT CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n0,
         CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n1
  FROM u
),
c AS (
  SELECT n0, n1,
         (n0 - n1) * (n0 - n1) / CAST(n0 + n1 AS DOUBLE) AS chi2
  FROM g
),
e AS (
  SELECT *, sqrt(chi2) / sqrt(2) AS az,
         1 / (1 + 0.3275911 * (sqrt(chi2) / sqrt(2))) AS t
  FROM c
)
SELECT n0 AS n_variant_a, n1 AS n_variant_b, round(chi2, 6) AS chi2,
       round(((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
               - 0.284496736) * t + 0.254829592) * t * exp(-az * az), 6)
         AS p_value,
       ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
         - 0.284496736) * t + 0.254829592) * t * exp(-az * az) < 0.001
         AS srm_detected
FROM e
"""


@register("stats_srm_check", _SRM_ORACLE)
def stats_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail on the even/odd user split.
    Scale: one distinct-user agg, then closed-form arithmetic on a
    single count row; P(chi2(1) > x) = erfc(sqrt(x)/sqrt(2)) uses the
    same A&S polynomial both engines share across the stats family."""
    ev = _t(spark, sf_dir, "events")
    u = ev.select("user_id").distinct()
    g = u.agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n0"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
    )
    chi2 = ((F.col("n0") - F.col("n1")) * (F.col("n0") - F.col("n1"))) / (
        F.col("n0") + F.col("n1")
    ).cast("double")
    c = g.withColumn("chi2", chi2)
    az = F.sqrt(F.col("chi2")) / F.sqrt(F.lit(2.0))
    e = c.withColumn("az", az).withColumn(
        "t", 1 / (1 + 0.3275911 * (F.sqrt(F.col("chi2")) / F.sqrt(F.lit(2.0))))
    )
    t = F.col("t")
    p = (
        (((1.061405429 * t - 1.453152027) * t + 1.421413741) * t - 0.284496736)
        * t
        + 0.254829592
    ) * t * F.exp(-F.col("az") * F.col("az"))
    return e.select(
        F.col("n0").alias("n_variant_a"),
        F.col("n1").alias("n_variant_b"),
        F.round("chi2", 6).alias("chi2"),
        F.round(p, 6).alias("p_value"),
        (p < 0.001).alias("srm_detected"),
    )


# ---------------------------------------------------------------------------
# stats_ratio_delta_ci — purchases-per-view per variant with a
# delta-method 95% CI. All moments are exact BIGINT sums, so theta,
# the variance, and the bounds are identical doubles in both engines.
# ---------------------------------------------------------------------------

_RATIO_ORACLE = """
WITH per AS (
  SELECT user_id, user_id % 2 AS variant,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY user_id
),
mo AS (
  SELECT variant, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM per GROUP BY variant
),
d AS (
  SELECT variant, n, sx, sy,
         CAST(sx AS DOUBLE) / sy AS theta,
         CAST(n * sxx - sx * sx AS DOUBLE) / (CAST(n AS DOUBLE) * n) AS vx,
         CAST(n * sxy - sx * sy AS DOUBLE) / (CAST(n AS DOUBLE) * n) AS cxy,
         CAST(n * syy - sy * sy AS DOUBLE) / (CAST(n AS DOUBLE) * n) AS vy,
         CAST(sy AS DOUBLE) / n AS ybar
  FROM mo
),
s AS (
  SELECT variant, n, sx, sy, theta,
         sqrt((vx - 2 * theta * cxy + theta * theta * vy) / n)
           / ybar AS se
  FROM d
)
SELECT CAST(variant AS BIGINT) AS variant, n AS n_users,
       sx AS n_purchases, sy AS n_views,
       round(theta, 6) AS ratio,
       round(se, 6) AS se,
       round(theta - 1.96 * se, 6) AS ci_lo,
       round(theta + 1.96 * se, 6) AS ci_hi
FROM s
"""


@register("stats_ratio_delta_ci", _RATIO_ORACLE)
def stats_ratio_delta_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method 95% CI for the purchases-per-view ratio per
    variant. Scale: ONE user-grain agg, ONE 2-row moment agg; the
    ratio-of-sums estimator and its linearized variance are closed-form
    on exact integer moments — the statistic never revisits rows."""
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("y"),
    ).select((F.col("user_id") % 2).alias("variant"), "x", "y")
    mo = per.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    theta = sx.cast("double") / sy
    nd = n.cast("double")
    vx = (n * F.col("sxx") - sx * sx).cast("double") / (nd * n)
    cxy = (n * F.col("sxy") - sx * sy).cast("double") / (nd * n)
    vy = (n * F.col("syy") - sy * sy).cast("double") / (nd * n)
    ybar = sy.cast("double") / n
    d = mo.select(
        "variant", "n", "sx", "sy",
        theta.alias("theta"),
        (F.sqrt((vx - 2 * theta * cxy + theta * theta * vy) / n) / ybar).alias(
            "se"
        ),
    )
    return d.select(
        F.col("variant").cast("bigint").alias("variant"),
        F.col("n").alias("n_users"),
        F.col("sx").alias("n_purchases"),
        F.col("sy").alias("n_views"),
        F.round("theta", 6).alias("ratio"),
        F.round("se", 6).alias("se"),
        F.round(F.col("theta") - 1.96 * F.col("se"), 6).alias("ci_lo"),
        F.round(F.col("theta") + 1.96 * F.col("se"), 6).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# profile_column_entropy — Shannon entropy of every categorical column
# in the star schema, normalized by log2(n_distinct).
# ---------------------------------------------------------------------------

_ENTCOLS = [
    ("orders", "o_orderstatus"),
    ("orders", "o_orderpriority"),
    ("customer", "c_mktsegment"),
    ("part", "p_brand"),
    ("part", "p_type"),
]

_PCE_ORACLE = "\nUNION ALL\n".join(
    f"""
SELECT '{t}.{c}' AS col_name,
       CAST(sum(n) AS BIGINT) AS n_values,
       CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
       round(-sum(p * ln(p)) / ln(2), 6) AS entropy_bits,
       round(CASE WHEN count(DISTINCT v) > 1
             THEN (-sum(p * ln(p)) / ln(2))
                  / (ln(CAST(count(DISTINCT v) AS DOUBLE)) / ln(2))
             ELSE 0 END, 6) AS norm_entropy
FROM (
  SELECT v, n, n / CAST(sum(n) OVER () AS DOUBLE) AS p
  FROM (SELECT {c} AS v, CAST(count(*) AS BIGINT) AS n FROM {t} GROUP BY 1)
)
""".strip()
    for t, c in _ENTCOLS
)


@register("profile_column_entropy", _PCE_ORACLE)
def profile_column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (and its normalized-by-log-cardinality form) for
    each categorical column. Scale: one value-grain hash-agg per
    column (bounded output), entropy algebra on those bounded tables;
    branches union at the end. The normalized entropy is the skew
    detector: 1.0 = uniform, near 0 = one value dominates."""
    import math

    out = None
    for t, c in _ENTCOLS:
        tb = _t(spark, sf_dir, t)
        vc = tb.groupBy(F.col(c).alias("v")).agg(
            F.count(F.lit(1)).cast("bigint").alias("n")
        )
        from pyspark.sql import Window

        tot = F.sum("n").over(Window.partitionBy())
        pr = vc.select(
            "v", "n", (F.col("n") / tot.cast("double")).alias("p"),
            tot.cast("bigint").alias("tot"),
        )
        ent = -F.sum(F.col("p") * F.log("p")) / F.lit(math.log(2))
        nd = F.countDistinct("v")
        row = pr.agg(
            F.sum("n").cast("bigint").alias("n_values"),
            nd.cast("bigint").alias("n_distinct"),
            F.round(ent, 6).alias("entropy_bits"),
            F.round(
                F.when(
                    nd > 1,
                    ent / (F.log(nd.cast("double")) / F.lit(math.log(2))),
                ).otherwise(0.0),
                6,
            ).alias("norm_entropy"),
        ).select(
            F.lit(f"{t}.{c}").alias("col_name"),
            "n_values",
            "n_distinct",
            "entropy_bits",
            "norm_entropy",
        )
        out = row if out is None else out.unionAll(row)
    return out
