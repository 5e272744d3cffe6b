"""Query surface batch 38 (round 4): classical-statistics completions —
the k-group nonparametric test, the variance-homogeneity gate, the
normality screen, standardized effect sizes, and survey allocation.

- Kruskal-Wallis H (tie-corrected, Wilson-Hilferty chi-square p) — the
  k-group generalization of stats_mannwhitney_u
- Brown-Forsythe Levene W — the variance-homogeneity check run before
  trusting a pooled-variance t/ANOVA result
- Jarque-Bera — the moment-based normality screen per segment
- Cohen's d / Hedges' g / Cliff's delta — the effect sizes a report
  quotes next to stats_ttest_welch's p-value
- Neyman allocation — optimal stratified-sample budget split (pairs
  with sample_stratified, which draws the actual rows)

Determinism pattern (memory: global double sums are partition-order
nondeterministic): every cross-row sum of a continuous metric goes
through exact DECIMAL casts or exact half-integer ranks; doubles only
appear in per-group closed-form arithmetic on those exact sums, then
round(6).

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.operators.ranks import grid_median, tie_avg_ranks, tie_term
from kafka_etl_consumer_spark.plans.registry import _t, register

# A&S 7.1.26 erfc(x) for x >= 0 (same Horner spelling as
# stats_mannwhitney_u / stats_prop_ztest so both engines share bitwise
# evaluation order).
_ERFC_SQL = (
    "(((((1.061405429 * {t} - 1.453152027) * {t} + 1.421413741) * {t}"
    " - 0.284496736) * {t} + 0.254829592) * {t} * exp(-{x} * {x}))"
)


def _erfc_cols(x: Column) -> Column:
    t = 1 / (1 + 0.3275911 * x)
    return (
        ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t - 0.284496736) * t
         + 0.254829592)
        * t
        * F.exp(-x * x)
    )


def _normal_sf(z: Column) -> Column:
    """P(Z > z) via erfc(|z|/sqrt(2)) with explicit sign handling (the
    A&S polynomial is only valid for non-negative arguments)."""
    az = F.abs(z) / F.sqrt(F.lit(2.0))
    half = 0.5 * _erfc_cols(az)
    return F.when(z >= 0, half).otherwise(1.0 - half)


def _normal_sf_sql(z: str) -> str:
    az = f"(abs({z}) / sqrt(2))"
    t = f"(1 / (1 + 0.3275911 * {az}))"
    half = f"(0.5 * {_ERFC_SQL.format(t=t, x=az)})"
    return f"(CASE WHEN {z} >= 0 THEN {half} ELSE 1 - {half} END)"


# ---------------------------------------------------------------------------
# stats_kruskal_wallis — H across order priorities within each order
# status. Tie-averaged ranks are exact half-integers (sums exact in
# double); tie term is BIGINT; p comes from the Wilson-Hilferty cube-root
# normal approximation of the chi-square survival, so any df works with
# the shared erfc polynomial.
# ---------------------------------------------------------------------------

_KW_ORACLE = f"""
WITH base AS (
  SELECT o_orderstatus AS s, o_orderpriority AS g, o_totalprice AS x FROM orders
),
rk AS (
  SELECT s, g,
         rank() OVER (PARTITION BY s ORDER BY x)
           + (count(*) OVER (PARTITION BY s, x) - 1) / 2.0 AS ar
  FROM base
),
pg AS (
  SELECT s, g, CAST(count(*) AS BIGINT) AS nj, sum(ar) AS rj
  FROM rk GROUP BY s, g
),
tie AS (
  SELECT s, CAST(sum(t * t * t - t) AS BIGINT) AS ts3
  FROM (SELECT s, x, CAST(count(*) AS BIGINT) AS t FROM base GROUP BY s, x)
  GROUP BY s
),
ps AS (
  SELECT pg.s, CAST(count(*) AS BIGINT) AS k, CAST(sum(nj) AS BIGINT) AS n,
         sum(rj * rj / nj) AS srn
  FROM pg GROUP BY pg.s
),
h AS (
  SELECT ps.s, k, n,
         (12.0 / (n * (n + 1.0)) * srn - 3 * (n + 1.0))
           / (1 - ts3 / (CAST(n AS DOUBLE) * n * n - n)) AS hc
  FROM ps JOIN tie ON tie.s = ps.s
),
wh AS (
  SELECT s, k, n, hc, k - 1 AS df,
         (pow(hc / (k - 1.0), 1.0 / 3) - (1 - 2.0 / (9 * (k - 1.0))))
           / sqrt(2.0 / (9 * (k - 1.0))) AS z
  FROM h
)
SELECT s AS o_orderstatus, CAST(k AS INT) AS k_groups, n AS n_total,
       round(hc, 6) AS h_stat, CAST(df AS INT) AS df,
       round({_normal_sf_sql('z')}, 6) AS p_value
FROM wh
"""


@register("stats_kruskal_wallis", _KW_ORACLE)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test of o_totalprice across the 5 order
    priorities, run independently inside each order status. Scale: ranks
    via tie_avg_ranks' count grid — a full-parallelism hash agg plus a
    window over the per-status distinct-price grid (no per-row sort),
    collapsing to a k-row group table; everything after the rank sums is
    per-status closed-form arithmetic. Rank sums are exact
    half-integers, tie term is integer, so H is deterministic; the
    Wilson-Hilferty normal approximation gives the p-value for any df
    with the shared erfc polynomial. At 100 TB pass num_bins to
    tie_avg_ranks to bound the grid (stats_mannwhitney_u_binned shows
    the shape)."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("s"),
        F.col("o_orderpriority").alias("g"),
        F.col("o_totalprice").alias("x"),
    )
    rk = tie_avg_ranks(o, ["s"], "x", cohort_cols=["g"])
    pg = rk.groupBy("s", "g").agg(
        F.sum("cnt").cast("bigint").alias("nj"),
        F.sum(F.col("cnt") * F.col("avg_rank")).alias("rj"),
    )
    tie = tie_term(rk, ["s"], "x")
    ps = pg.groupBy("s").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("nj").cast("bigint").alias("n"),
        F.sum(F.col("rj") * F.col("rj") / F.col("nj")).alias("srn"),
    )
    h = ps.join(tie, "s").select(
        "s",
        "k",
        "n",
        (
            (12.0 / (F.col("n") * (F.col("n") + 1.0)) * F.col("srn")
             - 3 * (F.col("n") + 1.0))
            / (
                1
                - F.col("ts3")
                / (F.col("n").cast("double") * F.col("n") * F.col("n") - F.col("n"))
            )
        ).alias("hc"),
    )
    df_ = (F.col("k") - 1).cast("double")
    z = (
        F.pow(F.col("hc") / df_, F.lit(1.0 / 3))
        - (1 - 2.0 / (9 * df_))
    ) / F.sqrt(2.0 / (9 * df_))
    return h.select(
        F.col("s").alias("o_orderstatus"),
        F.col("k").cast("int").alias("k_groups"),
        F.col("n").alias("n_total"),
        F.round("hc", 6).alias("h_stat"),
        (F.col("k") - 1).cast("int").alias("df"),
        F.round(_normal_sf(z), 6).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# stats_levene_test — Brown-Forsythe variant (median-centered) of
# Levene's variance-homogeneity test across event types. Absolute
# deviations are quantized to DECIMAL(28,12) per row so every cross-row
# sum is exact; SS_within uses the raw-moment identity on exact sums.
# ---------------------------------------------------------------------------

_LEVENE_ORACLE = """
WITH base AS (SELECT event_type AS g, value AS x FROM events),
med AS (SELECT g, quantile_cont(x, 0.5) AS md FROM base GROUP BY g),
dev AS (
  SELECT base.g,
         CAST(abs(x - md) AS DECIMAL(28,12)) AS z,
         CAST(CAST(abs(x - md) AS DECIMAL(28,12))
              * CAST(abs(x - md) AS DECIMAL(28,12)) AS DECIMAL(38,12)) AS z2
  FROM base JOIN med ON med.g = base.g
),
pg AS (
  SELECT g, CAST(count(*) AS BIGINT) AS nj,
         CAST(CAST(sum(z) AS DECIMAL(38,12)) AS DOUBLE) AS sz,
         CAST(CAST(sum(z2) AS DECIMAL(38,12)) AS DOUBLE) AS sz2
  FROM dev GROUP BY g
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(nj) AS BIGINT) AS n,
         sum(sz) AS szall
  FROM pg
),
w AS (
  SELECT k, n,
         sum(nj * pow(sz / nj - szall / n, 2)) AS num,
         sum(sz2 - sz * sz / nj) AS den
  FROM pg CROSS JOIN tot GROUP BY k, n, szall
)
SELECT CAST(k AS INT) AS k_groups, n AS n_total,
       round((n - k) * num / ((k - 1.0) * den), 6) AS w_stat,
       CAST(k - 1 AS INT) AS df1, CAST(n - k AS INT) AS df2
FROM w
"""


@register("stats_levene_test", _LEVENE_ORACLE)
def stats_levene_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe (median-centered Levene) test that event-value
    spread is homogeneous across the 5 event types — the gate before
    pooled-variance inference (stats_anova_value). Scale: one exact
    median per group from grid_median's value-count grid (Spark's
    percentile aggregate would buffer every value of a group in one
    aggregation buffer — the same parallelism collapse as a per-row
    rank sort), one broadcast of the 5-row median table back onto the
    stream, one partial+final group agg of DECIMAL-quantized
    deviations, then 5-row closed-form arithmetic. The group medians
    broadcast; nothing else shuffles twice."""
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("g"), F.col("value").alias("x")
    )
    med = grid_median(ev, ["g"], "x", out_col="md")
    z = F.abs(F.col("x") - F.col("md")).cast("decimal(28,12)")
    dev = ev.join(F.broadcast(med), "g").select(
        "g",
        z.alias("z"),
        (z * z).cast("decimal(38,12)").alias("z2"),
    )
    pg = dev.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("nj"),
        F.sum("z").cast("decimal(38,12)").cast("double").alias("sz"),
        F.sum("z2").cast("decimal(38,12)").cast("double").alias("sz2"),
    )
    tot = pg.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("nj").cast("bigint").alias("n"),
        F.sum("sz").alias("szall"),
    )
    w = (
        pg.crossJoin(F.broadcast(tot))
        .groupBy("k", "n", "szall")
        .agg(
            F.sum(
                F.col("nj")
                * F.pow(F.col("sz") / F.col("nj") - F.col("szall") / F.col("n"), 2)
            ).alias("num"),
            F.sum(F.col("sz2") - F.col("sz") * F.col("sz") / F.col("nj")).alias("den"),
        )
    )
    return w.select(
        F.col("k").cast("int").alias("k_groups"),
        F.col("n").alias("n_total"),
        F.round(
            (F.col("n") - F.col("k")) * F.col("num")
            / ((F.col("k") - 1.0) * F.col("den")),
            6,
        ).alias("w_stat"),
        (F.col("k") - 1).cast("int").alias("df1"),
        (F.col("n") - F.col("k")).cast("int").alias("df2"),
    )


# ---------------------------------------------------------------------------
# stats_jarque_bera — normality screen per event type from exact DECIMAL
# power sums (value <= 491 so x^4 <= ~5.9e10 fits DECIMAL(38,12) with 22
# integer digits to spare); central moments are closed-form on the exact
# sums; chi-square(2) survival is exactly exp(-JB/2).
# ---------------------------------------------------------------------------

_JB_ORACLE = """
WITH p AS (
  SELECT event_type AS g,
         CAST(value AS DECIMAL(28,12)) AS x1,
         CAST(value * value AS DECIMAL(38,12)) AS x2,
         CAST(value * value * value AS DECIMAL(38,12)) AS x3,
         CAST(value * value * value * value AS DECIMAL(38,12)) AS x4
  FROM events
),
s AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
         CAST(CAST(sum(x1) AS DECIMAL(38,12)) AS DOUBLE) AS s1,
         CAST(CAST(sum(x2) AS DECIMAL(38,12)) AS DOUBLE) AS s2,
         CAST(CAST(sum(x3) AS DECIMAL(38,12)) AS DOUBLE) AS s3,
         CAST(CAST(sum(x4) AS DECIMAL(38,12)) AS DOUBLE) AS s4
  FROM p GROUP BY g
),
m AS (
  SELECT g, n, s1 / n AS mu,
         s2 / n - (s1 / n) * (s1 / n) AS m2,
         s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * pow(s1 / n, 3) AS m3,
         s4 / n - 4 * (s1 / n) * (s3 / n)
           + 6 * (s1 / n) * (s1 / n) * (s2 / n) - 3 * pow(s1 / n, 4) AS m4
  FROM s
),
jb AS (
  SELECT g, n, m3 / pow(m2, 1.5) AS skew, m4 / (m2 * m2) - 3 AS exk
  FROM m
)
SELECT g AS event_type, n AS n_events,
       round(skew, 6) AS skewness, round(exk, 6) AS excess_kurtosis,
       round(n / 6.0 * (skew * skew + exk * exk / 4), 6) AS jb_stat,
       round(exp(-(n / 6.0 * (skew * skew + exk * exk / 4)) / 2), 6) AS p_value
FROM jb
"""


@register("stats_jarque_bera", _JB_ORACLE)
def stats_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality screen of event values per event type:
    moment skewness + excess kurtosis and the chi-square(2) survival
    p = exp(-JB/2) (exact, no approximation needed at df=2). Scale: ONE
    partial+final group agg of four DECIMAL power sums — a single
    map-side-combining shuffle of 5 groups; moments are per-group
    closed-form. Raw moments are computed deliberately (vs streaming
    central moments) because the exact DECIMAL sums make them
    cross-engine deterministic."""
    ev = _t(spark, sf_dir, "events")
    v = F.col("value")
    p = ev.select(
        F.col("event_type").alias("g"),
        v.cast("decimal(28,12)").alias("x1"),
        (v * v).cast("decimal(38,12)").alias("x2"),
        (v * v * v).cast("decimal(38,12)").alias("x3"),
        (v * v * v * v).cast("decimal(38,12)").alias("x4"),
    )
    s = p.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x1").cast("decimal(38,12)").cast("double").alias("s1"),
        F.sum("x2").cast("decimal(38,12)").cast("double").alias("s2"),
        F.sum("x3").cast("decimal(38,12)").cast("double").alias("s3"),
        F.sum("x4").cast("decimal(38,12)").cast("double").alias("s4"),
    )
    mu = F.col("s1") / F.col("n")
    m = s.select(
        "g",
        "n",
        (F.col("s2") / F.col("n") - mu * mu).alias("m2"),
        (
            F.col("s3") / F.col("n")
            - 3 * mu * (F.col("s2") / F.col("n"))
            + 2 * F.pow(mu, 3)
        ).alias("m3"),
        (
            F.col("s4") / F.col("n")
            - 4 * mu * (F.col("s3") / F.col("n"))
            + 6 * mu * mu * (F.col("s2") / F.col("n"))
            - 3 * F.pow(mu, 4)
        ).alias("m4"),
    )
    jb = m.select(
        "g",
        "n",
        (F.col("m3") / F.pow(F.col("m2"), 1.5)).alias("skew"),
        (F.col("m4") / (F.col("m2") * F.col("m2")) - 3).alias("exk"),
    )
    stat = F.col("n") / 6.0 * (
        F.col("skew") * F.col("skew") + F.col("exk") * F.col("exk") / 4
    )
    return jb.select(
        F.col("g").alias("event_type"),
        F.col("n").alias("n_events"),
        F.round("skew", 6).alias("skewness"),
        F.round("exk", 6).alias("excess_kurtosis"),
        F.round(stat, 6).alias("jb_stat"),
        F.round(F.exp(-stat / 2), 6).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# stats_effect_sizes — Cohen's d, Hedges' g, Cliff's delta between
# even/odd user cohorts per event type. Means/variances from exact
# DECIMAL sums; Cliff's delta from the exact half-integer rank-sum U
# (the same quantity stats_mannwhitney_u tests — here reported as a
# bounded, unitless effect size).
# ---------------------------------------------------------------------------

_EFFECT_ORACLE = """
WITH base AS (
  SELECT event_type AS g, user_id % 2 AS c, value AS x,
         CAST(value AS DECIMAL(28,12)) AS xd,
         CAST(value * value AS DECIMAL(38,12)) AS xd2
  FROM events
),
mom AS (
  SELECT g, c, CAST(count(*) AS BIGINT) AS n,
         CAST(CAST(sum(xd) AS DECIMAL(38,12)) AS DOUBLE) AS s1,
         CAST(CAST(sum(xd2) AS DECIMAL(38,12)) AS DOUBLE) AS s2
  FROM base GROUP BY g, c
),
wide AS (
  SELECT g,
         max(CASE WHEN c = 0 THEN n END) AS n1,
         max(CASE WHEN c = 1 THEN n END) AS n2,
         max(CASE WHEN c = 0 THEN s1 END) AS a1,
         max(CASE WHEN c = 1 THEN s1 END) AS b1,
         max(CASE WHEN c = 0 THEN s2 END) AS a2,
         max(CASE WHEN c = 1 THEN s2 END) AS b2
  FROM mom GROUP BY g
),
rk AS (
  SELECT g, c,
         rank() OVER (PARTITION BY g ORDER BY x)
           + (count(*) OVER (PARTITION BY g, x) - 1) / 2.0 AS ar
  FROM base
),
u AS (
  SELECT g, sum(CASE WHEN c = 0 THEN ar ELSE 0 END) AS r1
  FROM rk GROUP BY g
),
st AS (
  SELECT wide.g, n1, n2,
         a1 / n1 - b1 / n2 AS md,
         sqrt(((a2 - a1 * a1 / n1) + (b2 - b1 * b1 / n2))
              / (n1 + n2 - 2.0)) AS sp,
         2 * (r1 - n1 * (n1 + 1) / 2.0) / (CAST(n1 AS DOUBLE) * n2) - 1 AS cd
  FROM wide JOIN u ON u.g = wide.g
)
SELECT g AS event_type, n1 AS n_a, n2 AS n_b,
       round(md / sp, 6) AS cohens_d,
       round(md / sp * (1 - 3.0 / (4 * (n1 + n2) - 9)), 6) AS hedges_g,
       round(cd, 6) AS cliffs_delta
FROM st
"""


@register("stats_effect_sizes", _EFFECT_ORACLE)
def stats_effect_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized effect sizes (Cohen's d, small-sample-corrected
    Hedges' g, rank-based Cliff's delta) between even/odd user cohorts
    per event type — the magnitude report that accompanies
    stats_ttest_welch / stats_mannwhitney_u p-values. Scale: one
    DECIMAL-moment group agg + tie_avg_ranks' count-grid ranks (hash agg
    at full parallelism, window only over the distinct-value grid), both
    collapsing to |types| rows; the pivot to cohort columns is a 10-row
    hash agg."""
    ev = _t(spark, sf_dir, "events")
    v = F.col("value")
    base = ev.select(
        F.col("event_type").alias("g"),
        (F.col("user_id") % 2).alias("c"),
        v.alias("x"),
        v.cast("decimal(28,12)").alias("xd"),
        (v * v).cast("decimal(38,12)").alias("xd2"),
    )
    mom = base.groupBy("g", "c").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("xd").cast("decimal(38,12)").cast("double").alias("s1"),
        F.sum("xd2").cast("decimal(38,12)").cast("double").alias("s2"),
    )
    wide = mom.groupBy("g").agg(
        F.max(F.when(F.col("c") == 0, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("c") == 1, F.col("n"))).alias("n2"),
        F.max(F.when(F.col("c") == 0, F.col("s1"))).alias("a1"),
        F.max(F.when(F.col("c") == 1, F.col("s1"))).alias("b1"),
        F.max(F.when(F.col("c") == 0, F.col("s2"))).alias("a2"),
        F.max(F.when(F.col("c") == 1, F.col("s2"))).alias("b2"),
    )
    rk = tie_avg_ranks(base.select("g", "c", "x"), ["g"], "x", cohort_cols=["c"])
    u = rk.groupBy("g").agg(
        F.sum(
            F.when(F.col("c") == 0, F.col("cnt") * F.col("avg_rank")).otherwise(
                F.lit(0.0)
            )
        ).alias("r1")
    )
    md = F.col("a1") / F.col("n1") - F.col("b1") / F.col("n2")
    sp = F.sqrt(
        (
            (F.col("a2") - F.col("a1") * F.col("a1") / F.col("n1"))
            + (F.col("b2") - F.col("b1") * F.col("b1") / F.col("n2"))
        )
        / (F.col("n1") + F.col("n2") - 2.0)
    )
    cd = (
        2
        * (F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2.0)
        / (F.col("n1").cast("double") * F.col("n2"))
        - 1
    )
    st = wide.join(u, "g").select(
        "g", "n1", "n2", md.alias("md"), sp.alias("sp"), cd.alias("cd")
    )
    return st.select(
        F.col("g").alias("event_type"),
        F.col("n1").alias("n_a"),
        F.col("n2").alias("n_b"),
        F.round(F.col("md") / F.col("sp"), 6).alias("cohens_d"),
        F.round(
            F.col("md") / F.col("sp")
            * (1 - 3.0 / (4 * (F.col("n1") + F.col("n2")) - 9)),
            6,
        ).alias("hedges_g"),
        F.round("cd", 6).alias("cliffs_delta"),
    )


# ---------------------------------------------------------------------------
# stats_neyman_allocation — optimal stratified sampling allocation
# n_h ∝ N_h * S_h over market segments (budget 1000). Stratum standard
# deviations come from exact DECIMAL sums, so the shares and floor
# counts are identical doubles in both engines.
# ---------------------------------------------------------------------------

_BUDGET_N = 1000

_NEYMAN_ORACLE = f"""
WITH c AS (
  SELECT c_mktsegment AS seg,
         CAST(c_acctbal AS DECIMAL(28,12)) AS x,
         CAST(c_acctbal * c_acctbal AS DECIMAL(38,12)) AS x2
  FROM customer
),
s AS (
  SELECT seg, CAST(count(*) AS BIGINT) AS nh,
         CAST(CAST(sum(x) AS DECIMAL(38,12)) AS DOUBLE) AS s1,
         CAST(CAST(sum(x2) AS DECIMAL(38,12)) AS DOUBLE) AS s2
  FROM c GROUP BY seg
),
sd AS (
  SELECT seg, nh, sqrt((s2 - s1 * s1 / nh) / (nh - 1.0)) AS sh
  FROM s
),
w AS (SELECT seg, nh, sh, nh * sh AS wh FROM sd),
t AS (SELECT sum(wh) AS wtot FROM w)
SELECT seg AS c_mktsegment, nh AS n_stratum, round(sh, 6) AS stddev,
       round(wh / wtot, 6) AS alloc_share,
       CAST(floor({_BUDGET_N} * wh / wtot) AS BIGINT) AS alloc_n
FROM w CROSS JOIN t
"""


@register("stats_neyman_allocation", _NEYMAN_ORACLE)
def stats_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal allocation of a 1000-row sampling budget across
    market segments (n_h proportional to N_h·S_h on account balance) —
    the planning step ahead of sample_stratified, minimizing estimator
    variance for a fixed budget. Scale: ONE DECIMAL-moment group agg
    (|segments| rows) + a one-row total broadcast back; floor counts are
    derived from identical doubles in both engines because every input
    to the division is an exact sum."""
    c = _t(spark, sf_dir, "customer")
    v = F.col("c_acctbal")
    base = c.select(
        F.col("c_mktsegment").alias("seg"),
        v.cast("decimal(28,12)").alias("x"),
        (v * v).cast("decimal(38,12)").alias("x2"),
    )
    s = base.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("nh"),
        F.sum("x").cast("decimal(38,12)").cast("double").alias("s1"),
        F.sum("x2").cast("decimal(38,12)").cast("double").alias("s2"),
    )
    sd = s.select(
        "seg",
        "nh",
        F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("nh"))
            / (F.col("nh") - 1.0)
        ).alias("sh"),
    )
    w = sd.select("seg", "nh", "sh", (F.col("nh") * F.col("sh")).alias("wh"))
    t = w.agg(F.sum("wh").alias("wtot"))
    return w.crossJoin(F.broadcast(t)).select(
        F.col("seg").alias("c_mktsegment"),
        F.col("nh").alias("n_stratum"),
        F.round("sh", 6).alias("stddev"),
        F.round(F.col("wh") / F.col("wtot"), 6).alias("alloc_share"),
        F.floor(_BUDGET_N * F.col("wh") / F.col("wtot")).cast("bigint").alias("alloc_n"),
    )
