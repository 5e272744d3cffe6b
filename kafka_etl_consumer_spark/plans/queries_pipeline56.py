"""Query surface batch 60 (round 10, seventh wave): unequal-variance
post-hoc, template entropy, and detrended fluctuation analysis.

- stats_games_howell — Games-Howell post-hoc (the unequal-variance
  Tukey) with per-pair Welch df and a 2-D studentized-range table
  literal (df rows x k columns, largest tabulated df <= Welch df).
- ts_sample_entropy — SampEn(m=2, r=0.5*sd) on the daily-mean series:
  template-match regularity, the complexity complement to
  ts_spectral_entropy's frequency-domain view.
- ts_dfa_alpha — detrended fluctuation analysis scaling exponent on
  the integrated profile at box sizes 4/8/16, the robust complement
  to ts_hurst_rs (DFA tolerates nonstationarity R/S does not).

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283 of mykidong/kafka-etl-consumer).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# stats_games_howell — unequal-variance post-hoc on the Tukey substrate
# ---------------------------------------------------------------------------

_GH_MAX_K = 6

# Upper-5% studentized-range critical values q_{0.05}(k, df) (Harter
# 1960), k = 2..6 at df rows 10/20/30/60/120/inf. The inf row equals
# stats_tukey_hsd's _TUKEY_Q05_INF (deliberate cross-check). Lookup
# takes the LARGEST tabulated df <= the pair's Welch df: q decreases
# in df, so rounding df down inflates the critical value — the
# conservative direction (documented; with hundreds of rows per group
# the Welch df here always lands at or beyond the 120 row).
_GH_Q05 = {
    10: {2: 3.151, 3: 3.877, 4: 4.327, 5: 4.654, 6: 4.912},
    20: {2: 2.950, 3: 3.578, 4: 3.958, 5: 4.232, 6: 4.445},
    30: {2: 2.888, 3: 3.486, 4: 3.845, 5: 4.102, 6: 4.302},
    60: {2: 2.829, 3: 3.399, 4: 3.737, 5: 3.977, 6: 4.163},
    120: {2: 2.800, 3: 3.356, 4: 3.685, 5: 3.917, 6: 4.096},
    999999999: {2: 2.772, 3: 3.314, 4: 3.633, 5: 3.858, 6: 4.030},
}

_GH_TBL_ROWS = ", ".join(
    f"({df}, {k}, {q})"
    for df, ks in sorted(_GH_Q05.items())
    for k, q in sorted(ks.items())
)

_GH_ORACLE = f"""
WITH om AS (
  SELECT l_orderkey, count(*) AS k, max(l_extendedprice) AS mx
  FROM lineitem GROUP BY 1
),
g AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n, sum(mx) AS s, sum(mx * mx) AS q2
  FROM om WHERE k BETWEEN 1 AND {_GH_MAX_K} GROUP BY k
),
kg AS (SELECT CAST(count(*) AS INT) AS k_groups FROM g),
pairs AS (
  SELECT a.k AS k_a, b.k AS k_b, a.n AS n_a, b.n AS n_b,
         a.s / a.n AS mean_a, b.s / b.n AS mean_b,
         (a.q2 - a.s * a.s / a.n) / (a.n - 1) / a.n AS va,
         (b.q2 - b.s * b.s / b.n) / (b.n - 1) / b.n AS vb,
         k_groups
  FROM g a JOIN g b ON a.k < b.k CROSS JOIN kg
),
welch AS (
  SELECT *, abs(mean_a - mean_b) / sqrt((va + vb) / 2) AS q,
         (va + vb) * (va + vb)
           / (va * va / (n_a - 1) + vb * vb / (n_b - 1)) AS df_w
  FROM pairs
),
tbl AS (
  SELECT * FROM (VALUES {_GH_TBL_ROWS}) t(df, k, qc)
),
pick AS (
  SELECT welch.*, tbl.qc,
         row_number() OVER (PARTITION BY k_a, k_b ORDER BY tbl.df DESC)
           AS rk
  FROM welch JOIN tbl
    ON tbl.k = welch.k_groups AND tbl.df <= greatest(welch.df_w, 10)
)
SELECT CAST(k_a AS BIGINT) AS k_a, CAST(k_b AS BIGINT) AS k_b,
       n_a, n_b,
       round(mean_a, 2) AS mean_a, round(mean_b, 2) AS mean_b,
       round(q, 4) AS q_stat, round(df_w, 2) AS df_welch,
       qc AS q_crit,
       CAST(CASE WHEN q > qc THEN 1 ELSE 0 END AS INT) AS significant
FROM pick WHERE rk = 1
ORDER BY k_a, k_b
"""


@register("stats_games_howell", _GH_ORACLE)
def stats_games_howell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Games-Howell post-hoc (1976) — the unequal-variance, unequal-n
    replacement for Tukey-Kramer: each pair is tested at
    q = |mean_i - mean_j| / sqrt((v_i/n_i + v_j/n_j)/2) with its OWN
    Welch-Satterthwaite df, against q_0.05(k, df) from a 2-D table
    literal (Harter 1960; df rows 10..inf, largest tabulated df <=
    Welch df — q decreases in df so rounding down is conservative,
    documented at the table; the inf row is byte-identical to
    stats_tukey_hsd's, a deliberate cross-check). Same STRUCTURAL
    grouping as Tukey — per-order max(l_extendedprice) by line count
    1..{_GH_MAX_K} — where group variances genuinely differ (the max
    of k draws tightens as k grows), which is exactly the regime GH
    exists for. Per-group moments are exact (n, sum, sum-of-squares);
    q is a ratio so accumulation-order noise divides out. Scale: one
    data-grain hash-agg, then a <=6-row frame broadcast-self-joined
    and a 30-row broadcast table — nothing pairwise ever touches data
    volume."""
    li = _t(spark, sf_dir, "lineitem")
    om = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("k"), F.max("l_extendedprice").alias("mx")
    )
    g = (
        om.filter(F.col("k").between(1, _GH_MAX_K))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("mx").alias("s"),
            F.sum(F.col("mx") * F.col("mx")).alias("q2"),
        )
    )
    kg = g.agg(F.count(F.lit(1)).cast("int").alias("k_groups"))
    va = (F.col("a.q2") - F.col("a.s") * F.col("a.s") / F.col("a.n")) / (
        F.col("a.n") - 1
    ) / F.col("a.n")
    vb = (F.col("b.q2") - F.col("b.s") * F.col("b.s") / F.col("b.n")) / (
        F.col("b.n") - 1
    ) / F.col("b.n")
    pairs = (
        g.alias("a")
        .join(F.broadcast(g.alias("b")), F.col("a.k") < F.col("b.k"))
        .crossJoin(F.broadcast(kg))
        .select(
            F.col("a.k").alias("k_a"),
            F.col("b.k").alias("k_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
            (F.col("a.s") / F.col("a.n")).alias("mean_a"),
            (F.col("b.s") / F.col("b.n")).alias("mean_b"),
            va.alias("va"),
            vb.alias("vb"),
            "k_groups",
        )
    )
    q = F.abs(F.col("mean_a") - F.col("mean_b")) / F.sqrt(
        (F.col("va") + F.col("vb")) / 2
    )
    df_w = (
        (F.col("va") + F.col("vb"))
        * (F.col("va") + F.col("vb"))
        / (
            F.col("va") * F.col("va") / (F.col("n_a") - 1)
            + F.col("vb") * F.col("vb") / (F.col("n_b") - 1)
        )
    )
    welch = pairs.select("*", q.alias("q"), df_w.alias("df_w"))
    tbl = spark.createDataFrame(
        [
            (df, k, qc)
            for df, ks in sorted(_GH_Q05.items())
            for k, qc in sorted(ks.items())
        ],
        ["df", "k", "qc"],
    )
    pick = (
        welch.join(
            F.broadcast(tbl),
            (F.col("k") == F.col("k_groups"))
            & (F.col("df") <= F.greatest(F.col("df_w"), F.lit(10.0))),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("k_a", "k_b").orderBy(F.col("df").desc())
            ),
        )
        .filter(F.col("rk") == 1)
    )
    return pick.select(
        F.col("k_a").cast("bigint").alias("k_a"),
        F.col("k_b").cast("bigint").alias("k_b"),
        "n_a",
        "n_b",
        F.round("mean_a", 2).alias("mean_a"),
        F.round("mean_b", 2).alias("mean_b"),
        F.round("q", 4).alias("q_stat"),
        F.round("df_w", 2).alias("df_welch"),
        F.col("qc").alias("q_crit"),
        (F.col("q") > F.col("qc")).cast("int").alias("significant"),
    ).orderBy("k_a", "k_b")


# ---------------------------------------------------------------------------
# ts_sample_entropy — SampEn(m=2, r=0.2*sd) on the daily-mean series
# ---------------------------------------------------------------------------

# r = 0.5*sd, not the textbook 0.2: with the fixture's 30-day series
# (28 template indices, 378 pairs) the 0.2 tolerance leaves A = 0 for
# most keys (probed: 1 of 5 keys survives at sf0.001) — the standard
# short-series adjustment is a wider tolerance, and 0.5 keeps every
# key at every SF with A >= 1 while remaining discriminative.
_SE_R_FRAC = 0.5

_SAMPEN_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
         round(avg(value), 6) AS m
  FROM events GROUP BY 1, 2
),
stat AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         {_SE_R_FRAC} * stddev_samp(m) AS r
  FROM daily GROUP BY event_type
),
seq AS (
  SELECT event_type, m,
         row_number() OVER (PARTITION BY event_type ORDER BY d) AS t
  FROM daily
),
trip AS (
  SELECT event_type, t, m AS x0,
         lead(m, 1) OVER w AS x1, lead(m, 2) OVER w AS x2
  FROM seq WINDOW w AS (PARTITION BY event_type ORDER BY t)
),
pairs AS (
  SELECT a.event_type,
         CASE WHEN abs(a.x0 - b.x0) < r AND abs(a.x1 - b.x1) < r
              THEN 1 ELSE 0 END AS mb,
         CASE WHEN abs(a.x0 - b.x0) < r AND abs(a.x1 - b.x1) < r
                   AND abs(a.x2 - b.x2) < r
              THEN 1 ELSE 0 END AS ma
  FROM trip a
  JOIN trip b ON a.event_type = b.event_type AND a.t < b.t
  JOIN stat ON stat.event_type = a.event_type
  WHERE a.x2 IS NOT NULL AND b.x2 IS NOT NULL
)
SELECT p.event_type, s.n AS n_days, round(s.r, 6) AS r_tol,
       CAST(sum(mb) AS BIGINT) AS b_count,
       CAST(sum(ma) AS BIGINT) AS a_count,
       round(ln(CAST(sum(mb) AS DOUBLE)) - ln(CAST(sum(ma) AS DOUBLE)), 6)
         AS sampen
FROM pairs p JOIN stat s ON s.event_type = p.event_type
GROUP BY p.event_type, s.n, s.r
HAVING sum(ma) > 0
ORDER BY p.event_type
"""


@register("ts_sample_entropy", _SAMPEN_ORACLE)
def ts_sample_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample entropy SampEn(m=2, r=0.5*sd) of the daily-mean series
    (Richman & Moorman 2000): -ln(A/B) where B counts index pairs
    i < j in 1..n-2 whose length-2 templates match under Chebyshev
    distance < r and A counts the same index range matching at length
    3 — low SampEn means patterns repeat (regularity), high means
    they don't. Both A and B run over the IDENTICAL index range (the
    x2-exists filter) so A/B is a proper conditional probability, the
    strict-< match convention is spelled identically cross-engine,
    and template values are the 6dp-quantized daily means so every
    comparison sees identical doubles. Keys where A = 0 (no length-3
    match anywhere) are dropped rather than emitting -ln(0) = inf,
    same HAVING in both engines. Scale: the pair join runs on the
    CALENDAR-bounded daily grain — |days|^2 pairs per key regardless
    of data volume (378 pairs at the fixture's 30 days), after the
    one data-proportional daily reduction."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.to_date(F.date_trunc("day", "ts")).alias("d"),
            "value",
        )
        .groupBy("event_type", "d")
        .agg(F.round(F.avg("value"), 6).alias("m"))
    )
    stat = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (_SE_R_FRAC * F.stddev_samp("m")).alias("r"),
    )
    w = Window.partitionBy("event_type").orderBy("d")
    trip = daily.select(
        "event_type",
        F.row_number().over(w).alias("t"),
        F.col("m").alias("x0"),
        F.lead("m", 1).over(w).alias("x1"),
        F.lead("m", 2).over(w).alias("x2"),
    ).filter(F.col("x2").isNotNull())
    a, b = trip.alias("a"), trip.alias("b")
    joined = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.t") < F.col("b.t")),
        )
        .select(F.col("a.event_type").alias("event_type"),
                F.col("a.x0").alias("ax0"), F.col("a.x1").alias("ax1"),
                F.col("a.x2").alias("ax2"),
                F.col("b.x0").alias("bx0"), F.col("b.x1").alias("bx1"),
                F.col("b.x2").alias("bx2"))
        .join(F.broadcast(stat), "event_type")
    )
    m2 = (F.abs(F.col("ax0") - F.col("bx0")) < F.col("r")) & (
        F.abs(F.col("ax1") - F.col("bx1")) < F.col("r")
    )
    m3 = m2 & (F.abs(F.col("ax2") - F.col("bx2")) < F.col("r"))
    agg = (
        joined.groupBy("event_type", "n", "r")
        .agg(
            F.sum(m2.cast("int")).cast("bigint").alias("b_count"),
            F.sum(m3.cast("int")).cast("bigint").alias("a_count"),
        )
        .filter(F.col("a_count") > 0)
    )
    return agg.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.round("r", 6).alias("r_tol"),
        "b_count",
        "a_count",
        F.round(
            F.log(F.col("b_count").cast("double"))
            - F.log(F.col("a_count").cast("double")),
            6,
        ).alias("sampen"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# ts_dfa_alpha — detrended fluctuation analysis at box sizes 4/8/16
# ---------------------------------------------------------------------------

_DFA_SCALES = (4, 8, 16)

_DFA_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
         round(avg(value), 6) AS m
  FROM events GROUP BY 1, 2
),
stat AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n, avg(m) AS mbar
  FROM daily GROUP BY event_type
),
prof AS (
  SELECT daily.event_type, n,
         row_number() OVER (PARTITION BY daily.event_type ORDER BY d) AS t,
         sum(m - mbar) OVER (PARTITION BY daily.event_type ORDER BY d
                             ROWS UNBOUNDED PRECEDING) AS y
  FROM daily JOIN stat USING (event_type)
),
boxed AS (
  SELECT event_type, n, s, y,
         CAST(floor((t - 1) / s) AS BIGINT) AS bx,
         CAST((t - 1) % s + 1 AS DOUBLE) AS u
  FROM prof CROSS JOIN (VALUES {", ".join(f"({s})" for s in _DFA_SCALES)}) sc(s)
  WHERE CAST(floor((t - 1) / s) AS BIGINT) < CAST(floor(n / s) AS BIGINT)
),
fits AS (
  SELECT event_type, s, bx, CAST(s AS DOUBLE) AS sn,
         sum(u) AS su, sum(y) AS sy, sum(u * u) AS suu,
         sum(u * y) AS suy, sum(y * y) AS syy
  FROM boxed GROUP BY event_type, s, bx
),
sse AS (
  SELECT event_type, s,
         sum(syy - (sy - (sn * suy - su * sy) / (sn * suu - su * su) * su)
                   / sn * sy
                 - (sn * suy - su * sy) / (sn * suu - su * su) * suy) AS e2,
         CAST(sum(sn) AS DOUBLE) AS npts
  FROM fits GROUP BY event_type, s
),
fluct AS (
  SELECT event_type, s, sqrt(e2 / npts) AS f FROM sse
),
alpha AS (
  SELECT event_type,
         sum((ln(CAST(s AS DOUBLE)) - lsbar) * (ln(f) - lfbar))
           / sum((ln(CAST(s AS DOUBLE)) - lsbar)
                 * (ln(CAST(s AS DOUBLE)) - lsbar)) AS a
  FROM fluct JOIN (
    SELECT event_type, avg(ln(CAST(s AS DOUBLE))) AS lsbar,
           avg(ln(f)) AS lfbar
    FROM fluct GROUP BY event_type
  ) mm USING (event_type)
  GROUP BY event_type
)
SELECT f4.event_type,
       round(f4.f, 6) AS f_4, round(f8.f, 6) AS f_8,
       round(f16.f, 6) AS f_16, round(a, 6) AS dfa_alpha
FROM (SELECT event_type, f FROM fluct WHERE s = 4) f4
JOIN (SELECT event_type, f FROM fluct WHERE s = 8) f8 USING (event_type)
JOIN (SELECT event_type, f FROM fluct WHERE s = 16) f16 USING (event_type)
JOIN alpha USING (event_type)
ORDER BY f4.event_type
"""


@register("ts_dfa_alpha", _DFA_ORACLE)
def ts_dfa_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detrended fluctuation analysis (Peng et al. 1994) of the
    daily-mean series: integrate the demeaned series into a profile,
    split it into complete boxes of size s in {4, 8, 16}, linearly
    detrend WITHIN each box (the same closed-form simple-regression
    sufficient sums as stats_durbin_watson — SSE = syy - a*sy - b*suy
    by the normal equations, no iterative fit), and report the
    fluctuation F(s) = sqrt(sum SSE / points) per scale plus the
    log-log slope alpha across the three scales. alpha ~ 0.5 for
    white noise, ~1.5 for a random walk, and unlike ts_hurst_rs' R/S
    exponent DFA stays calibrated under slow mean drift (the trend is
    removed per box). Incomplete trailing boxes are dropped in both
    engines (the floor(n/s) filter). Scale: after the daily
    reduction, every stage runs on |days| x |scales| calendar-bounded
    rows; the box fits are one hash-agg of five sums."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.to_date(F.date_trunc("day", "ts")).alias("d"),
            "value",
        )
        .groupBy("event_type", "d")
        .agg(F.round(F.avg("value"), 6).alias("m"))
    )
    stat = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"), F.avg("m").alias("mbar")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    prof = daily.join(stat, "event_type").select(
        "event_type",
        "n",
        F.row_number().over(w).alias("t"),
        F.sum(F.col("m") - F.col("mbar"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("y"),
    )
    boxed = (
        prof.select(
            "event_type",
            "n",
            "t",
            "y",
            F.explode(F.array(*[F.lit(s) for s in _DFA_SCALES])).alias("s"),
        )
        .withColumn("bx", F.floor((F.col("t") - 1) / F.col("s")).cast("bigint"))
        .withColumn("u", ((F.col("t") - 1) % F.col("s") + 1).cast("double"))
        .filter(F.col("bx") < F.floor(F.col("n") / F.col("s")).cast("bigint"))
    )
    fits = boxed.groupBy("event_type", "s", "bx").agg(
        F.first(F.col("s").cast("double")).alias("sn"),
        F.sum("u").alias("su"),
        F.sum("y").alias("sy"),
        F.sum(F.col("u") * F.col("u")).alias("suu"),
        F.sum(F.col("u") * F.col("y")).alias("suy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    slope = (F.col("sn") * F.col("suy") - F.col("su") * F.col("sy")) / (
        F.col("sn") * F.col("suu") - F.col("su") * F.col("su")
    )
    icept = (F.col("sy") - slope * F.col("su")) / F.col("sn")
    sse = fits.groupBy("event_type", "s").agg(
        F.sum(
            F.col("syy") - icept * F.col("sy") - slope * F.col("suy")
        ).alias("e2"),
        F.sum("sn").alias("npts"),
    )
    fluct = sse.select(
        "event_type", "s", F.sqrt(F.col("e2") / F.col("npts")).alias("f")
    )
    mm = fluct.groupBy("event_type").agg(
        F.avg(F.log(F.col("s").cast("double"))).alias("lsbar"),
        F.avg(F.log("f")).alias("lfbar"),
    )
    ls = F.log(F.col("s").cast("double"))
    alpha = (
        fluct.join(mm, "event_type")
        .groupBy("event_type")
        .agg(
            (
                F.sum((ls - F.col("lsbar")) * (F.log("f") - F.col("lfbar")))
                / F.sum((ls - F.col("lsbar")) * (ls - F.col("lsbar")))
            ).alias("a")
        )
    )
    piv = (
        fluct.groupBy("event_type")
        .agg(
            F.round(F.max(F.when(F.col("s") == 4, F.col("f"))), 6).alias("f_4"),
            F.round(F.max(F.when(F.col("s") == 8, F.col("f"))), 6).alias("f_8"),
            F.round(F.max(F.when(F.col("s") == 16, F.col("f"))), 6).alias(
                "f_16"
            ),
        )
    )
    return (
        piv.join(alpha, "event_type")
        .select(
            "event_type",
            "f_4",
            "f_8",
            "f_16",
            F.round("a", 6).alias("dfa_alpha"),
        )
        .orderBy("event_type")
    )
