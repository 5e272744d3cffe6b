"""Query surface batch 52 (round 9, fifth wave): hidden-periodicity
testing and the normal-scores variance test.

- ts_fisher_g — Fisher's g test per event type: is the LARGEST
  periodogram ordinate of the daily series too big for white noise?
  The significance test behind ts_fourier_seasonal_fit's fixed-period
  fit (that assumes the period; this one hunts it).
- stats_fligner_killeen — the Fligner-Killeen normal-scores test of
  variance homogeneity across event types: the robust (median-centred,
  rank-based) alternative to stats_levene_test, the one scale test
  that keeps its size under heavy non-normality.

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283 of mykidong/kafka-etl-consumer).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.queries_pipeline33 import (
    _normal_sf,
    _normal_sf_sql,
)
from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# ts_fisher_g — largest periodogram ordinate vs white noise
# ---------------------------------------------------------------------------

_FG_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
         round(avg(value), 6) AS m
  FROM events GROUP BY 1, 2
),
seq AS (
  SELECT event_type, m,
         row_number() OVER (PARTITION BY event_type ORDER BY d) AS t,
         count(*) OVER (PARTITION BY event_type) AS n,
         avg(m) OVER (PARTITION BY event_type) AS mbar
  FROM daily
),
jj AS (
  -- frequency bound derived from n, same as the engine's F.sequence
  -- (ADVICE r9: a literal cap silently diverged for n >= 401)
  SELECT event_type, t, n, m - mbar AS x,
         unnest(range(1, CAST(floor((n - 1) / 2.0) AS BIGINT) + 1)) AS j
  FROM seq
),
per AS (
  SELECT event_type, j, CAST(max(n) AS BIGINT) AS n,
         round(pow(sum(x * cos(2 * {math.pi!r} * j * t / n)), 2)
               + pow(sum(x * sin(2 * {math.pi!r} * j * t / n)), 2), 6) AS i
  FROM jj GROUP BY event_type, j
),
g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS m, max(n) AS n,
         max(i) / sum(i) AS g,
         min(CASE WHEN i = (SELECT max(i2.i) FROM per i2
                            WHERE i2.event_type = per.event_type)
                  THEN j END) AS peak_j
  FROM per GROUP BY event_type
),
p AS (
  SELECT event_type, m, n, g, peak_j,
         m * pow(greatest(0, 1 - g), m - 1)
         - m * (m - 1) / 2.0 * pow(greatest(0, 1 - 2 * g), m - 1)
         + m * (m - 1) * (m - 2) / 6.0 * pow(greatest(0, 1 - 3 * g), m - 1)
           AS pv
  FROM g
)
SELECT event_type, CAST(n AS BIGINT) AS n_days, CAST(m AS INT) AS n_freqs,
       CAST(peak_j AS INT) AS peak_freq,
       round(CAST(n AS DOUBLE) / peak_j, 6) AS peak_period_days,
       round(g, 6) AS g_stat,
       round(least(1.0, greatest(0.0, pv)), 6) AS p_value
FROM p
"""


@register("ts_fisher_g", _FG_ORACLE)
def ts_fisher_g(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher's g test for a hidden periodicity (Fisher 1929): the
    largest periodogram ordinate of the demeaned daily series as a
    fraction of the total, g = max_j I_j / sum_j I_j over the Fourier
    frequencies j = 1..floor((n-1)/2); under Gaussian white noise the
    exact null is P(g > g0) = sum_k (-1)^(k-1) C(m,k)(1-k*g0)^(m-1),
    evaluated here to its first THREE terms (the alternating series'
    truncation error is bounded by term 4 — negligible except when g is
    so small that p ~ 1 anyway; both engines spell the identical
    truncation, and the result clamps to [0,1]). Reports the winning
    frequency and its period in days — the TEST behind
    ts_fourier_seasonal_fit's assumed-period harmonic fit. Ordinates
    round to 6dp before the argmax (ties to the smallest j), so the
    peak pick is deterministic cross-engine. Scale: the series is
    calendar-grain, so the (t, j) grid is bounded (n * n/2 rows per
    key) and the periodogram is one hash-agg over it; nothing but the
    daily reduction touches raw data volume."""
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
    wt = Window.partitionBy("event_type")
    seq = daily.select(
        "event_type",
        F.row_number().over(wt.orderBy("d")).alias("t"),
        F.count(F.lit(1)).over(wt).alias("n"),
        (F.col("m") - F.avg("m").over(wt)).alias("x"),
    )
    jj = seq.select(
        "event_type",
        "t",
        "n",
        "x",
        F.explode(
            F.sequence(F.lit(1), F.floor((F.col("n") - 1) / 2.0).cast("int"))
        ).alias("j"),
    )
    ang = 2 * math.pi * F.col("j") * F.col("t") / F.col("n")
    per = jj.groupBy("event_type", "j").agg(
        F.max("n").cast("bigint").alias("n"),
        F.round(
            F.pow(F.sum(F.col("x") * F.cos(ang)), 2)
            + F.pow(F.sum(F.col("x") * F.sin(ang)), 2),
            6,
        ).alias("i"),
    )
    g = per.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.max("n").alias("n"),
        (F.max("i") / F.sum("i")).alias("g"),
        F.min_by("j", F.struct((-F.col("i")).alias("ni"), F.col("j"))).alias(
            "peak_j"
        ),
    )
    m, gg = F.col("m").cast("double"), F.col("g")
    pv = (
        m * F.pow(F.greatest(F.lit(0.0), 1 - gg), m - 1)
        - m * (m - 1) / 2.0 * F.pow(F.greatest(F.lit(0.0), 1 - 2 * gg), m - 1)
        + m
        * (m - 1)
        * (m - 2)
        / 6.0
        * F.pow(F.greatest(F.lit(0.0), 1 - 3 * gg), m - 1)
    )
    return g.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        F.col("m").cast("int").alias("n_freqs"),
        F.col("peak_j").cast("int").alias("peak_freq"),
        F.round(F.col("n").cast("double") / F.col("peak_j"), 6).alias(
            "peak_period_days"
        ),
        F.round("g", 6).alias("g_stat"),
        F.round(F.least(F.lit(1.0), F.greatest(F.lit(0.0), pv)), 6).alias(
            "p_value"
        ),
    )


# ---------------------------------------------------------------------------
# stats_fligner_killeen — normal-scores scale test on the 64-bin grid
# ---------------------------------------------------------------------------

_FK_BINS = 64

# Abramowitz & Stegun 26.2.22 inverse-normal rational approximation
# (|error| < 3e-3 over (0,1)); spelled IDENTICALLY in both engines so the
# scores — and therefore the statistic — agree cross-engine exactly.
_FK_PROBIT_SQL = """(CASE WHEN {p} <= 0.5
  THEN -(sqrt(-2 * ln({p}))
         - (2.30753 + 0.27061 * sqrt(-2 * ln({p})))
           / (1 + 0.99229 * sqrt(-2 * ln({p}))
                + 0.04481 * (-2 * ln({p}))))
  ELSE (sqrt(-2 * ln(1 - {p}))
        - (2.30753 + 0.27061 * sqrt(-2 * ln(1 - {p})))
          / (1 + 0.99229 * sqrt(-2 * ln(1 - {p}))
               + 0.04481 * (-2 * ln(1 - {p})))) END)"""


def _fk_probit(p):
    t_lo = F.sqrt(-2 * F.log(p))
    t_hi = F.sqrt(-2 * F.log(1 - p))
    lo = -(
        t_lo
        - (2.30753 + 0.27061 * t_lo)
        / (1 + 0.99229 * t_lo + 0.04481 * (-2 * F.log(p)))
    )
    hi = t_hi - (2.30753 + 0.27061 * t_hi) / (
        1 + 0.99229 * t_hi + 0.04481 * (-2 * F.log(1 - p))
    )
    return F.when(p <= 0.5, lo).otherwise(hi)


_FK_ORACLE = f"""
WITH base AS (SELECT event_type AS g, value AS x FROM events),
vg AS (SELECT g, x AS v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1, 2),
vc AS (
  SELECT g, v, c,
         sum(c) OVER (PARTITION BY g ORDER BY v ROWS UNBOUNDED PRECEDING)
           AS cc,
         sum(c) OVER (PARTITION BY g) AS ng
  FROM vg
),
med AS (
  SELECT g, min(v) AS med FROM vc
  WHERE cc >= CAST(ceil(ng / 2.0) AS BIGINT) GROUP BY g
),
dev AS (
  SELECT base.g, abs(x - med) AS dx FROM base JOIN med USING (g)
),
rng AS (SELECT max(dx) AS hi FROM dev),
cells AS (
  SELECT g, least({_FK_BINS - 1},
                  CAST(floor(dx / hi * {_FK_BINS}) AS BIGINT)) AS b,
         CAST(count(*) AS BIGINT) AS c
  FROM dev, rng GROUP BY 1, 2
),
pooled AS (
  SELECT b, CAST(sum(c) AS BIGINT) AS t FROM cells GROUP BY b
),
pc AS (
  SELECT b, t,
         sum(t) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS cumt,
         sum(t) OVER () AS nn
  FROM pooled
),
sc AS (
  SELECT b, t, nn,
         {_FK_PROBIT_SQL.format(p="(0.5 + (cumt - t + (t + 1) / 2.0) / (2 * (nn + 1)))")}
           AS a
  FROM pc
),
ga AS (
  SELECT cells.g, CAST(sum(cells.c) AS DOUBLE) AS ng,
         sum(cells.c * sc.a) / sum(cells.c) AS ag
  FROM cells JOIN sc USING (b) GROUP BY cells.g
),
tots AS (
  SELECT sum(t * a) / max(nn) AS abar,
         sum(t * a * a) AS saa, sum(t * a) AS sa,
         CAST(max(nn) AS DOUBLE) AS nn
  FROM sc
),
stat AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         sum(ng * (ag - abar) * (ag - abar))
           / ((saa - sa * sa / nn) / (nn - 1)) AS fk
  FROM ga CROSS JOIN tots
  GROUP BY abar, saa, sa, nn
),
z AS (
  SELECT k, fk, CAST(k - 1 AS DOUBLE) AS dfree,
         (pow(fk / (k - 1), 1.0 / 3) - (1 - 2.0 / (9 * (k - 1))))
           / sqrt(2.0 / (9 * (k - 1))) AS zq
  FROM stat
)
SELECT CAST(k AS INT) AS k_groups, round(fk, 6) AS fk_stat,
       CAST(dfree AS INT) AS df,
       round({_normal_sf_sql('zq')}, 6) AS p_value
FROM z
"""


@register("stats_fligner_killeen", _FK_ORACLE)
def stats_fligner_killeen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fligner-Killeen normal-scores test of variance homogeneity
    (1976; the scale test with the most robust size under non-normal
    data — R's default `fligner.test`): center each group's values on
    its own exact MEDIAN, pool the absolute deviations, rank them, map
    midranks to half-normal scores a = probit(1/2 + r/(2(N+1))), and
    chi-square the group mean scores: FK = sum n_g (abar_g - abar)^2 /
    V, df = k-1 (Wilson-Hilferty p, the cochran_q pattern). The probit
    is the A&S 26.2.22 rational approximation spelled identically in
    both engines, so scores agree exactly. Deviations quantize to a
    64-bin grid (the brunner_munzel pattern) so midranks are
    tie-identical cross-engine; group medians are EXACT from per-group
    distinct-value grids (per-group partitioned windows — parallel
    across groups). Scale: one value-grid hash-agg per pass, a bounded
    64-row score grid, and k-row arithmetic — the deviation pass is
    the only other data-proportional stage."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(F.col("event_type").alias("g"), F.col("value").alias("x"))
    vg = base.groupBy("g", F.col("x").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wg = Window.partitionBy("g")
    vc = vg.select(
        "g",
        "v",
        "c",
        F.sum("c")
        .over(wg.orderBy("v").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cc"),
        F.sum("c").over(wg).alias("ng"),
    )
    med = (
        vc.filter(F.col("cc") >= F.ceil(F.col("ng") / 2.0).cast("bigint"))
        .groupBy("g")
        .agg(F.min("v").alias("med"))
    )
    dev = base.join(F.broadcast(med), "g").select(
        "g", F.abs(F.col("x") - F.col("med")).alias("dx")
    )
    rng = dev.agg(F.max("dx").alias("hi"))
    cells = (
        dev.crossJoin(F.broadcast(rng))
        .select(
            "g",
            F.least(
                F.lit(_FK_BINS - 1),
                F.floor(F.col("dx") / F.col("hi") * _FK_BINS),
            ).alias("b"),
        )
        .groupBy("g", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    pooled = cells.groupBy("b").agg(F.sum("c").cast("bigint").alias("t"))
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    pc = pooled.select(
        "b",
        "t",
        F.sum("t").over(wb).alias("cumt"),
        F.sum("t").over(
            Window.orderBy("b").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("nn"),
    )
    rmid = (F.col("cumt") - F.col("t") + (F.col("t") + 1) / 2.0)
    sc = pc.select(
        "b",
        "t",
        "nn",
        _fk_probit(0.5 + rmid / (2 * (F.col("nn") + 1))).alias("a"),
    )
    ga = (
        cells.join(F.broadcast(sc.select("b", "a")), "b")
        .groupBy("g")
        .agg(
            F.sum("c").cast("double").alias("ng"),
            (F.sum(F.col("c") * F.col("a")) / F.sum("c")).alias("ag"),
        )
    )
    tots = sc.agg(
        (F.sum(F.col("t") * F.col("a")) / F.max("nn")).alias("abar"),
        F.sum(F.col("t") * F.col("a") * F.col("a")).alias("saa"),
        F.sum(F.col("t") * F.col("a")).alias("sa"),
        F.max("nn").cast("double").alias("nn"),
    )
    fk = (
        ga.crossJoin(F.broadcast(tots))
        .groupBy("abar", "saa", "sa", "nn")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k"),
            F.sum(
                F.col("ng") * (F.col("ag") - F.col("abar")) * (F.col("ag") - F.col("abar"))
            ).alias("num"),
        )
        .select(
            "k",
            (
                F.col("num")
                / (
                    (F.col("saa") - F.col("sa") * F.col("sa") / F.col("nn"))
                    / (F.col("nn") - 1)
                )
            ).alias("fk"),
        )
    )
    dfree = (F.col("k") - 1).cast("double")
    zq = (
        F.pow(F.col("fk") / dfree, F.lit(1.0 / 3)) - (1 - 2.0 / (9 * dfree))
    ) / F.sqrt(2.0 / (9 * dfree))
    return fk.select(
        F.col("k").cast("int").alias("k_groups"),
        F.round("fk", 6).alias("fk_stat"),
        dfree.cast("int").alias("df"),
        F.round(_normal_sf(zq), 6).alias("p_value"),
    )
