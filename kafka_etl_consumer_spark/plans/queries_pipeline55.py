"""Query surface batch 59 (round 10, sixth wave): residual
autocorrelation, outlier testing, and two-sample scale comparison.

- stats_durbin_watson — Durbin-Watson d on the residuals of a per-key
  linear trend fit of the daily-mean series, with the Savin-White
  dL/dU 5% bounds table (k'=1) as a broadcast literal.
- stats_grubbs_max — Grubbs' two-sided max-outlier test per event type
  with the critical value from a deterministic Cornish-Fisher
  t-quantile expansion (A&S 26.7.5) on the shared A&S probit.
- stats_ansari_bradley — Ansari-Bradley two-sample scale test,
  purchase vs view values, median-aligned then binned to the shared
  64-cell grid; both-ends midrank scores in exact closed form.

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283 of mykidong/kafka-etl-consumer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.queries_pipeline33 import (
    _normal_sf,
    _normal_sf_sql,
)
from kafka_etl_consumer_spark.plans.queries_pipeline48 import (
    _FK_PROBIT_SQL,
    _fk_probit,
)
from kafka_etl_consumer_spark.plans.registry import _t, register, scalar_barrier

# ---------------------------------------------------------------------------
# stats_durbin_watson — DW d on detrended daily means + Savin-White bounds
# ---------------------------------------------------------------------------

# Savin & White (1977) 5% significance bounds for the DW statistic with
# one regressor plus intercept (k' = 1). The row with the largest
# tabulated n <= the series length applies (bounds tighten as n grows,
# so rounding n DOWN keeps the inconclusive band conservative).
_DW_TABLE = [
    (15, 1.077, 1.361),
    (20, 1.201, 1.411),
    (25, 1.288, 1.454),
    (30, 1.352, 1.489),
    (40, 1.442, 1.544),
    (50, 1.503, 1.585),
    (60, 1.549, 1.616),
    (80, 1.611, 1.662),
    (100, 1.654, 1.694),
]

_DW_VERDICT_SQL = """CASE
  WHEN d < dl THEN 'positive'
  WHEN d <= du THEN 'inconclusive'
  WHEN d < 4 - du THEN 'none'
  WHEN d <= 4 - dl THEN 'inconclusive'
  ELSE 'negative' END"""

_DW_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
         round(avg(value), 6) AS m
  FROM events GROUP BY 1, 2
),
seq AS (
  SELECT event_type, m,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
              AS DOUBLE) AS t
  FROM daily
),
sums AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
         sum(t) AS st, sum(m) AS sy,
         sum(t * t) AS stt, sum(t * m) AS sty
  FROM seq GROUP BY event_type
),
fit AS (
  SELECT event_type, n,
         (n * sty - st * sy) / (n * stt - st * st) AS b,
         (sy - (n * sty - st * sy) / (n * stt - st * st) * st) / n AS a
  FROM sums
),
res AS (
  SELECT seq.event_type, t, m - a - b * t AS e, n, b
  FROM seq JOIN fit USING (event_type)
),
lagd AS (
  SELECT event_type, n, b, e,
         e - lag(e) OVER (PARTITION BY event_type ORDER BY t) AS de
  FROM res
),
dw AS (
  SELECT event_type, CAST(max(n) AS BIGINT) AS n_days,
         max(b) AS b,
         sum(de * de) / sum(e * e) AS d
  FROM lagd GROUP BY event_type
),
tbl AS (
  SELECT * FROM (VALUES {", ".join(f"({tn}, {dl}, {du})" for tn, dl, du in _DW_TABLE)})
           t(tn, dl, du)
),
pick AS (
  SELECT dw.*, tbl.tn, tbl.dl, tbl.du,
         row_number() OVER (PARTITION BY event_type ORDER BY tn DESC) AS rk
  FROM dw JOIN tbl ON tbl.tn <= dw.n_days
)
SELECT event_type, n_days, round(b, 6) AS trend_slope,
       round(d, 6) AS dw_stat,
       CAST(tn AS INT) AS table_n, dl AS d_lower, du AS d_upper,
       {_DW_VERDICT_SQL} AS verdict
FROM pick WHERE rk = 1
ORDER BY event_type
"""


@register("stats_durbin_watson", _DW_ORACLE)
def stats_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson first-order autocorrelation test (Durbin & Watson
    1950/51) on the residuals of a per-event-type linear trend fit of
    the daily-mean series: d = sum (e_t - e_{{t-1}})^2 / sum e_t^2 in
    [0, 4], ~2 for uncorrelated residuals. The fit is the closed-form
    simple regression m ~ a + b*t (one hash-agg of five sufficient
    sums, the ml_ols_normal_eq discipline — no iterative optimizer),
    residuals come from one join + one lag window over the
    calendar-bounded daily grain, and the verdict compares d against
    the Savin-White (1977) 5% dL/dU bounds for k'=1, embedded as a
    VALUES literal in both engines with the largest tabulated n <= the
    series length (bounds tighten in n, so rounding down widens the
    inconclusive band — the conservative direction; the classic
    inconclusive region is the reason the output carries both bounds).
    Daily means quantize to 6dp before the fit (the shared series
    substrate), d is a RATIO of residual sums so accumulation-order
    float noise divides out, and the verdict CASE is spelled
    identically cross-engine. Scale: the daily reduction is the only
    data-proportional stage; everything after runs on |days| rows per
    key and a 9-row broadcast table."""
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
    seq = daily.select(
        "event_type",
        "m",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("d"))
        .cast("double")
        .alias("t"),
    )
    t, m = F.col("t"), F.col("m")
    sums = seq.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(t).alias("st"),
        F.sum(m).alias("sy"),
        F.sum(t * t).alias("stt"),
        F.sum(t * m).alias("sty"),
    )
    b = (F.col("n") * F.col("sty") - F.col("st") * F.col("sy")) / (
        F.col("n") * F.col("stt") - F.col("st") * F.col("st")
    )
    fit = sums.select(
        "event_type",
        "n",
        b.alias("b"),
        ((F.col("sy") - b * F.col("st")) / F.col("n")).alias("a"),
    )
    res = seq.join(fit, "event_type").select(
        "event_type",
        "t",
        "n",
        "b",
        (m - F.col("a") - F.col("b") * t).alias("e"),
    )
    lagd = res.select(
        "event_type",
        "n",
        "b",
        "e",
        (
            F.col("e")
            - F.lag("e").over(Window.partitionBy("event_type").orderBy("t"))
        ).alias("de"),
    )
    dw = lagd.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_days"),
        F.max("b").alias("b"),
        (F.sum(F.col("de") * F.col("de")) / F.sum(F.col("e") * F.col("e"))).alias(
            "d"
        ),
    )
    tbl = spark.createDataFrame(_DW_TABLE, ["tn", "dl", "du"])
    pick = (
        dw.join(F.broadcast(tbl), F.col("tn") <= F.col("n_days"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(F.col("tn").desc())
            ),
        )
        .filter(F.col("rk") == 1)
    )
    d, dl, du = F.col("d"), F.col("dl"), F.col("du")
    verdict = (
        F.when(d < dl, "positive")
        .when(d <= du, "inconclusive")
        .when(d < 4 - du, "none")
        .when(d <= 4 - dl, "inconclusive")
        .otherwise("negative")
    )
    return pick.select(
        "event_type",
        "n_days",
        F.round("b", 6).alias("trend_slope"),
        F.round("d", 6).alias("dw_stat"),
        F.col("tn").cast("int").alias("table_n"),
        dl.alias("d_lower"),
        du.alias("d_upper"),
        verdict.alias("verdict"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# stats_grubbs_max — two-sided Grubbs outlier test per event type
# ---------------------------------------------------------------------------

_GRUBBS_ALPHA = 0.05

# Cornish-Fisher asymptotic expansion of the Student-t quantile around
# the normal quantile z (A&S 26.7.5, four correction terms); at the
# fixture's df = n-2 = 28 the truncation error is < 2e-4, and both
# engines evaluate the identical polynomial so the critical value is
# cross-engine deterministic. The underlying probit is the shared A&S
# 26.2.22 rational approximation (|err| < 3e-3, documented there).
_T_QUANTILE_SQL = """(
  {z} + ({z} * {z} * {z} + {z}) / (4 * {v})
      + (5 * pow({z}, 5) + 16 * {z} * {z} * {z} + 3 * {z}) / (96 * {v} * {v})
      + (3 * pow({z}, 7) + 19 * pow({z}, 5) + 17 * {z} * {z} * {z}
         - 15 * {z}) / (384 * pow({v}, 3))
      + (79 * pow({z}, 9) + 776 * pow({z}, 7) + 1482 * pow({z}, 5)
         - 1920 * {z} * {z} * {z} - 945 * {z}) / (92160 * pow({v}, 4)))"""


def _t_quantile(z, v):
    return (
        z
        + (z * z * z + z) / (4 * v)
        + (5 * F.pow(z, 5) + 16 * z * z * z + 3 * z) / (96 * v * v)
        + (3 * F.pow(z, 7) + 19 * F.pow(z, 5) + 17 * z * z * z - 15 * z)
        / (384 * F.pow(v, 3))
        + (
            79 * F.pow(z, 9)
            + 776 * F.pow(z, 7)
            + 1482 * F.pow(z, 5)
            - 1920 * z * z * z
            - 945 * z
        )
        / (92160 * F.pow(v, 4))
    )


_GRUBBS_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
         round(avg(value), 6) AS m
  FROM events GROUP BY 1, 2
),
mom AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
         avg(m) AS mu, stddev_samp(m) AS sd
  FROM daily GROUP BY event_type
),
dev AS (
  SELECT daily.event_type, d, m, n,
         round(abs(m - mu) / sd, 6) AS g,
         row_number() OVER (PARTITION BY daily.event_type
                            ORDER BY round(abs(m - mu) / sd, 6) DESC, d)
           AS rk
  FROM daily JOIN mom USING (event_type)
),
zc AS (
  SELECT event_type, d, m, n, g,
         {_FK_PROBIT_SQL.format(p=f"(1 - {_GRUBBS_ALPHA} / (2 * n))")} AS z
  FROM dev WHERE rk = 1
),
tq AS (
  SELECT event_type, d, m, n, g,
         {_T_QUANTILE_SQL.format(z="z", v="(n - 2)")} AS t
  FROM zc
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       strftime(d, '%Y-%m-%d') AS outlier_date,
       round(m, 6) AS outlier_value,
       g AS g_stat,
       round((n - 1) / sqrt(n) * sqrt(t * t / (n - 2 + t * t)), 6)
         AS g_crit,
       CAST(CASE WHEN g > round((n - 1) / sqrt(n)
                                * sqrt(t * t / (n - 2 + t * t)), 6)
                 THEN 1 ELSE 0 END AS INT) AS is_outlier
FROM tq
ORDER BY event_type
"""


@register("stats_grubbs_max", _GRUBBS_ORACLE)
def stats_grubbs_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' two-sided maximum-outlier test (Grubbs 1950) on the
    daily-mean series per event type: G = max |m - mean| / sd against
    G_crit = (n-1)/sqrt(n) * sqrt(t^2 / (n-2+t^2)) with t the
    1 - alpha/(2n) Student-t quantile at df = n-2. The t quantile has
    no closed form, so both engines evaluate the SAME deterministic
    Cornish-Fisher expansion (A&S 26.7.5, four terms, error < 2e-4 at
    df=28) around the shared A&S probit — the table-free analogue of
    stats_tukey_hsd's fixed-table approach, exact enough that the
    verdict boundary is stable (documented at the expansion). The
    candidate row is the argmax of the 6dp-QUANTIZED deviation with
    the date as tie-break, so the selected day is cross-engine
    deterministic even when two days tie; the date serializes as a
    yyyy-MM-dd string (the ts_pettitt convention). Scale: one daily
    hash-agg, one |days|-per-key moment pass, one bounded window —
    the test itself is scalar arithmetic on one row per key."""
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
    mom = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("m").alias("mu"),
        F.stddev_samp("m").alias("sd"),
    )
    g = F.round(F.abs(F.col("m") - F.col("mu")) / F.col("sd"), 6)
    dev = (
        daily.join(mom, "event_type")
        .select("event_type", "d", "m", "n", g.alias("g"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(
                    F.col("g").desc(), F.col("d")
                )
            ),
        )
        .filter(F.col("rk") == 1)
    )
    n = F.col("n")
    # Build the scalar chain probit -> t-quantile -> critical value behind
    # Generate barriers (scalar_barrier): inlined, the t-quantile's ~20
    # references to the ~100-node probit tree and the critical value's 4
    # references to the t-polynomial multiply into a 10^4-node plan that
    # cost 1.2 s of optimizer time + >3 s of codegen for 5 rows (measured
    # this round). Behind barriers each tree exists once; the arithmetic —
    # and therefore the 6dp-rounded result — is unchanged.
    dev = scalar_barrier(dev, __z=_fk_probit(1 - _GRUBBS_ALPHA / (2 * n)))
    dev = scalar_barrier(dev, __t=_t_quantile(F.col("__z"), n - 2))
    t = F.col("__t")
    g_crit = F.round(
        (n - 1) / F.sqrt(n) * F.sqrt(t * t / (n - 2 + t * t)), 6
    )
    dev = scalar_barrier(dev, __gc=g_crit)
    g_crit = F.col("__gc")
    return dev.select(
        "event_type",
        n.cast("bigint").alias("n_days"),
        F.date_format("d", "yyyy-MM-dd").alias("outlier_date"),
        F.round("m", 6).alias("outlier_value"),
        F.col("g").alias("g_stat"),
        g_crit.alias("g_crit"),
        (F.col("g") > g_crit).cast("int").alias("is_outlier"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# stats_ansari_bradley — two-sample scale test on the 64-bin grid
# ---------------------------------------------------------------------------

_AB_BINS = 64
_AB_G1, _AB_G2 = "purchase", "view"

_AB_ORACLE = f"""
WITH base AS (
  SELECT event_type AS g, value AS x FROM events
  WHERE event_type IN ('{_AB_G1}', '{_AB_G2}')
),
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
  SELECT base.g, x - med AS dx FROM base JOIN med USING (g)
),
rng AS (SELECT min(dx) AS lo, max(dx) AS hi FROM dev),
cells AS (
  SELECT g, least({_AB_BINS - 1},
                  CAST(floor((dx - lo) / (hi - lo) * {_AB_BINS}) AS BIGINT))
           AS b,
         CAST(count(*) AS BIGINT) AS c
  FROM dev, rng GROUP BY 1, 2
),
pooled AS (
  SELECT b, CAST(sum(c) AS BIGINT) AS t FROM cells GROUP BY b
),
tot AS (SELECT CAST(sum(t) AS BIGINT) AS nn FROM pooled),
pc AS (
  SELECT b, t,
         sum(t) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS cumt
  FROM pooled
),
sc AS (
  SELECT b, t, nn,
         cumt - t + 1 AS lo_r, cumt AS hi_r,
         CAST(floor((nn + 1) / 2.0) AS BIGINT) AS h
  FROM pc CROSS JOIN tot
),
ssum AS (
  SELECT b, t, nn,
         (CASE WHEN lo_r <= least(hi_r, h)
               THEN (lo_r + least(hi_r, h))
                    * (least(hi_r, h) - lo_r + 1) / 2.0
               ELSE 0 END)
         + (CASE WHEN greatest(lo_r, h + 1) <= hi_r
                 THEN (nn + 1) * (hi_r - greatest(lo_r, h + 1) + 1)
                      - (greatest(lo_r, h + 1) + hi_r)
                        * (hi_r - greatest(lo_r, h + 1) + 1) / 2.0
                 ELSE 0 END) AS s
  FROM sc
),
stat AS (
  SELECT sum(CASE WHEN cells.g = '{_AB_G1}' THEN cells.c * ssum.s / ssum.t
                  ELSE 0 END) AS w,
         sum(CASE WHEN cells.g = '{_AB_G1}' THEN cells.c ELSE 0 END) AS m1,
         sum(CASE WHEN cells.g = '{_AB_G2}' THEN cells.c ELSE 0 END) AS m2
  FROM cells JOIN ssum USING (b)
),
mom AS (
  SELECT sum(s) / max(nn) AS abar,
         sum(t * (s / t) * (s / t)) AS sa2,
         CAST(max(nn) AS DOUBLE) AS nn
  FROM ssum
),
z AS (
  SELECT m1, m2, w, m1 * abar AS ew,
         (w - m1 * abar)
           / sqrt(m1 * m2 * (sa2 - nn * abar * abar) / (nn * (nn - 1)))
           AS zv
  FROM stat CROSS JOIN mom
)
SELECT CAST(m1 AS BIGINT) AS n_{_AB_G1}, CAST(m2 AS BIGINT) AS n_{_AB_G2},
       round(w, 2) AS w_stat, round(ew, 2) AS e_w,
       round(zv, 6) AS z_stat,
       round(least(1.0, 2 * {_normal_sf_sql("abs(zv)")}), 6) AS p_value
FROM z
"""


@register("stats_ansari_bradley", _AB_ORACLE)
def stats_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ansari-Bradley two-sample scale test (1960), purchase vs view
    event values: ranks are assigned 1, 2, ... inward from BOTH ends
    of the pooled order, so W = sum of sample-1 scores is small when
    sample 1 carries the extremes (larger dispersion). Each group is
    median-ALIGNED first (exact per-group lower median from the
    distinct-value cumulative counts, the fligner_killeen substrate)
    because AB assumes equal locations, then centered values quantize
    to the shared {_AB_BINS}-cell grid so the tie structure is
    cross-engine identical. The per-cell score mass is the EXACT
    closed-form sum of min(r, N+1-r) over the cell's rank interval
    (two arithmetic series split at floor((N+1)/2) — all-integer
    until the final division, the tie-midrank generalization), and
    the normal reference uses the standard tie-corrected moments
    E[W] = m*abar, Var[W] = m*n*(sum t*a^2 - N*abar^2)/(N*(N-1))
    (Hollander & Wolfe eq. 5.4-5.6). p comes from the shared A&S
    erfc. Scale: one hash-agg to <= 2*{_AB_BINS} cells after a
    data-proportional distinct-value median pass; every window runs
    on the bounded grid."""
    ev = _t(spark, sf_dir, "events")
    base = ev.filter(F.col("event_type").isin(_AB_G1, _AB_G2)).select(
        F.col("event_type").alias("g"), F.col("value").alias("x")
    )
    vg = base.groupBy("g", F.col("x").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wg = Window.partitionBy("g").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    vc = vg.select(
        "g",
        "v",
        "c",
        F.sum("c").over(wg).alias("cc"),
        F.sum("c").over(Window.partitionBy("g")).alias("ng"),
    )
    med = (
        vc.filter(F.col("cc") >= F.ceil(F.col("ng") / 2.0).cast("bigint"))
        .groupBy("g")
        .agg(F.min("v").alias("med"))
    )
    dev = base.join(med, "g").select("g", (F.col("x") - F.col("med")).alias("dx"))
    rng = dev.agg(F.min("dx").alias("lo"), F.max("dx").alias("hi"))
    cells = (
        dev.crossJoin(F.broadcast(rng))
        .select(
            "g",
            F.least(
                F.lit(_AB_BINS - 1),
                F.floor(
                    (F.col("dx") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * _AB_BINS
                ),
            ).alias("b"),
        )
        .groupBy("g", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    pooled = cells.groupBy("b").agg(F.sum("c").cast("bigint").alias("t"))
    tot = pooled.agg(F.sum("t").cast("bigint").alias("nn"))
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    pc = pooled.select(
        "b",
        "t",
        F.sum("t").over(wb).alias("cumt"),
    ).crossJoin(F.broadcast(tot))
    lo_r = F.col("cumt") - F.col("t") + 1
    hi_r = F.col("cumt")
    h = F.floor((F.col("nn") + 1) / 2.0).cast("bigint")
    e1 = F.least(hi_r, h)
    b2 = F.greatest(lo_r, h + 1)
    s_asc = F.when(lo_r <= e1, (lo_r + e1) * (e1 - lo_r + 1) / 2.0).otherwise(
        0.0
    )
    s_desc = F.when(
        b2 <= hi_r,
        (F.col("nn") + 1) * (hi_r - b2 + 1) - (b2 + hi_r) * (hi_r - b2 + 1) / 2.0,
    ).otherwise(0.0)
    ssum = pc.select("b", "t", "nn", (s_asc + s_desc).alias("s"))
    stat = cells.join(ssum, "b").agg(
        F.sum(
            F.when(
                F.col("g") == _AB_G1, F.col("c") * F.col("s") / F.col("t")
            ).otherwise(0.0)
        ).alias("w"),
        F.sum(F.when(F.col("g") == _AB_G1, F.col("c")).otherwise(0)).alias("m1"),
        F.sum(F.when(F.col("g") == _AB_G2, F.col("c")).otherwise(0)).alias("m2"),
    )
    mom = ssum.agg(
        (F.sum("s") / F.max("nn")).alias("abar"),
        F.sum(F.col("t") * (F.col("s") / F.col("t")) * (F.col("s") / F.col("t"))).alias(
            "sa2"
        ),
        F.max("nn").cast("double").alias("nn"),
    )
    nn = F.col("nn")
    zv = (F.col("w") - F.col("m1") * F.col("abar")) / F.sqrt(
        F.col("m1")
        * F.col("m2")
        * (F.col("sa2") - nn * F.col("abar") * F.col("abar"))
        / (nn * (nn - 1))
    )
    z = stat.crossJoin(F.broadcast(mom)).select(
        F.col("m1").cast("bigint").alias(f"n_{_AB_G1}"),
        F.col("m2").cast("bigint").alias(f"n_{_AB_G2}"),
        F.round("w", 2).alias("w_stat"),
        F.round(F.col("m1") * F.col("abar"), 2).alias("e_w"),
        F.round(zv, 6).alias("z_stat"),
        F.round(F.least(F.lit(1.0), 2 * _normal_sf(F.abs(zv))), 6).alias(
            "p_value"
        ),
    )
    return z
