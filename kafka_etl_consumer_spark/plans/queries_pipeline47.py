"""Query surface batch 51 (round 9, fourth wave): circular statistics
and robust location estimation.

- stats_rayleigh_uniformity — Rayleigh test per event type: are event
  times uniform around the 24h clock, or is there a daily phase
  concentration? First member of the circular-statistics family (the
  hour-grid audit counts slots; this tests the DISTRIBUTION on the
  circle).
- stats_hodges_lehmann — the one-sample Hodges-Lehmann pseudo-median
  of the event value (median of all Walsh averages (x_i + x_j)/2,
  i <= j): the robust location estimate behind the Wilcoxon
  signed-rank test, companion to stats_brunner_munzel's comparison.

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283 of mykidong/kafka-etl-consumer).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# stats_rayleigh_uniformity — daily-phase concentration per event type
# ---------------------------------------------------------------------------

_RAY_ORACLE = f"""
WITH ang AS (
  SELECT event_type,
         2 * {math.pi!r} * (extract(hour FROM CAST(ts AS TIMESTAMP)) * 3600
             + extract(minute FROM CAST(ts AS TIMESTAMP)) * 60
             + extract(second FROM CAST(ts AS TIMESTAMP))) / 86400.0 AS th
  FROM events
),
s AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
         sum(cos(th)) AS sc, sum(sin(th)) AS ss
  FROM ang GROUP BY event_type
),
r AS (
  SELECT event_type, n, sqrt(sc * sc + ss * ss) / n AS rbar,
         (sc * sc + ss * ss) / n AS z
  FROM s
)
SELECT event_type, CAST(n AS BIGINT) AS n_events,
       round(rbar, 6) AS r_bar,
       round(z, 6) AS z_stat,
       round(least(1.0, greatest(0.0, exp(-z) * (1 + (2 * z - z * z) / (4 * n)
             - (24 * z - 132 * z * z + 76 * z * z * z - 9 * z * z * z * z)
               / (288 * n * n)))), 6) AS p_value
FROM r
"""


@register("stats_rayleigh_uniformity", _RAY_ORACLE)
def stats_rayleigh_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rayleigh test of circular uniformity (Lord Rayleigh 1880; the
    standard first test of any periodic phenomenon): map each event's
    time-of-day to an angle on the 24h circle, compute the resultant
    length R_bar = |sum e^(i*theta)|/n, and test z = n*R_bar^2 with the
    exact small-sample correction p = exp(-z)(1 + (2z - z^2)/(4n) -
    (24z - 132z^2 + 76z^3 - 9z^4)/(288n^2)) (Zar, Biostatistical
    Analysis). A significant result means events cluster at a daily
    phase — the circular complement to audit_hour_completeness' slot
    counting. Second-precision angles (identical integer arithmetic in
    both engines before the single trig call per row). Scale: one
    map-side-combined hash-agg of (cos, sin) sums per key; everything
    after is k-row arithmetic."""
    ev = _t(spark, sf_dir, "events")
    th = (
        2
        * math.pi
        * (F.hour("ts") * 3600 + F.minute("ts") * 60 + F.second("ts"))
        / 86400.0
    )
    s = (
        ev.select("event_type", th.alias("th"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(F.cos("th")).alias("sc"),
            F.sum(F.sin("th")).alias("ss"),
        )
    )
    n = F.col("n")
    z = (F.col("sc") * F.col("sc") + F.col("ss") * F.col("ss")) / n
    rbar = F.sqrt(F.col("sc") * F.col("sc") + F.col("ss") * F.col("ss")) / n
    p = F.exp(-z) * (
        1
        + (2 * z - z * z) / (4 * n)
        - (24 * z - 132 * z * z + 76 * z * z * z - 9 * z * z * z * z)
        / (288 * n * n)
    )
    return s.select(
        "event_type",
        n.cast("bigint").alias("n_events"),
        F.round(rbar, 6).alias("r_bar"),
        F.round(z, 6).alias("z_stat"),
        # the correction series can dip below 0 at extreme z (the z^4
        # term) where the true p is ~0 — clamp to [0, 1] in BOTH engines
        F.round(F.least(F.lit(1.0), F.greatest(F.lit(0.0), p)), 6).alias(
            "p_value"
        ),
    )


# ---------------------------------------------------------------------------
# stats_hodges_lehmann — pseudo-median via histogram self-convolution
# ---------------------------------------------------------------------------

_HL_BINS = 64

_HL_ORACLE = f"""
WITH base AS (SELECT value AS x FROM events),
rng AS (SELECT min(x) AS lo, max(x) AS hi FROM base),
cells AS (
  SELECT least({_HL_BINS - 1},
               CAST(floor((x - lo) / (hi - lo) * {_HL_BINS}) AS BIGINT)) AS b,
         CAST(count(*) AS BIGINT) AS c
  FROM base, rng GROUP BY 1
),
mids AS (
  SELECT b, c, lo + (b + 0.5) * (hi - lo) / {_HL_BINS} AS mid
  FROM cells, rng
),
pairs AS (
  SELECT round((a.mid + b.mid) / 2, 9) AS walsh,
         CASE WHEN a.b = b.b THEN a.c * (a.c + 1) / 2
              ELSE a.c * b.c END AS w
  FROM mids a JOIN mids b ON b.b >= a.b
),
agg AS (SELECT walsh, CAST(sum(w) AS BIGINT) AS w FROM pairs GROUP BY walsh),
cum AS (
  SELECT walsh, w,
         sum(w) OVER (ORDER BY walsh ROWS UNBOUNDED PRECEDING) AS cw
  FROM agg
),
tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM agg),
nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells)
SELECT n AS n_events,
       round((SELECT min(walsh) FROM cum, tot
              WHERE cw >= CAST(ceil(tw / 2.0) AS BIGINT)), 6) AS pseudo_median
FROM nn
"""


@register("stats_hodges_lehmann", _HL_ORACLE)
def stats_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sample Hodges-Lehmann estimator (1963): the median of all
    Walsh averages (x_i + x_j)/2 over i <= j — the location estimate
    the Wilcoxon signed-rank test inverts, with a ~29% breakdown point
    and far better efficiency than the median under near-normal data.
    KEY scale identity: naively this is an n^2/2 pair enumeration; on
    the 64-bin grid the Walsh-average DISTRIBUTION is the histogram's
    self-convolution — <=64*65/2 weighted rows (diagonal cells weigh
    c(c+1)/2, off-diagonal c_i*c_j) — and the weighted median is one
    bounded cumulative window. Bin midpoints replace values (the
    stats_brunner_munzel quantization, spelled identically in the
    oracle); averages round to 9dp before the median pick so the
    argmin cell is deterministic cross-engine."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(F.col("value").alias("x"))
    rng = base.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    cells = (
        base.crossJoin(F.broadcast(rng))
        .select(
            F.least(
                F.lit(_HL_BINS - 1),
                F.floor(
                    (F.col("x") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * _HL_BINS
                ),
            ).alias("b")
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .crossJoin(F.broadcast(rng))
        .select(
            "b",
            "c",
            (
                F.col("lo")
                + (F.col("b") + 0.5) * (F.col("hi") - F.col("lo")) / _HL_BINS
            ).alias("mid"),
        )
    )
    a = cells.select(
        F.col("b").alias("ba"), F.col("c").alias("ca"), F.col("mid").alias("ma")
    )
    b = cells.select(
        F.col("b").alias("bb"), F.col("c").alias("cb"), F.col("mid").alias("mb")
    )
    pairs = (
        a.join(F.broadcast(b), F.col("bb") >= F.col("ba"))
        .select(
            F.round((F.col("ma") + F.col("mb")) / 2, 9).alias("walsh"),
            F.when(
                F.col("ba") == F.col("bb"),
                F.col("ca") * (F.col("ca") + 1) / 2,
            )
            .otherwise(F.col("ca") * F.col("cb"))
            .alias("w"),
        )
        .groupBy("walsh")
        .agg(F.sum("w").cast("bigint").alias("w"))
    )
    cum = pairs.select(
        "walsh",
        "w",
        F.sum("w")
        .over(Window.orderBy("walsh").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cw"),
    )
    tot = pairs.agg(F.sum("w").cast("bigint").alias("tw"))
    hl = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("cw") >= F.ceil(F.col("tw") / 2.0).cast("bigint"))
        .agg(F.min("walsh").alias("hl"))
    )
    nn = cells.agg(F.sum("c").cast("bigint").alias("n_events"))
    return nn.crossJoin(F.broadcast(hl)).select(
        "n_events", F.round("hl", 6).alias("pseudo_median")
    )
