"""Query surface batch 53 (round 9, sixth wave): the seasonal
Mann-Kendall trend test.

- ts_seasonal_mann_kendall — Hirsch & Slack's seasonal form of the
  Mann-Kendall test per event type: compare days only WITHIN the same
  weekday season, so a strong weekly cycle cannot masquerade as (or
  mask) a monotone trend. The seasonal complement to ts_mann_kendall,
  exactly as ts_fourier_seasonal_fit complements ts_theilsen_trend.

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283 of mykidong/kafka-etl-consumer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.queries_pipeline33 import (
    _normal_sf,
    _normal_sf_sql,
)
from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# ts_seasonal_mann_kendall — within-weekday MK, summed across seasons
# ---------------------------------------------------------------------------

_SMK_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
         (CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
            - DATE '2024-01-01') % 7 AS season,
         round(avg(value), 6) AS m
  FROM events GROUP BY 1, 2, 3
),
pairs AS (
  SELECT a.event_type,
         CAST(sum(CASE WHEN b.m > a.m THEN 1
                       WHEN b.m < a.m THEN -1 ELSE 0 END) AS BIGINT) AS s
  FROM daily a JOIN daily b
    ON b.event_type = a.event_type AND b.season = a.season AND b.d > a.d
  GROUP BY a.event_type
),
cells AS (
  SELECT event_type, season, m, CAST(count(*) AS BIGINT) AS t
  FROM daily GROUP BY 1, 2, 3
),
seas AS (
  SELECT event_type, season, CAST(sum(t) AS BIGINT) AS ng,
         CAST(sum(CASE WHEN t > 1
                       THEN t * (t - 1) * (2 * t + 5) ELSE 0 END)
              AS BIGINT) AS tieg
  FROM cells GROUP BY 1, 2
),
v AS (
  SELECT event_type,
         CAST(sum(ng) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS n_seasons,
         sum((ng * (ng - 1.0) * (2 * ng + 5) - tieg) / 18.0) AS var_s
  FROM seas GROUP BY event_type
),
z AS (
  SELECT p.event_type, s, n, n_seasons, var_s,
         CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
              WHEN s < 0 THEN (s + 1) / sqrt(var_s)
              ELSE 0.0 END AS zmk
  FROM pairs p JOIN v USING (event_type)
),
az AS (SELECT *, abs(zmk) AS azmk FROM z)
SELECT event_type, n AS n_days, CAST(n_seasons AS INT) AS n_seasons,
       s AS s_stat, round(zmk, 6) AS z_stat,
       round(least(1.0, 2 * {_normal_sf_sql('azmk')}), 6) AS p_value,
       CASE WHEN s > 0 THEN 'increasing' WHEN s < 0 THEN 'decreasing'
            ELSE 'none' END AS trend
FROM az
"""


@register("ts_seasonal_mann_kendall", _SMK_ORACLE)
def ts_seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal Mann-Kendall (Hirsch & Slack 1984, independent-seasons
    form): partition each event type's daily series into weekday
    seasons, compute the MK S statistic from pairwise comparisons
    WITHIN each season only, and sum S and the tie-corrected null
    variances across seasons — so a weekly cycle contributes nothing
    to S and a genuine monotone drift accumulates across all seven
    seasons. z uses the standard continuity correction on the summed S.
    The season key is days-since-epoch mod 7 (identical integer
    arithmetic in both engines — no locale-dependent weekday names).
    Each season's tie term sums t(t-1)(2t+5) over its duplicated
    values, computed per (type, season, value) cell identically in
    both engines. Scale: the series is calendar-grain
    (<=30 rows/key/season here), so the within-season pair join is a
    bounded-grid operation; only the daily reduction touches raw
    volume. At longer horizons the pair join stays O(n_g^2) per season
    per key with n_g = weeks elapsed — still clock-bounded."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.to_date(F.date_trunc("day", "ts")).alias("d"),
            "value",
        )
        .groupBy("event_type", "d")
        .agg(F.round(F.avg("value"), 6).alias("m"))
        .select(
            "event_type",
            "d",
            (F.datediff(F.col("d"), F.lit("2024-01-01")) % 7).alias("season"),
            "m",
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.season") == F.col("a.season"))
            & (F.col("b.d") > F.col("a.d")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("b.m") > F.col("a.m"), 1)
                .when(F.col("b.m") < F.col("a.m"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s")
        )
    )
    cells = daily.groupBy("event_type", "season", "m").agg(
        F.count(F.lit(1)).cast("bigint").alias("t")
    )
    seas = cells.groupBy("event_type", "season").agg(
        F.sum("t").cast("bigint").alias("ng"),
        F.sum(
            F.when(
                F.col("t") > 1,
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("tieg"),
    )
    ng = F.col("ng").cast("double")
    v = seas.groupBy("event_type").agg(
        F.sum("ng").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_seasons"),
        F.sum(
            (ng * (ng - 1) * (2 * ng + 5) - F.col("tieg")) / 18.0
        ).alias("var_s"),
    )
    s = F.col("s")
    zmk = (
        F.when(s > 0, (s - 1) / F.sqrt(F.col("var_s")))
        .when(s < 0, (s + 1) / F.sqrt(F.col("var_s")))
        .otherwise(0.0)
    )
    return pairs.join(v, "event_type").select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("n_seasons").cast("int").alias("n_seasons"),
        F.col("s").alias("s_stat"),
        F.round(zmk, 6).alias("z_stat"),
        F.round(F.least(F.lit(1.0), 2 * _normal_sf(F.abs(zmk))), 6).alias(
            "p_value"
        ),
        F.when(s > 0, "increasing")
        .when(s < 0, "decreasing")
        .otherwise("none")
        .alias("trend"),
    )
