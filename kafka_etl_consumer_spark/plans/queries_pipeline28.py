"""Query surface batch 33 (round 4): burstiness, recency scoring,
robust anomaly days.

- Fano factor + burstiness index of daily event counts — is the
  arrival process Poisson-like (F~1), regular (F<1), or bursty (F>1)?
- exponentially time-decayed engagement score per user — the recency-
  weighted activity metric ranking/CRM systems use (yesterday counts
  ~ e^-lambda more than today)
- IQR-fence anomaly days — the robust (median-based) daily outlier
  screen beside the parametric z-score and CUSUM detectors

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283); these extend the driver-verified operator
families the brief requires. Every query carries an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# ts_burstiness_fano — F = var/mean and B = (sd - mean)/(sd + mean) of
# the daily count series per type, from exact integer moments.
# ---------------------------------------------------------------------------

_FANO_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
mo AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(c) AS BIGINT) AS sc, CAST(sum(c * c) AS BIGINT) AS scc
  FROM daily GROUP BY event_type
),
st AS (
  SELECT event_type, n,
         CAST(sc AS DOUBLE) / n AS mu,
         sqrt(CAST(n * scc - sc * sc AS DOUBLE) / (CAST(n AS DOUBLE) * n))
           AS sd
  FROM mo
)
SELECT event_type, n AS n_days,
       round(mu, 4) AS mean_daily,
       round(sd * sd / mu, 6) AS fano_factor,
       round((sd - mu) / (sd + mu), 6) AS burstiness
FROM st
"""


@register("ts_burstiness_fano", _FANO_ORACLE)
def ts_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (var/mean) and Goh-Barabasi burstiness of daily
    counts per type. Scale: ONE day-grain hash-agg then closed-form
    algebra on exact integer moments — nothing after the first agg
    scales with volume. F~1 is Poisson; F>>1 means batched/bursty
    arrivals (retry storms, bot bursts)."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.col("ts").cast("timestamp")).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    mo = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("scc"),
    )
    mu = F.col("sc").cast("double") / F.col("n")
    sd = F.sqrt(
        (F.col("n") * F.col("scc") - F.col("sc") * F.col("sc")).cast("double")
        / (F.col("n").cast("double") * F.col("n"))
    )
    return mo.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.round(mu, 4).alias("mean_daily"),
        F.round(sd * sd / mu, 6).alias("fano_factor"),
        F.round((sd - mu) / (sd + mu), 6).alias("burstiness"),
    )


# ---------------------------------------------------------------------------
# user_decay_engagement — score = sum exp(-lambda * days_since), with
# the horizon = global max event date; top 20 users. lambda = ln(2)/7
# (7-day half-life) spelled as 0.0990210257942779 in BOTH engines so
# the exponent arithmetic is identical.
# ---------------------------------------------------------------------------

_DECAY_L = 0.0990210257942779  # ln(2)/7, 7-day half-life

_DECAY_ORACLE = f"""
WITH e AS (
  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events
),
h AS (SELECT max(d) AS hd FROM e),
s AS (
  SELECT e.user_id,
         sum(exp(-{_DECAY_L} * (h.hd - e.d))) AS score,
         CAST(count(*) AS BIGINT) AS n_events
  FROM e CROSS JOIN h GROUP BY e.user_id
)
SELECT user_id, n_events, round(score, 6) AS decay_score
FROM s ORDER BY score DESC, user_id LIMIT 20
"""


@register("user_decay_engagement", _DECAY_ORACLE)
def user_decay_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 users by exponentially time-decayed activity (7-day
    half-life, anchored at the corpus horizon so the score is
    reproducible). Scale: the horizon is a one-row broadcast, the
    decayed sum partial-combines map-side in ONE user-grain agg, and
    the report is TakeOrderedAndProject. Same-day events contribute
    identical exp terms, so partial-sum ordering stays inside 6dp."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date(F.col("ts").cast("timestamp")).alias("d")
    )
    h = ev.agg(F.max("d").alias("hd"))
    s = (
        ev.crossJoin(F.broadcast(h))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.exp(-F.lit(_DECAY_L) * F.datediff("hd", "d"))
            ).alias("score"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )
    return (
        s.orderBy(F.col("score").desc(), "user_id")
        .limit(20)
        .select("user_id", "n_events", F.round("score", 6).alias("decay_score"))
    )


# ---------------------------------------------------------------------------
# ts_daily_anomaly_iqr — days whose count falls outside the 1.5-IQR
# Tukey fences of their type's daily distribution.
# ---------------------------------------------------------------------------

_IQR_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
q AS (
  SELECT event_type,
         quantile_cont(c, 0.25) AS q1, quantile_cont(c, 0.75) AS q3
  FROM daily GROUP BY event_type
)
SELECT daily.event_type, strftime(daily.d, '%Y-%m-%d') AS d, daily.c AS n_events,
       round(q.q1 - 1.5 * (q.q3 - q.q1), 4) AS lo_fence,
       round(q.q3 + 1.5 * (q.q3 - q.q1), 4) AS hi_fence,
       CASE WHEN daily.c > q.q3 + 1.5 * (q.q3 - q.q1) THEN 'high'
            ELSE 'low' END AS side
FROM daily JOIN q ON q.event_type = daily.event_type
WHERE daily.c < q.q1 - 1.5 * (q.q3 - q.q1)
   OR daily.c > q.q3 + 1.5 * (q.q3 - q.q1)
"""


@register("ts_daily_anomaly_iqr", _IQR_ORACLE)
def ts_daily_anomaly_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence anomaly days per event type — the robust outlier
    screen (quartiles don't move when the outlier itself grows, unlike
    the z-score's mean/sd). Scale: day-grain agg, per-type exact
    percentiles over the bounded day series (swap approx_percentile at
    100 TB of history), fence filter joins the 5-row quartile table
    back broadcast. Spark percentile() and DuckDB quantile_cont share
    interpolation semantics, so the fences are identical doubles."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.col("ts").cast("timestamp")).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    q = daily.groupBy("event_type").agg(
        F.percentile("c", 0.25).alias("q1"),
        F.percentile("c", 0.75).alias("q3"),
    )
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    j = daily.join(F.broadcast(q), "event_type")
    return j.filter((F.col("c") < lo) | (F.col("c") > hi)).select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        F.col("c").alias("n_events"),
        F.round(lo, 4).alias("lo_fence"),
        F.round(hi, 4).alias("hi_fence"),
        F.when(F.col("c") > hi, "high").otherwise("low").alias("side"),
    )
