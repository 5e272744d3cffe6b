"""Query surface batch 23 (round 4): seasonal exponential smoothing.

ts_holtwinters_additive — additive Holt-Winters (level + trend +
period-7 seasonality) over the daily event-count series per event type:
the seasonal-aware upgrade of ts_holt_linear, and the standard one-step
forecaster for weekly-cycled operational metrics. The inherently
sequential fold runs as an Arrow-batched grouped map AFTER the series
has been reduced to day grain (operators/timeseries.py
holt_winters_last); the recursive-CTE oracle replays the exact IEEE op
order, seasonal ring buffer included.

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.registry import _t, register

_HW_ORACLE = """
WITH RECURSIVE daily AS (
  SELECT event_type AS k, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
         CAST(count(*) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2
),
seq AS (
  SELECT k, x, row_number() OVER (PARTITION BY k ORDER BY d) AS rn,
         count(*) OVER (PARTITION BY k) AS n
  FROM daily
),
ok AS (SELECT * FROM seq WHERE n >= 8),
cnt AS (SELECT k, CAST(max(n) AS BIGINT) AS n FROM ok GROUP BY k),
init AS (SELECT k, list(x ORDER BY rn) AS xs FROM ok WHERE rn <= 7 GROUP BY k),
f(k, rn, l, b, s) AS (
  SELECT k, CAST(7 AS BIGINT) AS rn,
         (xs[1]+xs[2]+xs[3]+xs[4]+xs[5]+xs[6]+xs[7]) / 7.0 AS l,
         CAST(0 AS DOUBLE) AS b,
         list_transform(xs,
             v -> v - (xs[1]+xs[2]+xs[3]+xs[4]+xs[5]+xs[6]+xs[7]) / 7.0) AS s
  FROM init
  UNION ALL
  SELECT q.k, f.rn + 1,
         0.4 * (q.x - f.s[1]) + (CAST(1 AS DOUBLE) - 0.4) * (f.l + f.b),
         0.3 * ((0.4 * (q.x - f.s[1])
                 + (CAST(1 AS DOUBLE) - 0.4) * (f.l + f.b)) - f.l)
             + (CAST(1 AS DOUBLE) - 0.3) * f.b,
         list_append(f.s[2:],
             0.2 * (q.x - (0.4 * (q.x - f.s[1])
                           + (CAST(1 AS DOUBLE) - 0.4) * (f.l + f.b)))
                 + (CAST(1 AS DOUBLE) - 0.2) * f.s[1])
  FROM f JOIN ok q ON q.k = f.k AND q.rn = f.rn + 1
)
SELECT f.k AS event_type, cnt.n AS n_days,
       round(f.l, 6) AS level, round(f.b, 6) AS trend,
       round(f.l + f.b + f.s[1], 6) AS forecast_1
FROM f JOIN cnt ON cnt.k = f.k WHERE f.rn = cnt.n
"""


@register("ts_holtwinters_additive", _HW_ORACLE)
def ts_holtwinters_additive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters (alpha=0.4, beta=0.3, gamma=0.2, m=7) over
    daily event counts per type. Scale: events reduce to the (type,
    day) grain in ONE partial-combining hash-agg BEFORE the sequential
    fold, so each applyInPandas group is |days| rows regardless of raw
    volume; the seasonal ring buffer is m doubles of state per key.
    The oracle's recursive CTE carries the same ring buffer as a LIST
    and inlines the level expression into the trend/seasonal updates,
    replaying the identical IEEE sequence."""
    from kafka_etl_consumer_spark.operators.timeseries import (
        holt_winters_last,
    )

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("k"),
        F.to_date(F.col("ts").cast("timestamp")).alias("d"),
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    res = holt_winters_last(
        daily, alpha=0.4, beta=0.3, gamma=0.2, period=7,
        key_col="k", order_col="d", value_col="x",
    )
    return res.select(
        F.col("k").alias("event_type"),
        F.col("n_rows").alias("n_days"),
        "level",
        "trend",
        "forecast_1",
    )
