"""Query surface batch 35 (round 4): audience algebra, multi-grain
reporting.

- exact audience-overlap matrix — user-set Jaccard between every pair
  of event types: the segmentation question ("do purchasers also
  error?") answered exactly; the ground truth the theta sketch
  (sketch_theta_set_ops) approximates
- one-pass multi-granularity revenue — day, week, and month rollups of
  the same measure from a SINGLE scan via GROUPING SETS over derived
  time buckets (three separate queries = three scans; Expand = one)

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283); these extend the driver-verified operator
families the brief requires. Every query carries an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# events_audience_overlap — |A n B| / |A u B| for every ordered pair of
# event types (a < b), from exact distinct user sets.
# ---------------------------------------------------------------------------

_AOV_ORACLE = """
WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
sz AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM tu GROUP BY 1),
ix AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
              CAST(count(*) AS BIGINT) AS n_both
       FROM tu a JOIN tu b ON a.user_id = b.user_id
                          AND a.event_type < b.event_type
       GROUP BY 1, 2)
SELECT ix.type_a, ix.type_b, sa.n AS n_a, sb.n AS n_b, ix.n_both,
       round(ix.n_both / CAST(sa.n + sb.n - ix.n_both AS DOUBLE), 6)
         AS jaccard
FROM ix JOIN sz sa ON sa.event_type = ix.type_a
        JOIN sz sb ON sb.event_type = ix.type_b
"""


@register("events_audience_overlap", _AOV_ORACLE)
def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact user-audience Jaccard for every event-type pair. Scale:
    events collapse to the distinct (type, user) grain first (ONE
    hash-agg), so the pair self-join fans each user out by their type
    count (<= |types|, bounded) — never a cross join of audiences; the
    matrix itself is |types|^2 rows. The theta-sketch variant
    (sketch_theta_set_ops) replaces the exact branch when audiences
    stop fitting."""
    ev = _t(spark, sf_dir, "events")
    tu = ev.select("event_type", "user_id").distinct()
    sz = tu.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), F.col("user_id").alias("u2"))
    ix = (
        a.join(b, (F.col("user_id") == F.col("u2")) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    return (
        ix.join(
            F.broadcast(sz.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))),
            "type_a",
        )
        .join(
            F.broadcast(sz.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            F.round(
                F.col("n_both")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# revenue_multi_grain — day/week/month revenue from ONE scan via
# GROUPING SETS; grain labeled explicitly. DECIMAL sums keep the
# measure exact at every grain.
# ---------------------------------------------------------------------------

_RMG_ORACLE = """
WITH o AS (
  SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS p,
         strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
         strftime(CAST(date_trunc('week', o_orderdate) AS DATE),
                  '%Y-%m-%d') AS week,
         strftime(CAST(date_trunc('month', o_orderdate) AS DATE),
                  '%Y-%m-%d') AS month
  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
)
SELECT CASE WHEN day IS NOT NULL THEN 'day'
            WHEN week IS NOT NULL THEN 'week' ELSE 'month' END AS grain,
       coalesce(day, week, month) AS bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(p) AS DOUBLE) AS revenue
FROM o
GROUP BY GROUPING SETS ((day), (week), (month))
"""


@register("revenue_multi_grain", _RMG_ORACLE)
def revenue_multi_grain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1998 revenue at day, week, and month grain from ONE scan:
    GROUPING SETS over three derived time buckets compiles to a single
    Expand + one shuffle (each row fans out exactly 3 times) instead
    of three scans of the fact table. DECIMAL sums make every grain's
    revenue exact, so the grains reconcile to the cent."""
    o = _t(spark, sf_dir, "orders")
    o.filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    ).select(
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias(
            "day"
        ),
        F.date_format(
            F.trunc(F.col("o_orderdate").cast("date"), "week"), "yyyy-MM-dd"
        ).alias("week"),
        F.date_format(
            F.trunc(F.col("o_orderdate").cast("date"), "month"), "yyyy-MM-dd"
        ).alias("month"),
    ).createOrReplaceTempView("rmg_orders")
    return spark.sql(
        """
        SELECT CASE WHEN day IS NOT NULL THEN 'day'
                    WHEN week IS NOT NULL THEN 'week' ELSE 'month' END AS grain,
               coalesce(day, week, month) AS bucket,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(p) AS DOUBLE) AS revenue
        FROM rmg_orders
        GROUP BY GROUPING SETS ((day), (week), (month))
        """
    )
