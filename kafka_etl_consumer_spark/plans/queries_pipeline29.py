"""Query surface batch 34 (round 4): supply-chain and customer-trend
reporting.

- supplier lead time — order-to-ship latency per supplier (mean + p95)
  over the lineitem-orders join: the canonical BIG-BIG equi join that
  bucketing/co-partitioning exists for
- open-order aging buckets — the 0-30 / 31-60 / 61+ day backlog aging
  report finance asks for, reusing the open/close interval logic
- steepest customer value trends — per-customer OLS slope of order
  value over time, with every moment in exact integer cents so the
  slope ordering is engine-identical

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283); these extend the driver-verified operator
families the brief requires. Every query carries an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# supplier_lead_time — days from order date to each line's ship date,
# aggregated per supplier. Integer day diffs; Spark percentile ==
# DuckDB quantile_cont.
# ---------------------------------------------------------------------------

_SLT_ORACLE = """
WITH j AS (
  SELECT l.l_suppkey AS suppkey,
         CAST(CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
              AS BIGINT) AS lead_days
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT suppkey, CAST(count(*) AS BIGINT) AS n_lines,
       round(avg(lead_days), 4) AS mean_lead_days,
       round(quantile_cont(lead_days, 0.95), 4) AS p95_lead_days,
       CAST(max(lead_days) AS BIGINT) AS max_lead_days
FROM j GROUP BY suppkey
"""


@register("supplier_lead_time", _SLT_ORACLE)
def supplier_lead_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lead time per supplier. Scale: this is THE big-big
    equi join (lineitem x orders on orderkey) — at 100 TB both sides
    are bucketed on orderkey at write time so the SMJ runs with no
    exchange (test_bucketing.py asserts the pattern); the per-supplier
    agg then shuffles only (suppkey, day) pairs. Exact percentile over
    per-supplier groups swaps to approx_percentile at extreme
    cardinality."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.col("l_suppkey").alias("suppkey"),
        F.col("l_shipdate").cast("date").alias("sd"),
    )
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.col("o_orderdate").cast("date").alias("od"),
    )
    j = li.join(o, "l_orderkey").select(
        "suppkey", F.datediff("sd", "od").cast("bigint").alias("lead_days")
    )
    return j.groupBy("suppkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.round(F.avg("lead_days"), 4).alias("mean_lead_days"),
        F.round(F.percentile("lead_days", 0.95), 4).alias("p95_lead_days"),
        F.max("lead_days").cast("bigint").alias("max_lead_days"),
    )


# ---------------------------------------------------------------------------
# orders_aging_buckets — orders still open at the horizon (no shipment
# completes them yet), bucketed by age. Reuses the open/close logic of
# orders_open_backlog: an order closes at its LAST shipment.
# ---------------------------------------------------------------------------

_AGING_ORACLE = """
WITH oe AS (SELECT l_orderkey AS o, CAST(max(l_shipdate) AS DATE) AS endd
            FROM lineitem GROUP BY 1),
hz AS (SELECT max(endd) AS h FROM oe),
open_o AS (
  SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS startd
  FROM orders o JOIN oe ON oe.o = o.o_orderkey CROSS JOIN hz
  WHERE oe.endd >= hz.h - 30
),
aged AS (
  SELECT o_orderkey, CAST(hz.h - startd AS BIGINT) AS age_days
  FROM open_o CROSS JOIN hz
)
SELECT CASE WHEN age_days <= 30 THEN '0-30'
            WHEN age_days <= 60 THEN '31-60'
            WHEN age_days <= 90 THEN '61-90' ELSE '91+' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(min(age_days) AS BIGINT) AS min_age,
       CAST(max(age_days) AS BIGINT) AS max_age
FROM aged GROUP BY 1
"""


@register("orders_aging_buckets", _AGING_ORACLE)
def orders_aging_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aging report for the active backlog: orders whose last shipment
    lands in the horizon's trailing 30 days ("still in flight"),
    bucketed by age since placement. Scale: one order-grain max agg,
    a one-row horizon broadcast, a bounded bucket agg — the aging
    CASE ladder is pure codegen."""
    oe = _t(spark, sf_dir, "lineitem").groupBy(
        F.col("l_orderkey").alias("o")
    ).agg(F.max(F.col("l_shipdate").cast("date")).alias("endd"))
    hz = oe.agg(F.max("endd").alias("h"))
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("o"),
        F.col("o_orderdate").cast("date").alias("startd"),
    )
    open_o = (
        o.join(oe, "o")
        .crossJoin(F.broadcast(hz))
        .filter(F.col("endd") >= F.date_sub("h", 30))
    )
    aged = open_o.select(
        F.datediff("h", "startd").cast("bigint").alias("age_days")
    )
    bucket = (
        F.when(F.col("age_days") <= 30, "0-30")
        .when(F.col("age_days") <= 60, "31-60")
        .when(F.col("age_days") <= 90, "61-90")
        .otherwise("91+")
    )
    return aged.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.min("age_days").cast("bigint").alias("min_age"),
        F.max("age_days").cast("bigint").alias("max_age"),
    )


# ---------------------------------------------------------------------------
# customer_value_trend_topk — per-customer OLS slope of order value
# (integer cents) over order day; top-20 steepest risers. Every moment
# is an exact BIGINT, so slopes — and their ordering — are identical
# doubles in both engines.
# ---------------------------------------------------------------------------

_CVT_ORACLE = """
WITH o AS (
  SELECT o_custkey AS c,
         CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT) AS x,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
  FROM orders
),
mo AS (
  SELECT c, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
  FROM o GROUP BY c
),
sl AS (
  SELECT c, n,
         CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) / 100 AS slope
  FROM mo WHERE n >= 5 AND n * sxx - sx * sx > 0
)
SELECT c AS custkey, n AS n_orders,
       round(slope, 6) AS slope_per_day
FROM sl ORDER BY slope DESC, c LIMIT 20
"""


@register("customer_value_trend_topk", _CVT_ORACLE)
def customer_value_trend_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by OLS slope of order value over time (>= 5
    orders). Scale: ONE customer-grain moment agg (exact integer cents
    and day offsets — no streaming-regression divergence), closed-form
    slope, TakeOrdered report. The deterministic slope ORDERING is the
    point: an approximate slope would reshuffle the leaderboard run to
    run."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        ).cast("bigint").alias("x"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("y"),
    )
    mo = o.groupBy("c").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    det = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / det.cast("double")
        / 100
    )
    sl = mo.filter((F.col("n") >= 5) & (det > 0)).select(
        "c", "n", slope.alias("slope")
    )
    return (
        sl.orderBy(F.col("slope").desc(), "c")
        .limit(20)
        .select(
            F.col("c").alias("custkey"),
            F.col("n").alias("n_orders"),
            F.round("slope", 6).alias("slope_per_day"),
        )
    )
