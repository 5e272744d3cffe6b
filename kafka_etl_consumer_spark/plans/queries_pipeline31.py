"""Query surface batch 36 (round 4): product return rates, load
profiling, skyline dominance.

- return rate per brand with a Wilson 95% interval — proportion
  reporting done right over the lineitem-part join (a raw rate with
  n=40 and a rate with n=40k read the same without the interval)
- hour-of-day load profile per event type — the capacity-planning
  heatmap (which hours carry the traffic?)
- 2-D skyline (Pareto frontier) of parts on (price, size) — the
  dominance operator: no other part is at most as expensive AND at
  most as large with one strict; classic "best trade-offs" query that
  SQL engines don't ship as a primitive

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283); these extend the driver-verified operator
families the brief requires. Every query carries an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# brand_return_rate_ci — P(l_returnflag = 'R') per brand with the
# Wilson score interval (same closed form as stats_wilson_ci).
# ---------------------------------------------------------------------------

_BRR_ORACLE = """
WITH j AS (
  SELECT p.p_brand AS brand,
         CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS r
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
g AS (
  SELECT brand, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(r) AS BIGINT) AS s
  FROM j GROUP BY brand
),
c AS (
  SELECT brand, n, s, s / CAST(n AS DOUBLE) AS ph,
         1.96 * 1.96 AS z2, CAST(n AS DOUBLE) AS nd
  FROM g
)
SELECT brand, n AS n_lines, s AS n_returned, round(ph, 6) AS return_rate,
       round((ph + z2 / (2 * nd)) / (1 + z2 / nd)
             - 1.96 * sqrt(ph * (1 - ph) / nd + z2 / (4 * nd * nd))
               / (1 + z2 / nd), 6) AS ci_lo,
       round((ph + z2 / (2 * nd)) / (1 + z2 / nd)
             + 1.96 * sqrt(ph * (1 - ph) / nd + z2 / (4 * nd * nd))
               / (1 + z2 / nd), 6) AS ci_hi
FROM c
"""


@register("brand_return_rate_ci", _BRR_ORACLE)
def brand_return_rate_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return rate per brand with Wilson 95% bounds. Scale: the
    lineitem-part join is key-partitioned (part is the build side a
    broadcast handles to surprising sizes — it's |parts| rows wide of
    2 columns here); then ONE brand-grain agg and closed-form interval
    algebra on the bounded brand table."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("r"),
    )
    p = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_brand").alias("brand")
    )
    g = li.join(p, "l_partkey").groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r").cast("bigint").alias("s"),
    )
    nd = F.col("n").cast("double")
    ph = F.col("s") / nd
    z2 = F.lit(1.96) * F.lit(1.96)
    center = (ph + z2 / (2 * nd)) / (1 + z2 / nd)
    half = (
        F.lit(1.96)
        * F.sqrt(ph * (1 - ph) / nd + z2 / (4 * nd * nd))
        / (1 + z2 / nd)
    )
    return g.select(
        "brand",
        F.col("n").alias("n_lines"),
        F.col("s").alias("n_returned"),
        F.round(ph, 6).alias("return_rate"),
        F.round(center - half, 6).alias("ci_lo"),
        F.round(center + half, 6).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# events_hour_profile — (type, hour-of-day) counts and within-type
# share: the 5 x 24 capacity heatmap.
# ---------------------------------------------------------------------------

_EHP_ORACLE = """
WITH h AS (
  SELECT event_type,
         CAST(extract(hour FROM CAST(ts AS TIMESTAMP)) AS BIGINT) AS hour,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, hour, n,
       round(n / CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE), 6)
         AS share_of_type
FROM h
"""


@register("events_hour_profile", _EHP_ORACLE)
def events_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day traffic profile per event type. Scale: ONE hash-agg
    to the bounded |types| x 24 grid; the share window runs over that
    grid, not over events. The aggregate complement of
    audit_hour_completeness's per-day view."""
    ev = _t(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type",
        F.hour(F.col("ts").cast("timestamp")).cast("bigint").alias("hour"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.partitionBy("event_type")
    return h.select(
        "event_type",
        "hour",
        "n",
        F.round(F.col("n") / F.sum("n").over(w).cast("double"), 6).alias(
            "share_of_type"
        ),
    )


# ---------------------------------------------------------------------------
# skyline_parts_2d — Pareto frontier on (minimize retail price,
# minimize size). Exact duplicates collapse to one frontier row first;
# then a part survives iff its size beats the running minimum size of
# everything at most as expensive that sorts before it.
# ---------------------------------------------------------------------------

_SKY_ORACLE = """
WITH g AS (
  SELECT p_retailprice AS price, CAST(p_size AS BIGINT) AS sz,
         CAST(min(p_partkey) AS BIGINT) AS keeper_partkey,
         CAST(count(*) AS BIGINT) AS n_parts
  FROM part GROUP BY 1, 2
),
r AS (
  SELECT *, min(sz) OVER (ORDER BY price, sz, keeper_partkey
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS prev_min_sz
  FROM g
)
SELECT price, sz AS size, keeper_partkey, n_parts
FROM r WHERE prev_min_sz IS NULL OR sz < prev_min_sz
"""


@register("skyline_parts_2d", _SKY_ORACLE)
def skyline_parts_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline of parts minimizing (retail price, size). The
    sort-scan algorithm: after sorting by (price, size), a row is
    Pareto-optimal iff its size is strictly below every earlier row's
    size — one running-min, no pairwise dominance join (the naive
    NOT EXISTS is O(N^2)). Scale: distinct-(price,size) collapse
    first; the exclusive running min then runs on the SHARD SUBSTRATE
    (operators/shard.py sharded_prefix_extrema — local running min per
    price-range shard + the broadcast prefix-min of per-shard minima),
    so the grain table never funnels through one task the way the
    plain unpartitioned window did (the tightened data-derived window
    guard caught exactly that: p_retailprice is data grain, r7).
    Duplicate (price,size) points collapse to one frontier row
    carrying their count."""
    from kafka_etl_consumer_spark.operators.shard import sharded_prefix_extrema

    p = _t(spark, sf_dir, "part")
    g = p.groupBy(
        F.col("p_retailprice").alias("price"),
        F.col("p_size").cast("bigint").alias("sz"),
    ).agg(
        F.min("p_partkey").cast("bigint").alias("keeper_partkey"),
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
    )
    r = sharded_prefix_extrema(
        g,
        ["price", "sz", "keeper_partkey"],
        {"sz": "prev_min_sz"},
        kind="min",
        inclusive=False,
    )
    return r.filter(
        F.col("prev_min_sz").isNull() | (F.col("sz") < F.col("prev_min_sz"))
    ).select("price", F.col("sz").alias("size"), "keeper_partkey", "n_parts")
