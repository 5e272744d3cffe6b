"""Query surface batch 22 (round 4): co-purchase similarity, interval
sweep accounting, freshness auditing.

- item-item cosine from order co-occurrence — the classic "customers
  who bought X also bought Y" similarity, computed per-order so the
  pair fanout is bounded by basket size, never |items|^2
- open-order backlog curve via the +1/-1 interval sweep — point-in-time
  concurrency from exact integer cumsums (the shape behind concurrent
  sessions / open tickets / active connections dashboards)
- hour-grid completeness audit per (event_type, day) — the data
  freshness check a pipeline runs before trusting a partition

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283); these extend the training-data operator families
the brief requires. Every query carries an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# recsys_item_cosine — cosine(i,j) = |orders with both| / sqrt(n_i n_j)
# over binary item-order incidence; top-20 pairs. All inputs are exact
# BIGINT counts, so the cosine doubles (and their ordering) are
# identical in both engines.
# ---------------------------------------------------------------------------

_COSINE_ORACLE = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
cnt AS (SELECT p, CAST(count(*) AS BIGINT) AS n FROM op GROUP BY p),
co AS (SELECT a.p AS pi, b.p AS pj, CAST(count(*) AS BIGINT) AS co
       FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
       GROUP BY 1, 2),
sc AS (SELECT pi, pj, co, ca.n AS ni, cb.n AS nj,
              co / sqrt(CAST(ca.n * cb.n AS DOUBLE)) AS cosine
       FROM co JOIN cnt ca ON ca.p = co.pi JOIN cnt cb ON cb.p = co.pj)
SELECT pi, pj, co AS co_orders, ni, nj, round(cosine, 6) AS cosine
FROM sc ORDER BY cosine DESC, pi, pj LIMIT 20
"""


@register("recsys_item_cosine", _COSINE_ORACLE)
def recsys_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most-similar part pairs by co-purchase cosine. Scale: the
    self-join runs WITHIN each order key, so pair volume is
    sum(basket_size choose 2) — linear in orders for bounded baskets,
    never |parts|^2; the item-frequency joins are key-partitioned
    hash joins, and the final top-20 is TakeOrderedAndProject (no
    global sort materializes). A pathological mega-basket would need
    the same df-cut used in text_vocab_oov."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    cnt = li.groupBy("p").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = li.select("o", F.col("p").alias("pi"))
    b = li.select(F.col("o").alias("o2"), F.col("p").alias("pj"))
    co = (
        a.join(b, (a.o == b.o2) & (F.col("pi") < F.col("pj")))
        .groupBy("pi", "pj")
        .agg(F.count(F.lit(1)).cast("bigint").alias("co"))
    )
    sc = (
        co.join(cnt.select(F.col("p").alias("pi"), F.col("n").alias("ni")), "pi")
        .join(cnt.select(F.col("p").alias("pj"), F.col("n").alias("nj")), "pj")
        .select(
            "pi",
            "pj",
            F.col("co").alias("co_orders"),
            "ni",
            "nj",
            (F.col("co") / F.sqrt((F.col("ni") * F.col("nj")).cast("double"))).alias(
                "cosine_raw"
            ),
        )
    )
    return (
        sc.orderBy(F.col("cosine_raw").desc(), "pi", "pj")
        .limit(20)
        .select(
            "pi", "pj", "co_orders", "ni", "nj",
            F.round("cosine_raw", 6).alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# orders_open_backlog — +1 at o_orderdate, -1 at the order's last
# shipment; the running sum is the number of in-flight orders at each
# day's close. Exact integers end to end.
# ---------------------------------------------------------------------------

_BACKLOG_ORACLE = """
WITH oe AS (SELECT l_orderkey AS o, CAST(max(l_shipdate) AS DATE) AS endd
            FROM lineitem GROUP BY 1),
sp AS (SELECT CAST(o.o_orderdate AS DATE) AS d, 1 AS op, 0 AS cl
       FROM orders o JOIN oe ON oe.o = o.o_orderkey
       UNION ALL
       SELECT endd AS d, 0 AS op, 1 AS cl FROM oe),
g AS (SELECT d, CAST(sum(op) AS BIGINT) AS n_opened,
             CAST(sum(cl) AS BIGINT) AS n_closed
      FROM sp GROUP BY d)
SELECT strftime(d, '%Y-%m-%d') AS d, n_opened, n_closed,
       CAST(sum(n_opened - n_closed) OVER (ORDER BY d
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS open_eod
FROM g
"""


@register("orders_open_backlog", _BACKLOG_ORACLE)
def orders_open_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily open-order backlog via the interval sweep: orders open at
    placement and close at their last shipment. Scale: lineitem
    collapses to order grain in ONE hash-agg (partial max map-side);
    the sweep unions two |orders|-row delta streams and immediately
    re-aggregates to day grain, so the running-sum window sees only
    |days| rows (the classic trick that turns interval stabbing into
    a cumsum). Exact integers everywhere — no float drift."""
    oe = _t(spark, sf_dir, "lineitem").groupBy(
        F.col("l_orderkey").alias("o")
    ).agg(F.max(F.col("l_shipdate").cast("date")).alias("endd"))
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("o"),
        F.col("o_orderdate").cast("date").alias("startd"),
    )
    opens = o.join(oe, "o").select(
        F.col("startd").alias("d"), F.lit(1).alias("op"), F.lit(0).alias("cl")
    )
    closes = oe.select(
        F.col("endd").alias("d"), F.lit(0).alias("op"), F.lit(1).alias("cl")
    )
    g = opens.unionAll(closes).groupBy("d").agg(
        F.sum("op").cast("bigint").alias("n_opened"),
        F.sum("cl").cast("bigint").alias("n_closed"),
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return g.select(
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        "n_opened",
        "n_closed",
        F.sum(F.col("n_opened") - F.col("n_closed"))
        .over(w)
        .cast("bigint")
        .alias("open_eod"),
    )


# ---------------------------------------------------------------------------
# audit_hour_completeness — per (event_type, day): how many of the 24
# hour slots have data, and which hour peaked. The freshness /
# completeness gate before a consumer trusts a day partition.
# ---------------------------------------------------------------------------

_HOURAUDIT_ORACLE = """
WITH h AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
         extract(hour FROM CAST(ts AS TIMESTAMP)) AS hr,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2, 3
),
r AS (
  SELECT event_type, d, hr, cnt,
         row_number() OVER (PARTITION BY event_type, d
                            ORDER BY cnt DESC, hr) AS rk,
         count(*) OVER (PARTITION BY event_type, d) AS hours_present,
         sum(cnt) OVER (PARTITION BY event_type, d) AS day_events
  FROM h
)
SELECT event_type, strftime(d, '%Y-%m-%d') AS d,
       CAST(hours_present AS BIGINT) AS hours_present,
       CAST(24 - hours_present AS BIGINT) AS hours_missing,
       CAST(hr AS BIGINT) AS peak_hour, cnt AS peak_count,
       CAST(day_events AS BIGINT) AS day_events
FROM r WHERE rk = 1
"""


@register("audit_hour_completeness", _HOURAUDIT_ORACLE)
def audit_hour_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-slot completeness and peak hour per (event_type, day).
    Scale: ONE hash-agg to the bounded (type x day x 24) grain; the
    ranking window and the completeness counts share the same
    (type, day) exchange. Nothing downstream of the first agg scales
    with event volume."""
    ev = _t(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    h = ev.groupBy(
        "event_type",
        F.to_date(ts).alias("d"),
        F.hour(ts).alias("hr"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    wp = Window.partitionBy("event_type", "d")
    wr = wp.orderBy(F.col("cnt").desc(), "hr")
    r = h.select(
        "event_type",
        "d",
        "hr",
        "cnt",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wp).alias("hours_present"),
        F.sum("cnt").over(wp).alias("day_events"),
    )
    return r.filter(F.col("rk") == 1).select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        F.col("hours_present").cast("bigint").alias("hours_present"),
        (24 - F.col("hours_present")).cast("bigint").alias("hours_missing"),
        F.col("hr").cast("bigint").alias("peak_hour"),
        F.col("cnt").alias("peak_count"),
        F.col("day_events").cast("bigint").alias("day_events"),
    )
