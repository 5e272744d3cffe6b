"""The engine's registered query surface (SURVEY.md §2.2 coverage).

Each ``@register(name, oracle=...)`` pairs an idiomatic-Spark DataFrame query
with the ANSI-SQL DuckDB oracle the driver hash-compares it against.
Conventions that make the hash comparison deterministic:

- every computed column is aliased IDENTICALLY in both engines;
- every float aggregate is ``round()``-ed in BOTH engines (Spark and DuckDB
  accumulate doubles in different orders; rounding collapses the ~1e-9 ulp
  noise to identical values);
- DuckDB ``sum(BIGINT)`` returns HUGEINT and ``row_number`` BIGINT — oracles
  cast to match Spark's LongType / IntegerType;
- raw ``events.ts`` is nanosecond precision in the parquet footer; Spark
  truncates to microseconds on read, so oracles ``CAST(ts AS TIMESTAMP)``
  (µs) anywhere ts is carried through;
- no ORDER BY unless the query itself is a top-k (the driver's value hash is
  order-insensitive; needless global sorts are exactly the kind of
  100-TB-hostile operation this engine avoids).

Scale posture is noted per query; the common themes: dimension joins are
broadcast, aggregations rely on Catalyst's partial/final split, top-k uses
rank-limit (never a global collect), and everything stays in whole-stage
codegen (no Python UDFs in this module at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.operators.joins import asof_join, range_join
from kafka_etl_consumer_spark.plans.registry import ORACLES, QUERIES, _t, register

__all__ = ["QUERIES", "ORACLES"]


# ---------------------------------------------------------------------------
# Flagship: the event rollup the reference's <topic>/<yyyy-MM-dd/HH/mm>
# directory layout exists to serve (ETLTask.java:213-219 in the reference).
# ---------------------------------------------------------------------------


@register(
    "flagship_event_rollup",
    oracle="""
    SELECT event_type,
           CAST(date_trunc('minute', ts) AS TIMESTAMP) AS minute,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value,
           round(avg(value), 6) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def flagship_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type per-minute event rollup. Scan → hash-agg (partial+final);
    one shuffle on (event_type, minute) — the minimal plan for this query."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.date_trunc("minute", F.col("ts")).alias("minute")
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )


@register(
    "ts_gapfill_ffill",
    oracle="""
    WITH mins AS (SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                                TIMESTAMP '2024-01-01 23:59:00',
                                                INTERVAL 1 MINUTE)) AS minute),
    agg AS (SELECT event_type,
                   CAST(date_trunc('minute', ts) AS TIMESTAMP) AS minute,
                   count(*) AS n_events,
                   round(avg(value), 6) AS avg_value
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-02'
            GROUP BY 1, 2),
    types AS (SELECT DISTINCT event_type FROM agg),
    grid AS (SELECT event_type, minute FROM types CROSS JOIN mins)
    SELECT g.event_type, g.minute,
           CAST(coalesce(a.n_events, 0) AS BIGINT) AS n_events,
           last_value(a.avg_value IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.minute
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
    FROM grid g LEFT JOIN agg a USING (event_type, minute)
    """,
)
def ts_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap-fill: densify one day to a fixed
    per-type minute grid (`sequence` + explode — generated, not scanned),
    left-join the sparse per-minute rollup, forward-fill the last observed
    value per type (`last(ignorenulls)` over an ordered window). Minutes
    before a type's first event stay NULL — same in both engines.

    100 TB shape: the grid is O(types × minutes), independent of event
    volume; events aggregate partial+final on (type, minute) BEFORE the
    join, so the big side collapses first; the window shuffles only the
    dense grid on the type key. This is the standard dashboard/feature
    "resample to fixed frequency + ffill" primitive."""
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-02").cast("timestamp"))
    )
    agg = ev.groupBy(
        "event_type", F.date_trunc("minute", F.col("ts")).alias("minute")
    ).agg(F.count("*").alias("n_events"), F.round(F.avg("value"), 6).alias("avg_value"))
    grid = (
        agg.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(
                F.sequence(
                    F.lit("2024-01-01 00:00:00").cast("timestamp"),
                    F.lit("2024-01-01 23:59:00").cast("timestamp"),
                    F.expr("INTERVAL 1 MINUTE"),
                )
            ).alias("minute"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("minute")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(agg, ["event_type", "minute"], "left")
        .select(
            "event_type",
            "minute",
            F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
            F.last("avg_value", ignorenulls=True).over(w).alias("value_ffill"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped core relational queries
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape. The shipdate filter pushes down to the parquet scan
    (PushedFilters) and only 9 of 11 columns are read (ReadSchema pruning);
    the agg is a 2-key hash-agg, partial map-side then one shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape. customer is the selective side — Catalyst broadcasts
    it into orders (no shuffle of the fact side for that join at our dim
    sizes; at 100 TB customer is still ~1% of lineitem so the broadcast→SMJ
    switch is AQE's call). Top-k via sort+limit = TakeOrderedAndProject —
    O(k) per partition, never a global sort."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape. nation/region/supplier are bounded-size dims →
    broadcast hints keep the only real shuffle on the lineitem⋈orders key."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           upper(l_returnflag) AS flag
    FROM lineitem
    WHERE l_quantity > 30 AND l_discount BETWEEN 0.02 AND 0.08
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan→filter→project: both predicates push down into the parquet
    reader; ReadSchema carries only the 7 referenced columns.

    ``charge`` is deliberately NOT rounded: per-row arithmetic over the same
    parquet doubles in the same order is bit-identical across engines, while
    round() itself differs at half-boundaries (Spark BigDecimal HALF_UP vs
    DuckDB's scaled std::round) — rounding would INTRODUCE mismatches."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 30) & F.col("l_discount").between(0.02, 0.08)
    ).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias(
            "charge"
        ),
        F.upper("l_returnflag").alias("flag"),
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS n_customers,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation: Catalyst expands to a two-phase agg (distinct
    keys partial-deduped map-side before the shuffle)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@register(
    "rollup_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_items,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@register(
    "cube_agg",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("sum_price")
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "win_rank_topk",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
    WHERE rn <= 3
    """,
)
def win_rank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. Rank-filter is the scalable per-group
    top-k: one shuffle on the partition key, no global sort. (Spark 3.5+'s
    WindowGroupLimit pushes the rn<=3 limit into the sort itself.)"""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "win_analytic",
    oracle="""
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
               AS running_sum,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
               AS moving_avg3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead + running/moving frames per user. One shuffle on user_id
    serves all four window expressions (same partitioning+ordering)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.round(F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4).alias(
            "running_sum"
        ),
        F.round(F.avg("value").over(w.rowsBetween(-2, 0)), 6).alias("moving_avg3"),
    )


@register(
    "sort_topk",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    ORDER BY value DESC, event_id
    LIMIT 10
    """,
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: plans as TakeOrderedAndProject (per-partition heap of
    k, then driver merge of #partitions × k rows) — never a full sort."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select("event_id", "user_id", "event_type", "value")
        .orderBy(F.col("value").desc(), "event_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------

_SET_L = "SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
_SET_R = "SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 350000"


def _set_sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    lhs = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    rhs = o.filter(F.col("o_totalprice") > 350000).select(F.col("o_custkey").alias("custkey"))
    return lhs, rhs


@register("set_union", oracle=f"{_SET_L} UNION {_SET_R}")
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    lhs, rhs = _set_sides(spark, sf_dir)
    return lhs.unionByName(rhs).distinct()


@register("set_intersect", oracle=f"{_SET_L} INTERSECT {_SET_R}")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    lhs, rhs = _set_sides(spark, sf_dir)
    return lhs.intersect(rhs)


@register("set_except", oracle=f"{_SET_L} EXCEPT {_SET_R}")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    lhs, rhs = _set_sides(spark, sf_dir)
    return lhs.subtract(rhs)


# ---------------------------------------------------------------------------
# Join variants
# ---------------------------------------------------------------------------


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: probes stop at first match, output never duplicates
    the left side — strictly cheaper than inner-join+distinct."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no large order (every customer has SOME order in this
    data, so the anti-join is against the filtered right side)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "join_range",
    oracle="""
    SELECT p_brand, count(*) AS n_lines, round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
             AND l_quantity >= p_size - 5 AND l_quantity <= p_size + 5
    GROUP BY p_brand
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi+band join: the equi key keeps it a hash join (band predicate as
    post-filter) — the scale-safe shape for range joins (operators/joins.py)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").withColumn(
        "size_lo", F.col("p_size") - 5
    ).withColumn("size_hi", F.col("p_size") + 5)
    joined = range_join(
        li,
        F.broadcast(p),
        equi=[("l_partkey", "p_partkey")],
        lower=("l_quantity", "size_lo"),
        upper=("l_quantity", "size_hi"),
    )
    return joined.groupBy("p_brand").agg(
        F.count("*").alias("n_lines"), F.round(F.sum("l_extendedprice"), 2).alias("sum_price")
    )


@register(
    "join_asof",
    oracle="""
    WITH ranked AS (
        SELECT e.event_id, o.o_orderkey, o.o_totalprice, o.o_orderdate,
               row_number() OVER (PARTITION BY e.event_id
                                  ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM events e
        JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
    SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
           m.o_orderkey, m.o_totalprice, m.o_orderdate
    FROM events e
    LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) m USING (event_id)
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: each event picks the user's most recent order
    at event time; o_orderkey DESC breaks orderdate ties deterministically."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderkey", "o_totalprice", "o_orderdate"
    )
    return asof_join(
        ev, o, on="user_id", left_ts="ts", right_ts="o_orderdate",
        tiebreakers=["o_orderkey"], direction="backward", how="left",
        left_unique=["event_id"],
    )


_BAG_L = "SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000"
_BAG_R = "SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'"


def _bag_sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    o = _t(spark, sf_dir, "orders")
    lhs = o.filter(F.col("o_totalprice") > 200000).select(
        F.col("o_custkey").alias("custkey")
    )
    rhs = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return lhs, rhs


@register("set_intersect_all", oracle=f"{_BAG_L} INTERSECT ALL {_BAG_R}")
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection (min multiplicity per value) — both engines
    plan it as a counted anti-semi variant, one shuffle per side; rows
    keep their duplicity, unlike INTERSECT's implicit distinct."""
    lhs, rhs = _bag_sides(spark, sf_dir)
    return lhs.intersectAll(rhs)


@register("set_except_all", oracle=f"{_BAG_L} EXCEPT ALL {_BAG_R}")
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (multiplicities subtract)."""
    lhs, rhs = _bag_sides(spark, sf_dir)
    return lhs.exceptAll(rhs)


@register(
    "distinct_rows",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, o_orderpriority
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates over a join result — plans as one hash-aggregate on
    all columns (partial dedup map-side before the shuffle, same as any
    agg; never a sort)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("l_returnflag", "l_linestatus", "o_orderpriority")
        .dropDuplicates()
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           1 AS approx_ok
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++, rsd=2%) per order status —
    the mergeable constant-memory distinct for 100 TB interactive use.
    HLL estimates are engine-specific, so the raw estimate can't be
    hash-compared; instead the query emits a BOUNDS CHECK (VERDICT r7
    item 3): approx_ok = 1 iff |estimate - exact| <= 5*rsd*exact (5
    standard errors — an estimate that far out means the sketch is
    broken, not unlucky). The oracle emits the literal 1, so the driver
    row goes red exactly when Spark's estimate leaves the bound, while
    exact_customers pins the true distinct on both sides. The exact
    branch exists to VALIDATE the sketch; at 100 TB production use only
    the approx branch (the deterministic cross-engine sketch alternative
    is sketch_distinct_theta)."""
    o = _t(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers"),
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").cast("bigint").alias("exact_customers"),
    )
    return agg.select(
        "o_orderstatus",
        "n_orders",
        "exact_customers",
        (
            F.abs(F.col("approx_customers") - F.col("exact_customers"))
            <= 5 * 0.02 * F.col("exact_customers")
        )
        .cast("int")
        .alias("approx_ok"),
    )
