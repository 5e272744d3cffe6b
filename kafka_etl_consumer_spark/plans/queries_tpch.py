"""Query surface batch 4: the rest of the TPC-H-shaped relational suite +
remaining SURVEY.md §2.2 categories (grouping sets, pivot, full-outer join,
ntile/percent_rank/cume_dist, exact percentiles & moment statistics,
min_by/max_by, scalar subqueries, union-all).

Same conventions as plans/queries.py: identical aliases both engines,
aggregate floats rounded in both, per-row floats never rounded, no needless
global sorts (top-k only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# TPC-H-shaped suite (continued; q1/q3/q5 in plans/queries.py)
# ---------------------------------------------------------------------------


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 25
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure-pushdown query. All three predicates reach
    the parquet reader (PushedFilters); only 4 columns are read; the global
    agg is a partial-per-partition + single final reduce — the cheapest
    possible plan, and the one that matters most at 100 TB (scan-bound)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 25)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
                AND n2.n_name IN ('NATION_4', 'NATION_5', 'NATION_6'))
           OR (n1.n_name IN ('NATION_4', 'NATION_5', 'NATION_6')
                AND n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')))
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the same dimension (nation) joined in TWO roles —
    supplier nation and customer nation — with a disjunctive cross-role
    predicate. Both nation copies broadcast; the only real shuffle is
    lineitem⋈orders."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                F.col("supp_nation").isin("NATION_1", "NATION_2", "NATION_3")
                & F.col("cust_nation").isin("NATION_4", "NATION_5", "NATION_6")
            )
            | (
                F.col("supp_nation").isin("NATION_4", "NATION_5", "NATION_6")
                & F.col("cust_nation").isin("NATION_1", "NATION_2", "NATION_3")
            )
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue last half-year.
    Date filter pushes into the orders scan, returnflag into lineitem;
    nation broadcasts; top-20 via TakeOrderedAndProject."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q14_promo_effect",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct,
           count(*) AS n_lines
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation (CASE WHEN inside sum) over
    a month of shipments. part broadcasts (bounded dim); single-row result
    from a partial+final global agg."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", disc_price).otherwise(0.0))
                / F.sum(disc_price),
                6,
            ).alias("promo_revenue_pct"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q18_large_volume",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           round(sum_qty, 2) AS sum_qty
    FROM (
        SELECT l_orderkey, sum(l_quantity) AS sum_qty
        FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250) big
    JOIN orders   ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: agg → HAVING → join back to the fact's parents.
    The heavy groupBy(l_orderkey) runs FIRST and the >250 filter collapses
    it to a tiny set before any join — orders/customer then join against
    the small side (AQE turns both into broadcasts at runtime)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__sum_qty"))
        .filter(F.col("__sum_qty") > 250)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round("__sum_qty", 2).alias("sum_qty"),
        )
    )


@register(
    "q19_disjunctive",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunct groups spanning BOTH join
    sides. Catalyst derives the common p_brand IN (...) / l_quantity range
    supersets and pushes them below the join; the full OR evaluates as the
    join's post-condition."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# remaining aggregation / window / join / set categories
# ---------------------------------------------------------------------------


@register(
    "grouping_sets_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_items, round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (not expressible as rollup/cube) through the
    engine's SQL entry point — same Catalyst Expand-based plan as cube:
    each input row fans out once per grouping set before one shuffle."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_items, round(sum(l_extendedprice), 2) AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "pivot_agg",
    oracle="""
    SELECT o_orderpriority,
           round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS "O",
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS "F",
           round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS "P"
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide). The value list is EXPLICIT — with it, pivot is a
    single conditional aggregation pass; without it Spark must first run a
    distinct query to discover columns (two jobs, and nondeterministic
    column order). Always pass values at scale."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
    )


@register(
    "scd2_customer_segment",
    oracle="""
    WITH cur AS (SELECT c_custkey, c_mktsegment AS segment,
                        TIMESTAMP '2023-01-01 00:00:00' AS valid_from,
                        CAST(NULL AS TIMESTAMP) AS valid_to
                 FROM customer),
    big AS (SELECT o_custkey, max(o_totalprice) AS mx
            FROM orders WHERE o_totalprice > 250000 GROUP BY 1),
    upd AS (SELECT c_custkey,
                   CASE WHEN mx > 400000 THEN 'VIP' ELSE c_mktsegment END AS segment,
                   TIMESTAMP '2024-06-01 00:00:00' AS ts
            FROM big JOIN customer ON o_custkey = c_custkey),
    chg AS (SELECT u.c_custkey, u.segment AS new_seg, u.ts
            FROM upd u JOIN cur c USING (c_custkey)
            WHERE u.segment <> c.segment)
    SELECT c.c_custkey, c.segment, c.valid_from, chg.ts AS valid_to
    FROM cur c LEFT JOIN chg USING (c_custkey)
    UNION ALL
    SELECT c_custkey, new_seg AS segment, ts AS valid_from,
           CAST(NULL AS TIMESTAMP) AS valid_to
    FROM chg
    """,
)
def scd2_customer_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension merge (operators/scd.py): customers whose max order
    exceeds 400k move to a 'VIP' segment effective 2024-06-01 — their open
    row closes and a new open row appends; customers matched by the update
    batch with an UNCHANGED segment are no-ops (no spurious version). One
    key join decides every row; update batch ≪ dimension → broadcast."""
    from kafka_etl_consumer_spark.operators.scd import scd2_merge

    cust = _t(spark, sf_dir, "customer")
    cur = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("2023-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    big = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 250000)
        .groupBy("o_custkey")
        .agg(F.max("o_totalprice").alias("mx"))
    )
    upd = big.join(cust, F.col("o_custkey") == F.col("c_custkey")).select(
        "c_custkey",
        F.when(F.col("mx") > 400000, F.lit("VIP"))
        .otherwise(F.col("c_mktsegment"))
        .alias("segment"),
        F.lit("2024-06-01 00:00:00").cast("timestamp").alias("ts"),
    )
    return scd2_merge(cur, upd, "c_custkey", ["segment"], ts_col="ts")


@register(
    "unpivot_measures",
    oracle="""
    WITH agg AS (
        SELECT l_returnflag,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_price,
               round(sum(l_discount), 2) AS sum_disc
        FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, measure, amount
    FROM agg
    UNPIVOT (amount FOR measure IN (sum_qty, sum_price, sum_disc))
    """,
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long, the inverse of `pivot_agg`): one aggregation
    pass, then `DataFrame.unpivot` melts the measure columns — a pure
    per-row projection (Expand node), NO extra shuffle or join; output is
    3× the agg's rows regardless of input size."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.sum("l_discount"), 2).alias("sum_disc"),
    )
    return agg.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "sum_disc"], "measure", "amount"
    )


@register(
    "join_outer_full",
    oracle="""
    SELECT coalesce(l.c_custkey, r.o_custkey) AS custkey,
           l.c_acctbal, r.n_big_orders
    FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal < 500) l
    FULL OUTER JOIN (
        SELECT o_custkey, count(*) AS n_big_orders
        FROM orders WHERE o_totalprice > 300000 GROUP BY o_custkey) r
      ON l.c_custkey = r.o_custkey
    """,
)
def join_outer_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of two partially-overlapping keyed sets; both sides
    survive with nulls. Full outer can't broadcast (both sides must be
    preserved) — it's the one join shape that always sort-merges, so keep
    both inputs pre-reduced (filter left, pre-agg right) as done here."""
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 500)
        .select("c_custkey", "c_acctbal")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_big_orders"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "full_outer").select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "c_acctbal",
        "n_big_orders",
    )


@register(
    "win_ntile_dist",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           CAST(ntile(4) OVER w AS INT) AS price_quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           CAST(dense_rank() OVER w AS INT) AS drank
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def win_ntile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile/percent_rank/cume_dist/
    dense_rank) sharing ONE window spec → one shuffle + one sort serves all
    four. o_orderkey tiebreak makes ntile deterministic across engines."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.ntile(4).over(w).alias("price_quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.dense_rank().over(w).alias("drank"),
    )


@register(
    "stats_agg",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 4) AS price_sd,
           round(var_samp(l_quantity), 6) AS qty_var,
           round(corr(l_extendedprice, l_quantity), 6) AS price_qty_corr,
           round(covar_samp(l_discount, l_tax), 8) AS disc_tax_cov,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS price_median,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS price_p90
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moment statistics + EXACT interpolated percentiles. stddev/var/corr/
    covar are single-pass streaming aggregates (partial+final); percentile
    is the expensive one — it buffers each group's values, so at 100 TB
    prefer approx_percentile (t-digest, mergeable) unless exactness is
    contractual (it isn't oracle-comparable cross-engine, hence exact here) —
    or the engine's deterministic quantile_histogram sketch (operators/
    sketch.py), which IS oracle-comparable and mergeable."""
    li = _t(spark, sf_dir, "lineitem")
    # both percentiles from ONE percentile(col, array(...)) buffer — two
    # scalar percentile aggs would each collect the full group (2x memory
    # and 2x sort; measured ~35% of this query's wall-clock)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_sd"),
            F.round(F.var_samp("l_quantity"), 6).alias("qty_var"),
            F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("price_qty_corr"),
            F.round(F.covar_samp("l_discount", "l_tax"), 8).alias("disc_tax_cov"),
            F.expr("percentile(l_extendedprice, array(0.5, 0.9))").alias("__pcts"),
        )
        .select(
            "l_returnflag",
            "price_sd",
            "qty_var",
            "price_qty_corr",
            "disc_tax_cov",
            F.round(F.element_at("__pcts", 1), 4).alias("price_median"),
            F.round(F.element_at("__pcts", 2), 4).alias("price_p90"),
        )
    )


@register(
    "agg_minmax_by",
    oracle="""
    WITH r AS (
        SELECT o_orderpriority, o_orderkey,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
        FROM orders)
    SELECT p.o_orderpriority,
           mx.o_orderkey AS max_price_order,
           mn.o_orderkey AS min_price_order,
           round(p.mxp, 2) AS max_price,
           round(p.mnp, 2) AS min_price
    FROM (SELECT o_orderpriority, max(o_totalprice) AS mxp, min(o_totalprice) AS mnp
          FROM orders GROUP BY o_orderpriority) p
    JOIN (SELECT * FROM r WHERE rmax = 1) mx USING (o_orderpriority)
    JOIN (SELECT * FROM r WHERE rmin = 1) mn USING (o_orderpriority)
    """,
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax/argmin) as single-pass aggregates — ONE
    partial+final agg instead of the window-sort the oracle needs. The
    ordering value is a (price, key) struct so price ties resolve
    identically in both engines (largest key wins the max, smallest the
    min)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr("max_by(o_orderkey, struct(o_totalprice, o_orderkey))").alias(
            "max_price_order"
        ),
        F.expr("min_by(o_orderkey, struct(o_totalprice, o_orderkey))").alias(
            "min_price_order"
        ),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
    )


@register(
    "scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT 1.8 * avg(o_totalprice) FROM orders)
    """,
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery via the SQL entry point. Catalyst
    executes the subquery once and injects the result as a literal into the
    main scan's filter — at scale this is 2 passes over orders, the second
    with a pushed-down predicate."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT 1.8 * avg(o_totalprice) FROM orders)
        """
    )


@register(
    "union_all_counts",
    oracle="""
    SELECT custkey, count(*) AS n_appearances
    FROM (
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION ALL
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 350000)
    GROUP BY custkey
    """,
)
def union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics, no dedup shuffle) + aggregation. unionByName
    is a zero-cost plan concat — rows never move until the groupBy."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    lhs = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    rhs = o.filter(F.col("o_totalprice") > 350000).select(
        F.col("o_custkey").alias("custkey")
    )
    return lhs.unionByName(rhs).groupBy("custkey").agg(
        F.count("*").alias("n_appearances")
    )


@register(
    "dedup_apply_exact",
    oracle="""
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d
    WHERE d.doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
    """,
)
def dedup_apply_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the DEDUPLICATED corpus (dedup_exact lists the groups;
    this applies them): keeper = min(doc_id) per content fingerprint, then a
    left-semi join back. Two shuffles (agg on fingerprint, semi-join on
    doc_id) but never a wide sort — at 100 TB both shuffles carry only
    (hash, id) pairs, not the documents."""
    d = _t(spark, sf_dir, "documents")
    keep = d.groupBy(F.md5("text").alias("fp")).agg(F.min("doc_id").alias("doc_id"))
    return d.join(keep.select("doc_id"), "doc_id", "left_semi").select(
        "doc_id", "lang", "source", "n_chars"
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region    ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'ECONOMY')
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of ECONOMY-part volume sold into
    ASIA, per year. Seven-table join where every dimension (part, supplier,
    both nation roles, region) broadcasts — the fact side shuffles only for
    lineitem⋈orders; the share is one conditional aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q13_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS n_custs
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of orders-per-customer INCLUDING
    zero-order customers — the left join is what a groupBy(orders) alone
    can't see. Two aggs: per-customer count, then histogram; both single
    shuffles with map-side partials."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("n_custs"))


@register(
    "join_theta",
    oracle="""
    SELECT n_name, r_name
    FROM nation JOIN region ON n_regionkey < r_regionkey
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PURE non-equi (theta) join — no equi key at all. This can only plan
    as a nested-loop; it is acceptable ONLY because one side is a bounded
    dim (broadcast → BroadcastNestedLoopJoin, no shuffle). With two large
    sides, first derive an equi key (banding/bucketing, see range_join) —
    a large×large theta join is a 100 TB cartesian and always a bug."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey < r.r_regionkey).select("n_name", "r_name")


@register(
    "sample_hash_10pct",
    oracle="""
    SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    WHERE CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)
                                   || '-' || CAST(l_linenumber AS VARCHAR)), 1, 15))
               AS BIGINT) % 100 < 10
    GROUP BY l_returnflag
    """,
)
def sample_hash_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% sample via hash-mod on the row key — unlike
    TABLESAMPLE/rand(), the SAME rows are sampled on every run, engine, and
    retry, which is what makes sampled metrics comparable across pipeline
    versions at 100 TB (and what makes this oracle-checkable at all). The
    predicate is a narrow map; no shuffle until the aggregation."""
    from kafka_etl_consumer_spark.functions.hashing import hash64

    li = _t(spark, sf_dir, "lineitem")
    key = F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
    return (
        li.filter(hash64(key) % 100 < 10)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("sum_price"))
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate-then-argmax via a reused subplan. The
    revenue aggregation is computed once and referenced twice (Catalyst
    dedups the scan via ReusedExchange under AQE); the max is a scalar
    broadcast, never a sort."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "total_revenue"
            )
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.join(F.broadcast(top), revenue.total_revenue == top.mx)
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly, count(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#5'
      AND l_quantity < (SELECT 0.5 * avg(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average),
    decorrelated by hand into a pre-aggregation + broadcast join — the
    rewrite Catalyst performs for correlated scalars, made explicit. The
    per-part avg aggregates ONLY the brand's parts first (semi-filtered),
    not all of lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    brand_lines = li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
    per_part = brand_lines.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg_qty")
    )
    return (
        brand_lines.join(F.broadcast(per_part), brand_lines.l_partkey == per_part.pk)
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q22_global_sales",
    oracle="""
    SELECT c_nationkey,
           count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c_nationkey
    """,
)
def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (nationkey standing in for phone country codes):
    scalar subquery threshold + anti join against recent orders + agg.
    The threshold broadcasts; the anti join's right side is pre-filtered
    to recent orders before it shuffles."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    thr = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("t"))
    return (
        c.join(F.broadcast(thr), c.c_acctbal > thr.t)
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("numcust"), F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
    )
