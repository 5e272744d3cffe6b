"""Query surface batch 19 (round 4): survival analysis and cohort value.

- Kaplan-Meier estimator of time-to-repeat-purchase with right censoring
  (single-order customers censor at the observation horizon) — survival
  curves are the honest way to report "time to next event" under
  incomplete observation, and the cumulative product folds into an
  exp-of-running-log-sum window
- customer LTV cohort triangle: cumulative revenue per first-order-month
  cohort by month index — the complement of retention_cohorts (who came
  back) with how much they spent

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283); these extend the training-data operator families
the brief requires. Every query carries an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# stats_survival_km — KM over days-to-second-order. Event rows drop the
# risk set; censored rows only leave it. S(t) = prod_{t_i <= t}
# (1 - d_i/n_i), computed as exp(cumulative sum of ln terms) over the
# ordered distinct-duration table — both engines accumulate the same
# ordered sequence, so doubles agree to rounding.
# ---------------------------------------------------------------------------

_KM_ORACLE = """
WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders),
hz AS (SELECT max(d) AS h FROM o),
f AS (SELECT o_custkey, min(d) AS d1 FROM o GROUP BY 1),
s AS (SELECT f.o_custkey, min(oo.d) AS d2
      FROM f JOIN o oo ON oo.o_custkey = f.o_custkey AND oo.d > f.d1
      GROUP BY 1),
per AS (SELECT f.o_custkey,
               CASE WHEN s.d2 IS NOT NULL THEN s.d2 - f.d1
                    ELSE hz.h - f.d1 END AS dur,
               CASE WHEN s.d2 IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM f LEFT JOIN s USING (o_custkey) CROSS JOIN hz),
grp AS (SELECT dur, CAST(sum(ev) AS BIGINT) AS d_i,
               CAST(count(*) AS BIGINT) AS all_i
        FROM per GROUP BY dur),
rk1 AS (SELECT dur, d_i,
               (SELECT count(*) FROM per) -
               coalesce(sum(all_i) OVER (ORDER BY dur
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS n_risk
        FROM grp),
rk AS (SELECT dur, d_i, n_risk,
              sum(CASE WHEN d_i > 0 AND d_i < n_risk
                  THEN ln(1 - d_i / CAST(n_risk AS DOUBLE))
                  ELSE 0 END)
                OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) AS lnS,
              max(CASE WHEN d_i >= n_risk THEN 1 ELSE 0 END)
                OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) AS dead
       FROM rk1)
SELECT CAST(dur AS BIGINT) AS t_days, CAST(n_risk AS BIGINT) AS n_risk,
       d_i AS n_events,
       CASE WHEN dead = 1 THEN 0.0 ELSE round(exp(lnS), 6) END AS survival
FROM rk WHERE d_i > 0
"""


@register("stats_survival_km", _KM_ORACLE)
def stats_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier curve of days from first to second order, censoring
    single-order customers at the horizon. Scale: orders collapse to the
    customer grain (two hash-aggs sharing the key), then to the
    distinct-duration grain; the risk-set and survival windows run over
    that bounded duration series. The second-order lookup is a
    self-aggregation, not a join explosion — min over a filtered
    self-join keyed by customer."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("d")
    )
    hz = o.agg(F.max("d").alias("h"))
    f = o.groupBy("o_custkey").agg(F.min("d").alias("d1"))
    s = (
        o.join(f, "o_custkey")
        .filter(F.col("d") > F.col("d1"))
        .groupBy("o_custkey")
        .agg(F.min("d").alias("d2"))
    )
    per = (
        f.join(s, "o_custkey", "left")
        .crossJoin(F.broadcast(hz))
        .select(
            F.when(
                F.col("d2").isNotNull(), F.datediff("d2", "d1")
            ).otherwise(F.datediff("h", "d1")).alias("dur"),
            F.when(F.col("d2").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    grp = per.groupBy("dur").agg(
        F.sum("ev").cast("bigint").alias("d_i"),
        F.count(F.lit(1)).cast("bigint").alias("all_i"),
    )
    wex = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    win = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    # total customers as an in-plan window sum over the bounded duration
    # table — no driver-side count() action
    n_total = F.sum("all_i").over(Window.partitionBy())
    n_risk = n_total - F.coalesce(F.sum("all_i").over(wex), F.lit(0))
    rk = grp.select(
        "dur",
        "d_i",
        n_risk.alias("n_risk"),
    ).select(
        "dur",
        "d_i",
        "n_risk",
        F.sum(
            F.when(
                (F.col("d_i") > 0) & (F.col("d_i") < F.col("n_risk")),
                F.log(1 - F.col("d_i") / F.col("n_risk").cast("double")),
            ).otherwise(0.0)
        ).over(win).alias("lnS"),
        # once an interval's events exhaust the risk set, S drops to
        # exactly 0 — ln(0) is undefined, so carry a sticky flag instead
        F.max(
            F.when(F.col("d_i") >= F.col("n_risk"), 1).otherwise(0)
        ).over(win).alias("dead"),
    )
    return rk.filter(F.col("d_i") > 0).select(
        F.col("dur").cast("bigint").alias("t_days"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d_i").alias("n_events"),
        F.when(F.col("dead") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp("lnS"), 6))
        .alias("survival"),
    )


# ---------------------------------------------------------------------------
# orders_cohort_ltv — the LTV triangle: cohort = month of the customer's
# first order; k = months since cohort; cumulative revenue per customer.
# ---------------------------------------------------------------------------

_LTV_ORACLE = """
WITH o AS (SELECT o_custkey,
                  CAST(o_totalprice AS DECIMAL(18,2)) AS p,
                  CAST(date_trunc('month', o_orderdate) AS DATE) AS m
           FROM orders),
f AS (SELECT o_custkey, min(m) AS cohort FROM o GROUP BY 1),
cs AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size
       FROM f GROUP BY cohort),
rev AS (SELECT f.cohort,
               CAST(datediff('month', f.cohort, o.m) AS INT) AS k,
               CAST(sum(o.p) AS DECIMAL(18,2)) AS revenue
        FROM o JOIN f USING (o_custkey) GROUP BY 1, 2)
SELECT strftime(rev.cohort, '%Y-%m-%d') AS cohort,
       rev.k, cs.cohort_size,
       CAST(rev.revenue AS DOUBLE) AS revenue,
       floor(CAST(sum(rev.revenue) OVER (PARTITION BY rev.cohort
                 ORDER BY rev.k ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / cs.cohort_size * 100 + 0.5) / 100
         AS cum_ltv_per_customer
FROM rev JOIN cs ON cs.cohort = rev.cohort
"""


@register("orders_cohort_ltv", _LTV_ORACLE)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per customer by (first-order-month cohort,
    month index). Scale: one customer-grain first-order agg, one
    (cohort, k) revenue agg (both partial-combining), cohort sizes
    broadcast; the cumulative window runs per cohort over <=|months|
    rows. The revenue cumsum is ordered-window sequential in both
    engines, so 2dp rounding is stable."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        # DECIMAL(18,2) summation is exact and partition-order
        # independent, so both engines produce bit-identical revenue —
        # double sums flip 2dp rounding in the last ulp
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
        F.trunc(F.col("o_orderdate").cast("date"), "month").alias("m"),
    )
    f = o.groupBy("o_custkey").agg(F.min("m").alias("cohort"))
    cs = f.groupBy("cohort").agg(F.count(F.lit(1)).cast("bigint").alias("cohort_size"))
    rev = (
        o.join(f, "o_custkey")
        .groupBy(
            "cohort",
            F.months_between(F.col("m"), F.col("cohort")).cast("int").alias("k"),
        )
        .agg(F.sum("p").cast("decimal(18,2)").alias("revenue"))
    )
    wc = Window.partitionBy("cohort").orderBy("k").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return rev.join(F.broadcast(cs), "cohort").select(
        F.date_format("cohort", "yyyy-MM-dd").alias("cohort"),
        "k",
        "cohort_size",
        F.col("revenue").cast("double").alias("revenue"),
        # floor(x*100+0.5)/100 instead of round(x,2): Spark rounds the
        # shortest decimal string HALF_UP while DuckDB rounds the binary
        # double, which disagree exactly at half-way representations; the
        # floor form is a pure double computation identical in both
        (
            F.floor(
                F.sum("revenue").over(wc).cast("double")
                / F.col("cohort_size")
                * 100
                + 0.5
            )
            / 100
        ).alias("cum_ltv_per_customer"),
    )
