"""Query surface batch 29 (round 4): PR-curve summarization, code
filtering, near-duplicate invoice detection.

- average precision (the PR-curve area) of the view-count score — the
  imbalanced-class companion of eval_auc_rank's ROC view
- code-vs-prose detection by symbol density — the corpus filter every
  LLM data pipeline runs to route code away from prose processing
- duplicate-invoice candidates — same customer, same price bucket,
  within 90 days: the fuzzy-join fraud/dedup screen on transactions

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283); these extend the driver-verified operator
families the brief requires. Every query carries an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# eval_pr_auc — average precision: AP = sum_i (R_i - R_{i-1}) * P_i
# over distinct scores descending. Exact-integer cumsums -> identical
# rational arithmetic in both engines.
# ---------------------------------------------------------------------------

_AP_ORACLE = """
WITH u AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS score,
         max(CASE WHEN event_type = 'purchase' AND value > 150
             THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
g AS (
  SELECT score, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(conv) AS BIGINT) AS pos
  FROM u GROUP BY score
),
c AS (
  SELECT score,
         CAST(sum(pos) OVER (ORDER BY score DESC
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
         CAST(sum(n) OVER (ORDER BY score DESC
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pp,
         CAST(sum(pos) OVER () AS BIGINT) AS p_total,
         CAST(sum(n) OVER () AS BIGINT) AS n_total
  FROM g
),
d AS (
  SELECT tp, pp, p_total, n_total,
         tp - coalesce(lag(tp) OVER (ORDER BY pp), 0) AS d_tp
  FROM c
)
SELECT CAST(max(n_total) AS BIGINT) AS n_users,
       CAST(max(p_total) AS BIGINT) AS n_pos,
       round(max(p_total) / CAST(max(n_total) AS DOUBLE), 6) AS prevalence,
       round(sum((d_tp / CAST(p_total AS DOUBLE))
                 * (tp / CAST(pp AS DOUBLE))), 6) AS avg_precision
FROM d
"""


@register("eval_pr_auc", _AP_ORACLE)
def eval_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision of the view-count score against the conversion
    flag — the PR-curve summary that stays honest under class
    imbalance (ROC-AUC flatters rare-positive problems; AP's baseline
    is the prevalence, reported beside it). Scale: the same
    distinct-score cumulative-window sweep as eval_f1_best_threshold;
    one user-grain agg, one bounded window pass, one moment row."""
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("score"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
            ).otherwise(0)
        ).alias("conv"),
    )
    g = u.groupBy("score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("conv").cast("bigint").alias("pos"),
    )
    wc = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    c = g.select(
        F.sum("pos").over(wc).cast("bigint").alias("tp"),
        F.sum("n").over(wc).cast("bigint").alias("pp"),
        F.sum("pos").over(wall).cast("bigint").alias("p_total"),
        F.sum("n").over(wall).cast("bigint").alias("n_total"),
    )
    d = c.select(
        "tp",
        "pp",
        "p_total",
        "n_total",
        (
            F.col("tp")
            - F.coalesce(F.lag("tp").over(Window.orderBy("pp")), F.lit(0))
        ).alias("d_tp"),
    )
    return d.agg(
        F.max("n_total").cast("bigint").alias("n_users"),
        F.max("p_total").cast("bigint").alias("n_pos"),
        F.round(
            F.max("p_total") / F.max("n_total").cast("double"), 6
        ).alias("prevalence"),
        F.round(
            F.sum(
                (F.col("d_tp") / F.col("p_total").cast("double"))
                * (F.col("tp") / F.col("pp").cast("double"))
            ),
            6,
        ).alias("avg_precision"),
    )


# ---------------------------------------------------------------------------
# text_code_detect — symbol-density code filter per source. The symbol
# count comes from stripping every non-symbol character, so both
# engines count with the same regex class.
# ---------------------------------------------------------------------------

_CODE_PAT = r"[^{};=<>()\[\]#]"

_CODE_ORACLE = f"""
WITH d AS (
  SELECT source,
         len(text) AS n_chars,
         len(regexp_replace(text, '{_CODE_PAT}', '', 'g')) AS n_sym
  FROM documents WHERE len(text) > 0
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n_sym / CAST(n_chars AS DOUBLE) > 0.02
            THEN 1 ELSE 0 END) AS BIGINT) AS n_code_docs,
       round(avg(n_sym / CAST(n_chars AS DOUBLE)), 6) AS avg_symbol_ratio,
       CAST(sum(n_sym) AS BIGINT) AS total_symbols
FROM d GROUP BY source
"""


@register("text_code_detect", _CODE_ORACLE)
def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose routing stats per source: docs whose
    code-symbol density ({{}};=<>()[]#) exceeds 2%. Scale: a narrow
    per-row regexp strip + length in the scan projection, ONE
    source-grain hash-agg — the standard first-pass corpus filter
    before code and prose take different cleaning paths."""
    docs = _t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    d = docs.select(
        "source",
        F.length("text").alias("n_chars"),
        F.length(F.regexp_replace("text", _CODE_PAT, "")).alias("n_sym"),
    )
    ratio = F.col("n_sym") / F.col("n_chars").cast("double")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(ratio > 0.02, 1).otherwise(0))
        .cast("bigint")
        .alias("n_code_docs"),
        F.round(F.avg(ratio), 6).alias("avg_symbol_ratio"),
        F.sum("n_sym").cast("bigint").alias("total_symbols"),
    )


# ---------------------------------------------------------------------------
# orders_duplicate_invoices — same customer, same floor(price/5000)
# bucket, within 90 days: top-20 candidate pairs. floor (not round) so
# the bucket is identical across engines at half-boundaries.
# ---------------------------------------------------------------------------

_DUPINV_ORACLE = """
WITH o AS (
  SELECT o_orderkey AS k, o_custkey AS c,
         floor(o_totalprice / 5000) AS b,
         o_totalprice AS p, CAST(o_orderdate AS DATE) AS d
  FROM orders
)
SELECT a.c AS custkey, a.k AS key_a, b2.k AS key_b,
       CAST(a.b AS BIGINT) AS price_bucket,
       a.p AS price_a, b2.p AS price_b,
       CAST(abs(b2.d - a.d) AS BIGINT) AS days_apart
FROM o a JOIN o b2 ON a.c = b2.c AND a.b = b2.b AND a.k < b2.k
                   AND abs(b2.d - a.d) <= 90
ORDER BY days_apart, key_a, key_b LIMIT 20
"""


@register("orders_duplicate_invoices", _DUPINV_ORACLE)
def orders_duplicate_invoices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-invoice screen: same customer + same 5000-wide price
    bucket + within 90 days. Scale: an EQUI self-join on (customer,
    bucket) — the blocking keys bound each join group, the date
    predicate filters inside groups, and the top-20 report is
    TakeOrderedAndProject. The price bucket uses floor, not round:
    round() disagrees between engines exactly at double half-way
    points."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("c"),
        F.floor(F.col("o_totalprice") / 5000).alias("b"),
        F.col("o_totalprice").alias("p"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    a = o.select(
        F.col("k").alias("key_a"), F.col("c").alias("custkey"),
        F.col("b").alias("price_bucket"), F.col("p").alias("price_a"),
        F.col("d").alias("d_a"),
    )
    b = o.select(
        F.col("k").alias("key_b"), F.col("c").alias("c2"),
        F.col("b").alias("b2"), F.col("p").alias("price_b"),
        F.col("d").alias("d_b"),
    )
    j = a.join(
        b,
        (F.col("custkey") == F.col("c2"))
        & (F.col("price_bucket") == F.col("b2"))
        & (F.col("key_a") < F.col("key_b"))
        & (F.abs(F.datediff("d_b", "d_a")) <= 90),
    )
    return (
        j.select(
            "custkey",
            "key_a",
            "key_b",
            F.col("price_bucket").cast("bigint").alias("price_bucket"),
            "price_a",
            "price_b",
            F.abs(F.datediff("d_b", "d_a")).cast("bigint").alias("days_apart"),
        )
        .orderBy("days_apart", "key_a", "key_b")
        .limit(20)
    )
