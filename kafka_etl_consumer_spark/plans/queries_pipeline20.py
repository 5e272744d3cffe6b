"""Query surface batch 25 (round 4): threshold tuning, rank
correlation, duplicate-class accounting.

- best-F1 threshold sweep — the operating-point picker for a scoring
  model: evaluate every distinct score as a cut via cumulative TP/FP
  windows, no per-threshold rescan
- Spearman rank correlation — monotone association between user
  activity and purchases; tie-averaged ranks are exact halves so the
  moment algebra is cross-engine identical
- duplicate-class size histogram — the curation report behind "how
  duplicated is this corpus": how many exact-dup classes of each size

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283); these extend the driver-verified operator
families the brief requires. Every query carries an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# eval_f1_best_threshold — predict positive when score >= t for every
# distinct score t; cumulative TP / predicted-positive counts come from
# ONE descending window over the distinct-score table. Deterministic
# pick: max F1, ties to the LOWER threshold (higher recall).
# ---------------------------------------------------------------------------

_F1_ORACLE = """
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
         CAST(sum(pos) OVER () AS BIGINT) AS p_total
  FROM g
),
f AS (
  SELECT score AS threshold, tp, pp - tp AS fp, p_total - tp AS fn,
         2.0 * tp / (pp + p_total) AS f1,
         tp / CAST(pp AS DOUBLE) AS prec,
         tp / CAST(p_total AS DOUBLE) AS recall
  FROM c
)
SELECT threshold, tp, fp, fn,
       round(prec, 6) AS precision_at_t, round(recall, 6) AS recall_at_t,
       round(f1, 6) AS f1
FROM f ORDER BY f1 DESC, threshold ASC LIMIT 1
"""


@register("eval_f1_best_threshold", _F1_ORACLE)
def eval_f1_best_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-F1 cut of the view-count score against the conversion flag.
    Scale: ONE user-grain hash-agg, one distinct-score agg; the
    threshold sweep is a single cumulative window over |distinct
    scores| rows (never a per-threshold rescan), and the argmax is
    TakeOrdered on that bounded table. F1 = 2TP/(PP + P) avoids the
    P+R division chain, so the double is one expression in both
    engines."""
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
        "score",
        F.sum("pos").over(wc).cast("bigint").alias("tp"),
        F.sum("n").over(wc).cast("bigint").alias("pp"),
        F.sum("pos").over(wall).cast("bigint").alias("p_total"),
    )
    f = c.select(
        F.col("score").alias("threshold"),
        "tp",
        (F.col("pp") - F.col("tp")).alias("fp"),
        (F.col("p_total") - F.col("tp")).alias("fn"),
        (2.0 * F.col("tp") / (F.col("pp") + F.col("p_total"))).alias("f1_raw"),
        (F.col("tp") / F.col("pp").cast("double")).alias("prec"),
        (F.col("tp") / F.col("p_total").cast("double")).alias("recall"),
    )
    return (
        f.orderBy(F.col("f1_raw").desc(), F.col("threshold").asc())
        .limit(1)
        .select(
            "threshold",
            "tp",
            "fp",
            "fn",
            F.round("prec", 6).alias("precision_at_t"),
            F.round("recall", 6).alias("recall_at_t"),
            F.round("f1_raw", 6).alias("f1"),
        )
    )


# ---------------------------------------------------------------------------
# stats_spearman_corr — Spearman rho between per-user view count and
# purchase count: Pearson over tie-averaged ranks. Average ranks are
# exact halves, so every moment sum is an exact multiple of 0.25 and
# both engines compute identical doubles.
# ---------------------------------------------------------------------------

_SPEARMAN_ORACLE = """
WITH u AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY user_id
),
rk AS (
  SELECT rank() OVER (ORDER BY x)
           + (count(*) OVER (PARTITION BY x) - 1) / 2.0 AS rx,
         rank() OVER (ORDER BY y)
           + (count(*) OVER (PARTITION BY y) - 1) / 2.0 AS ry
  FROM u
),
mo AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         sum(rx) AS sx, sum(ry) AS sy, sum(rx * ry) AS sxy,
         sum(rx * rx) AS sxx, sum(ry * ry) AS syy,
         CAST(count(*) AS BIGINT) AS n_users
  FROM rk
)
SELECT n_users,
       round((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
         AS spearman_rho
FROM mo
"""


@register("stats_spearman_corr", _SPEARMAN_ORACLE)
def stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rho between user view count and purchase count. Scale:
    ONE user-grain hash-agg, then the joint moments collapse to the
    (x, y) CELL GRID: both rank functions are marginals (rx depends
    only on x, ry only on y), so tie-averaged ranks come from
    cumulative counts over each marginal's distinct-value grid
    (integer activity counts — tiny grids) and Σ rx·ry = Σ cells
    c·rx(x)·ry(y). No per-row rank sort anywhere; ranks are exact
    halves so the moments match the per-row formulation bit for bit
    under heavy ties, which integer counts always have."""
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("y"),
    )
    cell = u.groupBy("x", "y").agg(F.count(F.lit(1)).cast("bigint").alias("c"))

    def _marginal_ranks(col: str, rank_name: str):
        m = cell.groupBy(col).agg(F.sum("c").cast("bigint").alias("t"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        cum = F.sum("t").over(w)
        return m.select(
            col, (cum - F.col("t") + (F.col("t") + 1) / 2.0).alias(rank_name)
        )

    rk = cell.join(_marginal_ranks("x", "rx"), "x").join(
        _marginal_ranks("y", "ry"), "y"
    )
    c = F.col("c")
    mo = rk.agg(
        F.sum("c").cast("double").alias("n"),
        F.sum(c * F.col("rx")).alias("sx"),
        F.sum(c * F.col("ry")).alias("sy"),
        F.sum(c * F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(c * F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(c * F.col("ry") * F.col("ry")).alias("syy"),
        F.sum("c").cast("bigint").alias("n_users"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) * F.sqrt(
        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    )
    return mo.select("n_users", F.round(num / den, 6).alias("spearman_rho"))


# ---------------------------------------------------------------------------
# dedup_class_histogram — distribution of exact-duplicate class sizes:
# md5(text) classes, then how many classes have 1, 2, 3, ... members.
# ---------------------------------------------------------------------------

_DCH_ORACLE = """
WITH cls AS (
  SELECT md5(text) AS fp, CAST(count(*) AS BIGINT) AS sz
  FROM documents GROUP BY 1
)
SELECT sz AS class_size,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(sz) AS BIGINT) AS n_docs
FROM cls GROUP BY sz
"""


@register("dedup_class_histogram", _DCH_ORACLE)
def dedup_class_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of exact-duplicate class sizes. Scale: the fingerprint
    is computed in the scan projection so the class agg shuffles
    16-byte keys, never documents; the histogram re-agg runs on the
    bounded size domain. Complements corpus_dup_rate_by_source (rate)
    with the SHAPE of duplication — boilerplate shows up as a fat
    tail here long before the rate moves."""
    docs = _t(spark, sf_dir, "documents")
    cls = docs.groupBy(F.md5("text").alias("fp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    return cls.groupBy(F.col("sz").alias("class_size")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum("sz").cast("bigint").alias("n_docs"),
    )
