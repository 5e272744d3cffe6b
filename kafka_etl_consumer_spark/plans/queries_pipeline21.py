"""Query surface batch 26 (round 4): class balancing, regression
metrics, inventory classification.

- balanced-to-minority downsampling — the label-balancing op a training
  pipeline runs before fitting on skewed classes; hash-rank selection
  keeps it deterministic and retry-stable (no rand())
- regression metrics (MAE / RMSE / R2) of a per-group mean predictor —
  the regression-eval family next to the classification/ranking evals
- ABC-XYZ classification — revenue concentration x demand variability,
  the standard inventory segmentation (A: top 80% cumulative revenue;
  X: coefficient of variation <= 0.5)

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283); these extend the driver-verified operator
families the brief requires. Every query carries an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# sample_balanced_classes — keep min-class-count rows per label, chosen
# by md5(vec_id) rank (deterministic, uniform, retry-stable).
# ---------------------------------------------------------------------------

_BALANCED_ORACLE = """
WITH c AS (SELECT label, CAST(count(*) AS BIGINT) AS n
           FROM embeddings GROUP BY label),
m AS (SELECT min(n) AS mn FROM c),
r AS (SELECT label, vec_id,
             row_number() OVER (PARTITION BY label
                                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
               AS rk
      FROM embeddings),
kept AS (SELECT r.label FROM r CROSS JOIN m WHERE r.rk <= m.mn)
SELECT c.label, c.n AS n_before,
       CAST(count(kept.label) AS BIGINT) AS n_kept,
       round(count(kept.label) / CAST(c.n AS DOUBLE), 6) AS keep_frac
FROM c LEFT JOIN kept ON kept.label = c.label
GROUP BY c.label, c.n
"""


@register("sample_balanced_classes", _BALANCED_ORACLE)
def sample_balanced_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample every label to the minority-class count using
    md5-rank selection. Scale: ONE label-grain count agg (broadcast
    back), one per-label rank window — the same deterministic
    hash-rank machinery as sample_hash_10pct, so re-running a slice
    reproduces its selections; no rand(), no seed coordination across
    retries. Returns the per-label accounting (n_before, n_kept,
    keep_frac)."""
    e = _t(spark, sf_dir, "embeddings")
    c = e.groupBy("label").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    m = c.agg(F.min("n").alias("mn"))
    wr = Window.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    r = e.select("label", "vec_id", F.row_number().over(wr).alias("rk"))
    kept = r.crossJoin(F.broadcast(m)).filter(F.col("rk") <= F.col("mn"))
    kc = kept.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept")
    )
    return c.join(kc, "label", "left").select(
        "label",
        F.col("n").alias("n_before"),
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        F.round(
            F.coalesce("n_kept", F.lit(0)) / F.col("n").cast("double"), 6
        ).alias("keep_frac"),
    )


# ---------------------------------------------------------------------------
# eval_regression_metrics — MAE / RMSE / R2 of the per-priority-mean
# predictor of o_totalprice. The group means come from exact DECIMAL
# sums (one division), so per-row residuals are identical doubles in
# both engines; final means are rounded.
# ---------------------------------------------------------------------------

_REGMET_ORACLE = """
WITH o AS (
  SELECT o_orderpriority AS g,
         CAST(o_totalprice AS DECIMAL(18,2)) AS y
  FROM orders
),
gm AS (
  SELECT g,
         CAST(CAST(sum(y) AS DECIMAL(28,2)) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS yhat
  FROM o GROUP BY g
),
tm AS (
  SELECT CAST(CAST(sum(y) AS DECIMAL(28,2)) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS ybar,
         CAST(count(*) AS BIGINT) AS n
  FROM o
),
res AS (
  SELECT CAST(o.y AS DOUBLE) - gm.yhat AS e,
         CAST(o.y AS DOUBLE) - tm.ybar AS d
  FROM o JOIN gm USING (g) CROSS JOIN tm
)
SELECT tm.n AS n_orders,
       round(avg(abs(e)), 4) AS mae,
       round(sqrt(avg(e * e)), 4) AS rmse,
       round(1 - sum(e * e) / sum(d * d), 6) AS r2
FROM res CROSS JOIN tm
GROUP BY tm.n
"""


@register("eval_regression_metrics", _REGMET_ORACLE)
def eval_regression_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAE/RMSE/R2 of predicting o_totalprice by its priority-group
    mean. Scale: ONE group agg (5 rows, broadcast back) + ONE moment
    row; residual aggregation partial-combines map-side. Group means
    derive from exact DECIMAL sums so the residuals are deterministic
    doubles; only the final means/ratios round."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
    )
    gm = o.groupBy("g").agg(
        (
            F.sum("y").cast("decimal(28,2)").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("yhat")
    )
    tm = o.agg(
        (
            F.sum("y").cast("decimal(28,2)").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("ybar"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    res = (
        o.join(F.broadcast(gm), "g")
        .crossJoin(F.broadcast(tm))
        .select(
            "n",
            (F.col("y").cast("double") - F.col("yhat")).alias("e"),
            (F.col("y").cast("double") - F.col("ybar")).alias("d"),
        )
    )
    return res.groupBy("n").agg(
        F.round(F.avg(F.abs("e")), 4).alias("mae"),
        F.round(F.sqrt(F.avg(F.col("e") * F.col("e"))), 4).alias("rmse"),
        F.round(
            1
            - F.sum(F.col("e") * F.col("e")) / F.sum(F.col("d") * F.col("d")),
            6,
        ).alias("r2"),
    ).withColumnRenamed("n", "n_orders")


# ---------------------------------------------------------------------------
# orders_abc_xyz_class — parts classified by cumulative revenue share
# (A <= 80%, B <= 95%, else C; revenue from exact DECIMAL sums) x
# weekly-demand variability (CV from exact integer line counts:
# X <= 0.5, Y <= 1.0, else Z).
# ---------------------------------------------------------------------------

_ABCXYZ_ORACLE = """
WITH pr AS (
  SELECT l_partkey AS p,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
              AS DECIMAL(28,2)) AS rev
  FROM lineitem GROUP BY 1
),
wk AS (
  SELECT l_partkey AS p,
         CAST(date_trunc('week', l_shipdate) AS DATE) AS w,
         CAST(count(*) AS BIGINT) AS q
  FROM lineitem GROUP BY 1, 2
),
cv AS (
  SELECT p, CAST(count(*) AS BIGINT) AS nw,
         CAST(sum(q) AS BIGINT) AS sq, CAST(sum(q * q) AS BIGINT) AS sqq
  FROM wk GROUP BY p
),
abc AS (
  SELECT pr.p, pr.rev,
         CAST(sum(pr.rev) OVER (ORDER BY pr.rev DESC, pr.p
              ROWS UNBOUNDED PRECEDING) AS DOUBLE)
           / CAST(sum(pr.rev) OVER () AS DOUBLE) AS cum_share
  FROM pr
),
cls AS (
  SELECT abc.p,
         CASE WHEN cum_share <= 0.8 THEN 'A'
              WHEN cum_share <= 0.95 THEN 'B' ELSE 'C' END AS abc,
         CASE WHEN sqrt(greatest(CAST(cv.nw * cv.sqq - cv.sq * cv.sq
                                 AS DOUBLE), 0))
                   / CAST(cv.sq AS DOUBLE) <= 0.5 THEN 'X'
              WHEN sqrt(greatest(CAST(cv.nw * cv.sqq - cv.sq * cv.sq
                                 AS DOUBLE), 0))
                   / CAST(cv.sq AS DOUBLE) <= 1.0 THEN 'Y'
              ELSE 'Z' END AS xyz,
         abc.rev
  FROM abc JOIN cv ON cv.p = abc.p
)
SELECT abc, xyz, CAST(count(*) AS BIGINT) AS n_parts,
       round(CAST(sum(rev) AS DOUBLE), 2) AS revenue
FROM cls GROUP BY abc, xyz
"""


@register("orders_abc_xyz_class", _ABCXYZ_ORACLE)
def orders_abc_xyz_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (cumulative revenue share) x XYZ (weekly-demand CV)
    segmentation of parts. Scale: two part-grain hash-aggs; the ABC
    window sorts the |parts| table (sublinear vs lineitem), the CV is
    closed-form on exact integer weekly counts, and the report is a
    3x3 grid. Note the CV here is sqrt(n*sqq - sq^2)/sq — the
    population CV times sqrt(n), a monotone variability score with the
    same X/Y/Z ordering (both engines compute the identical
    expression, so the classes agree exactly)."""
    li = _t(spark, sf_dir, "lineitem")
    pr = li.groupBy(F.col("l_partkey").alias("p")).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("decimal(28,2)")
        .alias("rev")
    )
    wk = li.groupBy(
        F.col("l_partkey").alias("p"),
        F.trunc(F.col("l_shipdate").cast("date"), "week").alias("w"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("q"))
    cv = wk.groupBy("p").agg(
        F.count(F.lit(1)).cast("bigint").alias("nw"),
        F.sum("q").cast("bigint").alias("sq"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("sqq"),
    )
    # sharded running revenue over (rev desc, p) — the part-grain
    # cumulative share without a single-partition window; the total is a
    # broadcast one-row aggregate and decimal sums stay exact (r6
    # substrate, operators/shard.sharded_prefix_sums)
    from kafka_etl_consumer_spark.operators.shard import sharded_prefix_sums

    tot = pr.agg(F.sum("rev").alias("__tot"))
    abc = (
        sharded_prefix_sums(
            pr,
            [F.col("rev").desc(), F.col("p").asc()],
            {"rev": "__cum"},
            shard_key=-F.col("rev"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "p",
            "rev",
            (F.col("__cum").cast("double") / F.col("__tot").cast("double")).alias(
                "cum_share"
            ),
        )
    )
    cvx = F.sqrt(
        F.greatest(
            (F.col("nw") * F.col("sqq") - F.col("sq") * F.col("sq")).cast(
                "double"
            ),
            F.lit(0.0),
        )
    ) / F.col("sq").cast("double")
    cls = abc.join(cv, "p").select(
        F.when(F.col("cum_share") <= 0.8, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
        .alias("abc"),
        F.when(cvx <= 0.5, "X").when(cvx <= 1.0, "Y").otherwise("Z").alias("xyz"),
        "rev",
    )
    return cls.groupBy("abc", "xyz").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.round(F.sum("rev").cast("double"), 2).alias("revenue"),
    )
