"""Query surface batch 39 (round 4 close): probabilistic-forecast quality
and heavy-tail structure.

- Brier score with the Murphy decomposition (reliability / resolution /
  uncertainty) for the class-0 centroid cosine scorer — the proper-score
  companion to eval_calibration_bins' ECE: ECE says HOW miscalibrated,
  the decomposition says whether the score is bad because it is
  miscalibrated (reliability) or because it cannot discriminate
  (resolution vs the base-rate uncertainty floor).
- Continuous-MLE power-law exponent (Clauset-Shalizi-Newman alpha-hat)
  of the co-ordered-parts degree distribution — the standard heavy-tail
  diagnostic for graph workloads: alpha near 2 means celebrity vertices
  dominate and skew machinery (salting, degree-oriented orientation)
  is mandatory, large alpha means the tail is benign.

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283); these extend the evaluation/graph operator
families the brief requires. Exact DuckDB oracles for both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.queries_pipeline7 import (
    _COORD_EDGE_CTE,
    _coordered_edges,
)
from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# eval_brier_decomposition — same scorer, confidence mapping, and 10-bin
# grid as eval_calibration_bins (queries_pipeline9.py), so the two reports
# read side by side. Scores round(6) before the confidence map in BOTH
# engines, making bin assignment and every downstream aggregate
# cross-engine exact.
#
# brier       = avg((conf - pos)^2)                 (the proper score)
# uncertainty = ybar * (1 - ybar)                   (base-rate floor)
# reliability = sum_k n_k (confbar_k - ybar_k)^2 /N (calibration penalty)
# resolution  = sum_k n_k (ybar_k   - ybar)^2   /N  (discrimination gain)
# ---------------------------------------------------------------------------

_BRIER_ORACLE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
                  CAST(label = 0 AS INT) AS pos FROM embeddings),
el AS (SELECT vec_id, ord, emb[ord] AS x
       FROM e, (SELECT unnest(range(1, 65)) AS ord)),
cen AS (SELECT ord, round(avg(x), 6) AS c
        FROM el JOIN e USING (vec_id) WHERE e.pos = 1 GROUP BY ord),
cn AS (SELECT sqrt(sum(c * c)) AS nrm, array_agg(c ORDER BY ord) AS cvec FROM cen),
s AS (SELECT e.pos,
             round(list_dot_product(e.emb, cn.cvec)
                   / (sqrt(list_dot_product(e.emb, e.emb)) * cn.nrm), 6) AS score
      FROM e CROSS JOIN cn),
b AS (SELECT pos, (score + 1) / 2 AS conf,
             least(CAST(floor(((score + 1) / 2) * 10) AS INT), 9) AS bin FROM s),
g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
             avg(conf) AS cbar, avg(CAST(pos AS DOUBLE)) AS ybar_k
      FROM b GROUP BY bin),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total,
               round(avg((conf - pos) * (conf - pos)), 6) AS brier,
               avg(CAST(pos AS DOUBLE)) AS ybar
        FROM b)
SELECT tot.n_total,
       tot.brier,
       round(tot.ybar * (1 - tot.ybar), 6) AS uncertainty,
       round(sum(g.n * (g.cbar - g.ybar_k) * (g.cbar - g.ybar_k)) / tot.n_total, 6)
         AS reliability,
       round(sum(g.n * (g.ybar_k - tot.ybar) * (g.ybar_k - tot.ybar)) / tot.n_total, 6)
         AS resolution
FROM g CROSS JOIN tot
GROUP BY tot.n_total, tot.brier, tot.ybar
"""


@register("eval_brier_decomposition", _BRIER_ORACLE)
def eval_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score + Murphy decomposition of the class-0 centroid cosine
    scorer over 10 confidence bins. Scale: the centroid collapses to ONE
    broadcast row, the confidence is a narrow in-row fold, and the whole
    report reduces through one <=10-row bin hash-agg crossJoined with a
    one-row total — two tiny aggregates over a single corpus scan."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("emb"),
        (F.col("label") == 0).cast("int").alias("pos"),
    )
    el = e.filter(F.col("pos") == 1).select(F.posexplode("emb")).withColumnsRenamed(
        {"pos": "ord", "col": "x"}
    )
    cen = el.groupBy("ord").agg(F.round(F.avg("x"), 6).alias("c"))
    cn = cen.agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nrm"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("ord", "c"))), lambda s: s["c"]
        ).alias("cvec"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("emb"), F.col("cvec"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    self_norm = F.sqrt(
        F.aggregate(F.col("emb"), F.lit(0.0), lambda acc, v: acc + v * v)
    )
    score = F.round(dot / (self_norm * F.col("nrm")), 6)
    b = e.crossJoin(F.broadcast(cn)).select(
        "pos",
        ((score + 1) / 2).alias("conf"),
        F.least(F.floor(((score + 1) / 2) * 10), F.lit(9)).cast("int").alias("bin"),
    )
    g = b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.avg("conf").alias("cbar"),
        F.avg(F.col("pos").cast("double")).alias("ybar_k"),
    )
    tot = b.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.round(
            F.avg((F.col("conf") - F.col("pos")) * (F.col("conf") - F.col("pos"))), 6
        ).alias("brier"),
        F.avg(F.col("pos").cast("double")).alias("ybar"),
    )
    return (
        g.crossJoin(F.broadcast(tot))
        .groupBy("n_total", "brier", "ybar")
        .agg(
            F.round(
                F.sum(
                    F.col("n") * (F.col("cbar") - F.col("ybar_k"))
                    * (F.col("cbar") - F.col("ybar_k"))
                )
                / F.first("n_total"),
                6,
            ).alias("reliability"),
            F.round(
                F.sum(
                    F.col("n") * (F.col("ybar_k") - F.col("ybar"))
                    * (F.col("ybar_k") - F.col("ybar"))
                )
                / F.first("n_total"),
                6,
            ).alias("resolution"),
        )
        .select(
            "n_total",
            "brier",
            F.round(F.col("ybar") * (1 - F.col("ybar")), 6).alias("uncertainty"),
            "reliability",
            "resolution",
        )
    )


# ---------------------------------------------------------------------------
# graph_degree_powerlaw — continuous-MLE tail exponent (Clauset-Shalizi-
# Newman 2009, eq. 3.1 with the half-integer correction):
#   alpha_hat = 1 + n_tail / sum(ln(d_i / (dmin - 0.5)))   for d_i >= dmin
# over the symmetric degree distribution of the co-ordered-parts graph,
# with dmin pinned (the estimator's input, not estimated here — the KS
# scan for dmin is a 20-line extension on the same degree table).
# ---------------------------------------------------------------------------

_PL_DMIN = 3

_POWERLAW_ORACLE = f"""
WITH {_COORD_EDGE_CTE},
sym AS (SELECT p1 AS u FROM e0 UNION ALL SELECT p2 AS u FROM e0),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY u),
tail AS (SELECT d FROM deg WHERE d >= {_PL_DMIN})
SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_vertices,
       CAST(count(*) AS BIGINT) AS n_tail,
       CAST({_PL_DMIN} AS INT) AS dmin,
       round(1 + count(*) / sum(ln(d / ({_PL_DMIN} - 0.5))), 6) AS alpha_hat,
       CAST(max(d) AS BIGINT) AS d_max
FROM tail
"""


@register("graph_degree_powerlaw", _POWERLAW_ORACLE)
def graph_degree_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law MLE over the co-order degree distribution. Scale: degrees
    are ONE hash-agg over the (reused) edge exchange; the estimator is a
    single log-sum aggregate over the |tail| rows — no sort, no window;
    the vertex count rides the same degree table as a one-row broadcast."""
    edges = _coordered_edges(spark, sf_dir)
    sym = edges.select(F.col("p1").alias("u")).unionAll(
        edges.select(F.col("p2").alias("u"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    nv = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_vertices"))
    tail = deg.filter(F.col("d") >= _PL_DMIN)
    return (
        tail.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tail"),
            F.round(
                1
                + F.count(F.lit(1))
                / F.sum(F.log(F.col("d") / (_PL_DMIN - 0.5))),
                6,
            ).alias("alpha_hat"),
            F.max("d").cast("bigint").alias("d_max"),
        )
        .crossJoin(F.broadcast(nv))
        .select(
            "n_vertices",
            "n_tail",
            F.lit(_PL_DMIN).cast("int").alias("dmin"),
            "alpha_hat",
            "d_max",
        )
    )
