"""Query surface batch 56 (round 10, third wave): randomness by
turning points, Granovetter local bridges, and the Poisson GLM.

- ts_turning_points — the turning-point test of serial randomness
  (Kendall & Stuart): count interior strict local extrema; under iid
  E[T] = 2(n-2)/3 and Var[T] = (16n-29)/90 exactly.
- graph_local_bridges — per-edge triangle support on the co-ordered
  parts graph; an edge with support 0 is a LOCAL BRIDGE (Granovetter
  1973): its endpoints share no neighbor, so removing it pushes their
  distance to >= 3. The zero-support edges are exactly the ties whose
  removal Girvan-Newman-style splitting (graph_edge_betweenness)
  ranks highest in sparse regions — the two queries are a pair.
- ml_poisson_irls_grid — Poisson regression (log link) of the daily
  event count on the centered day index per event type, by 3 Newton
  steps over the CLOCK-bounded daily table — the count-GLM member of
  the ML-on-grids family next to ml_logistic_irls_grid.

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283 of mykidong/kafka-etl-consumer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.queries_pipeline33 import (
    _normal_sf,
    _normal_sf_sql,
)
from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# ts_turning_points — count of strict local extrema vs the iid null
# ---------------------------------------------------------------------------

_TP_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
         round(avg(value), 6) AS m
  FROM events GROUP BY 1, 2
),
lagd AS (
  SELECT event_type, m,
         lag(m) OVER (PARTITION BY event_type ORDER BY d) AS pm,
         lead(m) OVER (PARTITION BY event_type ORDER BY d) AS nm,
         CAST(count(*) OVER (PARTITION BY event_type) AS DOUBLE) AS n
  FROM daily
),
agg AS (
  SELECT event_type, max(n) AS n,
         CAST(sum(CASE WHEN pm IS NOT NULL AND nm IS NOT NULL
                        AND ((m > pm AND m > nm) OR (m < pm AND m < nm))
                       THEN 1 ELSE 0 END) AS BIGINT) AS t
  FROM lagd GROUP BY event_type
),
stat AS (
  SELECT event_type, n, t,
         (t - 2.0 * (n - 2) / 3.0) / sqrt((16.0 * n - 29) / 90.0) AS z
  FROM agg
)
SELECT event_type, CAST(n AS BIGINT) AS n_days, t AS n_turning,
       round(2.0 * (n - 2) / 3.0, 6) AS expected_t,
       round(z, 6) AS z_stat,
       round(least(1.0, 2 * {_normal_sf_sql('abs(z)')}), 6) AS p_value
FROM stat
"""


@register("ts_turning_points", _TP_ORACLE)
def ts_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-point test of serial randomness (Kendall & Stuart, The
    Advanced Theory of Statistics §45.18): count the interior days that
    are a STRICT local max or min of the daily-mean series; under
    exchangeability exactly E[T] = 2(n-2)/3 and
    Var[T] = (16n - 29)/90, with T asymptotically normal. Too few
    turning points flags positive serial dependence (smooth drifts),
    too many flags alternation — the extremum-count complement to
    ts_bartels_rank (rank distances) and ts_runs_test (median
    crossings); all three are MC-audited under the same iid null.
    Strict inequalities make ties drop out of T identically in both
    engines (continuous 6dp daily means). Scale: the daily reduction
    is the only data-proportional stage; the extremum scan is one
    lag+lead window per key over clock-bounded series."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.to_date(F.date_trunc("day", "ts")).alias("d"),
            "value",
        )
        .groupBy("event_type", "d")
        .agg(F.round(F.avg("value"), 6).alias("m"))
    )
    wk = Window.partitionBy("event_type")
    wd = wk.orderBy("d")
    lagd = daily.select(
        "event_type",
        "m",
        F.lag("m").over(wd).alias("pm"),
        F.lead("m").over(wd).alias("nm"),
        F.count(F.lit(1)).over(wk).cast("double").alias("n"),
    )
    is_turn = (
        F.col("pm").isNotNull()
        & F.col("nm").isNotNull()
        & (
            ((F.col("m") > F.col("pm")) & (F.col("m") > F.col("nm")))
            | ((F.col("m") < F.col("pm")) & (F.col("m") < F.col("nm")))
        )
    )
    agg = lagd.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum(is_turn.cast("int")).cast("bigint").alias("t"),
    )
    n = F.col("n")
    z = (F.col("t") - 2.0 * (n - 2) / 3.0) / F.sqrt((16.0 * n - 29) / 90.0)
    return agg.select(
        "event_type",
        n.cast("bigint").alias("n_days"),
        F.col("t").alias("n_turning"),
        F.round(2.0 * (n - 2) / 3.0, 6).alias("expected_t"),
        F.round(z, 6).alias("z_stat"),
        F.round(F.least(F.lit(1.0), 2 * _normal_sf(F.abs(z))), 6).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# graph_local_bridges — per-edge triangle support; support 0 = local bridge
# ---------------------------------------------------------------------------

_LB_TOPK = 40

_LB_ORACLE = f"""
WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
            WHERE l_orderkey % 20 = 0),
e0 AS (SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
       FROM li a JOIN li b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
sym AS (SELECT p1 AS u, p2 AS v FROM e0
        UNION ALL SELECT p2 AS u, p1 AS v FROM e0),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY u),
supp AS (
  SELECT e0.p1, e0.p2, CAST(count(b.v) AS BIGINT) AS support
  FROM e0
  LEFT JOIN sym a ON a.u = e0.p1
  LEFT JOIN sym b ON b.u = e0.p2 AND b.v = a.v
  GROUP BY e0.p1, e0.p2
)
SELECT s.p1 AS pu, s.p2 AS pv, da.d AS deg_u, db.d AS deg_v,
       s.support,
       CAST(CASE WHEN s.support = 0 THEN 1 ELSE 0 END AS INT)
         AS is_local_bridge
FROM supp s JOIN deg da ON da.u = s.p1 JOIN deg db ON db.u = s.p2
ORDER BY s.support, deg_u + deg_v DESC, pu, pv LIMIT {_LB_TOPK}
"""


@register("graph_local_bridges", _LB_ORACLE)
def graph_local_bridges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local bridges (Granovetter 1973, "The Strength of Weak Ties") on
    the co-ordered-parts graph: an edge whose endpoints share NO common
    neighbor — triangle support 0 — is the only route between its
    neighborhoods (removing it raises the endpoint distance to >= 3).
    Emits every edge's triangle support with the bridge flag, support
    ascending (bridges first, then the weakest ties), degree-sum and
    pair tie-breaks, top 40. Support counting is the k-truss
    primitive: one edge ⋈ adjacency ⋈ adjacency wedge join — the same
    bounded shape as graph_triangles, with the edge list's %-20 order
    slice keeping neighborhoods sparse. Scale: the wedge join is the
    standard distributed edge-support plan (partition by edge endpoint,
    count matched wedges); no stage exceeds triangle-counting cost, and
    the TakeOrderedAndProject cut bounds the output. Pairs with
    graph_edge_betweenness: support-0 ties are the sparse-region edges
    a Girvan-Newman split removes first."""
    from kafka_etl_consumer_spark.plans.queries_pipeline7 import _coordered_edges

    e0 = _coordered_edges(spark, sf_dir)
    sym = e0.select(F.col("p1").alias("u"), F.col("p2").alias("v")).unionByName(
        e0.select(F.col("p2").alias("u"), F.col("p1").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    supp = (
        e0.alias("e")
        .join(sym.alias("a"), F.col("a.u") == F.col("e.p1"), "left")
        .join(
            sym.alias("b"),
            (F.col("b.u") == F.col("e.p2")) & (F.col("b.v") == F.col("a.v")),
            "left",
        )
        .groupBy("e.p1", "e.p2")
        .agg(F.count(F.col("b.v")).cast("bigint").alias("support"))
    )
    return (
        supp.join(deg.alias("da"), F.col("p1") == F.col("da.u"))
        .join(deg.alias("db"), F.col("p2") == F.col("db.u"))
        .select(
            F.col("p1").alias("pu"),
            F.col("p2").alias("pv"),
            F.col("da.d").alias("deg_u"),
            F.col("db.d").alias("deg_v"),
            "support",
            (F.col("support") == 0).cast("int").alias("is_local_bridge"),
        )
        .orderBy(
            "support", (F.col("deg_u") + F.col("deg_v")).desc(), "pu", "pv"
        )
        .limit(_LB_TOPK)
    )


# ---------------------------------------------------------------------------
# ml_poisson_irls_grid — Poisson GLM on the clock-bounded daily counts
# ---------------------------------------------------------------------------

_POIS_ITERS = 3


def _pois_oracle(iters: int = _POIS_ITERS) -> str:
    """Unrolled per-key Newton steps on the daily-count table; betas
    quantize to 10dp after every step in both engines (the
    ml_logistic_irls_grid discipline), so the per-day doubles feeding
    the next step are bitwise identical cross-engine."""
    pre = """
WITH daily AS (
  SELECT event_type AS k,
         CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
seq AS (
  SELECT k, y,
         row_number() OVER (PARTITION BY k ORDER BY d)
           - (count(*) OVER (PARTITION BY k) + 1) / 2.0 AS x,
         CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n
  FROM daily
),
it0 AS (
  SELECT k, max(n) AS n, round(ln(avg(CAST(y AS DOUBLE))), 10) AS b0,
         CAST(0 AS DOUBLE) AS b1
  FROM seq GROUP BY k
)"""
    parts = [pre]
    for i in range(1, iters + 1):
        parts.append(f""",
s{i} AS (
  SELECT q.k, q.n, q.b0, q.b1,
         sum(q.y - q.mu)           AS g0,
         sum((q.y - q.mu) * q.x)   AS g1,
         sum(q.mu)                 AS h00,
         sum(q.mu * q.x)           AS h01,
         sum(q.mu * q.x * q.x)     AS h11
  FROM (SELECT s.k, i.n, s.y, s.x, i.b0, i.b1,
               exp(i.b0 + i.b1 * s.x) AS mu
        FROM seq s JOIN it{i - 1} i ON i.k = s.k) q
  GROUP BY q.k, q.n, q.b0, q.b1
),
it{i} AS (
  SELECT k, n,
         round(b0 + (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01), 10)
           AS b0,
         round(b1 + (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01), 10)
           AS b1
  FROM s{i}
)""")
    parts.append(f"""
SELECT it.k AS event_type, CAST(it.n AS BIGINT) AS n_days,
       round(it.b0, 6) AS beta0, round(it.b1, 6) AS beta1,
       round(ll.ll, 4) AS log_lik
FROM it{iters} it JOIN (
  SELECT s.k, sum(s.y * (i.b0 + i.b1 * s.x) - exp(i.b0 + i.b1 * s.x)) AS ll
  FROM seq s JOIN it{iters} i ON i.k = s.k GROUP BY s.k
) ll ON ll.k = it.k""")
    return "".join(parts)


@register("ml_poisson_irls_grid", _pois_oracle())
def ml_poisson_irls_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson regression with log link, y_t ~ Poisson(exp(b0 + b1*x_t))
    of the DAILY EVENT COUNT on the centered day index per event type,
    by 3 Newton/IRLS steps: gradient (sum(y - mu), sum((y-mu)x))
    and Hessian (sum mu, sum mu*x, sum mu*x^2) are plain sums over the
    clock-bounded daily table, and the 2x2 solve is closed-form — the
    count-GLM sibling of ml_logistic_irls_grid, sharing its whole
    discipline: sufficient statistics per step are ONE aggregate, betas
    quantize to 10dp per step so the cross-engine float chains cannot
    drift, and the reported log-likelihood drops the ln(y!) constant
    (it cancels in any model comparison). Centering the day index keeps
    exp() arguments small and the Hessian well-conditioned. Scale: the
    daily count reduction is the only data-proportional stage; each
    Newton step is a per-key aggregate over ~30 rows — at 100 TB the
    same plan fits one GLM per key with one scan plus k-row
    iterations."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.col("event_type").alias("k"),
            F.to_date(F.date_trunc("day", "ts")).alias("d"),
        )
        .groupBy("k", "d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    wk = Window.partitionBy("k")
    seq = daily.select(
        "k",
        "y",
        (
            F.row_number().over(wk.orderBy("d"))
            - (F.count(F.lit(1)).over(wk) + 1) / 2.0
        ).alias("x"),
        F.count(F.lit(1)).over(wk).cast("bigint").alias("n"),
    )
    it = seq.groupBy("k").agg(
        F.max("n").alias("n"),
        F.round(F.log(F.avg(F.col("y").cast("double"))), 10).alias("b0"),
        F.lit(0.0).alias("b1"),
    )
    seq = seq.drop("n")  # `it` carries n from here on (join would collide)
    for _ in range(_POIS_ITERS):
        mu = F.exp(F.col("b0") + F.col("b1") * F.col("x"))
        s = (
            seq.join(it, "k")
            .select("k", "n", "b0", "b1", "y", "x", mu.alias("mu"))
            .groupBy("k", "n", "b0", "b1")
            .agg(
                F.sum(F.col("y") - F.col("mu")).alias("g0"),
                F.sum((F.col("y") - F.col("mu")) * F.col("x")).alias("g1"),
                F.sum("mu").alias("h00"),
                F.sum(F.col("mu") * F.col("x")).alias("h01"),
                F.sum(F.col("mu") * F.col("x") * F.col("x")).alias("h11"),
            )
        )
        det = F.col("h00") * F.col("h11") - F.col("h01") * F.col("h01")
        it = s.select(
            "k",
            "n",
            F.round(
                F.col("b0")
                + (F.col("h11") * F.col("g0") - F.col("h01") * F.col("g1")) / det,
                10,
            ).alias("b0"),
            F.round(
                F.col("b1")
                + (F.col("h00") * F.col("g1") - F.col("h01") * F.col("g0")) / det,
                10,
            ).alias("b1"),
        )
    ll = (
        seq.join(it, "k")
        .groupBy("k")
        .agg(
            F.sum(
                F.col("y") * (F.col("b0") + F.col("b1") * F.col("x"))
                - F.exp(F.col("b0") + F.col("b1") * F.col("x"))
            ).alias("ll")
        )
    )
    return (
        it.join(ll, "k")
        .select(
            F.col("k").alias("event_type"),
            F.col("n").cast("bigint").alias("n_days"),
            F.round("b0", 6).alias("beta0"),
            F.round("b1", 6).alias("beta1"),
            F.round("ll", 4).alias("log_lik"),
        )
    )
