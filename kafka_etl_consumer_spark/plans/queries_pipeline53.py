"""Query surface batch 57 (round 10, fourth wave): k-truss cohesion,
binary-segmentation changepoints, and the EDF-trio completion.

- graph_ktruss — bounded-round 4-truss peeling on the co-ordered
  parts graph: repeatedly drop edges with triangle support < 2 and
  recount on the surviving subgraph. The cohesion complement to
  graph_kcore (degree peeling) and graph_local_bridges (the support-0
  edges the FIRST round removes).
- ts_binseg_changepoints — two-level binary segmentation over the
  daily-mean series with the scaled mean-difference gain — the
  multi-changepoint extension of ts_cusum_changepoint / ts_pettitt's
  single-split tests.
- stats_cramer_von_mises — CvM normality statistic W^2 on the 64-bin
  value grid with Stephens' (1974) modification and the estimated-
  parameters 5% critical value 0.126, MC-validated in the audit.

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283 of mykidong/kafka-etl-consumer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.queries_pipeline33 import _normal_sf_sql
from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# graph_ktruss — bounded-round truss peeling (k = 4: support >= 2)
# ---------------------------------------------------------------------------

_KT_K = 4
_KT_ROUNDS = 3
_KT_TOPK = 40


def _ktruss_oracle() -> str:
    from kafka_etl_consumer_spark.plans.queries_pipeline7 import _COORD_EDGE_CTE

    rounds = []
    prev = "e0"
    for r in range(1, _KT_ROUNDS + 1):
        rounds.append(f""",
sym{r} AS MATERIALIZED (SELECT p1 AS u, p2 AS v FROM {prev}
           UNION ALL SELECT p2 AS u, p1 AS v FROM {prev}),
supp{r} AS (
  SELECT e.p1, e.p2, CAST(count(b.v) AS BIGINT) AS s
  FROM {prev} e
  LEFT JOIN sym{r} a ON a.u = e.p1
  LEFT JOIN sym{r} b ON b.u = e.p2 AND b.v = a.v
  GROUP BY e.p1, e.p2
),
e{r} AS MATERIALIZED (SELECT p1, p2 FROM supp{r}
         WHERE s >= {_KT_K - 2})""")
        prev = f"e{r}"
    last = _KT_ROUNDS
    return f"""
WITH {_COORD_EDGE_CTE}{"".join(rounds)},
symf AS (SELECT p1 AS u, p2 AS v FROM e{last}
         UNION ALL SELECT p2 AS u, p1 AS v FROM e{last}),
suppf AS (
  SELECT e.p1, e.p2, CAST(count(b.v) AS BIGINT) AS support
  FROM e{last} e
  LEFT JOIN symf a ON a.u = e.p1
  LEFT JOIN symf b ON b.u = e.p2 AND b.v = a.v
  GROUP BY e.p1, e.p2
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_surviving FROM suppf)
SELECT p1 AS pu, p2 AS pv, support, n_surviving
FROM suppf CROSS JOIN tot
ORDER BY support DESC, pu, pv LIMIT {_KT_TOPK}
"""


@register("graph_ktruss", _ktruss_oracle())
def graph_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-round 4-truss (Cohen 2008): peel edges whose triangle
    support inside the CURRENT subgraph is below k-2 = 2, recount,
    repeat 3 rounds, then report the survivors with their final
    in-subgraph support (computed on the surviving edge set — dropping
    an edge can demote triangles it closed, which is why each round
    recounts). The cohesion ladder: k-core peels vertices by degree,
    k-truss peels edges by triangle membership — a strictly stronger
    community signal — and the support-0 edges the first round removes
    are exactly graph_local_bridges' bridges. Rounds are BOUNDED and
    unrolled identically in both engines (the graph_components /
    betweenness discipline), with a count-only early exit: peeling only
    REMOVES edges, so an unchanged edge COUNT is an unchanged edge SET
    and the remaining unrolled rounds are provably no-ops — skipping
    them cannot change the result. Scale (optimization r10): support is
    the adjacency-intersection form (operators/graph.edge_triangle_
    support — no wedge-row blowup before the aggregate), each round's
    survivors are eagerly checkpoint-truncated, and the peel's shuffle
    width is sized from the materialized edge count (~500k rows/task,
    guide §2 scale-adaptive partitioning) because checkpoint-compiled
    plans bypass AQE and would otherwise run every micro-stage at the
    session's full width."""
    from kafka_etl_consumer_spark.operators.graph import (
        edge_triangle_support,
        loop_shuffle_width,
    )
    from kafka_etl_consumer_spark.plans.queries_pipeline7 import _coordered_edges

    edges = _coordered_edges(spark, sf_dir).localCheckpoint(eager=True)
    n_prev = edges.count()
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(loop_shuffle_width(spark, n_prev))
    )
    try:
        final = None
        for _ in range(_KT_ROUNDS):
            # keep the support column through the checkpoint: when the
            # round removes nothing (break below), the set the support was
            # computed ON equals the surviving set, so these rows ARE the
            # final in-subgraph support — the closing support pass is
            # skipped entirely (optimization r11, one pass of ~4 saved)
            survivors = (
                edge_triangle_support(edges)
                .filter(F.col("s") >= _KT_K - 2)
                # eager: each round's survivors are consumed three ways by
                # the next support pass (edge side + the adjacency build);
                # a lazy checkpoint would re-derive the whole peel chain
                .localCheckpoint(eager=True)
            )
            edges = survivors.select("p1", "p2")
            n_now = survivors.count()
            if n_now == n_prev:
                # monotone peel: same count == same set == fixpoint, and
                # the support rows were computed on that very set
                final = survivors.withColumnRenamed("s", "support")
                break
            n_prev = n_now
        if final is None:  # round cap hit before the fixpoint probe fired
            final = edge_triangle_support(edges).withColumnRenamed("s", "support")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    tot = final.agg(F.count(F.lit(1)).cast("bigint").alias("n_surviving"))
    return (
        final.crossJoin(F.broadcast(tot))
        .select(
            F.col("p1").alias("pu"),
            F.col("p2").alias("pv"),
            "support",
            "n_surviving",
        )
        .orderBy(F.col("support").desc(), "pu", "pv")
        .limit(_KT_TOPK)
    )


# ---------------------------------------------------------------------------
# ts_binseg_changepoints — two-level binary segmentation on daily means
# ---------------------------------------------------------------------------

_BS_MIN_SEG = 8  # a segment shorter than this is not split further

_BS_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
         round(avg(value), 6) AS m
  FROM events GROUP BY 1, 2
),
seq AS (
  SELECT event_type, d, m,
         row_number() OVER (PARTITION BY event_type ORDER BY d) AS t,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
         sum(m) OVER (PARTITION BY event_type ORDER BY d
                      ROWS UNBOUNDED PRECEDING) AS sp,
         sum(m) OVER (PARTITION BY event_type) AS st
  FROM daily
),
g1 AS (
  SELECT event_type, d, t, n,
         round(sqrt(CAST(t AS DOUBLE) * (n - t) / n)
               * abs(sp / t - (st - sp) / (n - t)), 9) AS gain
  FROM seq WHERE t < n
),
cp1 AS (
  SELECT event_type, d AS change_day, t AS cp, n, gain FROM (
    SELECT *, row_number() OVER (PARTITION BY event_type
                                 ORDER BY gain DESC, t) AS rn
    FROM g1) WHERE rn = 1
),
halves AS (
  SELECT s.event_type, s.d, s.m,
         CASE WHEN s.t <= c.cp THEN 1 ELSE 2 END AS half,
         CASE WHEN s.t <= c.cp THEN s.t ELSE s.t - c.cp END AS lt,
         CASE WHEN s.t <= c.cp THEN c.cp ELSE s.n - c.cp END AS ln,
         CASE WHEN s.t <= c.cp THEN 1 ELSE c.cp + 1 END AS seg_start,
         CASE WHEN s.t <= c.cp THEN c.cp ELSE s.n END AS seg_end
  FROM seq s JOIN cp1 c USING (event_type)
),
h2 AS (
  SELECT event_type, half, d, lt, ln, seg_start, seg_end,
         sum(m) OVER (PARTITION BY event_type, half ORDER BY lt
                      ROWS UNBOUNDED PRECEDING) AS sp,
         sum(m) OVER (PARTITION BY event_type, half) AS st
  FROM halves
),
g2 AS (
  SELECT event_type, half, d, lt, ln, seg_start, seg_end,
         round(sqrt(CAST(lt AS DOUBLE) * (ln - lt) / ln)
               * abs(sp / lt - (st - sp) / (ln - lt)), 9) AS gain
  FROM h2 WHERE lt < ln AND ln >= {_BS_MIN_SEG}
),
cp2 AS (
  SELECT event_type, half, d AS change_day, seg_start, seg_end, gain FROM (
    SELECT *, row_number() OVER (PARTITION BY event_type, half
                                 ORDER BY gain DESC, lt) AS rn
    FROM g2) WHERE rn = 1
)
SELECT event_type, 1 AS level, CAST(1 AS BIGINT) AS seg_start,
       n AS seg_end, strftime(change_day, '%Y-%m-%d') AS change_day, gain
FROM cp1
UNION ALL
SELECT event_type, 2 AS level, CAST(seg_start AS BIGINT),
       CAST(seg_end AS BIGINT), strftime(change_day, '%Y-%m-%d'), gain
FROM cp2
"""


@register("ts_binseg_changepoints", _BS_ORACLE)
def ts_binseg_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level binary segmentation (Scott & Knott 1974; the classic
    multi-changepoint recipe): find the split of the daily-mean series
    maximizing the scaled mean-difference gain
    sqrt(t(n-t)/n) * |mean(left) - mean(right)|, then recurse once into
    each half (segments shorter than 8 days are left alone). Gains
    quantize to 9dp before the argmax and ties break to the earliest
    day, so the split choice is deterministic cross-engine. Emits the
    level-1 split plus up to two level-2 splits per key with segment
    bounds and gains — the multi-changepoint extension of
    ts_cusum_changepoint (one-shot) and ts_pettitt_values (rank-based
    single split); deeper recursion is the same plan repeated. Scale:
    the daily reduction is the only data-proportional stage; each
    level is two window passes over clock-bounded series (prefix sums
    + windowed argmax), and level 2 reuses the same shape partitioned
    by (key, half)."""
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
    seq = daily.select(
        "event_type",
        "d",
        "m",
        F.row_number().over(wd).alias("t"),
        F.count(F.lit(1)).over(wk).cast("bigint").alias("n"),
        F.sum("m").over(wd.rowsBetween(Window.unboundedPreceding, 0)).alias("sp"),
        F.sum("m").over(wk).alias("st"),
    )
    t, n, sp, st = F.col("t"), F.col("n"), F.col("sp"), F.col("st")
    g1 = seq.filter(t < n).select(
        "event_type",
        "d",
        "t",
        "n",
        F.round(
            F.sqrt(t.cast("double") * (n - t) / n)
            * F.abs(sp / t - (st - sp) / (n - t)),
            9,
        ).alias("gain"),
    )
    w1 = Window.partitionBy("event_type").orderBy(F.col("gain").desc(), "t")
    cp1 = (
        g1.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") == 1)
        .select(
            "event_type", F.col("d").alias("change_day"),
            F.col("t").alias("cp"), "n", "gain",
        )
    )
    halves = seq.join(cp1.select("event_type", "cp"), "event_type").select(
        "event_type",
        "d",
        "m",
        F.when(t <= F.col("cp"), 1).otherwise(2).alias("half"),
        F.when(t <= F.col("cp"), t).otherwise(t - F.col("cp")).alias("lt"),
        F.when(t <= F.col("cp"), F.col("cp")).otherwise(n - F.col("cp")).alias("ln"),
        F.when(t <= F.col("cp"), F.lit(1)).otherwise(F.col("cp") + 1).alias(
            "seg_start"
        ),
        F.when(t <= F.col("cp"), F.col("cp")).otherwise(n).alias("seg_end"),
    )
    wh = Window.partitionBy("event_type", "half")
    whl = wh.orderBy("lt")
    h2 = halves.select(
        "event_type",
        "half",
        "d",
        "lt",
        "ln",
        "seg_start",
        "seg_end",
        F.sum("m").over(whl.rowsBetween(Window.unboundedPreceding, 0)).alias("sp"),
        F.sum("m").over(wh).alias("st"),
    )
    lt, ln = F.col("lt"), F.col("ln")
    g2 = h2.filter((lt < ln) & (ln >= _BS_MIN_SEG)).select(
        "event_type",
        "half",
        "d",
        "lt",
        "seg_start",
        "seg_end",
        F.round(
            F.sqrt(lt.cast("double") * (ln - lt) / ln)
            * F.abs(F.col("sp") / lt - (F.col("st") - F.col("sp")) / (ln - lt)),
            9,
        ).alias("gain"),
    )
    w2 = Window.partitionBy("event_type", "half").orderBy(
        F.col("gain").desc(), "lt"
    )
    cp2 = (
        g2.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.lit(2).alias("level"),
            F.col("seg_start").cast("bigint").alias("seg_start"),
            F.col("seg_end").cast("bigint").alias("seg_end"),
            F.date_format(F.col("d"), "yyyy-MM-dd").alias("change_day"),
            "gain",
        )
    )
    l1 = cp1.select(
        "event_type",
        F.lit(1).alias("level"),
        F.lit(1).cast("bigint").alias("seg_start"),
        F.col("n").alias("seg_end"),
        F.date_format(F.col("change_day"), "yyyy-MM-dd").alias("change_day"),
        "gain",
    )
    return l1.unionByName(cp2)


# ---------------------------------------------------------------------------
# stats_cramer_von_mises — binned CvM normality with Stephens' adjustment
# ---------------------------------------------------------------------------

_CVM_BINS = 64
# Stephens (1974) case-3 (mean and variance estimated) 5% critical value
# for the modified statistic W* = W^2 (1 + 0.5/n) — MC-validated in
# tests/test_stats_mc_audit.py (empirical rejection 5% within 4 sigma).
_CVM_CRIT5 = 0.126

_CVM_ORACLE = f"""
WITH base AS (SELECT event_type AS g, value AS x FROM events),
rng AS (SELECT g, min(x) AS lo, max(x) AS hi FROM base GROUP BY g),
binned AS (
  SELECT base.g,
         CAST(round(
           CASE WHEN hi = lo THEN lo
                ELSE lo + (least({_CVM_BINS - 1},
                                 floor((x - lo) / (hi - lo) * {_CVM_BINS}))
                           + 0.5) * (hi - lo) / {_CVM_BINS} END,
           6) AS DECIMAL(12,6)) AS mq
  FROM base JOIN rng ON rng.g = base.g
),
cell AS (SELECT g, mq, CAST(count(*) AS BIGINT) AS t FROM binned GROUP BY g, mq),
mom AS (
  SELECT g, CAST(sum(t) AS BIGINT) AS n,
         sum(CAST(t AS DECIMAL(14,0)) * mq) AS sm,
         sum(CAST(t AS DECIMAL(14,0)) * CAST(round(mq * mq, 6) AS DECIMAL(20,6)))
           AS s2
  FROM cell GROUP BY g
),
ms AS (
  SELECT g, n, CAST(sm AS DOUBLE) / n AS mean,
         sqrt((CAST(s2 AS DOUBLE) - n * (CAST(sm AS DOUBLE) / n)
                                      * (CAST(sm AS DOUBLE) / n)) / (n - 1)) AS sd
  FROM mom
),
cum AS (
  SELECT cell.g, mq, t, n, mean, sd,
         sum(t) OVER (PARTITION BY cell.g ORDER BY mq
                      ROWS UNBOUNDED PRECEDING) AS cin
  FROM cell JOIN ms ON ms.g = cell.g
),
ff AS (
  SELECT g, t, n, cin, cin - t AS cprev,
         1 - {_normal_sf_sql('(CAST(mq AS DOUBLE) - mean) / sd')} AS fv
  FROM cum
),
term AS (
  -- block identity over ranks i = cprev+1..cin at shared F:
  -- sum (F - (2i-1)/2n)^2 = t F^2 - F (cin^2-cprev^2)/n
  --   + (S(cin) - S(cprev)) / (4 n^2),  S(m) = m(4m^2-1)/3
  SELECT g, n,
         CAST(round(
           t * fv * fv
           - fv * CAST(cin * cin - cprev * cprev AS DOUBLE) / n
           + (CAST(cin AS DOUBLE) * (4 * CAST(cin AS DOUBLE) * cin - 1) / 3
              - CAST(cprev AS DOUBLE) * (4 * CAST(cprev AS DOUBLE) * cprev - 1)
                / 3)
             / (4.0 * n * n),
           9) AS DECIMAL(38,9)) AS tq
  FROM ff
),
w2 AS (
  SELECT g, n, 1.0 / (12 * n) + CAST(sum(tq) AS DOUBLE) AS w2
  FROM term GROUP BY g, n
)
SELECT g AS event_type, n, round(w2, 6) AS w2,
       round(w2 * (1 + 0.5 / n), 6) AS w2_star,
       CAST(CASE WHEN w2 * (1 + 0.5 / n) > {_CVM_CRIT5}
                 THEN 1 ELSE 0 END AS INT) AS reject_5pct
FROM w2
"""


@register("stats_cramer_von_mises", _CVM_ORACLE)
def stats_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér-von Mises normality statistic per event type on the
    64-bin value grid: W^2 = 1/(12n) + sum_i (F(x_(i)) - (2i-1)/2n)^2
    with mean/sd estimated from the quantized data — the
    BODY-weighted member of the EDF trio (KS takes the max deviation,
    A-D weights the tails, CvM integrates the square). Binned form
    follows stats_anderson_darling's discipline exactly: 6dp DECIMAL
    bin midpoints, exact integer cumulative counts, the rank-block
    identities sum(2i-1) = cin^2 - cprev^2 and
    sum(2i-1)^2 = m(4m^2-1)/3 evaluated per cell, and each cell's
    contribution quantized to 9dp DECIMAL before the group sum so the
    total is aggregation-order independent. Reports Stephens' (1974)
    modified W* = W^2(1 + 0.5/n) and the case-3 (both parameters
    estimated) 5%% flag at 0.126 — the critical value is MC-validated
    in the audit (empirical null rejection within the 4-sigma band of
    5%%). Scale: one broadcast range join, one hash-agg to <= 64 cells
    per group, one bounded-grid window — flat at any volume."""
    from kafka_etl_consumer_spark.plans.queries_pipeline33 import _normal_sf

    ev = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("g"), F.col("value").alias("x")
    )
    rng = ev.groupBy("g").agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    lo, hi = F.col("lo"), F.col("hi")
    b = F.least(
        F.lit(_CVM_BINS - 1), F.floor((F.col("x") - lo) / (hi - lo) * _CVM_BINS)
    )
    mid = F.when(hi == lo, lo).otherwise(lo + (b + 0.5) * (hi - lo) / _CVM_BINS)
    binned = ev.join(F.broadcast(rng), "g").select(
        "g", F.round(mid, 6).cast("decimal(12,6)").alias("mq")
    )
    cell = binned.groupBy("g", "mq").agg(
        F.count(F.lit(1)).cast("bigint").alias("t")
    )
    mom = cell.groupBy("g").agg(
        F.sum("t").cast("bigint").alias("n"),
        F.sum(F.col("t").cast("decimal(14,0)") * F.col("mq")).alias("sm"),
        F.sum(
            F.col("t").cast("decimal(14,0)")
            * F.round(F.col("mq") * F.col("mq"), 6).cast("decimal(20,6)")
        ).alias("s2"),
    )
    mean = F.col("sm").cast("double") / F.col("n")
    ms = mom.select(
        "g",
        "n",
        mean.alias("mean"),
        F.sqrt(
            (F.col("s2").cast("double") - F.col("n") * mean * mean)
            / (F.col("n") - 1)
        ).alias("sd"),
    )
    w = (
        Window.partitionBy("g")
        .orderBy("mq")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cell.join(ms, "g").select(
        "g", "mq", "t", "n", "mean", "sd", F.sum("t").over(w).alias("cin")
    )
    fv = 1 - _normal_sf((F.col("mq").cast("double") - F.col("mean")) / F.col("sd"))
    cprev = F.col("cin") - F.col("t")
    cind = F.col("cin").cast("double")
    cprevd = cprev.cast("double")
    n = F.col("n")
    term = cum.select(
        "g",
        "n",
        F.round(
            F.col("t") * fv * fv
            - fv * (F.col("cin") * F.col("cin") - cprev * cprev).cast("double") / n
            + (
                cind * (4 * cind * F.col("cin") - 1) / 3
                - cprevd * (4 * cprevd * cprev - 1) / 3
            )
            / (4.0 * n * n),
            9,
        )
        .cast("decimal(38,9)")
        .alias("tq"),
    )
    w2 = term.groupBy("g", "n").agg(
        (1.0 / (12 * n) + F.sum("tq").cast("double")).alias("w2")
    )
    wstar = F.col("w2") * (1 + 0.5 / n)
    return w2.select(
        F.col("g").alias("event_type"),
        "n",
        F.round("w2", 6).alias("w2"),
        F.round(wstar, 6).alias("w2_star"),
        (wstar > _CVM_CRIT5).cast("int").alias("reject_5pct"),
    )
