"""Query surface batch 48 (round 9): isotonic calibration, bounded-radius
Brandes betweenness, and the batch Misra-Gries twin.

- ml_isotonic_pav — isotonic (monotone non-decreasing) regression of
  P(purchase) against the event value on the shared 32-bin histogram
  grid, via the exact min-max closed form of pool-adjacent-violators:
  fit(i) = max_{j<=i} min_{k>=i} mean(y, bins j..k). The calibration
  third of the ML-on-grids family (ml_stump_* finds the split,
  ml_gbdt_stump_boost boosts it, this calibrates the score).
- graph_betweenness_bounded — Brandes betweenness (2001) restricted to
  shortest paths of length <= 3 from a 4-seed set on the
  co-ordered-parts graph: forward BFS accumulates path counts sigma,
  the backward sweep accumulates dependencies
  delta(v) = sum_w sigma(v)/sigma(w) * (1 + delta(w)). Completes the
  centrality family (degree / closeness / PageRank / PPR / HITS).
- heavy_hitters_mg — the BATCH twin of
  streaming/heavy_hitters.misra_gries_monitor: replay the k=5-counter
  Misra-Gries summary over each event type's ts-ordered daily modal
  item stream and emit the final counters. Anchors the r8 streaming
  monitor with a driver-checked exact oracle, exactly how
  ts_cusum_oneside anchors cusum_monitor.

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283 of mykidong/kafka-etl-consumer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_etl_consumer_spark.plans.queries_pipeline7 import (
    _COORD_EDGE_CTE,
    _coordered_edges,
)
from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# ml_isotonic_pav — isotonic regression on the 32-bin value grid
# ---------------------------------------------------------------------------

_ISO_BINS = 32

_ISO_ORACLE = f"""
WITH base AS (
  SELECT value AS x,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
rng AS (SELECT min(x) AS lo, max(x) AS hi FROM base),
hist AS (
  SELECT least({_ISO_BINS - 1},
               CAST(floor((x - lo) / (hi - lo) * {_ISO_BINS}) AS BIGINT)) AS b,
         CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy
  FROM base, rng GROUP BY 1
),
cum AS (
  SELECT b, n, sy,
         sum(n) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS cn,
         sum(sy) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS csy
  FROM hist
),
pairs AS (
  SELECT j.b AS jb, k.b AS kb,
         CAST(k.csy - j.csy + j.sy AS DOUBLE)
           / (k.cn - j.cn + j.n) AS seg_mean
  FROM cum j JOIN cum k ON k.b >= j.b
),
sfx AS (
  SELECT jb, kb,
         min(seg_mean) OVER (PARTITION BY jb ORDER BY kb DESC
                             ROWS UNBOUNDED PRECEDING) AS m
  FROM pairs
),
fit AS (SELECT kb AS b, max(m) AS f FROM sfx GROUP BY kb)
SELECT h.b AS bin, h.n AS n_events, h.sy AS n_purchases,
       round(CAST(h.sy AS DOUBLE) / h.n, 6) AS raw_rate,
       round(f.f, 6) AS isotonic_rate
FROM hist h JOIN fit f ON f.b = h.b
"""


@register("ml_isotonic_pav", _ISO_ORACLE)
def ml_isotonic_pav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic regression (monotone non-decreasing least-squares fit) of
    the purchase rate against the event value, on the same 32-bin
    histogram grid as ml_gbdt_stump_boost — the classic score
    CALIBRATION step. Instead of iterating pool-adjacent-violators, use
    its exact closed form (Barlow et al. 1972): the fitted value of bin
    i is max_{j<=i} min_{k>=i} weightedmean(y, bins j..k) — PAV's pooled
    blocks are exactly the argmax/argmin segments, so one suffix-min
    window per start bin + one max per bin reproduces the fit with no
    loop. Scale: ONE data-proportional histogram aggregate collapses the
    corpus to <=32 rows; the (j,k) segment table is <=32*33/2 = 528 rows
    of grid arithmetic (a broadcast self-join of a bounded aggregate),
    so the fit costs one scan regardless of data volume. Both engines
    compute segment means as ratios of exact integer sums — bitwise
    identical doubles — so min/max selection agrees cross-engine; only
    the displayed aggregates are rounded."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        F.col("value").alias("x"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    rng = base.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    hist = (
        base.crossJoin(F.broadcast(rng))
        .select(
            F.least(
                F.lit(_ISO_BINS - 1),
                F.floor(
                    (F.col("x") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * _ISO_BINS
                ),
            ).alias("b"),
            "y",
        )
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("sy"),
        )
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "b", "n", "sy", F.sum("n").over(w).alias("cn"), F.sum("sy").over(w).alias("csy")
    )
    pairs = (
        cum.alias("j")
        .join(F.broadcast(cum.alias("k")), F.col("k.b") >= F.col("j.b"))
        .select(
            F.col("j.b").alias("jb"),
            F.col("k.b").alias("kb"),
            (
                (F.col("k.csy") - F.col("j.csy") + F.col("j.sy")).cast("double")
                / (F.col("k.cn") - F.col("j.cn") + F.col("j.n"))
            ).alias("seg_mean"),
        )
    )
    sfx = pairs.select(
        "jb",
        "kb",
        F.min("seg_mean")
        .over(
            Window.partitionBy("jb")
            .orderBy(F.col("kb").desc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("m"),
    )
    fit = sfx.groupBy(F.col("kb").alias("b")).agg(F.max("m").alias("f"))
    return hist.join(fit, "b").select(
        F.col("b").alias("bin"),
        F.col("n").alias("n_events"),
        F.col("sy").alias("n_purchases"),
        F.round(F.col("sy").cast("double") / F.col("n"), 6).alias("raw_rate"),
        F.round("f", 6).alias("isotonic_rate"),
    )


# ---------------------------------------------------------------------------
# graph_betweenness_bounded — Brandes dependency accumulation, radius <= 3
# ---------------------------------------------------------------------------

_BC_HOPS = 3
_BC_SRCS = 4
_BC_TOPK = 40

_BC_ORACLE = f"""
WITH RECURSIVE
{_COORD_EDGE_CTE},
sym AS (SELECT p1 AS u, p2 AS v FROM e0
        UNION ALL SELECT p2 AS u, p1 AS v FROM e0),
srcs AS (SELECT DISTINCT u AS s FROM sym ORDER BY u LIMIT {_BC_SRCS}),
walk(s, v, hop) AS (
  SELECT s, s, 0 FROM srcs
  UNION ALL
  SELECT walk.s, e.v, walk.hop + 1 FROM walk JOIN sym e ON e.u = walk.v
  WHERE walk.hop < {_BC_HOPS}
),
dist AS (SELECT s, v, min(hop) AS h FROM walk GROUP BY s, v),
sig AS (SELECT w.s, w.v, d.h, CAST(count(*) AS DOUBLE) AS sigma
        FROM walk w JOIN dist d ON d.s = w.s AND d.v = w.v AND d.h = w.hop
        GROUP BY w.s, w.v, d.h),
l3 AS (SELECT * FROM sig WHERE h = 3),
l2 AS (SELECT * FROM sig WHERE h = 2),
l1 AS (SELECT * FROM sig WHERE h = 1),
d2 AS (
  SELECT l2.s, l2.v, l2.sigma,
         coalesce(sum(l2.sigma / l3.sigma), 0) AS delta
  FROM l2
  LEFT JOIN sym e ON e.u = l2.v
  LEFT JOIN l3 ON l3.s = l2.s AND l3.v = e.v
  GROUP BY l2.s, l2.v, l2.sigma
),
d1 AS (
  SELECT l1.s, l1.v, l1.sigma,
         coalesce(sum(l1.sigma / d2.sigma * (1 + d2.delta)), 0) AS delta
  FROM l1
  LEFT JOIN sym e ON e.u = l1.v
  LEFT JOIN d2 ON d2.s = l1.s AND d2.v = e.v
  GROUP BY l1.s, l1.v, l1.sigma
),
alldel AS (SELECT s, v, delta FROM d1 UNION ALL SELECT s, v, delta FROM d2)
SELECT v AS part, round(sum(delta), 6) AS betweenness,
       CAST(count(*) AS BIGINT) AS n_source_terms
FROM alldel GROUP BY v HAVING sum(delta) > 0
ORDER BY betweenness DESC, part LIMIT {_BC_TOPK}
"""


@register("graph_betweenness_bounded", _BC_ORACLE)
def graph_betweenness_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-radius Brandes betweenness (Brandes 2001) on the
    co-ordered-parts graph: shortest-path dependencies from the 4
    smallest vertices, paths of length <= 3. Forward pass = BFS by
    LEVEL, where each level's path count sigma(v) is the sum of the
    predecessors' sigmas (one frontier ⋈ edges join + hash-agg per
    level; a min-hop struct-agg keeps only the FIRST time a vertex is
    reached, so only SHORTEST paths count); backward pass = the Brandes
    dependency recursion
    delta(v) = sum over successors w of sigma(v)/sigma(w)*(1+delta(w)),
    unrolled from the deepest level — each level is one equi-join onto
    the checkpointed edge list. Scale: exact betweenness is O(V*E) and
    inherently iterative; bounding sources (pivot sampling, Brandes &
    Pich 2007) and radius (ego-betweenness) is the standard cluster
    recipe — cost is |seeds| * (frontier ⋈ edges) per hop with the edge
    side partitioned ONCE and reused, never a full vertex sort. The
    oracle's recursive CTE enumerates bounded walks (count of minimal
    walks = count of shortest paths), combinatorial at scale — which is
    exactly why the engine iterates levels instead. Dependencies sum
    exact small rationals (sigma ratios), rounded only at the final
    aggregate.

    Optimization r11 (VERDICT r10 item 3): the symmetric edge list is
    materialized EAGERLY once and its count sizes every loop stage's
    shuffle width (loop_shuffle_width — lazy checkpoints compile via
    toRdd at build time and bypass AQE, so without this each BFS/
    dependency micro-stage ran at the session's full width on tiny
    state), and d2 — consumed TWICE (d1's upper level + the final
    union) — is lazily checkpointed so its dependency join runs once
    instead of re-executing per consumer."""
    from kafka_etl_consumer_spark.operators.graph import loop_shuffle_width

    e0 = _coordered_edges(spark, sf_dir)
    sym = e0.select(F.col("p1").alias("u"), F.col("p2").alias("v")).unionByName(
        e0.select(F.col("p2").alias("u"), F.col("p1").alias("v"))
    )
    sym = sym.repartition("u").localCheckpoint(eager=True)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(loop_shuffle_width(spark, sym.count()))
    )
    try:
        srcs = (
            sym.select(F.col("u").alias("s")).distinct().orderBy("s").limit(_BC_SRCS)
        )
        dist = srcs.select(
            "s", F.col("s").alias("v"), F.lit(0).alias("hop"), F.lit(1.0).alias("sigma")
        ).localCheckpoint(eager=False)
        for h in range(1, _BC_HOPS + 1):
            frontier = dist.filter(F.col("hop") == h - 1)
            step = (
                frontier.alias("f")
                .join(sym.alias("e"), F.col("e.u") == F.col("f.v"))
                .groupBy(F.col("f.s").alias("s"), F.col("e.v").alias("v"))
                .agg(F.sum("f.sigma").alias("sigma"))
                .select("s", "v", F.lit(h).alias("hop"), "sigma")
            )
            # min-struct keeps the FIRST (lowest-hop) row per (s, v): a vertex
            # re-reached at a deeper hop is not on a shortest path, so its
            # candidate sigma is discarded — same accumulate shape as
            # graph_closeness_harmonic, which also carries the sigma payload.
            dist = (
                dist.unionByName(step)
                .groupBy("s", "v")
                .agg(F.min(F.struct("hop", "sigma")).alias("m"))
                .select("s", "v", F.col("m.hop").alias("hop"), F.col("m.sigma").alias("sigma"))
                .localCheckpoint(eager=False)
            )
        levels = {
            h: dist.filter(F.col("hop") == h) for h in range(_BC_HOPS + 1)
        }

        def _delta_level(lower: DataFrame, upper_with_delta: DataFrame) -> DataFrame:
            """delta for `lower`-level vertices from the already-solved level
            above: sum sigma(v)/sigma(w) * (1 + delta(w)) over edges v->w."""
            contrib = (
                lower.alias("lo")
                .join(sym.alias("e"), F.col("e.u") == F.col("lo.v"))
                .join(
                    upper_with_delta.alias("up"),
                    (F.col("up.s") == F.col("lo.s")) & (F.col("up.v") == F.col("e.v")),
                )
                .groupBy(F.col("lo.s").alias("s"), F.col("lo.v").alias("v"))
                .agg(
                    F.sum(
                        F.col("lo.sigma") / F.col("up.sigma") * (1 + F.col("up.delta"))
                    ).alias("delta")
                )
            )
            return (
                lower.select("s", "v", "sigma")
                .join(contrib, ["s", "v"], "left")
                .select("s", "v", "sigma", F.coalesce("delta", F.lit(0.0)).alias("delta"))
            )

        l3 = levels[3].select("s", "v", "sigma", F.lit(0.0).alias("delta"))
        # d2 feeds BOTH d1's dependency join and the final union: checkpoint
        # so the subtree runs once (its upstream is the materialized dist RDD)
        d2 = _delta_level(levels[2], l3).localCheckpoint(eager=False)
        d1 = _delta_level(levels[1], d2)
        alldel = d1.select("s", "v", "delta").unionByName(d2.select("s", "v", "delta"))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return (
        alldel.groupBy(F.col("v").alias("part"))
        .agg(
            F.round(F.sum("delta"), 6).alias("betweenness"),
            F.count(F.lit(1)).cast("bigint").alias("n_source_terms"),
        )
        .filter(F.col("betweenness") > 0)
        .orderBy(F.col("betweenness").desc(), "part")
        .limit(_BC_TOPK)
    )


# ---------------------------------------------------------------------------
# heavy_hitters_mg — batch Misra-Gries replay (streaming-monitor twin)
# ---------------------------------------------------------------------------

_MG_K = 5
_MG_ITEMS = 12

_MG_ORACLE = f"""
WITH RECURSIVE
daily AS (
  SELECT event_type AS key,
         CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
         CAST(user_id % {_MG_ITEMS} AS VARCHAR) AS item, count(*) AS c
  FROM events GROUP BY 1, 2, 3
),
modal AS (
  SELECT key, d, item FROM (
    SELECT key, d, item,
           row_number() OVER (PARTITION BY key, d ORDER BY c DESC, item) AS rn
    FROM daily) WHERE rn = 1
),
stream AS (
  SELECT key, item, row_number() OVER (PARTITION BY key ORDER BY d) AS step
  FROM modal
),
nsteps AS (SELECT key, max(step) AS n FROM stream GROUP BY key),
mg(key, step, state) AS (
  SELECT key, CAST(0 AS BIGINT), CAST([] AS STRUCT(item VARCHAR, cnt BIGINT)[])
  FROM nsteps
  UNION ALL
  SELECT mg.key, s.step,
    CASE
      WHEN len(list_filter(mg.state, x -> x.item = s.item)) > 0 THEN
        list_transform(mg.state, x -> CASE WHEN x.item = s.item
          THEN {{'item': x.item, 'cnt': x.cnt + 1}} ELSE x END)
      WHEN len(mg.state) < {_MG_K} THEN
        list_append(mg.state, {{'item': s.item, 'cnt': CAST(1 AS BIGINT)}})
      ELSE
        list_filter(list_transform(mg.state,
          x -> {{'item': x.item, 'cnt': x.cnt - 1}}), x -> x.cnt > 0)
    END
  FROM mg JOIN stream s ON s.key = mg.key AND s.step = mg.step + 1
),
final AS (
  SELECT mg.key, mg.state, n FROM mg JOIN nsteps USING (key)
  WHERE mg.step = n
)
SELECT key, u.item AS item, u.cnt AS est_count, n AS n_processed,
       CAST(floor(n / {_MG_K + 1}.0) AS BIGINT) AS err_bound
FROM final, unnest(state) AS t(u)
"""

_MG_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("item", T.StringType()),
        T.StructField("est_count", T.LongType()),
        T.StructField("n_processed", T.LongType()),
        T.StructField("err_bound", T.LongType()),
    ]
)


@register("heavy_hitters_mg", _MG_ORACLE)
def heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/heavy_hitters.misra_gries_monitor — the
    driver-checked anchor for the r8 streaming monitor, mirroring how
    ts_cusum_oneside anchors cusum_monitor. Per event type, replay the
    k=5-counter Misra-Gries summary (Misra & Gries 1982) over the
    ts-ordered DAILY MODAL item stream (per day, the most frequent
    user_id mod 12 bucket; ties to the smallest item — deterministic
    cross-engine) and emit the surviving counters with the n/(k+1)
    error bound. The update is shared verbatim with the streaming
    monitor (streaming/heavy_hitters.mg_reduce): increment a tracked
    item, adopt into a free slot, else decrement all and drop zeros.
    Scale: the modal-stream prep is one data-proportional hash-agg +
    one bounded window (30 rows/key — calendar grain, not data grain);
    the sequential replay runs per key via applyInPandas over streams
    whose length is CLOCK-bounded (days), with keys partitioned across
    executors and O(k) state — the same shape that lets the streaming
    monitor hold O(#keys * k) state at any volume. The oracle replays
    the identical recurrence as a recursive CTE over a list-of-struct
    state column."""
    import pandas as pd

    from kafka_etl_consumer_spark.streaming.heavy_hitters import mg_reduce

    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.col("event_type").alias("key"),
            F.to_date(F.date_trunc("day", "ts")).alias("d"),
            (F.col("user_id") % _MG_ITEMS).cast("string").alias("item"),
        )
        .groupBy("key", "d", "item")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    modal = (
        daily.groupBy("key", "d")
        .agg(F.min(F.struct((-F.col("c")).alias("nc"), F.col("item"))).alias("m"))
        .select("key", "d", F.col("m.item").alias("item"))
    )

    def replay(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("d", kind="mergesort")
        n, summary = mg_reduce(pdf["item"].astype(str), k=_MG_K)
        key = pdf["key"].iloc[0]
        return pd.DataFrame(
            {
                "key": [key] * len(summary),
                "item": list(summary),
                "est_count": list(summary.values()),
                "n_processed": [n] * len(summary),
                "err_bound": [n // (_MG_K + 1)] * len(summary),
            }
        )

    return modal.groupBy("key").applyInPandas(replay, _MG_SCHEMA)
