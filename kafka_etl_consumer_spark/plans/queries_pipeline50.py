"""Query surface batch 54 (round 10, first wave): the ADWIN batch twin.

- ts_adwin_values — replay the ADWIN adaptive-window change detector
  (Bifet & Gavaldà 2007) over each event type's ts-ordered daily-mean
  series, calling the SAME ``adwin_insert`` / ``adwin_try_cut``
  recurrence the streaming monitor uses — the driver-checked anchor
  for streaming/drift.adwin_monitor, exactly as heavy_hitters_mg
  anchors misra_gries_monitor and ts_cusum_oneside anchors
  cusum_monitor. The DuckDB oracle replays the identical recurrence
  as a recursive-CTE STATE MACHINE: one primitive action per
  recursion step (MERGE two oldest buckets of the lowest over-full
  capacity level / DROP the oldest bucket while the Hoeffding cut
  condition is violated / INSERT the next observation), which keeps
  every step's SQL expression small instead of unrolling the
  insert-cascade and drop-while-violated loops into one mega
  expression. Termination is structural: every step either consumes
  an observation or removes a bucket, so iterations ≤ ~4n per key.

- graph_edge_betweenness — Brandes' dependency sweep accumulated on
  EDGES instead of vertices (the Girvan-Newman splitting primitive):
  every shortest-path-DAG edge (v, w) from the bounded-source BFS
  carries c(v, w) = sigma(v)/sigma(w) * (1 + delta(w)), and the
  vertex delta is just the sum of its outgoing edge terms — so edge
  betweenness falls out of the SAME forward sigma-BFS as
  graph_betweenness_bounded, with the backward per-level join keyed
  on the edge pair rather than its head. Completes the centrality
  family; real users hit it to split over-merged dedup clusters.

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283 of mykidong/kafka-etl-consumer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# ts_adwin_values — ADWIN window replay, shared with the streaming monitor
# ---------------------------------------------------------------------------

_ADWIN_M = 5  # max buckets per exponential-histogram capacity level
_ADWIN_DELTA = 0.002  # Hoeffding confidence
# value_range R is per-key: (max - min of the 6dp daily means) * factor.
# max/min of already-rounded doubles are the EXACT same IEEE values in
# both engines (no stddev-style accumulation-order risk), and 0.2 is
# deliberately sub-scale so the stationary synthetic series exercises
# the cut path (detections + window shrink) at every SF — at factor
# >= 0.3 the series never cuts and the twin would only test inserts.
_ADWIN_FACTOR = 0.2

_ADWIN_ORACLE = f"""
WITH RECURSIVE daily AS (
  SELECT event_type AS key,
         CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
         round(avg(value), 6) AS m
  FROM events GROUP BY 1, 2
),
stream AS (
  SELECT key, m, row_number() OVER (PARTITION BY key ORDER BY d) AS step
  FROM daily
),
nsteps AS (
  SELECT key, CAST(max(step) AS BIGINT) AS n,
         (max(m) - min(m)) * {_ADWIN_FACTOR} AS r
  FROM stream GROUP BY key
),
adwin(key, iter, i, st, n_det, last_seq, in_cut) AS (
  SELECT key, 0, CAST(0 AS BIGINT),
         CAST([] AS STRUCT(s DOUBLE, c BIGINT)[]),
         CAST(0 AS BIGINT), CAST(0 AS BIGINT), false
  FROM nsteps
  UNION ALL
  SELECT key, iter + 1,
    CASE WHEN act = 'I' THEN i + 1 ELSE i END,
    CASE act
      WHEN 'M' THEN  -- merge the two oldest buckets of level mcap
        st[1:i0-1]
        || [{{'s': st[i0].s + st[i0+1].s, 'c': mcap * 2}}]
        || st[i0+2:len(st)]
      WHEN 'D' THEN st[2:len(st)]  -- drop the oldest bucket
      ELSE list_append(st, {{'s': x, 'c': CAST(1 AS BIGINT)}})
    END,
    -- a detection counts ONCE per observation no matter how many
    -- buckets the cut loop drops (the in_cut flag, reset on insert)
    CASE WHEN act = 'D' AND NOT in_cut THEN n_det + 1 ELSE n_det END,
    CASE WHEN act = 'D' AND NOT in_cut THEN i ELSE last_seq END,
    CASE act WHEN 'D' THEN true WHEN 'I' THEN false ELSE in_cut END
  FROM (
    SELECT a.key, a.iter, a.i, a.st, a.n_det, a.last_seq, a.in_cut,
      s.m AS x, nn.n, nn.r,
      -- lowest over-full capacity level (NULL = no merge pending)
      list_min(list_transform(
        list_filter(a.st, b -> len(list_filter(a.st, z -> z.c = b.c))
                               > {_ADWIN_M}),
        b -> b.c)) AS mcap,
      -- 1-based index of the oldest bucket at that level (levels are
      -- contiguous: counts are non-increasing oldest -> newest)
      list_filter(list_transform(a.st,
                                 (b, ix) -> CASE WHEN b.c = mcap
                                                 THEN ix END),
                  v -> v IS NOT NULL)[1] AS i0,
      list_sum(list_transform(a.st, b -> b.c)) AS w,
      list_sum(list_transform(a.st, b -> b.s)) AS sm,
      ln(4.0 * greatest(w, 1) / {_ADWIN_DELTA}) AS lnw,
      -- Hoeffding cut check over every bucket-boundary split j:
      -- |mean(W0) - mean(W1)| >= R * sqrt(ln(4W/delta)*(1/n0+1/n1)/2)
      len(list_filter(
        list_transform(a.st, (b, ix) -> ix),
        j -> j < len(a.st) AND abs(
               list_sum(list_transform(a.st[1:j], b -> b.s))
                 / list_sum(list_transform(a.st[1:j], b -> b.c))
               - (sm - list_sum(list_transform(a.st[1:j], b -> b.s)))
                 / (w - list_sum(list_transform(a.st[1:j], b -> b.c)))
             ) >= nn.r * sqrt(lnw
                    * (1.0 / list_sum(list_transform(a.st[1:j], b -> b.c))
                       + 1.0 / (w - list_sum(list_transform(a.st[1:j],
                                                            b -> b.c))))
                    / 2.0)
      )) > 0 AS violated,
      CASE WHEN mcap IS NOT NULL THEN 'M'
           WHEN violated THEN 'D'
           WHEN a.i < nn.n THEN 'I' END AS act
    FROM adwin a
    JOIN nsteps nn USING (key)
    LEFT JOIN stream s ON s.key = a.key AND s.step = a.i + 1
  )
  WHERE act IS NOT NULL
)
SELECT key, i AS n_obs,
       CAST(list_sum(list_transform(st, b -> b.c)) AS BIGINT) AS width,
       round(list_sum(list_transform(st, b -> b.s))
             / list_sum(list_transform(st, b -> b.c)), 6) AS win_mean,
       n_det AS n_detections, last_seq AS last_detect_seq
FROM adwin
QUALIFY row_number() OVER (PARTITION BY key ORDER BY iter DESC) = 1
"""

_ADWIN_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_obs", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("win_mean", T.DoubleType()),
        T.StructField("n_detections", T.LongType()),
        T.StructField("last_detect_seq", T.LongType()),
    ]
)


@register("ts_adwin_values", _ADWIN_ORACLE)
def ts_adwin_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/drift.adwin_monitor — the driver-checked
    anchor for the r9 ADWIN detector (VERDICT r9 item 1). Per event
    type, replay the adaptive-window recurrence over the ts-ordered
    DAILY MEAN series (6dp — aggregate floats round in both engines)
    with max_buckets=5, delta=0.002 and a per-key value_range of
    0.2 * (max - min) of that series (exact doubles in both engines;
    sub-scale on purpose so the cut path actually fires — see module
    constants). The insert (exponential-histogram cascade) and cut
    (drop-oldest-while-Hoeffding-violated) steps are the SAME
    module-level helpers the streaming monitor executes, so a green
    driver row certifies the production recurrence, not a copy.
    Emits per key: n_obs, the adaptive window width and mean after the
    last observation, the detection count (one per observation that
    triggered a shrink) and the 1-based index of the latest detection.
    Scale: the daily reduction is the only data-proportional stage
    (one hash-agg); the replay runs per key via applyInPandas over
    CLOCK-bounded series (days), keys partitioned across executors,
    O(max_buckets * log window) state — identical to the streaming
    monitor's bound. The oracle advances the identical state machine
    one primitive action per recursive-CTE step (see module
    docstring), ≤ ~4n iterations per key."""
    import pandas as pd

    from kafka_etl_consumer_spark.streaming.drift import (
        adwin_insert,
        adwin_try_cut,
    )

    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.col("event_type").alias("key"),
            F.to_date(F.date_trunc("day", "ts")).alias("d"),
            "value",
        )
        .groupBy("key", "d")
        .agg(F.round(F.avg("value"), 6).alias("m"))
    )

    def replay(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("d", kind="mergesort")
        series = pdf["m"].astype(float)
        rng = (series.max() - series.min()) * _ADWIN_FACTOR
        sums: list = []
        counts: list = []
        n, n_det, last_seq = 0, 0, 0
        for x in series:
            n += 1
            adwin_insert(sums, counts, float(x), _ADWIN_M)
            if adwin_try_cut(sums, counts, _ADWIN_DELTA, rng):
                n_det += 1
                last_seq = n
        width = int(sum(counts))
        return pd.DataFrame(
            {
                "key": [pdf["key"].iloc[0]],
                "n_obs": [n],
                "width": [width],
                "win_mean": [round(sum(sums) / width, 6) if width else 0.0],
                "n_detections": [n_det],
                "last_detect_seq": [last_seq],
            }
        )

    return daily.groupBy("key").applyInPandas(replay, _ADWIN_SCHEMA)


# ---------------------------------------------------------------------------
# graph_edge_betweenness — Brandes dependency accumulated per EDGE
# ---------------------------------------------------------------------------

_EBC_HOPS = 3
_EBC_SRCS = 4
_EBC_TOPK = 40

_EBC_ORACLE = f"""
WITH RECURSIVE
{{coord_edge_cte}},
sym AS (SELECT p1 AS u, p2 AS v FROM e0
        UNION ALL SELECT p2 AS u, p1 AS v FROM e0),
srcs AS (SELECT DISTINCT u AS s FROM sym ORDER BY u LIMIT {_EBC_SRCS}),
walk(s, v, hop) AS (
  SELECT s, s, 0 FROM srcs
  UNION ALL
  SELECT walk.s, e.v, walk.hop + 1 FROM walk JOIN sym e ON e.u = walk.v
  WHERE walk.hop < {_EBC_HOPS}
),
dist AS (SELECT s, v, min(hop) AS h FROM walk GROUP BY s, v),
sig AS (SELECT w.s, w.v, d.h, CAST(count(*) AS DOUBLE) AS sigma
        FROM walk w JOIN dist d ON d.s = w.s AND d.v = w.v AND d.h = w.hop
        GROUP BY w.s, w.v, d.h),
l3 AS (SELECT * FROM sig WHERE h = 3),
l2 AS (SELECT * FROM sig WHERE h = 2),
l1 AS (SELECT * FROM sig WHERE h = 1),
ec3 AS (
  SELECT l2.s, l2.v AS a, l3.v AS b, l2.sigma / l3.sigma AS c
  FROM l2 JOIN sym e ON e.u = l2.v
  JOIN l3 ON l3.s = l2.s AND l3.v = e.v
),
d2 AS (
  SELECT l2.s, l2.v, l2.sigma, coalesce(g.delta, 0) AS delta
  FROM l2 LEFT JOIN (SELECT s, a, sum(c) AS delta FROM ec3 GROUP BY s, a) g
    ON g.s = l2.s AND g.a = l2.v
),
ec2 AS (
  SELECT l1.s, l1.v AS a, d2.v AS b, l1.sigma / d2.sigma * (1 + d2.delta) AS c
  FROM l1 JOIN sym e ON e.u = l1.v
  JOIN d2 ON d2.s = l1.s AND d2.v = e.v
),
d1 AS (
  SELECT l1.s, l1.v, l1.sigma, coalesce(g.delta, 0) AS delta
  FROM l1 LEFT JOIN (SELECT s, a, sum(c) AS delta FROM ec2 GROUP BY s, a) g
    ON g.s = l1.s AND g.a = l1.v
),
ec1 AS (
  SELECT d1.s, d1.s AS a, d1.v AS b, 1.0 / d1.sigma * (1 + d1.delta) AS c
  FROM d1 JOIN sym e ON e.u = d1.s AND e.v = d1.v
),
alle AS (SELECT * FROM ec1 UNION ALL SELECT * FROM ec2
         UNION ALL SELECT * FROM ec3)
SELECT least(a, b) AS pu, greatest(a, b) AS pv,
       round(sum(c), 6) AS edge_betweenness,
       CAST(count(*) AS BIGINT) AS n_source_terms
FROM alle GROUP BY 1, 2
ORDER BY edge_betweenness DESC, pu, pv LIMIT {_EBC_TOPK}
"""


def _ebc_oracle() -> str:
    from kafka_etl_consumer_spark.plans.queries_pipeline7 import _COORD_EDGE_CTE

    return _EBC_ORACLE.format(coord_edge_cte=_COORD_EDGE_CTE)


@register("graph_edge_betweenness", _ebc_oracle())
def graph_edge_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-radius EDGE betweenness (Brandes 2001 §4, the
    Girvan-Newman 2002 splitting primitive) on the co-ordered-parts
    graph, sources = the 4 smallest vertices, paths of length <= 3.
    Forward pass: the same per-level sigma-BFS as
    graph_betweenness_bounded (one frontier ⋈ edges join + min-hop
    struct-agg per level over a once-partitioned, checkpointed edge
    list). Backward pass: each shortest-path-DAG edge (v, w) with
    dist(w) = dist(v) + 1 carries
    c(v, w) = sigma(v)/sigma(w) * (1 + delta(w));
    the vertex dependency delta(v) is the SUM of its outgoing edge
    terms, so the sweep materializes the per-edge contribution rows
    the vertex query only aggregates — including the source-incident
    level-0 edges the vertex statistic never counts (endpoints are
    excluded from vertex betweenness, but every edge on a shortest
    path scores). Emits the canonical (min, max) edge pair, its summed
    betweenness and the number of contributing (source, direction)
    terms, top {_EBC_TOPK}. Both the oracle and the plan were verified
    this round against an independent queue-based Brandes replay (the
    page_trend lesson: parity alone cannot catch a shared-formula
    error — tests/test_graph_edge_betweenness.py pins the recurrence).
    Scale: identical envelope to graph_betweenness_bounded — cost is
    |seeds| * (frontier ⋈ edges) per hop, edge side partitioned once;
    per-edge accumulation adds one groupBy keyed on the edge pair (the
    DAG edge count is bounded by |E| per source). The Brandes-Pich
    pivot-sampling recipe scales |seeds|, never the radius.

    Optimization r11 (VERDICT r10 item 3, same treatment as
    graph_betweenness_bounded): the symmetric edge list is materialized
    EAGERLY once and its count sizes every loop stage's shuffle width
    (lazy checkpoints compile via toRdd at build time and bypass AQE),
    and the per-edge contribution levels ec3/ec2 — each consumed TWICE
    (the next delta level + the final union) — are lazily checkpointed
    so each backward level's joins run once instead of once per
    consumer (the nested re-execution multiplied the deepest level 3x)."""
    from kafka_etl_consumer_spark.operators.graph import loop_shuffle_width
    from kafka_etl_consumer_spark.plans.queries_pipeline7 import _coordered_edges

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
            sym.select(F.col("u").alias("s")).distinct().orderBy("s").limit(_EBC_SRCS)
        )
        dist = srcs.select(
            "s", F.col("s").alias("v"), F.lit(0).alias("hop"), F.lit(1.0).alias("sigma")
        ).localCheckpoint(eager=False)
        for h in range(1, _EBC_HOPS + 1):
            frontier = dist.filter(F.col("hop") == h - 1)
            step = (
                frontier.alias("f")
                .join(sym.alias("e"), F.col("e.u") == F.col("f.v"))
                .groupBy(F.col("f.s").alias("s"), F.col("e.v").alias("v"))
                .agg(F.sum("f.sigma").alias("sigma"))
                .select("s", "v", F.lit(h).alias("hop"), "sigma")
            )
            dist = (
                dist.unionByName(step)
                .groupBy("s", "v")
                .agg(F.min(F.struct("hop", "sigma")).alias("m"))
                .select(
                    "s", "v", F.col("m.hop").alias("hop"), F.col("m.sigma").alias("sigma")
                )
                .localCheckpoint(eager=False)
            )
        levels = {h: dist.filter(F.col("hop") == h) for h in range(_EBC_HOPS + 1)}

        def _edge_contrib(lower: DataFrame, upper_with_delta: DataFrame) -> DataFrame:
            """Per-DAG-edge rows (s, a, b, c) from `lower`-level tails to the
            already-solved level above: c = sigma(a)/sigma(b) * (1 + delta(b))."""
            return (
                lower.alias("lo")
                .join(sym.alias("e"), F.col("e.u") == F.col("lo.v"))
                .join(
                    upper_with_delta.alias("up"),
                    (F.col("up.s") == F.col("lo.s")) & (F.col("up.v") == F.col("e.v")),
                )
                .select(
                    F.col("lo.s").alias("s"),
                    F.col("lo.v").alias("a"),
                    F.col("up.v").alias("b"),
                    (
                        F.col("lo.sigma") / F.col("up.sigma") * (1 + F.col("up.delta"))
                    ).alias("c"),
                )
            )

        def _with_delta(level: DataFrame, contrib: DataFrame) -> DataFrame:
            """Attach delta(v) = sum of v's outgoing edge terms (0 if none)."""
            g = contrib.groupBy("s", F.col("a").alias("v")).agg(
                F.sum("c").alias("delta")
            )
            return level.select("s", "v", "sigma").join(g, ["s", "v"], "left").select(
                "s", "v", "sigma", F.coalesce("delta", F.lit(0.0)).alias("delta")
            )

        l3 = levels[3].select("s", "v", "sigma", F.lit(0.0).alias("delta"))
        ec3 = _edge_contrib(levels[2], l3).localCheckpoint(eager=False)
        d2 = _with_delta(levels[2], ec3)
        ec2 = _edge_contrib(levels[1], d2).localCheckpoint(eager=False)
        d1 = _with_delta(levels[1], ec2)
        # level-0 edges: the tail is the source itself, sigma(s) = 1
        ec1 = _edge_contrib(
            levels[0].select("s", "v", "sigma"), d1
        )
        alle = ec1.unionByName(ec2).unionByName(ec3)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return (
        alle.groupBy(
            F.least("a", "b").alias("pu"), F.greatest("a", "b").alias("pv")
        )
        .agg(
            F.round(F.sum("c"), 6).alias("edge_betweenness"),
            F.count(F.lit(1)).cast("bigint").alias("n_source_terms"),
        )
        .orderBy(F.col("edge_betweenness").desc(), "pu", "pv")
        .limit(_EBC_TOPK)
    )


# ---------------------------------------------------------------------------
# text_yake_keywords — YAKE single-term statistic on the raw-case grid
# ---------------------------------------------------------------------------

_YAKE_TOPK = 15

_YAKE_ORACLE = """
WITH arr AS (
  SELECT p_partkey AS doc_id,
         list_filter(regexp_split_to_array(trim(p_type || ' ' || p_name),
                                           '\\s+'),
                     t -> len(t) > 0) AS a
  FROM part
),
tok AS (
  SELECT doc_id, unnest(a) AS raw, unnest(range(1, len(a) + 1)) AS i
  FROM arr
),
grid AS (
  SELECT doc_id, i, raw, lower(raw) AS t,
         CASE WHEN lower(raw) IN ('the','a','an','and','or','of','to','in',
                                  'on','for','with','is','are','was','be',
                                  'as','by','at','it','this','that','from')
                   OR regexp_matches(lower(raw), '[^a-z]')
              THEN 1 ELSE 0 END AS is_delim
  FROM tok
),
kept AS (SELECT doc_id, i, raw, t FROM grid WHERE is_delim = 0),
base AS (
  SELECT t, CAST(count(*) AS BIGINT) AS tf,
         CAST(sum(CASE WHEN regexp_matches(raw, '^[A-Z]+$')
                            AND len(raw) > 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS tf_a,
         CAST(sum(CASE WHEN regexp_matches(raw, '^[A-Z]')
                            AND NOT (regexp_matches(raw, '^[A-Z]+$')
                                     AND len(raw) > 1)
                       THEN 1 ELSE 0 END) AS BIGINT) AS tf_u,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM kept GROUP BY t
),
medpos AS (
  SELECT t, avg(CAST(i AS DOUBLE)) AS med FROM (
    SELECT t, i,
           row_number() OVER (PARTITION BY t ORDER BY doc_id, i) AS rn,
           count(*) OVER (PARTITION BY t) AS cnt
    FROM kept)
  WHERE rn IN (CAST(floor((cnt + 1) / 2.0) AS BIGINT),
               CAST(ceil((cnt + 1) / 2.0) AS BIGINT))
  GROUP BY t
),
adj AS (
  SELECT a.t AS u, b.t AS v
  FROM kept a JOIN kept b ON b.doc_id = a.doc_id AND b.i = a.i + 1
),
lft AS (
  SELECT v AS t, CAST(count(DISTINCT u) AS DOUBLE) / count(*) AS dl
  FROM adj GROUP BY v
),
rgt AS (
  SELECT u AS t, CAST(count(DISTINCT v) AS DOUBLE) / count(*) AS dr
  FROM adj GROUP BY u
),
corpus AS (
  SELECT CAST(count(*) AS BIGINT) AS n_cand,
         CAST(sum(tf) AS BIGINT) AS s1,
         CAST(sum(tf * tf) AS BIGINT) AS s2,
         CAST(max(tf) AS BIGINT) AS max_tf
  FROM base
),
ndocs AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM part),
feat AS (
  SELECT b.t, b.tf,
         greatest(b.tf_a, b.tf_u) / (1 + ln(b.tf)) AS wcase,
         ln(ln(3 + m.med)) AS wpos,
         b.tf / (s1 / CAST(n_cand AS DOUBLE)
                 + sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / n_cand)
                        / (n_cand - 1))) AS wfreq,
         1 + (coalesce(l.dl, 0) + coalesce(r.dr, 0))
               * b.tf / CAST(max_tf AS DOUBLE) AS wrel,
         b.df / CAST(n_docs AS DOUBLE) AS wdif
  FROM base b
  JOIN medpos m USING (t)
  LEFT JOIN lft l USING (t)
  LEFT JOIN rgt r USING (t)
  CROSS JOIN corpus CROSS JOIN ndocs
)
SELECT t AS term, tf,
       round(wrel * wpos / (wcase + wfreq / wrel + wdif / wrel), 9)
         AS yake_score
FROM feat
ORDER BY yake_score, term LIMIT %(topk)s
""" % {"topk": _YAKE_TOPK}


@register("text_yake_keywords", _YAKE_ORACLE)
def text_yake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """YAKE single-term keyword statistic (Campos et al. 2020 §4.2) —
    the fourth extractor on the shared substrate and the first to use
    the raw-case grid (``keyword_token_grid(case_sensitive=True)``,
    VERDICT r9 item 4): the five YAKE features per candidate term are
    casing WCase = max(TF_acronym, TF_capitalized)/(1 + ln TF),
    position WPos = ln(ln(3 + median position)), frequency
    WFreq = TF/(mean_TF + sd_TF), relatedness
    WRel = 1 + (DL + DR) * TF/max_TF with DL/DR the left/right
    distinct-neighbor dispersion over the directed adjacency stream,
    and document dispersion WDif = DF/N; the final score
    S = WRel * WPos / (WCase + WFreq/WRel + WDif/WRel), LOWER = more
    keyword-like. Runs over a composite part-catalog corpus
    (p_type || ' ' || p_name) because the documents fixture is 100%
    lowercase — the casing feature would be identically zero there
    (the fixture-independence lesson); the all-caps p_type tokens vs
    lowercase p_name words give the feature real discrimination.
    Simplifications vs the paper, both documented and spelled in BOTH
    engines: the position unit is the token offset (these docs are one
    sentence) and the dispersion window is 1. sd_TF comes from exact
    integer sums (s2 - s1^2/n over n-1), never a builtin stddev, so
    the float chain is bit-identical cross-engine; the median is the
    explicit avg-of-middle-rows. Scale: one grid pass, one lag-shaped
    adjacency (no token self-join), vocabulary-grain aggregates, and
    the corpus scalars collapse to ONE broadcast row."""
    from kafka_etl_consumer_spark.operators.nlp import (
        adjacent_content_pairs_directed,
        keyword_token_grid,
    )

    part = _t(spark, sf_dir, "part")
    docs = part.select(
        F.col("p_partkey").alias("doc_id"),
        F.concat_ws(" ", "p_type", "p_name").alias("text"),
    )
    grid = keyword_token_grid(docs, case_sensitive=True)
    kept = grid.filter(F.col("is_delim") == 0).select(
        "doc_id", (F.col("i") + 1).alias("i"), "raw", "t"
    )
    is_acr = F.col("raw").rlike("^[A-Z]+$") & (F.length("raw") > 1)
    base = kept.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf"),
        F.sum(is_acr.cast("int")).cast("bigint").alias("tf_a"),
        F.sum((F.col("raw").rlike("^[A-Z]") & ~is_acr).cast("int"))
        .cast("bigint")
        .alias("tf_u"),
        F.countDistinct("doc_id").alias("df"),
    )
    wm = Window.partitionBy("t").orderBy("doc_id", "i")
    medpos = (
        kept.select(
            "t",
            "i",
            F.row_number().over(wm).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("t")).alias("cnt"),
        )
        .filter(
            (F.col("rn") == F.floor((F.col("cnt") + 1) / 2.0))
            | (F.col("rn") == F.ceil((F.col("cnt") + 1) / 2.0))
        )
        .groupBy("t")
        .agg(F.avg(F.col("i").cast("double")).alias("med"))
    )
    adj = adjacent_content_pairs_directed(grid)
    lft = adj.groupBy(F.col("v").alias("t")).agg(
        (F.countDistinct("u").cast("double") / F.count(F.lit(1))).alias("dl")
    )
    rgt = adj.groupBy(F.col("u").alias("t")).agg(
        (F.countDistinct("v").cast("double") / F.count(F.lit(1))).alias("dr")
    )
    corpus = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cand"),
        F.sum("tf").cast("bigint").alias("s1"),
        F.sum(F.col("tf") * F.col("tf")).cast("bigint").alias("s2"),
        F.max("tf").cast("bigint").alias("max_tf"),
    )
    ndocs = part.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    feat = (
        base.join(medpos, "t")
        .join(lft, "t", "left")
        .join(rgt, "t", "left")
        .crossJoin(F.broadcast(corpus))
        .crossJoin(F.broadcast(ndocs))
        .select(
            "t",
            "tf",
            (F.greatest("tf_a", "tf_u") / (1 + F.log("tf"))).alias("wcase"),
            F.log(F.log(3 + F.col("med"))).alias("wpos"),
            (
                F.col("tf")
                / (
                    F.col("s1") / F.col("n_cand").cast("double")
                    + F.sqrt(
                        (
                            F.col("s2")
                            - F.col("s1").cast("double")
                            * F.col("s1")
                            / F.col("n_cand")
                        )
                        / (F.col("n_cand") - 1)
                    )
                )
            ).alias("wfreq"),
            (
                1
                + (F.coalesce("dl", F.lit(0.0)) + F.coalesce("dr", F.lit(0.0)))
                * F.col("tf")
                / F.col("max_tf").cast("double")
            ).alias("wrel"),
            (F.col("df") / F.col("n_docs").cast("double")).alias("wdif"),
        )
    )
    score = F.round(
        F.col("wrel")
        * F.col("wpos")
        / (F.col("wcase") + F.col("wfreq") / F.col("wrel") + F.col("wdif") / F.col("wrel")),
        9,
    )
    return (
        feat.select(F.col("t").alias("term"), "tf", score.alias("yake_score"))
        .orderBy("yake_score", "term")
        .limit(_YAKE_TOPK)
    )


# ---------------------------------------------------------------------------
# stats_tukey_hsd — Tukey-Kramer post-hoc with a fixed (k, df=inf) table
# ---------------------------------------------------------------------------

# Studentized-range upper-5% critical values q_{0.05}(k, df=inf) from the
# standard tables (Harter 1960; the df=inf row). Using df=inf instead of
# df=N-k is the documented approximation: q decreases in df, so the inf
# row is the smallest critical value (anti-conservative), but the error
# df here is N-k in the hundreds-to-tens-of-thousands, where published
# tables put q within 0.03 of the inf row for every k in this map.
_TUKEY_Q05_INF = {2: 2.772, 3: 3.314, 4: 3.633, 5: 3.858,
                  6: 4.030, 7: 4.170, 8: 4.286, 9: 4.387, 10: 4.474}
_TUKEY_MAX_K = 6  # order-size groups 1..6 (larger orders thin out < sf0.01)

_TUKEY_CRIT_SQL = "CASE k_groups " + " ".join(
    f"WHEN {k} THEN {v}" for k, v in sorted(_TUKEY_Q05_INF.items())
) + " END"

_TUKEY_ORACLE = f"""
WITH om AS (
  SELECT l_orderkey, count(*) AS k, max(l_extendedprice) AS mx
  FROM lineitem GROUP BY 1
),
g AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n, sum(mx) AS s, sum(mx * mx) AS q2
  FROM om WHERE k BETWEEN 1 AND {_TUKEY_MAX_K} GROUP BY k
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_tot, CAST(count(*) AS INT) AS k_groups,
         (sum(q2) - sum(s * s / n)) / (sum(n) - count(*)) AS msw
  FROM g
),
crit AS (SELECT k_groups, n_tot, msw, {_TUKEY_CRIT_SQL} AS q_crit FROM tot)
SELECT CAST(a.k AS BIGINT) AS k_a, CAST(b.k AS BIGINT) AS k_b,
       a.n AS n_a, b.n AS n_b,
       round(a.s / a.n, 2) AS mean_a, round(b.s / b.n, 2) AS mean_b,
       round(abs(a.s / a.n - b.s / b.n)
             / sqrt(msw / 2 * (1.0 / a.n + 1.0 / b.n)), 4) AS q_stat,
       q_crit,
       CAST(CASE WHEN abs(a.s / a.n - b.s / b.n)
                      / sqrt(msw / 2 * (1.0 / a.n + 1.0 / b.n)) > q_crit
                 THEN 1 ELSE 0 END AS INT) AS significant
FROM g a JOIN g b ON a.k < b.k CROSS JOIN crit
ORDER BY k_a, k_b
"""


@register("stats_tukey_hsd", _TUKEY_ORACLE)
def stats_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-Kramer HSD post-hoc (Tukey 1949; Kramer 1956 for unequal
    n): all-pairs comparison of group means after an ANOVA, each pair
    tested at q = |mean_i - mean_j| / sqrt(MSW/2 * (1/n_i + 1/n_j))
    against the studentized-range critical value q_{{0.05}}(k, df=inf)
    from a fixed broadcast table (VERDICT r9 item 5; the df=inf
    approximation is documented at the table). The grouping is
    STRUCTURAL — per-order max(l_extendedprice) by order line count
    1..{_TUKEY_MAX_K} — because every natural grouping in the synthetic
    fixture is independent of every metric (probed again this round:
    even o_totalprice is drawn independently of the order's lineitems);
    E[max of k draws] grows concavely in k, so distant order sizes
    differ sharply and adjacent ones weakly, giving the post-hoc a
    non-degenerate mix of verdicts at sf0.001 (the fixture-independence
    lesson). MSW comes from exact per-group (n, sum, sum-of-squares) —
    never a builtin variance — and q is a RATIO, so accumulation-order
    float noise divides out; means round at 2dp (magnitude ~1e5).
    Scale: one data-grain hash-agg (per-order max), then a <=6-row
    group frame self-joined broadcast for the k(k-1)/2 pairs — the
    pairwise stage never touches data volume."""
    li = _t(spark, sf_dir, "lineitem")
    om = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("k"), F.max("l_extendedprice").alias("mx")
    )
    g = (
        om.filter(F.col("k").between(1, _TUKEY_MAX_K))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("mx").alias("s"),
            F.sum(F.col("mx") * F.col("mx")).alias("q2"),
        )
    )
    crit_map = F.create_map(
        *[F.lit(x) for kv in sorted(_TUKEY_Q05_INF.items()) for x in kv]
    )
    tot = g.agg(
        F.sum("n").cast("bigint").alias("n_tot"),
        F.count(F.lit(1)).cast("int").alias("k_groups"),
        (
            (F.sum("q2") - F.sum(F.col("s") * F.col("s") / F.col("n")))
            / (F.sum("n") - F.count(F.lit(1)))
        ).alias("msw"),
    ).select("n_tot", "k_groups", "msw", crit_map[F.col("k_groups")].alias("q_crit"))
    pairs = (
        g.alias("a")
        .join(F.broadcast(g.alias("b")), F.col("a.k") < F.col("b.k"))
        .crossJoin(F.broadcast(tot))
    )
    qd = F.abs(
        F.col("a.s") / F.col("a.n") - F.col("b.s") / F.col("b.n")
    ) / F.sqrt(F.col("msw") / 2 * (1.0 / F.col("a.n") + 1.0 / F.col("b.n")))
    return pairs.select(
        F.col("a.k").cast("bigint").alias("k_a"),
        F.col("b.k").cast("bigint").alias("k_b"),
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        F.round(F.col("a.s") / F.col("a.n"), 2).alias("mean_a"),
        F.round(F.col("b.s") / F.col("b.n"), 2).alias("mean_b"),
        F.round(qd, 4).alias("q_stat"),
        "q_crit",
        (qd > F.col("q_crit")).cast("int").alias("significant"),
    ).orderBy("k_a", "k_b")
