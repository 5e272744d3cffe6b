"""Query surface batch 10 (round 2): geospatial, retrieval fusion,
deterministic HLL, time-series bars/smoothing, ML-prep encodings,
robust outliers, and k-NN classification.

- grid-blocked geo radius join (haversine, oracle brute-forces all pairs)
- hybrid retrieval: reciprocal-rank fusion of BM25 and embedding cosine
- HyperLogLog distinct (register-exact cross-engine) vs exact counts
- OHLC resampling bars over the event stream
- per-user EWMA (inherently sequential fold, applyInPandas)
- smoothed target-mean encoding (leakage-safe global prior)
- median-absolute-deviation outlier counts
- k-NN majority-label prediction over the embedding table
- trigram-blocked fuzzy name matching (entity resolution)
- interval union coverage (gaps-and-islands merge)
- weighted median (cumulative-weight window)
- prefix-filtered exact set-similarity join (PPJoin family)
- skip-gram co-occurrence counts; rolling median
- leakage-free group-aware split; chi-square independence
- in-plan PCA power iteration; product-quantization codes
- PSI drift; label-propagation communities; sequence mining
- association rules; Benford digit audit; source JSD
- point-in-time temporal join (SCD2 read side)

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283); these extend the training-data/analytics operators
the brief requires. Every query carries an exact DuckDB oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_etl_consumer_spark.functions.hashing import hash64_sql
from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# geospatial radius join. Coordinates are derived deterministically from the
# keys (the synthetic tables carry none): lat/lon on a 0.1-degree lattice in
# [-10, 10)^2, so both engines compute identical doubles from integer
# arithmetic. The Spark side runs the grid-blocked join (operators/geo.py);
# the oracle brute-forces ALL pairs — hash equality therefore PROVES the
# 3x3-cell blocking misses no qualifying pair, not merely that the distance
# formula matches.
# ---------------------------------------------------------------------------

_GEO_RADIUS_KM = 70.0

_GEO_ORACLE = f"""
WITH c AS (SELECT c_custkey,
                  ((c_custkey * 37) % 200) / 10.0 - 10.0 AS c_lat,
                  ((c_custkey * 73) % 200) / 10.0 - 10.0 AS c_lon
           FROM customer),
s AS (SELECT s_suppkey,
             ((s_suppkey * 41) % 200) / 10.0 - 10.0 AS s_lat,
             ((s_suppkey * 97) % 200) / 10.0 - 10.0 AS s_lon
      FROM supplier),
p AS (SELECT s_suppkey, c_custkey,
             round(2 * 6371.0 * asin(sqrt(
                 sin((c_lat - s_lat) * 0.017453292519943295 / 2)
                 * sin((c_lat - s_lat) * 0.017453292519943295 / 2)
                 + cos(s_lat * 0.017453292519943295)
                 * cos(c_lat * 0.017453292519943295)
                 * sin((c_lon - s_lon) * 0.017453292519943295 / 2)
                 * sin((c_lon - s_lon) * 0.017453292519943295 / 2)
             )), 3) AS dist_km
      FROM s CROSS JOIN c)
SELECT s_suppkey, c_custkey, dist_km FROM p WHERE dist_km <= {_GEO_RADIUS_KM}
"""


@register("geo_radius_join", _GEO_ORACLE)
def geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All (supplier, customer) pairs within 70 km: grid-cell equi-join
    (:func:`operators.geo.radius_join`), never the O(N·M) cross product
    the oracle runs — see operators/geo.py for the provable 3x3-cell
    containment bound at |lat| <= 45, r <= 75 km."""
    from kafka_etl_consumer_spark.operators.geo import radius_join

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        (((F.col("c_custkey") * 37) % 200) / 10.0 - 10.0).alias("c_lat"),
        (((F.col("c_custkey") * 73) % 200) / 10.0 - 10.0).alias("c_lon"),
    )
    supp = _t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (((F.col("s_suppkey") * 41) % 200) / 10.0 - 10.0).alias("s_lat"),
        (((F.col("s_suppkey") * 97) % 200) / 10.0 - 10.0).alias("s_lon"),
    )
    pairs = radius_join(
        supp, cust, _GEO_RADIUS_KM, lat_cols=("s_lat", "c_lat"), lon_cols=("s_lon", "c_lon")
    )
    return pairs.select("s_suppkey", "c_custkey", "dist_km")


# ---------------------------------------------------------------------------
# hybrid retrieval: reciprocal-rank fusion (RRF, Cormack et al. 2009) of the
# BM25 lexical ranking and the embedding-cosine ranking. Rank-based, so the
# fused score is exact rational arithmetic — float noise in either scorer is
# absorbed by its rank (ties broken by id in both engines).
# ---------------------------------------------------------------------------

_RRF_TERMS = ["vector", "hash", "join"]
_RRF_DEPTH = 30  # per-system candidate depth
_RRF_C = 60  # the paper's smoothing constant

_RRF_ORACLE = f"""
WITH docs AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                     t -> len(t) > 0) AS toks
  FROM documents
),
dl AS (SELECT doc_id, len(toks) AS d FROM docs),
corpus AS (SELECT count(*) AS n, avg(d) AS avgdl FROM dl),
hits AS (
  SELECT doc_id, t FROM (SELECT doc_id, unnest(toks) AS t FROM docs)
  WHERE t IN ('vector', 'hash', 'join')
),
tf AS (SELECT doc_id, t, count(*) AS tf FROM hits GROUP BY doc_id, t),
dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
bm AS (
  SELECT tf.doc_id,
         round(sum(ln((n - df + 0.5) / (df + 0.5) + 1.0)
             * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * d / avgdl))), 6) AS s
  FROM tf JOIN dfreq USING (t) JOIN dl USING (doc_id) CROSS JOIN corpus
  GROUP BY tf.doc_id
),
br AS (SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r FROM bm
       QUALIFY r <= {_RRF_DEPTH}),
e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
q AS (SELECT emb AS q_emb FROM e WHERE vec_id = 0),
cs AS (SELECT e.vec_id AS doc_id,
              round(list_dot_product(q_emb, e.emb)
                    / (sqrt(list_dot_product(q_emb, q_emb))
                       * sqrt(list_dot_product(e.emb, e.emb))), 6) AS s
       FROM q CROSS JOIN e WHERE e.vec_id <> 0),
cr AS (SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r FROM cs
       QUALIFY r <= {_RRF_DEPTH}),
fused AS (
  SELECT coalesce(br.doc_id, cr.doc_id) AS doc_id,
         round(coalesce(CAST(1.0 AS DOUBLE) / ({_RRF_C} + br.r), 0.0)
               + coalesce(CAST(1.0 AS DOUBLE) / ({_RRF_C} + cr.r), 0.0), 6)
             AS rrf_score
  FROM br FULL OUTER JOIN cr ON br.doc_id = cr.doc_id
)
SELECT doc_id, rrf_score FROM fused
ORDER BY rrf_score DESC, doc_id LIMIT 10
"""


@register("search_hybrid_rrf", _RRF_ORACLE)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 hybrid retrieval: BM25 (terms {vector, hash, join}) and
    cosine-to-vec-0 candidate lists (depth 30 each), fused with
    RRF = Σ 1/(60 + rank).

    Scale shape: each ranker produces ≤ depth rows (TakeOrdered cuts), the
    fusion is a full-outer join of two 30-row sets — broadcast trivially;
    the heavy lifting stays inside the rankers, whose 100 TB stories live
    with them (operators/nlp.py bm25_topk, operators/similarity.py
    cosine_topk)."""
    from kafka_etl_consumer_spark.operators.nlp import bm25_topk
    from kafka_etl_consumer_spark.operators.similarity import cosine_topk

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    bm = bm25_topk(docs, _RRF_TERMS, k=_RRF_DEPTH)
    br = bm.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col("doc_id")))
        .alias("r"),
    )
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_embedding")
    )
    cs = cosine_topk(emb, q, k=_RRF_DEPTH)
    cr = cs.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col("vec_id")))
        .alias("r"),
    )
    fused = (
        br.withColumnRenamed("r", "rb")
        .join(cr.withColumnRenamed("r", "rc"), "doc_id", "full")
        .select(
            "doc_id",
            F.round(
                F.coalesce(1.0 / (_RRF_C + F.col("rb")), F.lit(0.0))
                + F.coalesce(1.0 / (_RRF_C + F.col("rc")), F.lit(0.0)),
                6,
            ).alias("rrf_score"),
        )
    )
    return fused.orderBy(F.col("rrf_score").desc(), "doc_id").limit(10)


# ---------------------------------------------------------------------------
# deterministic HyperLogLog vs exact distinct (operators/sketch.py
# hll_distinct — register layout and corrections documented there; the
# oracle replays registers bit-for-bit via the same bin/lpad/instr rho)
# ---------------------------------------------------------------------------

_HLL_ORACLE = f"""
WITH h AS (SELECT event_type,
                  {hash64_sql("CAST(user_id AS VARCHAR)")} AS h
           FROM events WHERE user_id IS NOT NULL),
r AS (SELECT event_type, h % 64 AS reg,
             CASE WHEN h // 64 = 0 THEN 55
                  ELSE instr(lpad(bin(h // 64), 54, '0'), '1') END AS rho
      FROM h),
m AS (SELECT event_type, reg, max(rho) AS mrho FROM r GROUP BY 1, 2),
s AS (SELECT event_type, sum(power(2.0, -mrho)) AS s,
             64 - count(*) AS zeros
      FROM m GROUP BY 1),
est AS (SELECT event_type,
               CAST(0.709 AS DOUBLE) * 4096 / (s + zeros) AS raw, zeros
        FROM s),
hll AS (SELECT event_type,
               round(CASE WHEN raw <= 160.0 AND zeros > 0
                          THEN CAST(64 AS DOUBLE)
                               * ln(CAST(64 AS DOUBLE) / zeros)
                          ELSE raw END, 6) AS hll_estimate
        FROM est)
SELECT e.event_type, hll.hll_estimate, e.exact_distinct
FROM (SELECT event_type, count(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY event_type) e
JOIN hll USING (event_type)
"""


@register("sketch_hll_distinct", _HLL_ORACLE)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL (m=64) distinct users per event type next to the exact count.
    Register state is md5-derived, so this approximate algorithm is
    hash-checked register-for-register against DuckDB — unlike
    ``approx_count_distinct`` whose xxhash64 registers no other engine can
    replay (that built-in remains the production default; see
    operators/sketch.py for when determinism is contractual)."""
    from kafka_etl_consumer_spark.operators.sketch import hll_distinct

    ev = _t(spark, sf_dir, "events")
    est = hll_distinct(ev, "user_id", group_cols=["event_type"], m=64)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return exact.join(est, "event_type").select(
        "event_type", "hll_estimate", "exact_distinct"
    )


# ---------------------------------------------------------------------------
# OHLC resampling (operators/timeseries.py resample_bars)
# ---------------------------------------------------------------------------

_OHLC_ORACLE = """
SELECT event_type,
       time_bucket(INTERVAL '6 hours', ts) AS bucket_ts,
       arg_min(value, epoch_us(ts) * 1000 + event_id % 1000) AS open,
       max(value) AS high,
       min(value) AS low,
       arg_max(value, epoch_us(ts) * 1000 + event_id % 1000) AS close,
       CAST(count(*) AS BIGINT) AS n,
       -- exact integer mean: cents sum, half-up via integer division
       -- (see operators/timeseries.resample_bars for why no double
       -- rounding path can agree cross-engine on boundary buckets)
       CAST((sum(CAST(round(value * 100, 0) AS BIGINT)) * 20000 + count(*))
            // (2 * count(*)) AS DOUBLE) / 1e6 AS mean_value
FROM events
GROUP BY 1, 2
"""


@register("ts_resample_ohlc", _OHLC_ORACLE)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-hour OHLC bars per event type over the event stream — ONE
    hash-agg; open/close via min_by/max_by on the composite
    (microsecond, event_id) order key (operators/timeseries.py
    resample_bars, which documents why timestamps alone don't make a
    deterministic bar)."""
    from kafka_etl_consumer_spark.operators.timeseries import resample_bars

    ev = _t(spark, sf_dir, "events")
    return resample_bars(ev, every="6 hours", group_cols=["event_type"])


# ---------------------------------------------------------------------------
# per-user EWMA (operators/timeseries.py ewma_last): the canonical
# inherently sequential fold — applyInPandas on Spark, list_reduce in the
# oracle, identical IEEE operation sequence (0.3*x + 0.7*acc) in both.
# ---------------------------------------------------------------------------

_EWMA_ORACLE = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       round(list_reduce(list(value ORDER BY ts, event_id),
                         (acc, x) -> 0.3 * x + (CAST(1 AS DOUBLE) - 0.3) * acc),
             6) AS ewma
FROM events GROUP BY user_id
"""


@register("ewma_user_value", _EWMA_ORACLE)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final EWMA (alpha=0.3) of ``value`` per user, ordered by
    (ts, event_id). No DataFrame expression can express an unbounded
    recursive fold, so this is the grouped-map slow path done right:
    Arrow-batched applyInPandas, one shuffle on user_id, O(1) state per
    key (operators/timeseries.py ewma_last)."""
    from kafka_etl_consumer_spark.operators.timeseries import ewma_last

    return ewma_last(_t(spark, sf_dir, "events"), alpha=0.3)


# ---------------------------------------------------------------------------
# smoothed target-mean encoding (the categorical-feature encoder every
# tabular training pipeline ships): enc(seg) = (sum_y + prior*a) / (n + a)
# ---------------------------------------------------------------------------

_TENC_ALPHA = 10.0

_TENC_ORACLE = f"""
WITH joined AS (
  SELECT c.c_mktsegment AS seg, o.o_totalprice AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
g AS (SELECT sum(y) / count(*) AS prior FROM joined),
seg AS (SELECT seg, count(*) AS n_orders, sum(y) AS sum_y
        FROM joined GROUP BY seg),
nc AS (SELECT c_mktsegment AS seg, count(*) AS n_customers
       FROM customer GROUP BY c_mktsegment)
SELECT nc.seg AS c_mktsegment,
       nc.n_customers,
       CAST(coalesce(seg.n_orders, 0) AS BIGINT) AS n_orders,
       round((coalesce(seg.sum_y, 0) + g.prior * {_TENC_ALPHA})
             / (coalesce(seg.n_orders, 0) + {_TENC_ALPHA}), 4) AS target_enc
FROM nc LEFT JOIN seg USING (seg) CROSS JOIN g
"""


@register("encode_target_mean", _TENC_ORACLE)
def encode_target_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target-mean encoding of c_mktsegment against order value:
    enc = (Σy + prior·α)/(n + α), α=10 — the global prior dominates rare
    categories (the standard leakage-damping form).

    Scale shape: orders⋈customer is the only real shuffle (fact-fact at
    TPC-H shapes — AQE picks the strategy); the per-segment stats and the
    one-row prior are tiny aggregates crossJoin/broadcast back. At 100 TB
    the encoding MAP (|categories| rows) broadcasts to wherever the
    feature column is applied."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"), F.col("o_totalprice").alias("y")
    )
    g = joined.agg((F.sum("y") / F.count(F.lit(1))).alias("prior"))
    seg = joined.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n_orders"), F.sum("y").alias("sum_y")
    )
    nc = c.groupBy(F.col("c_mktsegment")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    return (
        nc.join(
            F.broadcast(seg), nc.c_mktsegment == seg.seg, "left"
        )
        .crossJoin(F.broadcast(g))
        .select(
            "c_mktsegment",
            "n_customers",
            F.coalesce("n_orders", F.lit(0)).cast("bigint").alias("n_orders"),
            F.round(
                (F.coalesce("sum_y", F.lit(0.0)) + F.col("prior") * _TENC_ALPHA)
                / (F.coalesce("n_orders", F.lit(0)) + _TENC_ALPHA),
                4,
            ).alias("target_enc"),
        )
    )


# ---------------------------------------------------------------------------
# median-absolute-deviation outliers: the robust alternative to
# anomaly_zscore (mean/stddev break down exactly when outliers are present)
# ---------------------------------------------------------------------------

_MAD_ORACLE = """
WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
             FROM events GROUP BY event_type),
dev AS (SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS ad
        FROM events e JOIN med m USING (event_type)),
mad AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad
        FROM dev GROUP BY event_type)
SELECT d.event_type,
       round(any_value(d.med), 6) AS median_value,
       round(any_value(m.mad), 6) AS mad,
       CAST(count(*) FILTER (WHERE d.ad > 4.4478 * m.mad) AS BIGINT)
           AS n_outliers,
       CAST(count(*) AS BIGINT) AS n
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
"""


@register("anomaly_mad_outliers", _MAD_ORACLE)
def anomaly_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outliers per event type under the robust MAD rule
    |x − median| > 3·1.4826·MAD (4.4478, the normal-consistency constant).

    Both exact medians come from grid_median's value-count grids (no
    percentile aggregate buffering a whole group in one buffer), with
    the one-row-per-group results broadcast back to the scan; at 100 TB
    with near-unique values swap them for ``approx_percentile`` (or the
    mergeable histogram sketch, operators/sketch.py) without touching
    the outlier rule."""
    from kafka_etl_consumer_spark.operators.ranks import grid_median

    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    med = grid_median(ev, ["event_type"], "value", out_col="med")
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("value") - F.col("med"))
    )
    mad = grid_median(
        dev.select("event_type", "ad"), ["event_type"], "ad", out_col="mad"
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.first("med"), 6).alias("median_value"),
            F.round(F.first("mad"), 6).alias("mad"),
            F.count(F.when(F.col("ad") > 4.4478 * F.col("mad"), 1))
            .cast("bigint")
            .alias("n_outliers"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# k-NN majority-label classification over the embedding table: the
# similarity-search surface APPLIED (label transfer / weak supervision)
# ---------------------------------------------------------------------------

_KNN_ORACLE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label FROM embeddings),
q AS (SELECT vec_id AS q_vec_id, emb AS q_emb, label AS true_label
      FROM e WHERE vec_id < 20),
c AS (SELECT vec_id, emb, label FROM e WHERE vec_id >= 20),
s AS (SELECT q_vec_id, true_label, c.vec_id, c.label,
             round(list_dot_product(q_emb, c.emb)
                   / (sqrt(list_dot_product(q_emb, q_emb))
                      * sqrt(list_dot_product(c.emb, c.emb))), 6) AS score
      FROM q CROSS JOIN c),
r AS (SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                   ORDER BY score DESC, vec_id) AS rn
      FROM s),
votes AS (SELECT q_vec_id, true_label, label, count(*) AS cnt
          FROM r WHERE rn <= 5 GROUP BY 1, 2, 3),
pick AS (SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                      ORDER BY cnt DESC, label) AS pr
         FROM votes)
SELECT q_vec_id AS vec_id, true_label, label AS pred_label,
       true_label = label AS correct
FROM pick WHERE pr = 1
"""


@register("knn_label_predict", _KNN_ORACLE)
def knn_label_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-NN majority-vote label prediction for the first 20 vectors against
    the rest of the corpus (ties → smallest label; neighbor order ties →
    smallest id, both engines). The neighbor search is
    :func:`operators.similarity.cosine_topk` (broadcast query side, one
    corpus pass); votes and the argmax pick are |q|·k-row operations —
    noise after the search. This is label transfer/weak supervision, the
    standard k-NN application of the ANN surface."""
    from kafka_etl_consumer_spark.operators.similarity import cosine_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
        F.col("label").alias("true_label"),
    )
    corpus = e.filter(F.col("vec_id") >= 20).select("vec_id", "embedding", "label")
    top = cosine_topk(
        corpus.select("vec_id", "embedding"), q.select("q_vec_id", "q_embedding"), k=5
    )
    # Broadcast the |q|*k top-neighbor table, NEVER the corpus label
    # table: corpus is the full embedding table and would OOM the
    # broadcast at scale, while top is bounded by queries*k rows.
    votes = (
        F.broadcast(top)
        .join(corpus.select("vec_id", "label"), "vec_id")
        .groupBy("q_vec_id", "label")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.col("cnt").desc(), F.col("label"))
    pick = (
        votes.withColumn("pr", F.row_number().over(w))
        .filter(F.col("pr") == 1)
        .select("q_vec_id", F.col("label").alias("pred_label"))
    )
    return (
        q.select("q_vec_id", "true_label")
        .join(pick, "q_vec_id")
        .select(
            F.col("q_vec_id").alias("vec_id"),
            "true_label",
            "pred_label",
            (F.col("true_label") == F.col("pred_label")).alias("correct"),
        )
    )


# ---------------------------------------------------------------------------
# fuzzy entity matching: trigram-blocked name resolution. Query names are
# deterministic "typos" of catalog names (one char dropped at
# key-mod-length); matching is character-trigram Jaccard with the candidate
# set generated by a postings equi-join on shared trigrams — the pg_trgm /
# entity-resolution blocking pattern, never an all-pairs edit-distance scan
# (str_levenshtein_pairs covers the bounded-vocab exact-distance variant).
# ---------------------------------------------------------------------------

_FUZZY_THRESHOLD = 0.45

_FUZZY_ORACLE = f"""
WITH cat AS (SELECT DISTINCT p_name AS name FROM part),
catg AS (
  SELECT name,
         list_distinct(list_transform(range(1, length(name) - 1),
                                      i -> substr(name, CAST(i AS INT), 3))) AS tg
  FROM cat
),
q0 AS (SELECT p_partkey AS qid, p_name,
              CAST(p_partkey % length(p_name) AS INT) + 1 AS p
       FROM part WHERE p_partkey % 37 = 0),
q AS (SELECT qid,
             concat(substr(p_name, 1, p - 1), substr(p_name, p + 1)) AS qname
      FROM q0),
qg AS (
  SELECT qid, qname,
         list_distinct(list_transform(range(1, length(qname) - 1),
                                      i -> substr(qname, CAST(i AS INT), 3))) AS tg
  FROM q
),
cpost AS (SELECT name, unnest(tg) AS t FROM catg),
qpost AS (SELECT qid, unnest(tg) AS t FROM qg),
shared AS (SELECT qid, name, count(*) AS both
           FROM qpost JOIN cpost USING (t) GROUP BY qid, name),
scored AS (
  SELECT s.qid, qg.qname, s.name,
         round(CAST(s.both AS DOUBLE)
               / (len(qg.tg) + len(catg.tg) - s.both), 6) AS jac
  FROM shared s JOIN qg USING (qid) JOIN catg USING (name)
),
best AS (SELECT *, row_number() OVER (PARTITION BY qid
                                      ORDER BY jac DESC, name) AS rn
         FROM scored WHERE jac >= {_FUZZY_THRESHOLD})
SELECT qid, qname, name AS matched_name, jac FROM best WHERE rn = 1
"""


@register("fuzzy_match_names", _FUZZY_ORACLE)
def fuzzy_match_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best catalog match per corrupted name via trigram-blocked Jaccard.

    Scale shape: candidates come from ONE equi-join of trigram postings
    (each side a narrow explode), so comparison count is bounded by shared
    trigrams, not |queries|x|catalog|; per-pair scoring is a count + two
    broadcast size lookups; the final pick is a WindowGroupLimit rank.
    Common stopword-trigrams can hot-spot the postings join at 100 TB —
    cap or df-filter them exactly as the inverted-index operator documents
    (operators/nlp.py)."""
    part = _t(spark, sf_dir, "part")

    def trigrams(c):
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(c) - 2),
                lambda i: F.substring(c, i, F.lit(3)),
            )
        )

    cat = part.select(F.col("p_name").alias("name")).distinct()
    catg = cat.select("name", trigrams(F.col("name")).alias("tg"))
    q0 = part.filter(F.col("p_partkey") % 37 == 0).select(
        F.col("p_partkey").alias("qid"),
        "p_name",
        (F.col("p_partkey") % F.length("p_name") + 1).cast("int").alias("p"),
    )
    q = q0.select(
        "qid",
        F.concat(
            F.expr("substr(p_name, 1, p - 1)"), F.expr("substr(p_name, p + 1)")
        ).alias("qname"),
    )
    qg = q.select("qid", "qname", trigrams(F.col("qname")).alias("tg"))
    cpost = catg.select("name", F.explode("tg").alias("t"))
    qpost = qg.select("qid", F.explode("tg").alias("t"))
    shared = qpost.join(cpost, "t").groupBy("qid", "name").agg(
        F.count(F.lit(1)).alias("both")
    )
    scored = (
        shared.join(F.broadcast(qg.select("qid", "qname", F.size("tg").alias("nq"))), "qid")
        .join(F.broadcast(catg.select("name", F.size("tg").alias("nc"))), "name")
        .select(
            "qid",
            "qname",
            "name",
            F.round(
                F.col("both").cast("double")
                / (F.col("nq") + F.col("nc") - F.col("both")),
                6,
            ).alias("jac"),
        )
        .filter(F.col("jac") >= _FUZZY_THRESHOLD)
    )
    w = Window.partitionBy("qid").orderBy(F.col("jac").desc(), F.col("name"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("qid", "qname", F.col("name").alias("matched_name"), "jac")
    )


# ---------------------------------------------------------------------------
# interval union coverage (merge overlapping intervals): per-user total
# covered time and island count — the classic gaps-and-islands reduction,
# expressed identically in both engines (integer microsecond arithmetic,
# so the result is exact)
# ---------------------------------------------------------------------------

_COVER_ORACLE = """
WITH iv AS (
  SELECT user_id,
         epoch_us(ts) AS s,
         epoch_us(ts) + (event_id % 7 + 1) * 60000000 AS e
  FROM events
),
flagged AS (
  SELECT user_id, s, e,
         CASE WHEN s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islands AS (
  SELECT user_id, s, e,
         sum(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS island
  FROM flagged
),
merged AS (
  SELECT user_id, island, max(e) - min(s) AS span_us
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_islands,
       -- floor division: Spark's double->bigint cast truncates while
       -- DuckDB's rounds, so make the floor explicit in both engines
       CAST(sum(span_us) // 1000000 AS BIGINT) AS covered_seconds
FROM merged GROUP BY user_id
"""


@register("interval_union_coverage", _COVER_ORACLE)
def interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total covered wall-time per user after merging overlapping event
    intervals ([ts, ts + (event_id%7 + 1) min]) — the gaps-and-islands
    union: an interval opens a new island iff it starts after the running
    max of all previous ends.

    Scale shape: both windows (running-max-of-ends, running island sum)
    and the two aggregations share ONE user-keyed sort/exchange — Spark
    reuses the partitioning; nothing here is quadratic in events-per-user.
    The island flag must compare against max(e), not lag(e): with nested
    intervals the PREVIOUS end isn't the FURTHEST end (classic
    gaps-islands bug, caught by the oracle)."""
    ev = _t(spark, sf_dir, "events")
    s = F.unix_micros(F.col("ts").cast("timestamp"))
    iv = ev.select(
        "user_id",
        s.alias("s"),
        (s + (F.col("event_id") % 7 + 1) * 60000000).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(F.col("s") > F.max("e").over(w_prev), 1).otherwise(0),
    )
    islands = flagged.withColumn("island", F.sum("new_island").over(w_run))
    merged = islands.groupBy("user_id", "island").agg(
        (F.max("e") - F.min("s")).alias("span_us")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.floor(F.sum("span_us") / 1000000).cast("bigint").alias("covered_seconds"),
    )


# ---------------------------------------------------------------------------
# weighted median: cumulative-weight formulation (the lower weighted
# median: first value whose running weight reaches half the total).
# percentile() can't weight; this is the standard window reduction.
# ---------------------------------------------------------------------------

_WMED_ORACLE = """
WITH wv AS (
  SELECT event_type, value, event_id % 5 + 1 AS w FROM events
),
cum AS (
  SELECT event_type, value, w,
         sum(w) OVER (PARTITION BY event_type ORDER BY value, w
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cw,
         sum(w) OVER (PARTITION BY event_type) AS tw
  FROM wv
),
hit AS (
  SELECT event_type, min(value) AS weighted_median, any_value(tw) AS total_weight
  FROM cum WHERE cw * 2 >= tw GROUP BY event_type
)
SELECT event_type, CAST(total_weight AS BIGINT) AS total_weight,
       weighted_median
FROM hit
"""


@register("weighted_median_value", _WMED_ORACLE)
def weighted_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (lower) median of ``value`` per event type, weight =
    event_id%5+1: order by value, take the first row whose cumulative
    weight reaches half the total. ``cw*2 >= tw`` keeps the halfway test
    in exact integer arithmetic — no float boundary to disagree on.

    Scale shape: one event_type-keyed sort serves the running sum; the
    per-group total rides the same exchange as an unbounded window; the
    argmin collapses in the final hash-agg. At 100 TB prefer the mergeable
    histogram sketch (operators/sketch.py) unless exactness is
    contractual — same tradeoff stats_agg documents."""
    ev = _t(spark, sf_dir, "events")
    wv = ev.select(
        "event_type", "value", (F.col("event_id") % 5 + 1).alias("w")
    )
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("value", "w")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("event_type")
    cum = wv.select(
        "event_type",
        "value",
        F.sum("w").over(w_run).alias("cw"),
        F.sum("w").over(w_all).alias("tw"),
    )
    return (
        cum.filter(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("event_type")
        .agg(
            F.first("tw").cast("bigint").alias("total_weight"),
            F.min("value").alias("weighted_median"),
        )
    )


# ---------------------------------------------------------------------------
# exact set-similarity self-join via prefix filtering (PPJoin family): the
# deterministic complement to MinHash-LSH. The oracle BRUTE-FORCES all
# pairs, so hash equality proves the prefix filter's completeness — every
# qualifying pair survived the pruning — not just the Jaccard arithmetic.
# ---------------------------------------------------------------------------

_SSJ_ORACLE = """
WITH d AS (
  SELECT doc_id,
         list_sort(list_distinct(
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         t -> len(t) > 0))) AS ts
  FROM documents WHERE source = 'src0'
),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.ts, b.ts)) AS o,
         len(a.ts) AS na, len(b.ts) AS nb
  FROM d a JOIN d b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       round(CAST(o AS DOUBLE) / (na + nb - o), 6) AS jac
FROM p WHERE o * 3 >= (na + nb)
"""
# threshold filter o*(num+den) >= num*(na+nb) with num=1, den=2 — the same
# exact-rational contract the operator enforces (rounding only for display),
# so oracle and engine can never disagree at the rounding boundary


@register("ssjoin_prefix_tokens", _SSJ_ORACLE)
def ssjoin_prefix_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All src0 document pairs with EXACT token-set Jaccard >= 1/2, found
    by prefix filtering (:func:`operators.dedup.set_similarity_join_prefix`
    — rarest-first ordering, integer-exact prefix bound, array-intersect
    verification; see its docstring for why stopwords generate zero
    candidates and nothing goes |docs|²)."""
    from kafka_etl_consumer_spark.operators.dedup import set_similarity_join_prefix

    docs = _t(spark, sf_dir, "documents").filter(F.col("source") == "src0")
    return set_similarity_join_prefix(docs, threshold_num=1, threshold_den=2)


# ---------------------------------------------------------------------------
# skip-gram co-occurrence counts: the (center, context) pair table that
# word2vec-style embedding training consumes. Pair generation is PURE
# ARRAY CODEGEN over each document's token array — transform over
# positions x offsets, flatten, filter bounds — zero joins, zero shuffle
# until the final count agg; the 100 TB cost is exactly one hash-agg over
# ~2k x corpus-tokens pairs.
# ---------------------------------------------------------------------------

_SKIP_K = 2  # context window: offsets {-2,-1,+1,+2}

_SKIP_ORACLE = """
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                     t -> len(t) > 0) AS ts
  FROM documents
),
pl AS (
  SELECT flatten([
      list_transform(range(1, len(ts)),     i -> {'center': ts[i],     'context': ts[i + 1]}),
      list_transform(range(1, len(ts)),     i -> {'center': ts[i + 1], 'context': ts[i]}),
      list_transform(range(1, len(ts) - 1), i -> {'center': ts[i],     'context': ts[i + 2]}),
      list_transform(range(1, len(ts) - 1), i -> {'center': ts[i + 2], 'context': ts[i]})
  ]) AS prs
  FROM tok
),
pairs AS (SELECT u.center AS center, u.context AS context
          FROM pl, unnest(prs) AS t(u)),
counts AS (
  SELECT center, context, CAST(count(*) AS BIGINT) AS n
  FROM pairs GROUP BY center, context
)
SELECT center, context, n
FROM counts
ORDER BY n DESC, center, context
LIMIT 50
"""


@register("skipgram_pairs_topk", _SKIP_ORACLE)
def skipgram_pairs_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 skip-gram (center, context) pairs (window ±2) by corpus
    count — the co-occurrence table behind word2vec/GloVe-style embedding
    pretraining. Pair expansion is higher-order array functions inside
    whole-stage codegen (no explode-join: each doc's pairs materialize
    from its own token array); ONE hash-agg counts them; the cut is
    TakeOrderedAndProject."""
    from kafka_etl_consumer_spark.functions.text import tokens

    docs = _t(spark, sf_dir, "documents")
    t = F.col("__ts")
    n = F.size(t)

    def offset_pairs(o: int, swapped: bool) -> F.Column:
        m = F.greatest(n - o, F.lit(0))
        a, b = F.slice(t, 1, m), F.slice(t, 1 + o, m)
        if swapped:
            a, b = b, a
        return F.zip_with(
            a, b, lambda x, y: F.struct(x.alias("center"), y.alias("context"))
        )

    pairs = F.concat(
        *[offset_pairs(o, sw) for o in range(1, _SKIP_K + 1) for sw in (False, True)]
    )
    return (
        docs.select(tokens("text").alias("__ts"))
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.center").alias("center"), F.col("p.context").alias("context"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "center", "context")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# rolling median: robust trailing-window smoothing (the order-statistic
# counterpart to anomaly_zscore's trailing mean/stddev). The lower median
# of the last 21 values — an ELEMENT PICK from the sorted frame, so the
# result is a value both engines agree on exactly, with no interpolation
# arithmetic to diverge.
# ---------------------------------------------------------------------------

_RMED_ORACLE = """
WITH w AS (
  SELECT user_id, event_id, value,
         list_sort(list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN 20 PRECEDING AND CURRENT ROW))
             AS fr
  FROM events
)
SELECT user_id, event_id,
       fr[(len(fr) + 1) // 2] AS rolling_median,
       CAST(len(fr) AS INT) AS n_window
FROM w
"""


@register("rolling_median_value", _RMED_ORACLE)
def rolling_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-21-row lower median of ``value`` per user (ordered by
    ts, event_id): collect_list over the frame, array_sort, pick element
    ceil(n/2) — exact order statistic, no interpolation.

    Scale shape: ONE user-keyed sort serves the frame; the frame copy is
    bounded (21 doubles/row) — the documented window-buffer trade every
    trailing-window operator in this repo makes (anomaly_zscore,
    ts_motif_topk). Unbounded-history medians belong to the histogram
    sketch instead (operators/sketch.py)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, 0)
    )
    fr = F.array_sort(F.collect_list("value").over(w))
    idx = F.floor((F.size(fr) + 1) / 2).cast("int")
    return ev.select(
        "user_id",
        "event_id",
        F.element_at(fr, idx).alias("rolling_median"),
        F.size(fr).alias("n_window"),
    )


# ---------------------------------------------------------------------------
# group-aware (leakage-free) split: hash the GROUP key, not the row. The
# row-hash split (split_train_val_test) leaks when rows of one entity
# correlate — a user's events must all land in ONE split or eval measures
# memorization. Checked property: every user appears in exactly one split.
# ---------------------------------------------------------------------------

_GSPLIT_ORACLE = f"""
WITH b AS (
  SELECT user_id, event_id,
         {hash64_sql("'gsplit-' || CAST(user_id AS VARCHAR)")} % 100 AS bucket
  FROM events
),
s AS (SELECT user_id, event_id,
             CASE WHEN bucket < 80 THEN 'train'
                  WHEN bucket < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM b)
SELECT split,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM s GROUP BY split
"""


@register("split_group_aware", _GSPLIT_ORACLE)
def split_group_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 split keyed on hash(user_id): all of a user's events share
    a split — the leakage-free counterpart to the row-hash
    `split_train_val_test` (same deterministic md5 bucket machinery, so
    the assignment is stable across runs/engines/retries). A narrow map +
    one hash-agg; assignment itself never shuffles."""
    from kafka_etl_consumer_spark.functions.hashing import hash64

    ev = _t(spark, sf_dir, "events")
    bucket = hash64(F.concat(F.lit("gsplit-"), F.col("user_id").cast("string"))) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        ev.select("user_id", "event_id", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
# chi-square test of independence over a contingency table: is event_type
# distribution independent of the user cohort? Exact integer observed
# counts; expected counts and the statistic are the identical double
# formula in both engines.
# ---------------------------------------------------------------------------

_CHI2_ORACLE = """
WITH obs AS (
  SELECT event_type, user_id % 4 AS cohort, count(*) AS o
  FROM events GROUP BY 1, 2
),
margins AS (
  SELECT o.event_type, o.cohort, o.o,
         sum(o.o) OVER (PARTITION BY o.event_type) AS row_total,
         sum(o.o) OVER (PARTITION BY o.cohort) AS col_total,
         sum(o.o) OVER () AS grand
  FROM obs o
),
cells AS (
  SELECT event_type, cohort, o,
         CAST(row_total AS DOUBLE) * col_total / grand AS e
  FROM margins
)
SELECT CAST(count(*) AS BIGINT) AS n_cells,
       round(sum((o - e) * (o - e) / e), 6) AS chi2,
       CAST((count(DISTINCT event_type) - 1)
            * (count(DISTINCT cohort) - 1) AS BIGINT) AS dof
FROM cells
"""


@register("stats_chi2_independence", _CHI2_ORACLE)
def stats_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square statistic for event_type x cohort(user_id%4)
    independence: one contingency hash-agg (cells = |types|x|cohorts|,
    bounded), margins via windows over the TINY cell table, one-row
    result. All the data-sized work is the first aggregation; everything
    after runs on ~20 rows no matter the corpus size."""
    ev = _t(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", (F.col("user_id") % 4).alias("cohort")
    ).agg(F.count(F.lit(1)).alias("o"))
    margins = obs.select(
        "event_type",
        "cohort",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("row_total"),
        F.sum("o").over(Window.partitionBy("cohort")).alias("col_total"),
        F.sum("o").over(Window.partitionBy()).alias("grand"),
    )
    cells = margins.withColumn(
        "e", F.col("row_total").cast("double") * F.col("col_total") / F.col("grand")
    )
    return cells.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.round(
            F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")),
            6,
        ).alias("chi2"),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("cohort") - 1)
        )
        .cast("bigint")
        .alias("dof"),
    )


# ---------------------------------------------------------------------------
# PCA top component via in-plan power iteration: distributed linear algebra
# without a covariance matrix — C·v folds to one data pass per iteration
# (operators/embeddings.py pca_top_component, which documents the
# per-iteration re-rounding that keeps both engines on identical doubles).
# The component fingerprint hashes SCALED-INTEGER strings: float->string
# formatting differs across engines (1.0E-7 vs 1e-07), integers don't.
# ---------------------------------------------------------------------------

_PCA_ORACLE = """
WITH e AS (SELECT embedding::DOUBLE[] AS emb FROM embeddings),
dims AS (SELECT unnest(range(1, 65)) AS d),
v0 AS (SELECT list_transform(range(1, 65), d -> 0.125) AS v),
d1 AS (SELECT emb, list_dot_product(emb, v0.v) AS dot FROM e, v0),
r1 AS (SELECT dims.d AS d, sum(d1.emb[dims.d] * d1.dot) AS w
       FROM d1, dims GROUP BY dims.d),
v1 AS (SELECT list(round(w / sqrt((SELECT sum(w * w) FROM r1)), 9)
                   ORDER BY d) AS v FROM r1),
d2 AS (SELECT emb, list_dot_product(emb, v1.v) AS dot FROM e, v1),
r2 AS (SELECT dims.d AS d, sum(d2.emb[dims.d] * d2.dot) AS w
       FROM d2, dims GROUP BY dims.d),
v2 AS (SELECT list(round(w / sqrt((SELECT sum(w * w) FROM r2)), 9)
                   ORDER BY d) AS v FROM r2),
d3 AS (SELECT emb, list_dot_product(emb, v2.v) AS dot FROM e, v2),
r3 AS (SELECT dims.d AS d, sum(d3.emb[dims.d] * d3.dot) AS w
       FROM d3, dims GROUP BY dims.d),
v3 AS (SELECT list(round(w / sqrt((SELECT sum(w * w) FROM r3)), 9)
                   ORDER BY d) AS v FROM r3),
vf AS (SELECT list_transform(v3.v,
                             x -> x * (CASE WHEN v3.v[1] < 0
                                            THEN -1.0 ELSE 1.0 END)) AS v
       FROM v3),
lam AS (SELECT sum(list_dot_product(e.emb, vf.v)
                   * list_dot_product(e.emb, vf.v)) AS num,
               sum(list_dot_product(e.emb, e.emb)) AS den
        FROM e, vf)
SELECT round(lam.num / lam.den, 6) AS explained_ratio,
       round(vf.v[1], 6) AS c1,
       round(vf.v[2], 6) AS c2,
       round(vf.v[3], 6) AS c3,
       md5(array_to_string(
           list_transform(vf.v,
               x -> CAST(CAST(round(x * 1000000, 0) AS BIGINT) AS VARCHAR)),
           ',')) AS component_fp
FROM lam, vf
"""


@register("embedding_pca_power", _PCA_ORACLE)
def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding table (3 power-iteration
    passes, in-plan, covariance never materialized) with its Rayleigh
    explained-variance ratio. See operators/embeddings.py
    pca_top_component for the matvec-as-one-pass shape and the
    determinism-by-re-rounding argument."""
    from kafka_etl_consumer_spark.operators.embeddings import pca_top_component

    e = _t(spark, sf_dir, "embeddings")
    out = pca_top_component(e, dims=64, iters=3)
    v = F.col("component")
    fp = F.md5(
        F.concat_ws(
            ",",
            F.transform(
                v, lambda x: F.round(x * 1000000, 0).cast("bigint").cast("string")
            ),
        )
    )
    return out.select(
        "explained_ratio",
        F.round(F.element_at(v, 1), 6).alias("c1"),
        F.round(F.element_at(v, 2), 6).alias("c2"),
        F.round(F.element_at(v, 3), 6).alias("c3"),
        fp.alias("component_fp"),
    )


# ---------------------------------------------------------------------------
# distribution drift (PSI): the monitoring gate every production training
# pipeline runs before trusting a new data slice. Reference window =
# first half of the month, current = second half; buckets are the
# reference's exact deciles, PSI = Σ (p−q)·ln(p/q) with +0.5 Laplace
# smoothing so empty buckets stay finite. Both engines derive the SAME
# cutpoint doubles (identical percentile interpolation over identical
# values), so bucket assignment — a < comparison — cannot disagree.
# ---------------------------------------------------------------------------

_PSI_SPLIT = "2024-01-16"

_PSI_ORACLE = f"""
WITH ref AS (SELECT event_type, value FROM events
             WHERE ts < TIMESTAMP '{_PSI_SPLIT}'),
cur AS (SELECT event_type, value FROM events
        WHERE ts >= TIMESTAMP '{_PSI_SPLIT}'),
cuts AS (
  SELECT event_type,
         quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5,
                               0.6, 0.7, 0.8, 0.9]) AS cut
  FROM ref GROUP BY event_type
),
rb AS (SELECT r.event_type,
              len(list_filter(c.cut, x -> r.value > x)) AS b
       FROM ref r JOIN cuts c USING (event_type)),
cb AS (SELECT r.event_type,
              len(list_filter(c.cut, x -> r.value > x)) AS b
       FROM cur r JOIN cuts c USING (event_type)),
grid AS (SELECT DISTINCT event_type, unnest(range(0, 10)) AS b FROM cuts),
rc AS (SELECT event_type, b, count(*) AS n FROM rb GROUP BY 1, 2),
cc AS (SELECT event_type, b, count(*) AS n FROM cb GROUP BY 1, 2),
tot AS (SELECT event_type,
               sum(coalesce(rc.n, 0)) AS nr, sum(coalesce(cc.n, 0)) AS nc
        FROM grid LEFT JOIN rc USING (event_type, b)
                  LEFT JOIN cc USING (event_type, b)
        GROUP BY event_type),
cells AS (
  SELECT g.event_type,
         (coalesce(rc.n, 0) + 0.5) / (t.nr + 5.0) AS p,
         (coalesce(cc.n, 0) + 0.5) / (t.nc + 5.0) AS q
  FROM grid g
  LEFT JOIN rc USING (event_type, b)
  LEFT JOIN cc USING (event_type, b)
  JOIN tot t ON t.event_type = g.event_type
)
SELECT c.event_type,
       round(sum((p - q) * ln(p / q)), 6) AS psi,
       CAST(any_value(t.nr) AS BIGINT) AS n_ref,
       CAST(any_value(t.nc) AS BIGINT) AS n_cur
FROM cells c JOIN tot t USING (event_type)
GROUP BY c.event_type
"""


@register("drift_psi_value", _PSI_ORACLE)
def drift_psi_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of ``value`` per event type between the
    month's two halves, over the reference half's exact deciles.

    Scale shape: the reference deciles come from grid_quantiles' value-
    count grid in one pass (one row per event_type, broadcast back as
    the 9-cut array — no percentile value-map buffer), bucket assignment is
    a codegen array fold (no join per bucket), two bounded
    (event_type, bucket) count aggs, and the PSI fold runs on the
    10·|types| cell grid. At 100 TB swap the exact decile agg for
    ``approx_percentile``/the histogram sketch — the PSI algebra is
    untouched (stats_agg's documented trade)."""
    ev = _t(spark, sf_dir, "events").select("event_type", "value", "ts")
    split = F.lit(_PSI_SPLIT).cast("timestamp")
    ref = ev.filter(F.col("ts") < split)
    cur = ev.filter(F.col("ts") >= split)
    from kafka_etl_consumer_spark.operators.ranks import grid_quantiles

    dnames = [f"c{i}" for i in range(1, 10)]
    cuts = grid_quantiles(
        ref.select("event_type", "value"),
        ["event_type"],
        "value",
        [i / 10 for i in range(1, 10)],
        dnames,
    ).select("event_type", F.array(*dnames).alias("cut"))

    def bucketed(df):
        return (
            df.join(F.broadcast(cuts), "event_type")
            .select(
                "event_type",
                F.aggregate(
                    "cut",
                    F.lit(0),
                    lambda acc, x: acc + F.when(F.col("value") > x, 1).otherwise(0),
                ).alias("b"),
            )
            .groupBy("event_type", "b")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    rc, cc = bucketed(ref), bucketed(cur)
    grid = cuts.select("event_type").crossJoin(
        spark.range(0, 10).select(F.col("id").cast("int").alias("b"))
    )
    cells = (
        grid.join(rc.withColumnRenamed("n", "nr"), ["event_type", "b"], "left")
        .join(cc.withColumnRenamed("n", "nc"), ["event_type", "b"], "left")
        .select(
            "event_type",
            F.coalesce("nr", F.lit(0)).alias("nr"),
            F.coalesce("nc", F.lit(0)).alias("nc"),
        )
    )
    tot = cells.groupBy("event_type").agg(
        F.sum("nr").alias("tnr"), F.sum("nc").alias("tnc")
    )
    scored = cells.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "nr",
        "nc",
        "tnr",
        "tnc",
        ((F.col("nr") + 0.5) / (F.col("tnr") + 5.0)).alias("p"),
        ((F.col("nc") + 0.5) / (F.col("tnc") + 5.0)).alias("q"),
    )
    return scored.groupBy("event_type").agg(
        F.round(
            F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))), 6
        ).alias("psi"),
        F.first("tnr").cast("bigint").alias("n_ref"),
        F.first("tnc").cast("bigint").alias("n_cur"),
    )


# ---------------------------------------------------------------------------
# community detection via deterministic synchronous label propagation over
# the co-ordered-parts graph (orderkey%10 slice). Components answer
# reachability; LPA answers density — the oracle unrolls all three
# synchronous rounds, so the fixed-point arithmetic itself is hash-checked.
# ---------------------------------------------------------------------------

_LPA_ITER = """
i{n} AS (
  SELECT u, lbl FROM (
    SELECT e.u AS u, l.lbl AS lbl, count(*) AS c,
           row_number() OVER (PARTITION BY e.u
                              ORDER BY count(*) DESC, l.lbl) AS rn
    FROM sym e JOIN i{p} l ON e.v = l.u
    GROUP BY e.u, l.lbl)
  WHERE rn = 1)"""

_LPA_ORACLE = (
    """
WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 10 = 0),
e0 AS (SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
       FROM li a JOIN li b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
sym AS (SELECT p1 AS u, p2 AS v FROM e0
        UNION ALL SELECT p2 AS u, p1 AS v FROM e0),
i0 AS (SELECT DISTINCT u, u AS lbl FROM sym),"""
    + _LPA_ITER.format(n=1, p=0)
    + ","
    + _LPA_ITER.format(n=2, p=1)
    + ","
    + _LPA_ITER.format(n=3, p=2)
    + """,
sizes AS (SELECT lbl, count(*) AS cs FROM i3 GROUP BY lbl)
SELECT i3.u AS vertex, i3.lbl AS community, CAST(cs AS BIGINT) AS community_size
FROM i3 JOIN sizes ON i3.lbl = sizes.lbl
"""
)


@register("graph_label_propagation", _LPA_ORACLE)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Communities of the co-ordered-parts graph (orderkey%10 slice) after
    3 synchronous LPA rounds (operators/graph.py label_propagation —
    deterministic smallest-label tie-break, WindowGroupLimit argmax per
    round; see its docstring for the per-round shuffle inventory)."""
    from kafka_etl_consumer_spark.operators.graph import label_propagation

    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 10 == 0)
        .select("l_orderkey", "l_partkey")
    )
    e = (
        li.alias("x")
        .join(li.alias("y"), "l_orderkey")
        .filter(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(F.col("x.l_partkey").alias("src"), F.col("y.l_partkey").alias("dst"))
        .distinct()
    )
    out = label_propagation(e, iterations=3)
    return out.withColumn(
        "community_size", F.col("community_size").cast("bigint")
    )


# ---------------------------------------------------------------------------
# sequential pattern mining: most frequent consecutive event-type triples
# per user timeline — the 3-gram generalization of the bigram
# event_transition_matrix; behavioral "what path do users actually take".
# ---------------------------------------------------------------------------

_SEQ3_ORACLE = """
WITH seq AS (
  SELECT user_id, list(event_type ORDER BY ts, event_id) AS s
  FROM events GROUP BY user_id
),
tri AS (
  SELECT unnest(list_transform(range(1, len(s) - 1),
                               i -> s[i] || '>' || s[i + 1] || '>' || s[i + 2]))
             AS pattern
  FROM seq
)
SELECT pattern, CAST(count(*) AS BIGINT) AS n
FROM tri GROUP BY pattern
ORDER BY n DESC, pattern LIMIT 25
"""


@register("seq_event_trigrams", _SEQ3_ORACLE)
def seq_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 consecutive event-type triples across user timelines
    (ordered by ts, event_id). ONE user-keyed collect, then the triple
    expansion is slice+zip_with codegen over each user's sequence array
    (same no-explode-join shape as skipgram_pairs_topk), one hash-agg,
    TakeOrdered cut. Per-user state is the event-type sequence — the
    standard sessionization memory assumption, bounded by timeline
    length."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"), "event_id"
    )
    seq = ev.groupBy("user_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda s: s["event_type"],
        ).alias("s")
    )
    s = F.col("s")
    n = F.size(s)
    m = F.greatest(n - 2, F.lit(0))
    t1, t2, t3 = F.slice(s, 1, m), F.slice(s, 2, m), F.slice(s, 3, m)
    pair = F.zip_with(t1, t2, lambda a, b: F.concat(a, F.lit(">"), b))
    tri = F.zip_with(pair, t3, lambda ab, c: F.concat(ab, F.lit(">"), c))
    return (
        seq.select(F.explode(tri).alias("pattern"))
        .groupBy("pattern")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "pattern")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# product quantization: the compression layer under an IVF index (the
# vector-store stack this repo now covers end to end: brute force -> LSH
# -> IVF -> PQ codes). Seeded codebooks keep the assignment SQL-exact;
# operators/embeddings.py pq_assign documents the round-before-argmin rule.
# ---------------------------------------------------------------------------

_PQ_ORACLE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
subs AS (SELECT CAST(unnest(range(0, 8)) AS INT) AS s),
cb AS (SELECT subs.s, CAST(e.vec_id AS INT) AS code,
              e.emb[subs.s * 8 + 1 : subs.s * 8 + 8] AS cent
       FROM e, subs WHERE e.vec_id < 4),
d AS (SELECT e.vec_id, cb.s, cb.code,
             round(list_sum(list_transform(range(1, 9),
                   i -> (e.emb[cb.s * 8 + i] - cb.cent[i])
                        * (e.emb[cb.s * 8 + i] - cb.cent[i]))), 9) AS dist
      FROM e, cb),
pick AS (SELECT *, row_number() OVER (PARTITION BY vec_id, s
                                      ORDER BY dist, code) AS rn
         FROM d)
SELECT s AS subspace, code,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(dist), 6) AS mean_sqerr
FROM pick WHERE rn = 1 GROUP BY s, code
"""


@register("embedding_pq_codes", _PQ_ORACLE)
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ code occupancy and reconstruction error: assign every embedding
    to its nearest seeded centroid per 8-dim subspace
    (operators/embeddings.py pq_assign) and aggregate the bounded
    (subspace, code) grid — occupancy skew tells you whether the codebook
    needs a Lloyd refinement pass; mean_sqerr is the per-subspace
    compression loss."""
    from kafka_etl_consumer_spark.operators.embeddings import pq_assign

    e = _t(spark, sf_dir, "embeddings")
    codes = pq_assign(e, dims=64, subspaces=8, codebook_size=4)
    return codes.groupBy("subspace", "code").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.avg("sqerr"), 6).alias("mean_sqerr"),
    )


# ---------------------------------------------------------------------------
# association rules (market-basket): support / confidence / lift for part
# pairs co-occurring in orders — the rule-mining layer over the
# co-occurrence edges the graph queries build. Rule metrics are exact
# rationals over integer counts; only the final display values round.
# ---------------------------------------------------------------------------

_ASSOC_MIN_SUPPORT = 3

_ASSOC_ORACLE = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_orders FROM li),
item AS (SELECT l_partkey, count(*) AS s FROM li GROUP BY l_partkey),
pair AS (
  SELECT a.l_partkey AS x, b.l_partkey AS y, count(*) AS sxy
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING count(*) >= {_ASSOC_MIN_SUPPORT}
),
rules AS (
  SELECT p.x AS antecedent, p.y AS consequent,
         CAST(p.sxy AS BIGINT) AS support,
         round(CAST(p.sxy AS DOUBLE) / ix.s, 6) AS confidence,
         round(CAST(p.sxy AS DOUBLE) / ix.s / (iy.s / n.n_orders), 6) AS lift
  FROM pair p
  JOIN item ix ON ix.l_partkey = p.x
  JOIN item iy ON iy.l_partkey = p.y
  CROSS JOIN n
)
SELECT antecedent, consequent, support, confidence, lift
FROM rules
ORDER BY lift DESC, antecedent, consequent LIMIT 20
"""


@register("assoc_rules_parts", _ASSOC_ORACLE)
def assoc_rules_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 part→part association rules by lift (support ≥ 3 orders):
    support = co-order count, confidence = P(y|x), lift = confidence /
    P(y).

    Scale shape: the basket self-join is the standard co-occurrence
    shuffle on l_orderkey (bounded per-order fan-out — baskets are small;
    a pathological mega-basket is the skew-salt case, operators/skew.py);
    the HAVING prunes the pair table BEFORE the metric joins; item
    supports and the one-row order count broadcast. Directed pairs double
    the A-Priori candidate space but keep both rule directions — the
    display cut is TakeOrdered."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n = li.agg(
        F.countDistinct("l_orderkey").cast("double").alias("n_orders")
    )
    item = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("s"))
    pair = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("x"), F.col("b.l_partkey").alias("y")
        )
        .agg(F.count(F.lit(1)).alias("sxy"))
        .filter(F.col("sxy") >= _ASSOC_MIN_SUPPORT)
    )
    rules = (
        pair.join(
            F.broadcast(item.select(F.col("l_partkey").alias("x"), F.col("s").alias("sx"))),
            "x",
        )
        .join(
            F.broadcast(item.select(F.col("l_partkey").alias("y"), F.col("s").alias("sy"))),
            "y",
        )
        .crossJoin(F.broadcast(n))
        .select(
            F.col("x").alias("antecedent"),
            F.col("y").alias("consequent"),
            F.col("sxy").cast("bigint").alias("support"),
            F.round(F.col("sxy").cast("double") / F.col("sx"), 6).alias("confidence"),
            F.round(
                F.col("sxy").cast("double")
                / F.col("sx")
                / (F.col("sy") / F.col("n_orders")),
                6,
            ).alias("lift"),
        )
    )
    return rules.orderBy(F.col("lift").desc(), "antecedent", "consequent").limit(20)


# ---------------------------------------------------------------------------
# Benford first-digit audit: the classic forensic data-quality check —
# does a naturally-occurring amount column follow log10(1 + 1/d)? A
# synthetic or tampered column fails it. Digit extraction avoids string
# formatting entirely (floor-log arithmetic, identical in both engines).
# ---------------------------------------------------------------------------

_BENFORD_ORACLE = """
WITH digits AS (
  SELECT CAST(floor(o_totalprice
               / power(10.0, floor(log10(o_totalprice)))) AS INT) AS d
  FROM orders WHERE o_totalprice > 0
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM digits),
obs AS (SELECT d, count(*) AS c FROM digits GROUP BY d),
grid AS (SELECT CAST(unnest(range(1, 10)) AS INT) AS d)
SELECT g.d AS digit,
       CAST(coalesce(obs.c, 0) AS BIGINT) AS n,
       round(coalesce(obs.c, 0) / n.total, 6) AS observed_freq,
       round(log10(1.0 + CAST(1.0 AS DOUBLE) / g.d), 6) AS benford_freq,
       round(power(coalesce(obs.c, 0) / n.total
                   - log10(1.0 + CAST(1.0 AS DOUBLE) / g.d), 2)
             / log10(1.0 + CAST(1.0 AS DOUBLE) / g.d), 6) AS chi2_term
FROM grid g LEFT JOIN obs ON obs.d = g.d CROSS JOIN n
"""


@register("audit_benford_digits", _BENFORD_ORACLE)
def audit_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals against
    Benford's law, with per-digit chi-square terms. One narrow digit map
    + one 9-key hash-agg; everything after runs on the 9-row grid."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = F.floor(
        F.col("o_totalprice") / F.pow(10.0, F.floor(F.log10("o_totalprice")))
    ).cast("int")
    obs = o.select(d.alias("d")).groupBy("d").agg(F.count(F.lit(1)).alias("c"))
    n = o.agg(F.count(F.lit(1)).cast("double").alias("total"))
    grid = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    bf = F.log10(1.0 + F.lit(1.0) / F.col("digit"))
    freq = F.coalesce("c", F.lit(0)) / F.col("total")
    return (
        grid.join(F.broadcast(obs.withColumnRenamed("d", "digit")), "digit", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "digit",
            F.coalesce("c", F.lit(0)).cast("bigint").alias("n"),
            F.round(freq, 6).alias("observed_freq"),
            F.round(bf, 6).alias("benford_freq"),
            F.round(F.pow(freq - bf, 2) / bf, 6).alias("chi2_term"),
        )
    )


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence between source vocabularies: which corpus
# sources actually differ, and by how much — the symmetric, bounded
# companion to drift_psi_value for TEXT distributions (corpus mixing and
# contamination triage both start here).
# ---------------------------------------------------------------------------

_JSD_ORACLE = """
WITH tok AS (
  SELECT source, unnest(list_filter(
             regexp_split_to_array(lower(trim(text)), '\\s+'),
             t -> len(t) > 0)) AS token
  FROM documents
),
counts AS (SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2),
vocab AS (SELECT DISTINCT token FROM counts),
vsize AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM vocab),
totals AS (SELECT source, sum(c) AS tot FROM counts GROUP BY source),
grid AS (SELECT t.source, vb.token FROM totals t CROSS JOIN vocab vb),
probs AS (
  SELECT g.source, g.token,
         (coalesce(c.c, 0) + 0.5) / (t.tot + 0.5 * vs.v) AS p
  FROM grid g
  LEFT JOIN counts c ON c.source = g.source AND c.token = g.token
  JOIN totals t ON t.source = g.source
  CROSS JOIN vsize vs
),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b, a.token,
         a.p AS p, b.p AS q, (a.p + b.p) / 2 AS m
  FROM probs a JOIN probs b
    ON a.token = b.token AND a.source < b.source
)
SELECT source_a, source_b,
       round(sum(0.5 * p * ln(p / m) + 0.5 * q * ln(q / m)), 6) AS jsd
FROM pairs GROUP BY source_a, source_b
"""


@register("corpus_jsd_sources", _JSD_ORACLE)
def corpus_jsd_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence of the unigram distributions of
    every source pair (Laplace-smoothed over the union vocabulary).

    Scale shape: one (source, token) hash-agg over the tokenized corpus;
    everything after is vocab-bounded — the probability grid is
    |sources|x|vocab| rows, the pair join shuffles on token, and the JSD
    folds per pair. |sources| is small by construction; a huge vocabulary
    would df-cut exactly like text_vocab_oov documents."""
    d = _t(spark, sf_dir, "documents")
    from kafka_etl_consumer_spark.functions.text import tokens

    tok = d.select("source", F.explode(tokens("text")).alias("token"))
    counts = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("c"))
    vocab = counts.select("token").distinct()
    vsize = vocab.agg(F.count(F.lit(1)).cast("double").alias("v"))
    totals = counts.groupBy("source").agg(F.sum("c").alias("tot"))
    grid = totals.select("source", "tot").crossJoin(vocab)
    probs = (
        grid.join(counts, ["source", "token"], "left")
        .crossJoin(F.broadcast(vsize))
        .select(
            "source",
            "token",
            (
                (F.coalesce("c", F.lit(0)) + 0.5)
                / (F.col("tot") + 0.5 * F.col("v"))
            ).alias("p"),
        )
    )
    a = probs.select(
        F.col("source").alias("source_a"), "token", F.col("p").alias("p")
    )
    b = probs.select(
        F.col("source").alias("source_b"), "token", F.col("p").alias("q")
    )
    pairs = a.join(b, "token").filter(F.col("source_a") < F.col("source_b"))
    m = (F.col("p") + F.col("q")) / 2
    return pairs.groupBy("source_a", "source_b").agg(
        F.round(
            F.sum(
                0.5 * F.col("p") * F.log(F.col("p") / m)
                + 0.5 * F.col("q") * F.log(F.col("q") / m)
            ),
            6,
        ).alias("jsd")
    )


# ---------------------------------------------------------------------------
# point-in-time (temporal) join: facts against the dimension version VALID
# AT the fact's timestamp — the read side of the SCD2 surface
# (operators/scd.py writes these validity intervals; here a deterministic
# two-version history is derived in-query so the oracle is self-contained).
# Closed-open [from, to) semantics: an order ON the change boundary
# belongs to the NEW version — the classic off-by-one this query pins.
# ---------------------------------------------------------------------------

_PIT_CHANGE = "1998-07-01"

_PIT_ORACLE = f"""
WITH dim AS (
  SELECT c_custkey, c_mktsegment AS segment,
         TIMESTAMP '1992-01-01' AS valid_from,
         CASE WHEN c_custkey % 4 = 0 THEN TIMESTAMP '{_PIT_CHANGE}'
              ELSE TIMESTAMP '9999-12-31' END AS valid_to
  FROM customer
  UNION ALL
  SELECT c_custkey, c_mktsegment || '_B' AS segment,
         TIMESTAMP '{_PIT_CHANGE}' AS valid_from,
         TIMESTAMP '9999-12-31' AS valid_to
  FROM customer WHERE c_custkey % 4 = 0
)
SELECT d.segment,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o.o_totalprice), 4) AS revenue
FROM orders o
JOIN dim d ON d.c_custkey = o.o_custkey
          AND o.o_orderdate >= d.valid_from
          AND o.o_orderdate < d.valid_to
GROUP BY d.segment
"""


@register("join_point_in_time", _PIT_ORACLE)
def join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per dimension version valid at each order's date, over a
    two-version SCD2 history (customers with custkey%4==0 change segment
    at the boundary; closed-open intervals so boundary orders take the
    new version).

    Scale shape: ONE equi-join on the customer key with the validity
    predicates as join residuals — versions per key are bounded (SCD2
    dimensions grow by change count, not fact count), so the residual
    filter scans a handful of versions per fact row; never a range-join
    explosion. This is the read pattern operators/scd.py scd2_merge
    maintains tables for."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    far = F.lit("9999-12-31").cast("timestamp")
    change = F.lit(_PIT_CHANGE).cast("timestamp")
    v1 = c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("1992-01-01").cast("timestamp").alias("valid_from"),
        F.when(F.col("c_custkey") % 4 == 0, change).otherwise(far).alias("valid_to"),
    )
    v2 = (
        c.filter(F.col("c_custkey") % 4 == 0)
        .select(
            "c_custkey",
            F.concat("c_mktsegment", F.lit("_B")).alias("segment"),
            change.alias("valid_from"),
            far.alias("valid_to"),
        )
    )
    dim = v1.unionByName(v2)
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_totalprice")
    joined = o.join(
        dim,
        (F.col("o_custkey") == F.col("c_custkey"))
        & (F.col("o_orderdate") >= F.col("valid_from"))
        & (F.col("o_orderdate") < F.col("valid_to")),
    )
    return joined.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# image augmentation through the real decode path: horizontal flip +
# center crop re-encoded as PPM, then channel stats over the augmented
# pixels. The oracle reproduces the flipped/cropped pixel values
# arithmetically — so the flip index reversal, crop offsets, and
# re-encode/decode round trip are all hash-checked (same posture as
# multimodal_pixels).
# ---------------------------------------------------------------------------

_AUG_ORACLE = """
WITH px AS (
  SELECT d.doc_id,
         avg((d.doc_id * 7
              + 3 * ((t.j // 8 + 2) * 16 + (11 - t.j % 8))) % 256) AS mean_r,
         avg((d.doc_id * 7
              + 3 * ((t.j // 8 + 2) * 16 + (11 - t.j % 8)) + 1) % 256) AS mean_g,
         avg((d.doc_id * 7
              + 3 * ((t.j // 8 + 2) * 16 + (11 - t.j % 8)) + 2) % 256) AS mean_b
  FROM documents d, (SELECT unnest(range(0, 40)) AS j) t
  GROUP BY d.doc_id
)
SELECT doc_id, mean_r, mean_g, mean_b FROM px
"""


@register("multimodal_augment", _AUG_ORACLE)
def multimodal_augment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic augmentation pipeline: synthesize the same 16x9 PPMs
    as multimodal_pixels, horizontal-flip + center-crop to 8x5 through
    the REAL parse/encode path (operators/multimodal.py augment_images),
    decode again, and mean each channel. Narrow Arrow maps end to end;
    the only shuffle-free-ness caveat is none — there is no shuffle."""
    import numpy as np

    from kafka_etl_consumer_spark.operators import multimodal as M
    from kafka_etl_consumer_spark.session import ensure_min_parallelism

    W, H, CW, CH = 16, 9, 8, 5
    gen_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("media", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, medias = [], []
            for i in pdf["doc_id"]:
                flat = (int(i) * 7 + np.arange(W * H * 3)) % 256
                ids.append(i)
                medias.append(M.encode_ppm(flat, W, H))
            yield pd.DataFrame({"doc_id": ids, "media": medias})

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = ensure_min_parallelism(docs).mapInPandas(gen, gen_schema)
    aug = M.augment_images(media, CW, CH, hflip=True)
    return M.image_channel_stats(M.decode_image_pixels(aug)).select(
        "doc_id",
        F.col("mean_c0").alias("mean_r"),
        F.col("mean_c1").alias("mean_g"),
        F.col("mean_c2").alias("mean_b"),
    )


# ---------------------------------------------------------------------------
# winsorization: clip the tails at per-group exact percentiles — the
# outlier-robust normalization step feature pipelines run before scaling
# (the detection-side counterpart is anomaly_mad_outliers; this one fixes
# rather than flags).
# ---------------------------------------------------------------------------

_WINSOR_ORACLE = """
WITH cuts AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS lo,
         quantile_cont(value, 0.95) AS hi
  FROM events GROUP BY event_type
),
clipped AS (
  SELECT e.event_type, e.value,
         CASE WHEN e.value < c.lo THEN c.lo
              WHEN e.value > c.hi THEN c.hi
              ELSE e.value END AS w
  FROM events e JOIN cuts c USING (event_type)
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) FILTER (WHERE w <> value) AS BIGINT) AS n_clipped,
       round(avg(value), 6) AS mean_raw,
       round(avg(w), 6) AS mean_winsorized
FROM clipped GROUP BY event_type
"""


@register("winsorize_value", _WINSOR_ORACLE)
def winsorize_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%/95% winsorization of ``value`` per event type: exact percentile
    cutpoints broadcast back, clipping is a narrow CASE, one final
    hash-agg reports clip counts and the mean shift. The cutpoints
    come from grid_quantiles' value-count grid (no percentile value-map
    buffer); swap for approx_percentile at 100 TB with near-unique
    values, per stats_agg's documented trade."""
    from kafka_etl_consumer_spark.operators.ranks import grid_quantiles

    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    cuts = grid_quantiles(ev, ["event_type"], "value", [0.05, 0.95], ["lo", "hi"])
    clipped = ev.join(F.broadcast(cuts), "event_type").withColumn(
        "w",
        F.when(F.col("value") < F.col("lo"), F.col("lo"))
        .when(F.col("value") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("value")),
    )
    return clipped.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count(F.when(F.col("w") != F.col("value"), 1))
        .cast("bigint")
        .alias("n_clipped"),
        F.round(F.avg("value"), 6).alias("mean_raw"),
        F.round(F.avg("w"), 6).alias("mean_winsorized"),
    )


# ---------------------------------------------------------------------------
# missing-value imputation: per-group mean fill over a deterministic
# synthetic missingness mask (event_id%7==0 — the tables carry no real
# nulls), accounting included. Imputation must use statistics of the
# OBSERVED rows only — the classic bug is computing the mean over the
# masked column after zero-filling; the oracle pins the right order.
# ---------------------------------------------------------------------------

_IMPUTE_ORACLE = """
WITH masked AS (
  SELECT event_type,
         CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
  FROM events
),
stats AS (SELECT event_type, avg(v) AS fill FROM masked GROUP BY event_type),
imputed AS (
  SELECT m.event_type, m.v, coalesce(m.v, s.fill) AS iv
  FROM masked m JOIN stats s USING (event_type)
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) FILTER (WHERE v IS NULL) AS BIGINT) AS n_imputed,
       round(any_value(
           (SELECT fill FROM stats s WHERE s.event_type = imputed.event_type)
       ), 6) AS fill_value,
       round(avg(iv), 6) AS mean_after
FROM imputed GROUP BY event_type
"""


@register("impute_missing_values", _IMPUTE_ORACLE)
def impute_missing_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type mean imputation over the synthetic event_id%7 missingness
    mask: fill statistics come from OBSERVED rows only (avg skips nulls
    in both engines — the property this query pins), the per-group fill
    row broadcasts back, and the report is one hash-agg."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(F.col("value")).alias("v"),
    )
    stats = ev.groupBy("event_type").agg(F.avg("v").alias("fill"))
    imputed = ev.join(F.broadcast(stats), "event_type").withColumn(
        "iv", F.coalesce("v", "fill")
    )
    return imputed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count(F.when(F.col("v").isNull(), 1)).cast("bigint").alias("n_imputed"),
        F.round(F.first("fill"), 6).alias("fill_value"),
        F.round(F.avg("iv"), 6).alias("mean_after"),
    )


# ---------------------------------------------------------------------------
# relational division ("for all"): customers with at least one order in
# EVERY month of 1995 — the classic universal-quantifier query that trips
# naive NOT EXISTS chains; expressed as the standard distinct-count ==
# divisor-cardinality reduction.
# ---------------------------------------------------------------------------

_DIV_ORACLE = """
WITH m AS (
  SELECT o_custkey, CAST(month(o_orderdate) AS INT) AS mo
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate < TIMESTAMP '1996-01-01'
),
cover AS (
  SELECT o_custkey, count(DISTINCT mo) AS months_covered
  FROM m GROUP BY o_custkey
)
SELECT CAST(months_covered AS INT) AS months_covered,
       CAST(count(*) AS BIGINT) AS n_customers
FROM cover GROUP BY months_covered
"""


@register("division_all_months", _DIV_ORACLE)
def division_all_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-coverage distribution of 1995 buyers — the relational
    division ("customers active in ALL 12 months") via the
    count(DISTINCT month) reduction, reported as the full coverage
    histogram so the universal-quantifier answer is the months_covered=12
    row and the query is informative at any scale. ONE aggregate over the
    pruned year instead of 12 chained semi-joins; the rollup runs on a
    12-row-bounded key."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    cover = (
        o.select("o_custkey", F.month("o_orderdate").alias("mo"))
        .groupBy("o_custkey")
        .agg(F.countDistinct("mo").alias("months_covered"))
    )
    return cover.groupBy(
        F.col("months_covered").cast("int").alias("months_covered")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))


# ---------------------------------------------------------------------------
# last-touch attribution: each purchase credits the user's most recent
# PRIOR non-purchase event — the marketing-analytics pattern (and a
# within-stream as-of join: the asof machinery applied to one table).
# ---------------------------------------------------------------------------

_ATTR_ORACLE = """
WITH e AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN event_type <> 'purchase'
              THEN event_type END AS touch
  FROM events
),
lv AS (
  SELECT user_id, event_type, ts, event_id,
         last_value(touch IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS attributed_to
  FROM e
)
SELECT coalesce(attributed_to, '(none)') AS attributed_to,
       CAST(count(*) AS BIGINT) AS n_purchases
FROM lv WHERE event_type = 'purchase'
GROUP BY 1
"""


@register("attribution_last_touch", _ATTR_ORACLE)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases credited to the most recent prior non-purchase event of
    the same user (first event purchases credit '(none)'). ONE user-keyed
    window — the same last(ignorenulls)-over-preceding-frame shape the
    merge-asof join uses (operators/joins.py), applied within a single
    stream; the attribution rollup is a bounded hash-agg."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"), "event_id"
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lv = ev.withColumn("attributed_to", F.last(touch, ignorenulls=True).over(w))
    return (
        lv.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("attributed_to", F.lit("(none)")).alias("attributed_to"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_purchases"))
    )


# ---------------------------------------------------------------------------
# period-over-period: monthly revenue with MoM growth — the lag-window BI
# staple (and the shape every dashboard's "vs last period" tile compiles
# to). Growth is NULL for each partition's first month, pinned by both
# engines' lag semantics.
# ---------------------------------------------------------------------------

_MOM_ORACLE = """
WITH m AS (
  SELECT o_orderpriority AS priority,
         time_bucket(INTERVAL '1 month', o_orderdate) AS month,
         round(sum(o_totalprice), 4) AS revenue
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate < TIMESTAMP '1999-01-01'
  GROUP BY 1, 2
)
SELECT priority, month, revenue,
       round(revenue / lag(revenue) OVER (PARTITION BY priority
                                          ORDER BY month) - 1, 6)
           AS mom_growth
FROM m
"""


@register("growth_month_over_month", _MOM_ORACLE)
def growth_month_over_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue and month-over-month growth per order priority
    (1997-1998): one pruned-scan hash-agg to the bounded
    (priority, month) grid, then a lag window over that tiny table —
    growth math never touches fact-sized data. Growth is computed on the
    ROUNDED revenue so the ratio is identical cross-engine."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    m = (
        o.select(
            F.col("o_orderpriority").alias("priority"),
            F.date_trunc("month", "o_orderdate").alias("month"),
            "o_totalprice",
        )
        .groupBy("priority", "month")
        .agg(F.round(F.sum("o_totalprice"), 4).alias("revenue"))
    )
    w = Window.partitionBy("priority").orderBy("month")
    return m.select(
        "priority",
        "month",
        "revenue",
        F.round(F.col("revenue") / F.lag("revenue").over(w) - 1, 6).alias(
            "mom_growth"
        ),
    )


# ---------------------------------------------------------------------------
# longest streak: the consecutive-period run-length pattern (the
# date-keyed cousin of gaps-and-islands — grouping key = date - rank is
# constant exactly along a consecutive run).
# ---------------------------------------------------------------------------

_STREAK_ORACLE = """
WITH d AS (
  SELECT DISTINCT o_custkey,
         CAST(time_bucket(INTERVAL '1 month', o_orderdate) AS DATE) AS mo
  FROM orders
),
r AS (
  SELECT o_custkey, mo,
         row_number() OVER (PARTITION BY o_custkey ORDER BY mo) AS rn
  FROM d
),
runs AS (
  SELECT o_custkey,
         count(*) AS len
  FROM r
  GROUP BY o_custkey, mo - to_months(CAST(rn AS INT))
),
best AS (SELECT o_custkey, max(len) AS longest_streak FROM runs
         GROUP BY o_custkey)
SELECT CAST(longest_streak AS INT) AS streak_months,
       CAST(count(*) AS BIGINT) AS n_customers
FROM best GROUP BY longest_streak
"""


@register("streak_longest_monthly", _STREAK_ORACLE)
def streak_longest_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of each customer's longest consecutive-month order
    streak: the date-minus-rank trick (constant along a consecutive run)
    groups runs without self-joins — two hash-aggs and a window over the
    per-customer distinct months, reported as a bounded histogram."""
    o = _t(spark, sf_dir, "orders")
    d = o.select(
        "o_custkey", F.date_trunc("month", "o_orderdate").alias("mo")
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("mo")
    r = d.withColumn("rn", F.row_number().over(w))
    runs = (
        r.withColumn("grp", F.add_months(F.col("mo"), -F.col("rn")))
        .groupBy("o_custkey", "grp")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    best = runs.groupBy("o_custkey").agg(F.max("len").alias("longest_streak"))
    return best.groupBy(
        F.col("longest_streak").cast("int").alias("streak_months")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
