"""Query surface batch 28 (round 4): windowed funnel conversion, top
session paths, sketch-quality audit.

- signup -> purchase conversion within a 7-day window — the funnel
  metric product teams actually track (unwindowed conversion counts a
  year-later purchase as funnel success)
- top-10 session paths — the most common event sequences per
  30-minute session (first 8 steps), the navigation-pattern report
- MinHash estimation-error audit — for every LSH candidate pair,
  signature-estimated vs true Jaccard: the quality gate that tells you
  whether 24 hashes are enough BEFORE you trust the dedup decisions

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283); these extend the driver-verified operator
families the brief requires. Every query carries an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.operators import dedup as D
from kafka_etl_consumer_spark.plans.queries_pipeline import (
    _MINHASH_COEFF_VALUES,
    _SH_CTES,
)
from kafka_etl_consumer_spark.functions.hashing import hash64_sql
from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# funnel_conversion_window — first signup -> first subsequent purchase,
# split by whether it landed inside 7 days. Exact integers + one ratio.
# ---------------------------------------------------------------------------

_FCW_ORACLE = """
WITH su AS (
  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS ts_s
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
pu AS (
  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS ts_p
  FROM events e JOIN su ON su.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > su.ts_s
  GROUP BY e.user_id
),
j AS (
  SELECT su.user_id,
         CASE WHEN pu.ts_p IS NULL THEN 'none'
              WHEN date_diff('microsecond', su.ts_s, pu.ts_p)
                   <= 604800000000 THEN 'in_window'
              ELSE 'late' END AS outcome
  FROM su LEFT JOIN pu ON pu.user_id = su.user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_signup_users,
       CAST(sum(CASE WHEN outcome = 'in_window' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_converted_7d,
       CAST(sum(CASE WHEN outcome = 'late' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_converted_late,
       round(sum(CASE WHEN outcome = 'in_window' THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS conv_rate_7d
FROM j
"""


@register("funnel_conversion_window", _FCW_ORACLE)
def funnel_conversion_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup -> purchase conversion inside a 7-day window. Scale: two
    user-grain hash-aggs sharing the user key (the second is a
    semi-filtered min over the same exchange), one left join at user
    grain, one global count row. No window functions, no event-grain
    joins."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_s"))
    )
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("ts") > F.col("ts_s"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_p"))
    )
    j = su.join(pu, "user_id", "left").select(
        F.when(F.col("ts_p").isNull(), "none")
        .when(
            F.unix_micros("ts_p") - F.unix_micros("ts_s") <= 604800000000,
            "in_window",
        )
        .otherwise("late")
        .alias("outcome")
    )
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_signup_users"),
        F.sum(F.when(F.col("outcome") == "in_window", 1).otherwise(0))
        .cast("bigint")
        .alias("n_converted_7d"),
        F.sum(F.when(F.col("outcome") == "late", 1).otherwise(0))
        .cast("bigint")
        .alias("n_converted_late"),
        F.round(
            F.sum(F.when(F.col("outcome") == "in_window", 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("conv_rate_7d"),
    )


# ---------------------------------------------------------------------------
# session_path_topk — top-10 most common session paths (first 8 event
# types per 30-minute-gap session, in (ts, event_id) order).
# ---------------------------------------------------------------------------

_SPT_ORACLE = """
WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
           FROM events),
g AS (
  SELECT *, CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) IS NULL
                   OR date_diff('microsecond',
                        lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id), ts)
                      > 1800000000 THEN 1 ELSE 0 END AS ns
  FROM e
),
s AS (
  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS seq
  FROM g
),
p AS (
  SELECT user_id, seq,
         array_to_string(list(event_type ORDER BY ts, event_id)[1:8], '>')
           AS path
  FROM s GROUP BY user_id, seq
),
c AS (SELECT path, CAST(count(*) AS BIGINT) AS n_sessions FROM p GROUP BY path)
SELECT path, n_sessions FROM c ORDER BY n_sessions DESC, path LIMIT 10
"""


@register("session_path_topk", _SPT_ORACLE)
def session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 session paths (first 8 steps). Scale: ONE user-keyed
    window exchange serves the gap lag and the session running sum
    (same spec); the per-session path is a capped in-row sort of <=
    |session| structs (the 8-step slice bounds the output, and any
    monster session still aggregates, it just truncates); the path
    count is a hash-agg on a bounded-cardinality string and the top-10
    is TakeOrderedAndProject."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    ns = F.when(gap.isNull() | (gap > 1800000000), 1).otherwise(0)
    s = ev.withColumn("ns", ns).withColumn(
        "seq",
        F.sum("ns").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    p = s.groupBy("user_id", "seq").agg(
        F.array_join(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda x: x["event_type"],
                ),
                1,
                8,
            ),
            ">",
        ).alias("path")
    )
    c = p.groupBy("path").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions")
    )
    return c.orderBy(F.col("n_sessions").desc(), "path").limit(10)


# ---------------------------------------------------------------------------
# dedup_minhash_est_error — signature-estimated Jaccard (matching
# fraction of the 24 minhash values) vs true shingle Jaccard over the
# LSH candidate pairs; the approximation-quality report.
# ---------------------------------------------------------------------------

_MEE_ORACLE = (
    _SH_CTES
    + f""",
    hb AS (SELECT doc_id, ({hash64_sql('shingle')} % 2147483647) AS base FROM sh),
    hx AS (SELECT doc_id, hp.h AS h, min((base * hp.a + hp.b) % 2147483647) AS m
           FROM hb CROSS JOIN (VALUES {_MINHASH_COEFF_VALUES}) AS hp(h, a, b)
           GROUP BY doc_id, hp.h),
    bk AS (SELECT doc_id,
                  md5(string_agg(CAST(m AS VARCHAR), ',' ORDER BY h)
                      || ',' || CAST(h // 3 AS VARCHAR)) AS band_key
           FROM hx GROUP BY doc_id, h // 3),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bk a JOIN bk b ON a.band_key = b.band_key
                                AND a.doc_id < b.doc_id),
    est AS (SELECT c.id_a, c.id_b,
                   sum(CASE WHEN a.m = b.m THEN 1 ELSE 0 END) / 24.0 AS est_j
            FROM cand c
            JOIN hx a ON a.doc_id = c.id_a
            JOIN hx b ON b.doc_id = c.id_b AND b.h = a.h
            GROUP BY 1, 2),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (SELECT c.id_a, c.id_b, count(*) AS ni
              FROM cand c
              JOIN sh a ON a.doc_id = c.id_a
              JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
              GROUP BY 1, 2),
    pairs AS (SELECT est.id_a, est.id_b, est.est_j,
                     CAST(coalesce(inter.ni, 0) AS DOUBLE)
                       / (sa.n + sb.n - coalesce(inter.ni, 0)) AS true_j
              FROM est
              LEFT JOIN inter ON inter.id_a = est.id_a
                             AND inter.id_b = est.id_b
              JOIN sizes sa ON sa.doc_id = est.id_a
              JOIN sizes sb ON sb.doc_id = est.id_b)
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(abs(est_j - true_j)), 6) AS mean_abs_err,
           round(max(abs(est_j - true_j)), 6) AS max_abs_err
    FROM pairs
    """
)


@register("dedup_minhash_est_error", _MEE_ORACLE)
def dedup_minhash_est_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(24) estimation error over LSH candidate pairs: matching-
    signature fraction vs true shingle Jaccard. Scale: reuses the
    signature / banding machinery (operators/dedup.py) — candidates
    come from the bucketed band join, never all pairs; the estimate is
    a 24-column in-row comparison on the joined signature rows and the
    truth an array_intersect on the attached shingle arrays, both
    exact rationals. The report collapses to one row."""
    docs = _t(spark, sf_dir, "documents")
    # Both the shingle arrays (truth side) and the signatures (estimate
    # side + banding) are consumed 2-3x below; uncached, every consumer
    # re-runs the tokenize->shingle->md5 stage (the dominant cost) — the
    # caching contract minhash_signatures' docstring prescribes. Measured
    # 4.6s -> ~1.5s at sf0.1, hash-identical.
    sh = D.shingle_arrays(docs, "text", "doc_id", 3).cache()
    sig = D.minhash_signatures(docs, "text", "doc_id", 3, 24, arrays=sh).cache()
    bk = D.band_keys(sig, "doc_id", 8, 3)
    grp = (
        bk.groupBy("band_key")
        .agg(F.slice(F.array_sort(F.collect_list("doc_id")), 1, 1000).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    cand = (
        grp.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids) - i - 1), "
                    "y -> struct(x AS id_a, y AS id_b))))"
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    sig_cols = [f"sig_{h}" for h in range(24)]
    sa = sig.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(c).alias(f"a_{c}") for c in sig_cols],
    )
    sb = sig.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(c).alias(f"b_{c}") for c in sig_cols],
    )
    match_cnt = sum(
        F.when(F.col(f"a_{c}") == F.col(f"b_{c}"), 1).otherwise(0)
        for c in sig_cols
    )
    est = cand.join(sa, "id_a").join(sb, "id_b").select(
        "id_a", "id_b", (match_cnt / 24.0).alias("est_j")
    )
    ga = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("__sa"))
    gb = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("__sb"))
    ni = F.size(F.array_intersect("__sa", "__sb"))
    true_j = ni.cast("double") / (F.size("__sa") + F.size("__sb") - ni)
    pairs = (
        est.join(ga, "id_a")
        .join(gb, "id_b")
        .select("est_j", true_j.alias("true_j"))
    )
    err = F.abs(F.col("est_j") - F.col("true_j"))
    return pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(F.avg(err), 6).alias("mean_abs_err"),
        F.round(F.max(err), 6).alias("max_abs_err"),
    )
