"""Query surface batch 5: product/event analytics (ordered funnel,
retention cohorts) and corpus statistics (TF-IDF terms, PMI collocations).

Funnel and retention are the canonical event-warehouse workloads the
reference's downstream consumers run over its parquet output; TF-IDF/PMI
extend the training-data text surface. All exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.functions.text import tokens_sql, word_shingles_sql
from kafka_etl_consumer_spark.operators import nlp as N
from kafka_etl_consumer_spark.plans.registry import _t, register

_TOK = tokens_sql("text")


@register(
    "funnel_steps",
    oracle="""
    WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
    v AS (SELECT user_id, min(ts) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT e.user_id, min(v.t1) AS t1c, min(e.ts) AS t2
          FROM e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
          WHERE e.event_type = 'click' GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t3
          FROM e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
          WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT count(*) AS n_view, count(c.t2) AS n_click, count(p.t3) AS n_purchase,
           round(avg(date_diff('microsecond', c.t1c, c.t2)) / 1e6, 6) AS avg_view_to_click_s,
           round(avg(date_diff('microsecond', c.t2, p.t3)) / 1e6, 6) AS avg_click_to_purchase_s
    FROM v LEFT JOIN c ON v.user_id = c.user_id LEFT JOIN p ON c.user_id = p.user_id
    """,
)
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel: first view, first click AFTER
    that view, first purchase AFTER that click, per user; corpus-level
    conversion counts + mean step latencies.

    ONE scan, ONE shuffle: per-user events are gathered with
    collect_list(struct) and the ordered step times fall out of chained
    higher-order array_min/filter expressions (each step's filter
    references the previous step's time — no join needed). The join-chain
    formulation (3 filtered aggregates + user-keyed joins) re-scans the
    fact table 6× because its aggregate subtrees don't hit Spark's
    exchange-reuse; this shape scans once at any scale. Memory bound: one
    user's funnel-relevant events per row — the standard sessionization
    assumption."""
    # parquet ts may load as TIMESTAMP_NTZ (inference-dependent); unix_micros
    # requires TIMESTAMP — cast at the scan (session tz is UTC, lossless).
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    g = (
        ev.where(F.col("event_type").isin("view", "click", "purchase"))
        .groupBy("user_id")
        .agg(F.collect_list(F.struct("ts", "event_type")).alias("evs"))
    )

    def step_min(kind: str, after):
        cand = F.filter(
            F.col("evs"),
            lambda ev_: (ev_.event_type == kind)
            & (ev_.ts > after if after is not None else F.lit(True)),
        )
        return F.array_min(F.transform(cand, lambda ev_: ev_.ts))

    per_user = (
        g.withColumn("t1", step_min("view", None))
        .withColumn("t2", step_min("click", F.col("t1")))
        .withColumn("t3", step_min("purchase", F.col("t2")))
    )
    gap1 = F.unix_micros(F.col("t2")) - F.unix_micros(F.col("t1"))
    gap2 = F.unix_micros(F.col("t3")) - F.unix_micros(F.col("t2"))
    return per_user.where(F.col("t1").isNotNull()).agg(
        F.count("*").alias("n_view"),
        F.count("t2").alias("n_click"),
        F.count("t3").alias("n_purchase"),
        F.round(F.avg(gap1) / 1e6, 6).alias("avg_view_to_click_s"),
        F.round(F.avg(gap2) / 1e6, 6).alias("avg_click_to_purchase_s"),
    )


@register(
    "retention_cohorts",
    oracle="""
    WITH e AS (SELECT user_id,
                      date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk
               FROM events),
    u0 AS (SELECT user_id, min(wk) AS cohort FROM e GROUP BY 1),
    act AS (SELECT DISTINCT user_id, wk FROM e)
    SELECT cohort AS cohort_week,
           date_diff('day', cohort, wk) // 7 AS week_offset,
           count(*) AS n_users
    FROM act JOIN u0 USING (user_id)
    GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: cohort = ISO week of a user's first
    event; n_users active per (cohort, week_offset).

    distinct(user, week) then one user-keyed join to the per-user min —
    both aggregates partial-combine map-side; the (cohort, offset) rollup
    is tiny. Monday-start date_trunc('week') matches across engines; weeks
    stay TIMESTAMP (parquet dates here are timestamps; pandas reprs agree)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    )
    u0 = ev.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    act = ev.distinct()
    return (
        act.join(u0, "user_id")
        .groupBy(
            F.col("cohort").alias("cohort_week"),
            F.floor(F.datediff(F.col("wk"), F.col("cohort")) / 7).alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


@register(
    "tfidf_top_terms",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOK}) AS token FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
    dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (SELECT doc_id, token,
                      round(tf * ln(CAST(n AS DOUBLE) / df), 6) AS score
               FROM tf JOIN dfq USING (token) CROSS JOIN n),
    r AS (SELECT doc_id, token, score,
                 CAST(row_number() OVER (PARTITION BY doc_id
                                         ORDER BY score DESC, token) AS INT) AS rank
          FROM scored)
    SELECT doc_id, rank, token, score FROM r WHERE rank <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by TF × ln(N/df)
    (operators/nlp.tfidf_top_terms)."""
    return N.tfidf_top_terms(_t(spark, sf_dir, "documents"), k=3)


@register(
    "pmi_collocations",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOK} AS toks FROM documents),
    bg AS (SELECT unnest({word_shingles_sql('toks', 2)}) AS s FROM tok),
    pair AS (SELECT string_split(s, ' ')[1] AS w1, string_split(s, ' ')[2] AS w2,
                    count(*) AS n_pair
             FROM bg GROUP BY 1, 2),
    uni AS (SELECT token, count(*) AS c
            FROM (SELECT unnest({_TOK}) AS token FROM documents) GROUP BY 1),
    tot AS (SELECT CAST(sum(n_pair) AS BIGINT) AS t FROM pair),
    tou AS (SELECT CAST(sum(c) AS BIGINT) AS u FROM uni),
    scored AS (SELECT w1, w2, n_pair,
                      round(ln((n_pair / CAST(t AS DOUBLE))
                               / ((c1 / CAST(u AS DOUBLE)) * (c2 / CAST(u AS DOUBLE)))), 6) AS pmi
               FROM pair
               JOIN (SELECT token AS w1, c AS c1 FROM uni) USING (w1)
               JOIN (SELECT token AS w2, c AS c2 FROM uni) USING (w2)
               CROSS JOIN tot CROSS JOIN tou
               WHERE n_pair >= 5)
    SELECT w1, w2, n_pair, pmi FROM scored ORDER BY pmi DESC, w1, w2 LIMIT 50
    """,
)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 adjacent-bigram collocations by PMI, min pair count 5
    (operators/nlp.pmi_collocations)."""
    return N.pmi_collocations(_t(spark, sf_dir, "documents"), min_count=5, k=50)
