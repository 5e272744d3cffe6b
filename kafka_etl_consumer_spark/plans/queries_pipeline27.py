"""Query surface batch 32 (round 4): Markov steady state, normalized
dedup, embedding hubness.

- stationary distribution of the event-transition Markov chain (16
  power iterations) — "where does a user end up" as a limit, not a
  one-step transition; the iterative-algorithm showcase with an exact
  unrolled-CTE oracle
- normalized exact dedup — casefold / strip punctuation / collapse
  whitespace BEFORE fingerprinting: catches the trivial variants raw
  md5 dedup misses
- embedding hubness report — in-degree histogram of the within-label
  k-NN graph: hub vectors (abnormally high in-degree) are the classic
  high-dimensional pathology that silently skews retrieval

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283); these extend the driver-verified operator
families the brief requires. Every query carries an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# markov_stationary_dist — v_{t+1} = v_t P for 16 rounds from uniform.
# P entries are UNROUNDED exact rationals (n / row_total) in both
# engines; the per-round 5-term sums differ only in last-ulp order, so
# 6dp rounding after 16 rounds is stable.
# ---------------------------------------------------------------------------

_N_ITER = 16

_MSD_PRELUDE = """
WITH seq AS MATERIALIZED (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
           AS next_type
  FROM events
),
pairs AS MATERIALIZED (
  SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
),
p AS MATERIALIZED (
  SELECT pairs.event_type, pairs.next_type,
         pairs.n / CAST(t.row_n AS DOUBLE) AS pr
  FROM pairs JOIN (SELECT event_type, sum(n) AS row_n
                   FROM pairs GROUP BY 1) t USING (event_type)
),
states AS MATERIALIZED (SELECT DISTINCT event_type AS s FROM pairs),
v0 AS MATERIALIZED (
  SELECT s, 1.0 / (SELECT count(*) FROM states) AS p_v FROM states
)"""

_MSD_ITER = """,
v{k} AS MATERIALIZED (
  SELECT p.next_type AS s, sum(v{j}.p_v * p.pr) AS p_v
  FROM v{j} JOIN p ON p.event_type = v{j}.s
  GROUP BY 1
)"""

_MSD_ORACLE = (
    _MSD_PRELUDE
    + "".join(_MSD_ITER.format(k=k, j=k - 1) for k in range(1, _N_ITER + 1))
    + f"""
SELECT s AS event_type, round(p_v, 6) AS stationary_p
FROM v{_N_ITER}
"""
)


@register("markov_stationary_dist", _MSD_ORACLE)
def markov_stationary_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the user event-transition chain via
    16 in-plan power iterations. Scale: the ONLY corpus-sized work is
    the lead-window pair count (shared shape with
    event_transition_matrix); every iteration multiplies a |states|-row
    vector by the broadcast |states|^2 matrix — the loop is pure model
    algebra, lineage-truncated every 4 rounds (graph.py rule #1), no
    driver-side collect."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    pairs = seq.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = pairs.groupBy("event_type").agg(F.sum("n").alias("row_n"))
    p = pairs.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "next_type",
        (F.col("n") / F.col("row_n").cast("double")).alias("pr"),
    )
    p = p.localCheckpoint(eager=False)
    states = pairs.select(F.col("event_type").alias("s")).distinct()
    nst = states.agg(F.count(F.lit(1)).alias("k"))
    v = states.crossJoin(F.broadcast(nst)).select(
        "s", (F.lit(1.0) / F.col("k")).alias("p_v")
    )
    # Checkpoint cadence re-measured in optimization r10 and kept as-is:
    # every 4 rounds is the sweet spot — one lazy DAG for all 16 rounds
    # ran 4-8x SLOWER (AQE re-plans and schedules each of the 32 nested
    # micro-stages at runtime), and a checkpoint every round pays 16
    # serial compile+execute cycles.
    for i in range(1, _N_ITER + 1):
        v = (
            v.join(F.broadcast(p), v["s"] == p["event_type"])
            .groupBy(F.col("next_type").alias("s2"))
            .agg(F.sum(F.col("p_v") * F.col("pr")).alias("p_v"))
            .withColumnRenamed("s2", "s")
        )
        if i % 4 == 0:
            v = v.localCheckpoint(eager=False)
    return v.select(
        F.col("s").alias("event_type"), F.round("p_v", 6).alias("stationary_p")
    )


# ---------------------------------------------------------------------------
# dedup_exact_normalized — md5 over casefolded / punctuation-stripped /
# whitespace-collapsed text: the variant-tolerant exact dedup.
# ---------------------------------------------------------------------------

_DEN_ORACLE = """
WITH n AS (
  SELECT doc_id, text,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                             ' +', ' ', 'g')) AS norm
  FROM documents
)
SELECT md5(norm) AS fingerprint,
       CAST(min(doc_id) AS BIGINT) AS keeper_doc_id,
       CAST(count(*) AS BIGINT) AS n_copies,
       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_raw_variants
FROM n GROUP BY 1
"""


@register("dedup_exact_normalized", _DEN_ORACLE)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over NORMALIZED text (casefold, strip punctuation,
    collapse whitespace) — merges the trivial variants raw-md5 dedup
    (dedup_exact) treats as distinct; n_raw_variants counts how many
    raw fingerprints each normalized class absorbed. Scale: the
    normalization is a narrow per-row regexp chain in the scan
    projection; the agg shuffles 16-byte fingerprints only."""
    docs = _t(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    return docs.select(
        "doc_id", F.md5(norm).alias("fingerprint"), F.md5("text").alias("raw_fp")
    ).groupBy("fingerprint").agg(
        F.min("doc_id").cast("bigint").alias("keeper_doc_id"),
        F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        F.countDistinct("raw_fp").cast("bigint").alias("n_raw_variants"),
    )


# ---------------------------------------------------------------------------
# embedding_hubness — within-label 3-NN graph, then the in-degree
# histogram (0-degree vectors included via the left join).
# ---------------------------------------------------------------------------

_HUB_ORACLE = """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
s AS (SELECT a.label, a.vec_id AS qa, b.vec_id AS qb,
             round(list_dot_product(a.emb, b.emb)
                   / (sqrt(list_dot_product(a.emb, a.emb))
                      * sqrt(list_dot_product(b.emb, b.emb))), 6) AS score
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id),
r AS (SELECT *, row_number() OVER (PARTITION BY qa
                                   ORDER BY score DESC, qb) AS rn
      FROM s),
deg AS (SELECT e.vec_id,
               CAST(count(r.qb) AS BIGINT) AS in_deg
        FROM e LEFT JOIN (SELECT qb FROM r WHERE rn <= 3) r
          ON r.qb = e.vec_id
        GROUP BY e.vec_id)
SELECT in_deg AS in_degree, CAST(count(*) AS BIGINT) AS n_vectors
FROM deg GROUP BY in_deg
"""


@register("embedding_hubness", _HUB_ORACLE)
def embedding_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-degree histogram of the within-label 3-NN graph. A healthy
    embedding space keeps in-degrees near k; heavy hubs (in-degree >>
    k) are the high-dimensional pathology that makes retrieval return
    the same vectors for everything. Scale: the pair stage is
    label-BLOCKED (each label's block is locally quadratic, the
    standard trade also used by cosine_pairs); top-3 is a
    WindowGroupLimit per query vector and the histogram is two bounded
    aggs. Swap the label block for LSH buckets at 100 TB."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("emb")
    )
    from kafka_etl_consumer_spark.functions.vectors import dot, l2_norm

    from kafka_etl_consumer_spark.session import ensure_min_parallelism

    # The quadratic pair stage runs in the PROBE tasks of the broadcast
    # join; a few-file embedding table scans as one split, so without
    # this the whole n²/|labels| zip_with workload lands on ONE core
    # (plan-verified). At 100 TB the scan is already wide -> no-op.
    a = ensure_min_parallelism(
        e.select("label", F.col("vec_id").alias("qa"), F.col("emb").alias("ea"))
    ).withColumn("na", l2_norm("ea"))
    b = e.select(
        F.col("label").alias("lb"), F.col("vec_id").alias("qb"),
        F.col("emb").alias("eb"),
    ).withColumn("nb", l2_norm("eb"))
    s = a.join(
        b, (F.col("label") == F.col("lb")) & (F.col("qa") != F.col("qb"))
    ).select(
        "qa",
        "qb",
        F.round(dot("ea", "eb") / (F.col("na") * F.col("nb")), 6).alias(
            "score"
        ),
    )
    w = Window.partitionBy("qa").orderBy(F.col("score").desc(), "qb")
    top = s.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
    # in-degree from the aggregated top table, left-joined so 0-degree
    # vectors keep a row (count(*) over the raw left join would hand
    # them a phantom degree of 1 from the unmatched NULL row)
    deg = (
        e.select("vec_id")
        .join(
            top.groupBy(F.col("qb").alias("vec_id")).agg(
                F.count(F.lit(1)).cast("bigint").alias("in_deg")
            ),
            "vec_id",
            "left",
        )
        .select(F.coalesce("in_deg", F.lit(0)).cast("bigint").alias("in_deg"))
    )
    return deg.groupBy(F.col("in_deg").alias("in_degree")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors")
    )
