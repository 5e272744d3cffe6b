"""Query surface batch 3: the training-data-pipeline operators (north-star
extensions) — dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search (brute-force + LSH ANN), text
analysis, and multimodal plumbing. Every deterministic operator carries a
full DuckDB oracle that replicates the SAME algorithm (same md5-derived
hashes, same band keys, same rank rules), so the driver's hash comparison
is exact — no rows-only fallbacks needed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_etl_consumer_spark.functions.hashing import hash64_sql, minhash_coeffs
from kafka_etl_consumer_spark.functions.text import tokens_sql, word_shingles_sql
from kafka_etl_consumer_spark.operators import dedup as D
from kafka_etl_consumer_spark.operators import graph as G
from kafka_etl_consumer_spark.operators import multimodal as M
from kafka_etl_consumer_spark.operators import similarity as S
from kafka_etl_consumer_spark.operators.sampling import stratified_sample_sql
from kafka_etl_consumer_spark.operators import text as X
from kafka_etl_consumer_spark.operators.text import LANG_MARKERS
from kafka_etl_consumer_spark.plans.registry import _t, register
from kafka_etl_consumer_spark.operators.similarity import plane_weight_sql

_TOK = tokens_sql("text")
_SH3 = word_shingles_sql("toks", 3)

# shared CTE prefix: distinct (doc_id, 3-word-shingle) pairs
_SH_CTES = f"""
    WITH tok AS (SELECT doc_id, {_TOK} AS toks FROM documents),
    sh AS (SELECT DISTINCT doc_id, unnest({_SH3}) AS shingle FROM tok)"""


def _in_list(markers: tuple[str, ...]) -> str:
    return ", ".join(f"'{m}'" for m in markers)


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS fingerprint, min(doc_id) AS keeper_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup(_t(spark, sf_dir, "documents"))


_MINHASH_COEFF_VALUES = ", ".join(
    f"({h}, {a}, {b})" for h, (a, b) in enumerate(minhash_coeffs(24))
)


@register(
    "dedup_minhash",
    oracle=_SH_CTES
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
             FROM bk a JOIN bk b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (SELECT id_a, id_b, count(*) AS n_inter
              FROM cand
              JOIN sh a ON a.doc_id = id_a
              JOIN sh b ON b.doc_id = id_b AND b.shingle = a.shingle
              GROUP BY id_a, id_b)
    SELECT id_a, id_b,
           round(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
    """,
)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(24) + LSH(8 bands × 3 rows) near-dup pairs, Jaccard >= 0.5.
    The oracle replicates the exact algorithm — same md5 hashes, same band
    keys — so this approximate operator still gets an exact check."""
    pairs = D.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"),
        k=3,
        num_hashes=24,
        bands=8,
        rows_per_band=3,
        threshold=0.5,
    )
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


@register(
    "dedup_ngram_jaccard",
    oracle=_SH_CTES
    + """,
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT id_a, id_b,
           round(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT all-pairs 3-gram Jaccard >= 0.5 via inverted index — ground
    truth for the LSH recall; quadratic, not the 100 TB path."""
    pairs = D.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), k=3, threshold=0.5)
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


@register(
    "dedup_simhash",
    oracle=_SH_CTES
    + f""",
    hx AS (SELECT doc_id, {hash64_sql('shingle')} AS h FROM sh),
    bits AS (SELECT doc_id, b,
                    sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
             FROM hx CROSS JOIN (SELECT unnest(range(32)) AS b) bs
             GROUP BY doc_id, b),
    sig AS (SELECT doc_id,
                   CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b)
                            ELSE 0 END) AS BIGINT) AS simhash
            FROM bits GROUP BY doc_id)
    SELECT doc_id, simhash,
           CAST(count(*) OVER (PARTITION BY simhash) AS BIGINT) AS group_size
    FROM sig
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per doc + size of its exact-signature group (planted
    near-dups collapse to identical signatures)."""
    sig = D.simhash(_t(spark, sf_dir, "documents"), k=3, bits=32)
    w = Window.partitionBy("simhash")
    return sig.select("doc_id", "simhash", F.count("*").over(w).alias("group_size"))


@register(
    "dedup_embedding_cosine",
    oracle="""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.emb, b.emb)
                 / (sqrt(list_dot_product(a.emb, a.emb))
                    * sqrt(list_dot_product(b.emb, b.emb))), 6) AS score
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.emb, b.emb)
                / (sqrt(list_dot_product(a.emb, a.emb))
                   * sqrt(list_dot_product(b.emb, b.emb))), 6) >= 0.4
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs within label blocks (cosine >= 0.4).
    Label is the blocking key — one shuffle on it, quadratic cost per-block
    only. Scoring via the per-group BLAS matmul (cosine_pairs_blas, 5.5×
    the expression-eval path; cosine_pairs keeps the pure-JVM variant)."""
    return S.cosine_pairs_blas(_t(spark, sf_dir, "embeddings"), threshold=0.4)


_MIX = {"view": 0.1, "click": 0.25, "signup": 0.5, "purchase": 1.0}


@register(
    "sample_stratified",
    oracle=f"""
    SELECT event_id, event_type, value
    FROM events
    WHERE {stratified_sample_sql('event_type', _MIX, 'CAST(event_id AS VARCHAR)')}
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix rebalance: per-event-type keep fractions (purchases
    100%, signups 50%, clicks 25%, views 10%, errors dropped) decided by a
    deterministic hash of the row key — same rows every run/engine/retry,
    narrow codegen filter, no shuffle (operators/sampling.py)."""
    from kafka_etl_consumer_spark.operators.sampling import stratified_sample

    ev = _t(spark, sf_dir, "events")
    return stratified_sample(
        ev, "event_type", _MIX, key=F.col("event_id").cast("string")
    ).select("event_id", "event_type", "value")


@register(
    "graph_components",
    oracle="""
    WITH RECURSIVE e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb
                         FROM embeddings),
    p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
          WHERE round(list_dot_product(a.emb, b.emb)
                / (sqrt(list_dot_product(a.emb, a.emb))
                   * sqrt(list_dot_product(b.emb, b.emb))), 6) >= 0.3),
    sym AS (SELECT id_a AS u, id_b AS v FROM p
            UNION ALL SELECT id_b, id_a FROM p),
    reach AS (
        SELECT vec_id AS u, vec_id AS r FROM e
        UNION
        SELECT reach.u, sym.v FROM reach JOIN sym ON sym.u = reach.r),
    lab AS (SELECT u AS vec_id, min(r) AS component_id FROM reach GROUP BY u)
    SELECT vec_id, component_id,
           CAST(count(*) OVER (PARTITION BY component_id) AS BIGINT) AS n_members
    FROM lab
    """,
)
def graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: connected components over the label-blocked
    embedding-cosine pair graph (threshold 0.3 — non-transitive, so pairs
    chain into real multi-hop components; the sf0.1 graph's largest
    component has 151 vertices with min-vertex eccentricity 19).
    Optimization r10: the pair graph is BLOCKED by construction (pairs
    only form within a label group), so components can never span labels
    and the per-label union-find runs INSIDE the same BLAS task that
    scores the pairs (operators/similarity.cosine_components_blas, guide
    §8) — the distributed CC loop this query used to run (18
    label-propagation rounds ≈ 60 micro-stages at sf0.1, 7.4 s) is
    replaced by zero extra stages past the pair scan. The oracle still
    computes the true fixpoint with a recursive CTE, so the clustering is
    hash-checked at every SF. Every vertex is emitted (singletons = own
    id)."""
    e = _t(spark, sf_dir, "embeddings")
    comp = S.cosine_components_blas(e, threshold=0.3)
    w = Window.partitionBy("component_id")
    return comp.withColumn("n_members", F.count("*").over(w))


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

_COS = (
    "round(list_dot_product(q_emb, e.emb)"
    " / (sqrt(list_dot_product(q_emb, q_emb))"
    " * sqrt(list_dot_product(e.emb, e.emb))), 6)"
)


@register(
    "sim_cosine_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    q AS (SELECT vec_id AS q_vec_id, emb AS q_emb FROM e WHERE vec_id < 5),
    s AS (SELECT q_vec_id, e.vec_id, {_COS} AS score
          FROM q JOIN e ON e.vec_id <> q.q_vec_id),
    r AS (SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                       ORDER BY score DESC, vec_id) AS rn
          FROM s)
    SELECT q_vec_id, vec_id, score FROM r WHERE rn <= 10
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-10 for 5 query vectors: broadcast the
    queries, one corpus scan, rank-filter per query — the ANN baseline."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_embedding")
    )
    return S.cosine_topk(e.select("vec_id", "embedding"), q, k=10)


@register(
    "sim_ann_lsh",
    oracle=f"""
    WITH planes AS (
        SELECT p, list(w ORDER BY d) AS pw
        FROM (SELECT pp.p AS p, dd.d AS d,
                     {plane_weight_sql('CAST(pp.p AS VARCHAR)', 'CAST(dd.d AS VARCHAR)')} AS w
              FROM (SELECT unnest(range(8)) AS p) pp
              CROSS JOIN (SELECT unnest(range(64)) AS d) dd)
        GROUP BY p),
    emb AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    buck AS (SELECT vec_id,
                    string_agg(CASE WHEN list_dot_product(emb, pw) >= 0
                               THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
             FROM emb CROSS JOIN planes GROUP BY vec_id),
    e AS (SELECT emb.vec_id, emb.emb, buck.bucket FROM emb JOIN buck USING (vec_id)),
    q AS (SELECT vec_id AS q_vec_id, emb AS q_emb, bucket FROM e WHERE vec_id < 5),
    s AS (SELECT q_vec_id, e.vec_id, {_COS} AS score
          FROM q JOIN e ON e.bucket = q.bucket AND e.vec_id <> q.q_vec_id),
    r AS (SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                       ORDER BY score DESC, vec_id) AS rn
          FROM s)
    SELECT q_vec_id, vec_id, score FROM r WHERE rn <= 10
    """,
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 via 8 deterministic random-hyperplane sign bits: corpus
    joins queries on bucket equality (≈1/256 of the corpus per query) —
    the scale path; the oracle replicates the identical hyperplanes."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_embedding")
    )
    return S.lsh_ann_topk(e.select("vec_id", "embedding"), q, k=10, planes=8, dims=64)


@register(
    "sim_ann_ivf",
    oracle=f"""
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    cb AS (SELECT row_number() OVER (ORDER BY hh, vec_id) AS centroid_id,
                  emb AS cvec
           FROM (SELECT vec_id, emb,
                        {hash64_sql("CAST(vec_id AS VARCHAR)")} AS hh
                 FROM emb
                 ORDER BY hh, vec_id LIMIT 16)),
    asg AS (SELECT vec_id, emb, centroid_id,
                   round(list_dot_product(emb, cvec)
                         / (sqrt(list_dot_product(emb, emb))
                            * sqrt(list_dot_product(cvec, cvec))), 6) AS cs
            FROM emb CROSS JOIN cb),
    corp AS (SELECT vec_id, emb, centroid_id AS cluster
             FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                              ORDER BY cs DESC, centroid_id) AS crn FROM asg)
             WHERE crn = 1),
    qprobe AS (SELECT vec_id AS q_vec_id, emb AS q_emb, centroid_id AS cluster
               FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                ORDER BY cs DESC, centroid_id) AS crn FROM asg)
               WHERE vec_id < 5 AND crn <= 4),
    s AS (SELECT q_vec_id, e.vec_id, {_COS} AS score
          FROM qprobe q JOIN corp e USING (cluster)
          WHERE e.vec_id <> q.q_vec_id),
    r AS (SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                       ORDER BY score DESC, vec_id) AS rn
          FROM s)
    SELECT q_vec_id, vec_id, score FROM r WHERE rn <= 10
    """,
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN top-10: 16-cell inverted index from a deterministic
    hash-ranked codebook, nprobe=4 — candidates come from one broadcast
    equi-join on the cell id; the corpus is assigned to cells in a narrow
    broadcast-codebook pass and NEVER shuffled (operators/similarity.py
    ivf_ann_topk has the full 100 TB plan rationale). The oracle rebuilds
    the identical codebook/assignment arithmetically."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_embedding")
    )
    return S.ivf_ann_topk(
        e.select("vec_id", "embedding"), q, k=10, n_centroids=16, nprobe=4
    )


@register(
    "cluster_kmeans_refine",
    oracle=f"""
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    cb AS (SELECT row_number() OVER (ORDER BY hh, vec_id) AS centroid_id,
                  emb AS cvec
           FROM (SELECT vec_id, emb,
                        {hash64_sql("CAST(vec_id AS VARCHAR)")} AS hh
                 FROM emb
                 ORDER BY hh, vec_id LIMIT 8)),
    asg AS (SELECT vec_id, emb, centroid_id,
                   round(list_dot_product(emb, cvec)
                         / (sqrt(list_dot_product(emb, emb))
                            * sqrt(list_dot_product(cvec, cvec))), 6) AS cs
            FROM emb CROSS JOIN cb),
    best AS (SELECT vec_id, emb, centroid_id
             FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                              ORDER BY cs DESC, centroid_id) AS crn FROM asg)
             WHERE crn = 1),
    dims AS (SELECT b.centroid_id, dd.d AS pos, avg(b.emb[dd.d + 1]) AS m
             FROM best b CROSS JOIN (SELECT unnest(range(64)) AS d) dd
             GROUP BY 1, 2),
    agg AS (SELECT d.centroid_id,
                   sqrt(sum(m * m)) AS nrm,
                   sqrt(sum((m - cb.cvec[pos + 1]) * (m - cb.cvec[pos + 1]))) AS drift
            FROM dims d JOIN cb USING (centroid_id)
            GROUP BY 1),
    cnt AS (SELECT centroid_id, count(*) AS n FROM best GROUP BY 1)
    SELECT cb.centroid_id,
           CAST(coalesce(cnt.n, 0) AS BIGINT) AS n_assigned,
           round(coalesce(agg.nrm, sqrt(list_dot_product(cb.cvec, cb.cvec))), 6)
               AS centroid_norm,
           round(coalesce(agg.drift, 0.0), 6) AS drift
    FROM cb LEFT JOIN agg USING (centroid_id) LEFT JOIN cnt USING (centroid_id)
    """,
)
def cluster_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means, one Lloyd iteration over an 8-centroid
    hash-ranked seed codebook: per-cell member count, refined-centroid norm
    and L2 drift from the seed. The per-dim means shuffle at most C·d rows
    per partition (posexplode + partial agg — operators/similarity.py
    kmeans_refine); the oracle recomputes the identical assignment and
    means arithmetically. Iterating to convergence is the same call in a
    loop; one iteration keeps the oracle exact."""
    from kafka_etl_consumer_spark.functions.vectors import l2_norm

    e = _t(spark, sf_dir, "embeddings")
    cents = S.hash_ranked_centroids(e, n_centroids=8)
    ref = S.kmeans_refine(e.select("vec_id", "embedding"), cents)
    return ref.join(cents, "centroid_id").select(
        "centroid_id",
        "n_assigned",
        F.round(l2_norm("centroid"), 6).alias("centroid_norm"),
        F.round(
            F.sqrt(
                F.aggregate(
                    F.zip_with("centroid", "__cvec", lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ),
            6,
        ).alias("drift"),
    )


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


@register(
    "text_token_stats",
    oracle=f"""
    WITH tok AS (SELECT doc_id, text, {_TOK} AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_tokens,
           CAST(length(text) AS INT) AS n_chars,
           round(CAST(list_reduce(list_transform(toks, t -> len(t)),
                                  (a, b) -> a + b) AS DOUBLE) / len(toks), 6)
               AS avg_token_len
    FROM tok
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.token_stats(_t(spark, sf_dir, "documents"))


@register(
    "text_quality",
    oracle=f"""
    WITH tok AS (SELECT doc_id, text, {_TOK} AS toks FROM documents),
    raw AS (SELECT doc_id, len(toks) AS n_tokens,
                   CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                        AS DOUBLE) / length(text) AS draw,
                   CAST(len(list_filter(toks,
                            t -> t IN ({_in_list(X.STOPWORDS)}))) AS DOUBLE)
                        / len(toks) AS sraw
            FROM tok)
    SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
           round(draw, 6) AS digit_ratio,
           round(sraw, 6) AS stopword_ratio,
           round(least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
                 * (1 - draw) * (0.5 + 0.5 * least(1.0, sraw * 5)), 6) AS quality
    FROM raw
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.quality_score(_t(spark, sf_dir, "documents"))


@register(
    "text_lang_id",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOK} AS toks FROM documents),
    hits AS (SELECT doc_id,
        CAST(len(list_filter(toks, t -> t IN ({_in_list(LANG_MARKERS['en'])}))) AS INT) AS hits_en,
        CAST(len(list_filter(toks, t -> t IN ({_in_list(LANG_MARKERS['es'])}))) AS INT) AS hits_es,
        CAST(len(list_filter(toks, t -> t IN ({_in_list(LANG_MARKERS['de'])}))) AS INT) AS hits_de,
        CAST(len(list_filter(toks, t -> t IN ({_in_list(LANG_MARKERS['fr'])}))) AS INT) AS hits_fr
        FROM tok)
    SELECT doc_id, hits_en, hits_es, hits_de, hits_fr,
           CASE WHEN hits_en >= greatest(hits_es, hits_de, hits_fr) AND hits_en > 0 THEN 'en'
                WHEN hits_es >= greatest(hits_de, hits_fr) AND hits_es > 0 THEN 'es'
                WHEN hits_de >= hits_fr AND hits_de > 0 THEN 'de'
                WHEN hits_fr > 0 THEN 'fr'
                ELSE 'und' END AS guessed_lang
    FROM hits
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.lang_id(_t(spark, sf_dir, "documents"))


@register(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(lower(trim(text))) AS fp_md5,
           {hash64_sql('lower(trim(text))')} AS fp64
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.fingerprint(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


@register(
    "multimodal_meta",
    oracle="""
    WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_bytes,
           CAST(n % 640 + 1 AS BIGINT) AS width,
           CAST((n * 7) % 480 + 1 AS BIGINT) AS height,
           CAST(n % 3 + 1 AS BIGINT) AS channels
    FROM b
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column → metadata struct through a REAL Arrow-batched
    mapInPandas decode stage (deterministic fake header math — the decode
    library is stubbed, the Spark plumbing is the thing under test)."""
    docs = M.attach_binary(_t(spark, sf_dir, "documents"))
    return M.decode_image_meta(docs)


@register(
    "multimodal_frames",
    oracle="""
    WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
    SELECT doc_id, frame_idx, frame_idx * 64 AS offset
    FROM (SELECT doc_id, unnest(range(0, (n + 63) // 64)) AS frame_idx FROM b)
    """,
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: one row per 64-byte stride of each binary
    (stand-in for keyframe offsets) via mapInPandas flat-map."""
    docs = M.attach_binary(_t(spark, sf_dir, "documents"))
    return M.sample_frames(docs, every_n_bytes=64)


@register(
    "multimodal_pixels",
    oracle="""
    WITH px AS (
        SELECT d.doc_id,
               avg((d.doc_id * 7 + 3 * t.j) % 256) AS mean_r,
               avg((d.doc_id * 7 + 3 * t.j + 1) % 256) AS mean_g,
               avg((d.doc_id * 7 + 3 * t.j + 2) % 256) AS mean_b
        FROM documents d, range(0, 144) t(j)
        GROUP BY d.doc_id),
    rz AS (
        SELECT d.doc_id,
               avg((d.doc_id * 7
                    + 3 * (((t.j2 // 8) * 9 // 4) * 16 + (t.j2 % 8) * 2)) % 256)
                   AS resized_mean_r
        FROM documents d, range(0, 32) t(j2)
        GROUP BY d.doc_id)
    SELECT px.doc_id, mean_r, mean_g, mean_b, resized_mean_r
    FROM px JOIN rz USING (doc_id)
    """,
)
def multimodal_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel decode + resize, end to end: synthesize a deterministic
    16x9 PPM per document (flat value (doc_id*7 + i) % 256 at byte i), run
    the actual PPM parser (`multimodal._parse_image`), take per-channel
    means of the decoded buffer, nearest-neighbor resize to 8x4 through
    `resize_images` (decode → index-sample → PPM re-encode → decode again),
    and mean the resized red channel. The oracle reproduces the pixel
    values arithmetically — so header parsing, buffer layout, channel
    interleave, and the floor-mapping resample are all hash-checked.
    Both branches are narrow numpy maps; the final equi-join is on doc_id
    (broadcast at any realistic image-table size)."""
    import numpy as np

    W, H, RW, RH = 16, 9, 8, 4
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
    from kafka_etl_consumer_spark.session import ensure_min_parallelism

    # cached: both stats branches consume the generated media. Earlier a
    # localCheckpoint here measured 2x SLOWER (eager barrier + ser/deser);
    # with canChangeCachedPlanOutputPartitioning on (registry._t) a lazy
    # .cache() now wins the A/B at sf0.1: 1.8s vs 2.7s steady-state.
    media = ensure_min_parallelism(docs).mapInPandas(gen, gen_schema).cache()
    px = M.image_channel_stats(M.decode_image_pixels(media)).select(
        "doc_id",
        F.col("mean_c0").alias("mean_r"),
        F.col("mean_c1").alias("mean_g"),
        F.col("mean_c2").alias("mean_b"),
    )
    rz = M.image_channel_stats(
        M.decode_image_pixels(M.resize_images(media, RW, RH))
    ).select("doc_id", F.col("mean_c0").alias("resized_mean_r"))
    return px.join(rz, "doc_id")


@register(
    "dedup_embedding_lsh",
    oracle=f"""
    WITH planes AS (
        SELECT p, list(w ORDER BY d) AS pw
        FROM (SELECT pp.p AS p, dd.d AS d,
                     {plane_weight_sql('CAST(pp.p AS VARCHAR)', 'CAST(dd.d AS VARCHAR)')} AS w
              FROM (SELECT unnest(range(8)) AS p) pp
              CROSS JOIN (SELECT unnest(range(64)) AS d) dd)
        GROUP BY p),
    emb AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    buck AS (SELECT vec_id,
                    string_agg(CASE WHEN list_dot_product(emb, pw) >= 0
                               THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
             FROM emb CROSS JOIN planes GROUP BY vec_id),
    e AS (SELECT emb.vec_id, emb.emb, buck.bucket FROM emb JOIN buck USING (vec_id)),
    s AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 round(list_dot_product(a.emb, b.emb)
                       / (sqrt(list_dot_product(a.emb, a.emb))
                          * sqrt(list_dot_product(b.emb, b.emb))), 6) AS score
          FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
    SELECT id_a, id_b, score FROM s WHERE score >= 0.4
    """,
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs blocked by the 8-bit hyperplane LSH bucket
    instead of a label column — the self-contained scale path (no metadata
    needed): one shuffle on the bucket key, quadratic only within ~1/256
    slices of the corpus, and near-identical vectors land in the same
    bucket with high probability (they agree with most hyperplanes)."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    b = S.hyperplane_bucket(e, planes=8, dims=64)
    return S.cosine_pairs_blas(b, threshold=0.4, group_col="bucket")


@register(
    "sketch_distinct_theta",
    oracle=f"""
    WITH kept AS (
        SELECT event_type, user_id
        FROM events
        WHERE {hash64_sql('CAST(user_id AS VARCHAR)')} < 4503599627370496),
    est AS (SELECT event_type,
                   CAST(count(DISTINCT user_id) AS DOUBLE) * 256.0 AS est_distinct
            FROM kept GROUP BY event_type)
    SELECT e.event_type, est.est_distinct, e.exact_distinct
    FROM (SELECT event_type, count(DISTINCT user_id) AS exact_distinct
          FROM events GROUP BY event_type) e
    LEFT JOIN est USING (event_type)
    """,
)
def sketch_distinct_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """θ-sketch distinct users per event type, side-by-side with the exact
    count. The sketch's distinct-shuffle carries only ~1/256 of the values
    (hash-threshold filter BEFORE the shuffle) — the audit-friendly
    deterministic alternative to approx_count_distinct; 4503599627370496 =
    2^60/256 (operators/sketch.py)."""
    from kafka_etl_consumer_spark.operators.sketch import theta_distinct

    ev = _t(spark, sf_dir, "events")
    est = theta_distinct(ev, "user_id", group_cols=["event_type"], scale=256)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return exact.join(est, "event_type", "left").select(
        "event_type", "est_distinct", "exact_distinct"
    )


@register(
    "text_bpe_tokens",
    oracle=f"""
    WITH tok AS (SELECT doc_id, text, {_TOK} AS toks FROM documents),
    b AS (SELECT doc_id, toks,
                 regexp_extract_all(text, '{X.BPE_PATTERN.replace("'", "''")}') AS bpe
          FROM tok)
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_ws_tokens,
           CAST(len(bpe) AS INT) AS n_bpe_tokens,
           round(CAST(len(bpe) AS DOUBLE) / len(toks), 6) AS bpe_per_ws
    FROM b
    """,
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace vs BPE-ish (GPT-2-style pretokenizer regex) token counts
    per document — the token-budget proxy for training-data pipelines
    (operators/text.py bpe_token_count; plain-alternation regex keeps Java
    and RE2 engines token-identical)."""
    return X.bpe_token_count(_t(spark, sf_dir, "documents"))


@register(
    "pipeline_prepare_corpus",
    oracle=f"""
    WITH tok AS (SELECT doc_id, text, lang, {_TOK} AS toks FROM documents),
    q AS (SELECT doc_id, text, lang,
                 len(toks) AS n_tokens,
                 CAST(len(list_filter(toks, t -> t IN ({_in_list(X.STOPWORDS)})))
                      AS DOUBLE) / len(toks) AS stop_ratio
          FROM tok WHERE len(toks) > 0),
    kept AS (SELECT * FROM q WHERE n_tokens >= 5 AND stop_ratio >= 0.05),
    dedup AS (SELECT * FROM kept
              WHERE doc_id IN (SELECT min(doc_id) FROM kept GROUP BY md5(text))),
    sampled AS (SELECT * FROM dedup
                WHERE {hash64_sql('CAST(doc_id AS VARCHAR)')} % 2 = 0)
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(avg(n_tokens), 6) AS avg_tokens
    FROM sampled
    GROUP BY lang
    """,
)
def pipeline_prepare_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-star ops COMPOSED into one corpus-prep pipeline:
    quality gate (token count + stopword ratio, Gopher/C4-style) →
    exact dedup (min-id keeper per fingerprint) → deterministic 50%
    hash-sample → per-language token accounting.

    Plan shape at 100 TB: the gate and sample are narrow maps fused into
    the scan stage; dedup is one hash-agg + semi-join on (hash, id) pairs
    only (documents never shuffle); the final agg is partial+final on
    ~languages keys. Total: two small shuffles for any corpus size — and
    every stage deterministic, so reruns reproduce the corpus exactly."""
    from kafka_etl_consumer_spark.functions.hashing import hash64
    from kafka_etl_consumer_spark.functions.text import tokens

    d = _t(spark, sf_dir, "documents")
    toks = tokens("text")
    q = d.select(
        "doc_id",
        "text",
        "lang",
        F.size(toks).alias("n_tokens"),
        (
            F.size(F.filter(toks, lambda t: t.isin(*X.STOPWORDS))).cast("double")
            / F.size(toks)
        ).alias("stop_ratio"),
    ).filter(F.size(toks) > 0)
    kept = q.filter((F.col("n_tokens") >= 5) & (F.col("stop_ratio") >= 0.05))
    keepers = kept.groupBy(F.md5("text").alias("fp")).agg(F.min("doc_id").alias("doc_id"))
    dedup = kept.join(keepers.select("doc_id"), "doc_id", "left_semi")
    sampled = dedup.filter(hash64(F.col("doc_id").cast("string")) % 2 == 0)
    return sampled.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
    )
