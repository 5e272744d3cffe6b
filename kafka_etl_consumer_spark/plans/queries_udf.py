"""Query surface batch 5: the UDF/UDAF/UDTF row of SURVEY.md §2.2.

The engine's stance (SURVEY.md §4.2): built-in functions first — every
other query module is UDF-free. This module demonstrates the three Python
extension points for semantics built-ins cannot express, each in its
Arrow-vectorized form (never row-at-a-time ``F.udf`` in a hot path):

- scalar ``@pandas_udf``      — numpy batch math (cosine vs a reference
                                 vector); Arrow transfers columns
                                 zero-copy, numpy sees a (batch, 64) matrix
- grouped ``applyInPandas``   — per-group model-ish computation (centroid
                                 norm), the UDAF stand-in
- Python UDTF                 — one row → N rows (sentence split). This is
                                 the ONE row-at-a-time API here, kept as an
                                 API-surface demo: production splitting is
                                 the built-in explode+split (explode_tokens)

Oracles replicate the math exactly (same deterministic reference vector via
plane_weight, same split regex), so all three remain hash-checked.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from kafka_etl_consumer_spark.operators.similarity import plane_weight, plane_weight_sql
from kafka_etl_consumer_spark.plans.registry import _t, register

# deterministic 64-dim reference vector shared with the SQL oracle
_REF = [plane_weight(0, d) for d in range(64)]


@register(
    "udf_pandas_cosine",
    oracle=f"""
    WITH w AS (
        SELECT list(x ORDER BY d) AS ref
        FROM (SELECT dd.d AS d,
                     {plane_weight_sql("'0'", 'CAST(dd.d AS VARCHAR)')} AS x
              FROM (SELECT unnest(range(64)) AS d) dd)),
    s AS (SELECT vec_id,
                 round(list_dot_product(embedding::DOUBLE[], ref)
                       / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                          * sqrt(list_dot_product(ref, ref))), 6) AS ref_cosine
          FROM embeddings CROSS JOIN w)
    SELECT vec_id, ref_cosine FROM s ORDER BY ref_cosine DESC, vec_id LIMIT 20
    """,
)
def udf_pandas_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf: cosine of every embedding against a fixed
    reference vector, top-20. Arrow hands the UDF a whole batch; numpy does
    one (batch×64)·(64,) matmul per batch — the vectorized shape that is
    10-100× a row-at-a-time Python UDF. Still ~2× slower than the pure
    zip_with/aggregate codegen path (sim_cosine_topk) — which is why UDFs
    are the fallback, not the default."""

    ref = np.array(_REF, dtype=np.float64)
    ref_norm = float(np.sqrt(ref @ ref))

    @pandas_udf("double")
    def ref_cosine(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy()).astype(np.float64)
        return pd.Series((m @ ref) / (np.sqrt((m * m).sum(axis=1)) * ref_norm))

    e = _t(spark, sf_dir, "embeddings")
    return (
        e.select("vec_id", F.round(ref_cosine("embedding"), 6).alias("ref_cosine"))
        .orderBy(F.col("ref_cosine").desc(), "vec_id")
        .limit(20)
    )


@register(
    "udf_grouped_centroid",
    oracle="""
    WITH x AS (SELECT label,
                      unnest(embedding::DOUBLE[]) AS v,
                      CAST(unnest(range(64)) AS INT) AS d
               FROM embeddings),
    c AS (SELECT label, d, avg(v) AS cv FROM x GROUP BY label, d)
    SELECT label,
           (SELECT count(*) FROM embeddings e WHERE e.label = c.label) AS n_vectors,
           round(sqrt(sum(cv * cv)), 6) AS centroid_norm
    FROM c
    GROUP BY label
    """,
)
def udf_grouped_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (the UDAF stand-in): per-label embedding
    centroid L2 norm. Each label's rows arrive as ONE pandas frame — the
    shuffle is on label, the UDF cost is one mean+norm per group. At scale,
    watch group skew: a label holding 30% of 100 TB lands on one worker;
    pre-aggregating per-partition sums with built-ins and reducing would be
    the skew-safe rewrite (this demo keeps the canonical grouped-map shape)."""

    def centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        c = m.mean(axis=0)
        return pd.DataFrame(
            {
                "label": [int(pdf["label"].iloc[0])],
                "n_vectors": [len(pdf)],
                "centroid_norm": [float(np.sqrt(c @ c))],
            }
        )

    e = _t(spark, sf_dir, "embeddings").select("label", "embedding")
    out = e.groupBy("label").applyInPandas(
        centroid, "label int, n_vectors long, centroid_norm double"
    )
    return out.select("label", "n_vectors", F.round("centroid_norm", 6).alias("centroid_norm"))


_SENT_SPLIT = r"[.!?]+\s+"


@udtf(returnType="idx int, sentence string")
class _SplitSentences:
    """One document → one row per sentence (trimmed, non-empty)."""

    def eval(self, text: str):
        if text is None:
            return
        idx = 0
        for seg in re.split(_SENT_SPLIT, text):
            seg = seg.strip()
            if seg:
                yield idx, seg
                idx += 1


@register(
    "udf_udtf_sentences",
    oracle=rf"""
    WITH s AS (SELECT doc_id,
                      list_filter(list_transform(
                          regexp_split_to_array(text, '{_SENT_SPLIT}'),
                          x -> trim(x)), x -> len(x) > 0) AS segs
               FROM documents
               WHERE doc_id % 20 = 0)
    SELECT doc_id,
           CAST(unnest(range(len(segs))) AS INT) AS idx,
           unnest(segs) AS sentence
    FROM s
    """,
)
def udf_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF via LATERAL join: sentence-split each document (1 row →
    N rows). Row-at-a-time by design — registered to prove the surface; the
    production path for this exact job is the codegen'd
    explode(split(text, ...)) (see explode_tokens)."""
    spark.udtf.register("split_sentences", _SplitSentences)
    _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0).createOrReplaceTempView(
        "__docs_udtf"
    )
    return spark.sql(
        "SELECT d.doc_id, s.idx, s.sentence "
        "FROM __docs_udtf d, LATERAL split_sentences(d.text) s"
    )
