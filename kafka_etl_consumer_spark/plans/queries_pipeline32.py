"""Query surface batch 37 (round 4): heuristic-vs-ground-truth eval.

text_langid_accuracy — confusion matrix of the n-gram-marker language
detector (text_lang_id / operators/text.py lang_id) against the
documents table's labeled ``lang`` column: the eval loop that tells you
whether a cheap routing heuristic is good enough before it gates a
corpus. Closes the loop the same way eval_knn_confusion does for the
embedding classifier.

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.functions.text import tokens_sql
from kafka_etl_consumer_spark.operators.text import LANG_MARKERS
from kafka_etl_consumer_spark.plans.registry import _t, register

_TOK = tokens_sql("text")


def _in_list(markers: tuple[str, ...]) -> str:
    return ", ".join(f"'{m}'" for m in markers)


_LIA_ORACLE = f"""
WITH tok AS (SELECT doc_id, lang, {_TOK} AS toks FROM documents),
hits AS (SELECT doc_id, lang,
    CAST(len(list_filter(toks, t -> t IN ({_in_list(LANG_MARKERS['en'])}))) AS INT) AS hits_en,
    CAST(len(list_filter(toks, t -> t IN ({_in_list(LANG_MARKERS['es'])}))) AS INT) AS hits_es,
    CAST(len(list_filter(toks, t -> t IN ({_in_list(LANG_MARKERS['de'])}))) AS INT) AS hits_de,
    CAST(len(list_filter(toks, t -> t IN ({_in_list(LANG_MARKERS['fr'])}))) AS INT) AS hits_fr
    FROM tok),
pred AS (SELECT doc_id, lang AS true_lang,
    CASE WHEN hits_en >= greatest(hits_es, hits_de, hits_fr) AND hits_en > 0 THEN 'en'
         WHEN hits_es >= greatest(hits_de, hits_fr) AND hits_es > 0 THEN 'es'
         WHEN hits_de >= hits_fr AND hits_de > 0 THEN 'de'
         WHEN hits_fr > 0 THEN 'fr'
         ELSE 'und' END AS guessed_lang
    FROM hits)
SELECT true_lang, guessed_lang, CAST(count(*) AS BIGINT) AS n_docs,
       round(count(*) / CAST(sum(count(*))
             OVER (PARTITION BY true_lang) AS DOUBLE), 6) AS share_of_true
FROM pred GROUP BY true_lang, guessed_lang
"""


@register("text_langid_accuracy", _LIA_ORACLE)
def text_langid_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix (true lang x guessed lang) of the marker-based
    language detector against the labeled corpus, with per-true-class
    recall shares. Scale: the detector is the same narrow in-row
    marker count text_lang_id runs (zero shuffle); the confusion grid
    is ONE bounded hash-agg plus a window over |langs|^2 rows."""
    from kafka_etl_consumer_spark.operators.text import lang_id

    docs = _t(spark, sf_dir, "documents")
    pred = lang_id(docs).select("doc_id", "guessed_lang")
    truth = docs.select("doc_id", F.col("lang").alias("true_lang"))
    g = truth.join(pred, "doc_id").groupBy("true_lang", "guessed_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    w = Window.partitionBy("true_lang")
    return g.select(
        "true_lang",
        "guessed_lang",
        "n_docs",
        F.round(
            F.col("n_docs") / F.sum("n_docs").over(w).cast("double"), 6
        ).alias("share_of_true"),
    )
