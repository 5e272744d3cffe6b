"""Query surface batch 9: span-level exact dedup (cut repeated k-grams OUT
of documents, the in-document complement to the doc-level dedup family) and
Unicode-script detection (the code-point-range precursor to language ID).

The reference has no text surface at all (pass-through ETL,
ETLTask.java:261-283 of the reference); these extend the training-data
pipeline operators the brief requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.functions.hashing import hash64_sql
from kafka_etl_consumer_spark.functions.text import tokens_sql
from kafka_etl_consumer_spark.operators.dedup import remove_duplicate_spans
from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# duplicated-span removal (Lee et al. 2022 exact-substring dedup, word-gram
# form). k=8-word grams occurring >= 2 times corpus-wide are cut from every
# document; the oracle replays the identical tokenize/gram/hash/cover logic.
# ---------------------------------------------------------------------------

_SPAN_K = 8

_SPAN_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {tokens_sql("text")} AS toks FROM documents
),
occ AS (
  SELECT doc_id, toks, unnest(range(1, len(toks) - {_SPAN_K - 2})) AS start
  FROM docs
),
occ2 AS (
  SELECT doc_id, start,
         {hash64_sql(f"array_to_string(toks[start : start + {_SPAN_K - 1}], ' ')")} AS gh
  FROM occ
),
dup AS (SELECT gh FROM occ2 GROUP BY gh HAVING count(*) >= 2),
ds AS (
  SELECT doc_id, list_sort(list(DISTINCT start)) AS dups
  FROM occ2 JOIN dup USING (gh) GROUP BY doc_id
),
kept AS (
  SELECT d.doc_id, d.toks,
         list_filter(
           d.toks,
           (t, i) -> len(list_filter(coalesce(ds.dups, CAST([] AS BIGINT[])),
                                     s -> s <= i AND i <= s + {_SPAN_K - 1})) = 0
         ) AS kl
  FROM docs d LEFT JOIN ds USING (doc_id)
)
SELECT doc_id,
       len(toks) AS n_tokens,
       len(toks) - len(kl) AS n_removed,
       md5(coalesce(array_to_string(kl, ' '), '')) AS clean_fp
FROM kept
"""


@register("dedup_span_removal", _SPAN_ORACLE)
def dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cut every corpus-repeated 8-word gram out of every document.

    Spark side is :func:`remove_duplicate_spans` — see its docstring for
    the three-shuffle 100 TB shape (gram-count hash-agg, hash-keyed dup
    join, id-keyed cover collect reusing the doc partitioning).
    """
    return remove_duplicate_spans(_t(spark, sf_dir, "documents"), k=_SPAN_K)


# ---------------------------------------------------------------------------
# Unicode-script detection: per-document code-point-range histogram and the
# dominant script. Pure JVM regexp (one narrow map, zero shuffle); the
# stopword-based text_lang_id answers "which language", this answers "which
# writing system" — the cheap first gate a multilingual pipeline runs
# before any language model is consulted.
# ---------------------------------------------------------------------------

# char-class per script; counted as len(text) - len(text with class removed)
_SCRIPTS = {
    "n_latin": "[A-Za-zÀ-ɏ]",
    "n_cyrillic": "[Ѐ-ӿ]",
    "n_cjk": "[぀-ヿ一-鿿가-힯]",
    "n_digit": "[0-9]",
}

_DOMINANT_SQL = """
CASE WHEN n_latin >= n_cyrillic AND n_latin >= n_cjk THEN 'latin'
     WHEN n_cyrillic >= n_cjk THEN 'cyrillic'
     ELSE 'cjk' END
"""

# the same class literals verbatim in both engines: character-identical
# regexes, so the counts agree exactly
_SCRIPT_ORACLE = (
    "WITH c AS (SELECT doc_id, "
    + ", ".join(
        "CAST(length(regexp_extract_all(text, '{cls}')) AS BIGINT) AS {name}".format(
            cls=cls.replace("'", "''"), name=name
        )
        for name, cls in _SCRIPTS.items()
    )
    + f" FROM documents) SELECT c.*, {_DOMINANT_SQL} AS script FROM c"
)


@register("text_script_detect", _SCRIPT_ORACLE)
def text_script_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Unicode-script character counts + dominant script.

    One narrow map over the scan: each count is a JVM ``regexp_count``
    (whole-stage codegen, no Python, no shuffle) — at 100 TB this runs at
    scan speed and is the cheapest possible multilingual routing gate.
    """
    d = _t(spark, sf_dir, "documents")
    cols = [
        F.regexp_count("text", F.lit(cls)).cast("bigint").alias(name)
        for name, cls in _SCRIPTS.items()
    ]
    c = d.select("doc_id", *cols)
    return c.withColumn("script", F.expr(_DOMINANT_SQL))
