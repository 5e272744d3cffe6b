"""Document chunking and benchmark-contamination operators (training-data
pipeline).

``chunk_documents`` splits each document into overlapping token windows —
the standard pre-tokenization step before sequence packing. ``ngram_
contamination`` flags training documents that share word n-grams with an
evaluation/benchmark set (the decontamination pass every LLM corpus runs
before training).

Both are JVM-side built-ins end to end (split / sequence / slice /
posexplode / md5) — whole-stage codegen, no Python. Scale shape:

- chunking is a narrow per-row map + generator (posexplode); output rows
  ≈ input tokens / stride, no shuffle at any scale.
- contamination joins the train side's distinct (doc, gram-hash) pairs
  against the benchmark gram set. Benchmark/eval sets are small by nature
  (thousands of documents), so the gram set is broadcast and the train
  side never shuffles for the join; the per-doc count aggregate partial-
  combines map-side. Grams are 60-bit md5 hashes (functions/hashing.py),
  not strings, so the broadcast and the agg keys stay 8 bytes wide.

The reference has no text surface at all (pass-through ETL,
ETLTask.java:261-283); this extends the corpus-prep family of
operators/text.py and operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.functions.hashing import hash64
from kafka_etl_consumer_spark.functions.text import tokens, word_shingles


def chunk_documents(
    df: DataFrame,
    size: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode each document into overlapping token-window chunks.

    Chunk starts are ``1, 1+stride, 1+2*stride, …`` while a start still
    opens a window that adds new tokens (last start ≤ n - size + stride);
    the final chunk may be shorter than ``size`` (slice clamps at the
    document end). Documents with ≤ size tokens produce exactly one chunk;
    empty documents produce one empty chunk (kept so downstream accounting
    sees every doc_id).

    Returns (id, chunk_idx, n_tokens, chunk_text).
    """
    if stride <= 0 or size <= 0 or stride > size:
        raise ValueError("need 0 < stride <= size")
    from kafka_etl_consumer_spark.session import ensure_min_parallelism

    df = ensure_min_parallelism(df)
    toks = tokens(text_col)
    n = F.size(toks)
    starts = F.when(
        n > size,
        F.sequence(F.lit(1), n - F.lit(size - stride), F.lit(stride)),
    ).otherwise(F.array(F.lit(1)))
    ex = df.select(
        F.col(id_col), toks.alias("__toks"), F.posexplode(starts).alias("chunk_idx", "__start")
    )
    chunk = F.slice(F.col("__toks"), F.col("__start"), size)
    return ex.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.size(chunk).alias("n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


def ngram_contamination(
    train: DataFrame,
    bench: DataFrame,
    k: int = 3,
    threshold: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per training document: how many distinct word k-grams it shares
    with the benchmark corpus, and whether that crosses ``threshold``
    (the doc is contaminated and must be dropped before training).

    Returns (id, n_shared, contaminated). Docs sharing nothing are kept
    with n_shared = 0 so the output is a complete decontamination report.
    """

    def gram_pairs(d: DataFrame) -> DataFrame:
        sh = word_shingles(tokens(text_col), k)
        return d.select(F.col(id_col), F.explode(sh).alias("__g")).select(
            F.col(id_col), hash64(F.col("__g")).alias("gh")
        )

    from kafka_etl_consumer_spark.session import ensure_min_parallelism

    bench_grams = (
        gram_pairs(ensure_min_parallelism(bench))
        .select("gh")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    # Repartition the RAW docs by doc_id BEFORE shingling: the shuffle
    # moves ~300-byte texts instead of the 10-100x larger gram-hash set,
    # the shingle+md5 work runs full-width even when the source is one
    # small file, and hash(doc_id) satisfies the clustered distribution of
    # both the (doc, gram) distinct AND the final per-doc count — so the
    # whole train side pays exactly ONE exchange, and it's the cheapest
    # one. The partition count is pinned explicitly: AQE would coalesce a
    # countless column repartition of tiny text bytes to ONE partition and
    # serialize the CPU-heavy generate stage downstream of it (measured
    # 6x on this query at sf0.1).
    width = train.sparkSession.sparkContext.defaultParallelism
    return (
        gram_pairs(train.repartition(width, id_col))
        .distinct()
        .join(F.broadcast(bench_grams), "gh", "left")
        .groupBy(id_col)
        .agg(F.count("hit").alias("n_shared"))
        .select(
            F.col(id_col),
            F.col("n_shared"),
            (F.col("n_shared") >= threshold).alias("contaminated"),
        )
    )
