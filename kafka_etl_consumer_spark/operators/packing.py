"""Sequence packing: assign documents to fixed-token-budget training packs.

The standard "concatenate the token stream, then chunk every `budget`
tokens" layout LLM training pipelines use to build fixed-length batches
(documents may straddle a pack boundary; the attention mask handles the
seam). Deterministic given a (shard, order) pair, so it carries an exact
ANSI-SQL oracle.

Scale design: ONE shuffle — hash-shard the corpus (shard count chosen so a
shard's token stream fits a task), then a per-shard window cumulative sum.
At 100 TB with e.g. 4096 shards each task scans its shard once; no global
sort, no driver state. The per-pack rollup is a map-side-combinable
groupBy on (shard, pack_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_col: str,
    order_col: str,
    budget: int,
    n_shards: int = 8,
) -> DataFrame:
    """Per-pack summary: (shard, pack_id, n_docs, pack_tokens, first_doc,
    last_doc).

    Each document's start offset in its shard's concatenated token stream
    is the exclusive prefix sum of ``token_col`` ordered by ``order_col``;
    ``pack_id = floor(offset / budget)``.
    """
    shard = F.pmod(F.col(order_col), F.lit(n_shards)).alias("shard")
    d = df.select(shard, F.col(order_col).alias("__ord"), F.col(token_col).alias("__tok"))
    w = Window.partitionBy("shard").orderBy("__ord")
    offset = F.sum("__tok").over(w) - F.col("__tok")
    packed = d.select(
        "shard",
        "__ord",
        "__tok",
        F.floor(offset / F.lit(budget)).alias("pack_id"),
    )
    return packed.groupBy("shard", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("__tok").alias("pack_tokens"),
        F.min("__ord").alias("first_doc"),
        F.max("__ord").alias("last_doc"),
    )
