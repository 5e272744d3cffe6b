"""Streaming heavy hitters: a stateful Misra-Gries frequency summary.

The batch complement is the sketch family (``sketch_cms_tokens`` counts
with a count-min grid; ``win_rank_topk``/TakeOrdered give exact top-k);
the STREAMING question — "which items are trending RIGHT NOW, with
bounded state, over an unbounded stream" — needs a mergeable summary
that lives in the state store. Misra-Gries (1982) is the classic answer:
k counters per key, total error bounded by the theorem

    true(x) - n/(k+1)  <=  est(x)  <=  true(x)

and EVERY item with true frequency > n/(k+1) is guaranteed present —
the containment property tests/test_stream_heavy_hitters.py asserts
against exact batch counts (an invariant, not a tolerance).

Scale: state is exactly k (item, count) pairs + one counter per key —
O(#keys · k) regardless of stream volume; the only shuffle keys on the
monitored series. Reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283 of mykidong/kafka-etl-consumer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["mg_reduce", "misra_gries_monitor"]


def mg_reduce(items, k: int = 8, n: int = 0, summary: dict | None = None):
    """Fold an ordered item stream into a Misra-Gries summary.

    The ONE shared update used by both the streaming monitor below and
    the batch twin (plans/queries_pipeline44.heavy_hitters_mg), so the
    two surfaces cannot drift: increment a tracked item, adopt into a
    free slot while fewer than ``k`` counters live, else decrement ALL
    counters and drop zeros (the arriving item is spent too — k+1
    stream elements per decrement, hence the n/(k+1) error bound).
    Returns ``(n, summary)`` — pass a prior ``(n, summary)`` back in to
    resume (the streaming state-store path). ``summary`` preserves
    insertion order (Python dict), matching the oracle's list state."""
    summary = {} if summary is None else summary
    for x in items:
        x = str(x)
        n += 1
        if x in summary:
            summary[x] += 1
        elif len(summary) < k:
            summary[x] = 1
        else:
            for it in list(summary):
                summary[it] -= 1
                if summary[it] == 0:
                    del summary[it]
    return n, summary


def misra_gries_monitor(
    df: DataFrame,
    key_col: str = "series",
    ts_col: str = "ts",
    item_col: str = "item",
    k: int = 8,
) -> DataFrame:
    """Per-key streaming Misra-Gries summary (k counters).

    Emits one row per key per micro-batch it appears in:
    ``(key, n_processed, items, counts, err_bound)`` where ``items`` /
    ``counts`` are the surviving counters sorted by (count DESC, item
    ASC) — deterministic given the same ordered stream — and
    ``err_bound = floor(n_processed / (k + 1))`` is the worst-case
    undercount of any estimate (the MG guarantee). Items are consumed
    in ``ts_col`` order within each micro-batch (all Arrow chunks
    concatenated first — the same ordering contract as the drift
    monitors); cross-batch order is arrival order. The update is the
    textbook one: increment a tracked item, adopt into a free slot,
    else decrement ALL counters (dropping zeros) — each decrement
    "spends" k+1 stream elements, which is where the n/(k+1) bound
    comes from."""
    import pandas as pd  # local import: streaming module stays light
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("n_processed", T.LongType()),
            T.StructField("items", T.ArrayType(T.StringType())),
            T.StructField("counts", T.ArrayType(T.LongType())),
            T.StructField("err_bound", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("items", T.ArrayType(T.StringType())),
            T.StructField("counts", T.ArrayType(T.LongType())),
        ]
    )

    def update(key, pdfs, state):
        if state.exists:
            n, items, counts = state.get
            summary = dict(zip(list(items), list(counts)))
        else:
            n, summary = 0, {}
        chunks = [pdf for pdf in pdfs if len(pdf)]
        batch = (
            pd.concat(chunks, ignore_index=True) if len(chunks) > 1
            else (chunks[0] if chunks else None)
        )
        if batch is not None:
            n, summary = mg_reduce(
                batch.sort_values(ts_col, kind="mergesort")[item_col],
                k=k,
                n=n,
                summary=summary,
            )
        ordered = sorted(summary.items(), key=lambda kv: (-kv[1], kv[0]))
        state.update(
            (n, [it for it, _ in ordered], [c for _, c in ordered])
        )
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_processed": [n],
                "items": [[it for it, _ in ordered]],
                "counts": [[c for _, c in ordered]],
                "err_bound": [n // (k + 1)],
            }
        )

    return (
        df.select(
            F.col(key_col).cast("string").alias(key_col),
            F.col(ts_col),
            F.col(item_col).cast("string").alias(item_col),
        )
        .groupBy(key_col)
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )
