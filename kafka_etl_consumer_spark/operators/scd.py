"""Slowly-changing-dimension type-2 merge — the warehouse upsert that keeps
full attribute history: updating a key CLOSES its open row (sets
``valid_to``) and INSERTS a new open row, so as-of queries (operators/
joins.py asof_join, or ``valid_from <= ts < valid_to`` range predicates)
can reconstruct the dimension at any point in time.

Equivalent of Delta/Iceberg ``MERGE INTO`` + SCD2 templating, expressed as
one plan over plain DataFrames (works on raw parquet — no table format
required).

100 TB shape: ONE equi-join on the business key decides every row's fate;
closed history rows pass through untouched (filter, no join). Updates
batches are usually ≪ the dimension → Spark broadcasts them and the
dimension never shuffles; for dimension-scale updates, bucket both sides
on the key at write time and the merge is exchange-free (SCALE.md). Rows
are never mutated in place — the output is a full new snapshot,
partition-overwritable onto the old one (same idempotent-write posture as
streaming/ingest.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key_col: str,
    attr_cols: Sequence[str],
    ts_col: str = "ts",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Apply one batch of ``updates`` (one row per key: key, attrs, ts) to
    an SCD2 ``current`` table (key, attrs, valid_from, valid_to — open rows
    have NULL ``valid_to``). Returns the merged table:

    - closed history rows: unchanged,
    - open row + update with DIFFERENT attrs: closed at the update's ts,
      plus a new open row carrying the new attrs,
    - open row + update with identical attrs: unchanged (no-op update —
      no spurious version),
    - update for an unseen key: new open row,
    - open row with no update: unchanged.

    NULL-safe attr comparison (``eqNullSafe``), so NULL→value and
    value→NULL transitions version correctly."""
    is_open = F.col(to_col).isNull()
    closed_hist = current.filter(~is_open)
    open_cur = current.filter(is_open)

    u_cols = [F.col(key_col).alias("__uk"), F.col(ts_col).alias("__uts")] + [
        F.col(a).alias(f"__u_{a}") for a in attr_cols
    ]
    u = updates.select(*u_cols)
    j = open_cur.join(u, F.col(key_col) == F.col("__uk"), "full")

    same: Column = F.lit(True)
    for a in attr_cols:
        same = same & F.col(a).eqNullSafe(F.col(f"__u_{a}"))
    has_cur = F.col(key_col).isNotNull()
    has_upd = F.col("__uk").isNotNull()
    changed = has_cur & has_upd & ~same

    out_cols = [key_col, *attr_cols, from_col, to_col]
    kept_open = j.filter(has_cur & (~has_upd | same)).select(*out_cols)
    closed_now = j.filter(changed).select(
        key_col, *attr_cols, from_col, F.col("__uts").alias(to_col)
    )
    new_open = j.filter(has_upd & (~has_cur | changed)).select(
        F.col("__uk").alias(key_col),
        *[F.col(f"__u_{a}").alias(a) for a in attr_cols],
        F.col("__uts").alias(from_col),
        F.lit(None).cast(current.schema[to_col].dataType).alias(to_col),
    )
    return closed_hist.select(*out_cols).unionByName(
        kept_open.unionByName(closed_now).unionByName(new_open)
    )


def merge_type1(
    current: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    delete_col: str | None = None,
    broadcast_changes: bool = False,
) -> DataFrame:
    """Generic type-1 MERGE (upsert + optional delete) over a landed
    table: matched keys take the change row's values wholesale, unmatched
    change rows insert, and rows whose change has ``delete_col`` true are
    dropped. No history is kept — use :func:`scd2_merge` for that.

    Shape: ONE anti join (current minus changed keys) + a union — never a
    full outer join, so the big side shuffles at most once and not at all
    with ``broadcast_changes=True`` (the common case: changes ≪ table).
    Pass the flag rather than hinting the ``changes`` frame yourself: the
    frame also feeds the union branch, where a dangling broadcast hint
    would be silently ignored (and drown HintErrorLogger's signal for
    real hint regressions); the flag scopes the hint to the anti join's
    key projection only. Output is a full new snapshot to
    overwrite/partition-overwrite onto the old one, same idempotent
    posture as scd2_merge.
    """
    keys = list(key_cols)
    out_cols = [c for c in current.columns]
    changed_keys = changes.select(*keys).distinct()
    if broadcast_changes:
        changed_keys = F.broadcast(changed_keys)
    survivors = current.join(changed_keys, keys, "left_anti")
    incoming = changes
    if delete_col is not None:
        incoming = incoming.where(~F.coalesce(F.col(delete_col), F.lit(False)))
    return survivors.unionByName(incoming.select(*out_cols))
