"""Join operators Spark lacks as single primitives: as-of and range joins.

The reference has no joins at all (decode→write only, ETLTask.java:261-283
in the reference); these cover SURVEY.md §2.2's join rows beyond the stock
``df.join`` surface.

Scale notes (100 TB posture):
- ``asof_join`` defaults to the MERGE shape (strategy='merge'): union both
  sides tagged by origin, ONE shuffle+sort by (key, ts), then
  ``last(right_struct, ignorenulls)`` over a running window. Cost is
  O(L+R) rows moved and sorted — no join, no candidate set, so a key with
  millions of right rows (tick data) costs millions of rows, not L·R
  candidate pairs. This survives 100 TB where the rank shape explodes.
- strategy='rank' keeps the candidate-join + per-left-row rank pattern:
  left join on (equi-key AND ts-bound), then ``row_number() == 1`` per
  left row. Candidates per left row = ALL qualifying right rows for that
  key, i.e. O(L·R) per key — only use when the right side per key is
  known-small (e.g. a slowly-changing dimension Spark auto-broadcasts).
- For large-large time-series as-of, bucket both tables by the key at
  write time; the merge shape then sorts within buckets with no exchange.
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
    strategy: str = "merge",
    tolerance: float | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` (direction='backward') / smallest
    ``right_ts >= left_ts`` ('forward') sharing the equi-key ``on``.

    ``tiebreakers``: right-side columns ordered DESC after the timestamp so
    the picked row is deterministic when several right rows share the
    boundary timestamp (DuckDB's ASOF JOIN leaves this unspecified; we don't).

    ``strategy``: 'merge' (default — union + sort + running last, O(L+R),
    scale-safe) or 'rank' (candidate join + row_number, O(candidates); only
    safe when right rows per key are few). Both return identical rows for
    distinct left rows; they differ only on EXACT duplicate left rows
    ('merge' preserves each copy, 'rank' without ``left_unique`` collapses
    them — pandas merge_asof agrees with 'merge').

    ``left_unique``: rank-strategy only — columns forming a unique key of
    the left side; the rank window then partitions by just these (narrower
    sort keys, measured ~25% off the rank stage).

    ``tolerance``: maximum allowed as-of gap (pandas merge_asof
    semantics — the NEAREST match is picked first, then rejected if it
    exceeds the gap; by monotonicity of the as-of bound the two orders
    are equivalent). Units follow the widened timestamp type: SECONDS
    for timestamp columns, DAYS for dates, the column's own units for
    numerics. With ``how='left'`` an out-of-tolerance match nulls the
    right side; with ``how='inner'`` the row drops.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if strategy == "merge":
        return _asof_merge(left, right, keys, left_ts, right_ts,
                           tiebreakers, direction, how, tolerance)
    if strategy != "rank":
        raise ValueError(f"strategy must be merge|rank, got {strategy!r}")
    if direction == "backward":
        cond = F.col(f"__r.{right_ts}") <= F.col(f"__l.{left_ts}")
        ts_order = [F.col(f"__r.{right_ts}").desc()]
    elif direction == "forward":
        cond = F.col(f"__r.{right_ts}") >= F.col(f"__l.{left_ts}")
        ts_order = [F.col(f"__r.{right_ts}").asc()]
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    join_cond: Column = cond
    if tolerance is not None:
        ts_t = _widen_ts_type(
            left.schema[left_ts].dataType, right.schema[right_ts].dataType
        )
        l_n = _ts_number(F.col(f"__l.{left_ts}"), ts_t)
        r_n = _ts_number(F.col(f"__r.{right_ts}"), ts_t)
        gap = (l_n - r_n) if direction == "backward" else (r_n - l_n)
        join_cond = join_cond & (gap <= F.lit(float(tolerance)))
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


def _ts_number(c, ts_t):
    """Orderable number for as-of gap math: epoch seconds for timestamps,
    epoch days for dates, the raw value for numerics."""
    from pyspark.sql import types as T

    if isinstance(ts_t, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(c.cast(T.TimestampType())).cast("double") / 1e6
    if isinstance(ts_t, T.DateType):
        return F.datediff(c, F.lit("1970-01-01").cast("date")).cast("double")
    return c.cast("double")


def _widen_ts_type(lt, rt):
    """Common orderable type for the two as-of timestamp columns — the
    comparison semantics Catalyst would use for ``l.ts <= r.ts`` (date
    widens to timestamp, integers widen up). The merge shape unions the
    two columns, so the coercion must be explicit."""
    if lt == rt:
        return lt
    from pyspark.sql import types as T

    families = (
        [T.DateType(), T.TimestampNTZType(), T.TimestampType()],
        [T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType(),
         T.FloatType(), T.DoubleType()],
    )
    for fam in families:
        if lt in fam and rt in fam:
            return fam[max(fam.index(lt), fam.index(rt))]
    raise ValueError(f"incompatible as-of timestamp types: {lt} vs {rt}")


def _asof_merge(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    tiebreakers: list[str] | None,
    direction: str,
    how: str,
    tolerance: float | None = None,
) -> DataFrame:
    """Merge-asof: no join at all. Union left and right rows tagged by
    side, shuffle+sort ONCE by (key, ts, side, tiebreakers), and carry the
    most recent right row to each left row with a running
    ``last(struct, ignorenulls)`` window. The right payload travels as ONE
    struct so the picked row is atomic (a per-column last() could mix
    columns from different right rows when payload values are null).

    Cost at any scale: one exchange of L+R rows + an in-partition sort —
    never the O(L·R) candidate blow-up of the inequality-join shape.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    right_cols = [c for c in right.columns if c not in keys]
    tbs = list(tiebreakers or [])

    lrow_t = left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
    rrow_t = right.select(F.struct(*right_cols).alias("s")).schema["s"].dataType
    ts_t = _widen_ts_type(left.schema[left_ts].dataType, right.schema[right_ts].dataType)

    # A right row with any null key can never equi-match — drop it up front
    # (in the merge shape null keys would otherwise group together and
    # "match" null-keyed left rows, which SQL equality never does).
    r_in = right
    for k in keys:
        r_in = r_in.filter(F.col(k).isNotNull())

    l2 = left.select(
        *keys,
        F.col(left_ts).cast(ts_t).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__lrow"),
        F.lit(None).cast(rrow_t).alias("__rrow"),
        *[F.lit(None).cast(right.schema[t].dataType).alias(f"__tb{i}")
          for i, t in enumerate(tbs)],
    )
    r2 = r_in.select(
        *keys,
        F.col(right_ts).cast(ts_t).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(lrow_t).alias("__lrow"),
        F.struct(*right_cols).alias("__rrow"),
        *[F.col(t).alias(f"__tb{i}") for i, t in enumerate(tbs)],
    )
    u = l2.unionByName(r2)

    if direction == "backward":
        # rights sort BEFORE lefts at equal ts (<= bound is inclusive);
        # among same-ts rights, tiebreakers ASC so the running last() lands
        # on the max tiebreaker — same pick as rank's DESC ordering.
        order = [F.col("__ts").asc(), F.col("__side").asc()] + [
            F.col(f"__tb{i}").asc() for i in range(len(tbs))
        ]
        w = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        match = F.last("__rrow", ignorenulls=True).over(w)
    else:
        # lefts BEFORE rights at equal ts (>= bound inclusive); among
        # same-ts rights, tiebreakers DESC so the first() forward pick is
        # the max tiebreaker.
        order = [F.col("__ts").asc(), F.col("__side").desc()] + [
            F.col(f"__tb{i}").desc() for i in range(len(tbs))
        ]
        w = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        match = F.first("__rrow", ignorenulls=True).over(w)

    out = u.withColumn("__m", match)
    if tolerance is not None:
        l_n = _ts_number(F.col("__ts"), ts_t)
        r_n = _ts_number(F.col(f"__m.{right_ts}").cast(ts_t), ts_t)
        gap = (l_n - r_n) if direction == "backward" else (r_n - l_n)
        out = out.withColumn(
            "__m",
            F.when(
                F.col("__m").isNotNull() & (gap <= F.lit(float(tolerance))),
                F.col("__m"),
            ),
        )
    out = out.filter(F.col("__side") == 1)
    if how == "inner":
        out = out.filter(F.col("__m").isNotNull())
    return out.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"__m.{c}").alias(c) for c in right_cols],
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


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_interval: tuple[str, str],
    right_interval: tuple[str, str],
    bucket_width: int = 16,
) -> DataFrame:
    """Interval-OVERLAP equi-join: pairs sharing the ``on`` keys whose
    integer intervals ``[ls, le]`` and ``[rs, re]`` overlap
    (``ls <= re AND rs <= le``), both ends inclusive.

    The naive shape — equi-join on keys, overlap as a post-filter — builds
    every same-key pair before filtering: O(n_k^2) per key, the same cliff
    the rank as-of join has. This implementation uses the classic bucketed
    interval join instead: each interval explodes into the fixed-width
    buckets it covers (``floor(s/W) .. floor(e/W)``), the join is an
    EQUI-join on (keys…, bucket), and each overlapping pair is emitted
    EXACTLY ONCE — in the bucket containing the overlap's start,
    ``floor(greatest(ls, rs)/W)`` — so no distinct pass is needed.

    Cost: rows replicate ×(span/W + 1) narrow-map-side; the join compares
    only pairs sharing a bucket, O(sum over buckets of n_bucket^2) ≪ n_k^2
    when intervals are short relative to the key's time extent. Pick
    ``bucket_width`` ≈ the typical interval span: wider wastes comparisons,
    narrower wastes replication. At 100 TB both sides shuffle once on
    (keys…, bucket) — AQE's skew split handles hot buckets.

    Column names (outside ``on``) must be disjoint between the two inputs.
    """
    if not on:
        raise ValueError("interval_join requires at least one equi key")
    ls, le = left_interval
    rs, re = right_interval
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")

    # Pin the exchange width explicitly: the shuffled rows are small (keys +
    # two ints) so AQE would coalesce to a handful of partitions and
    # serialize the pair expansion that happens AFTER the exchange — the
    # same trap documented on decontamination (chunking.py). Both sides use
    # the identical (keys, bucket) partitioning, so the join adds none.
    width = left.sparkSession.sparkContext.defaultParallelism

    def buckets(df: DataFrame, s: str, e: str) -> DataFrame:
        b = F.explode(
            F.sequence(F.floor(F.col(s) / w), F.floor(F.col(e) / w))
        ).alias("__bucket")
        return df.select("*", b).repartition(width, *on, "__bucket")

    l = buckets(left, ls, le)
    r = buckets(right, rs, re)
    joined = l.join(r, [*on, "__bucket"])
    overlap = (F.col(ls) <= F.col(re)) & (F.col(rs) <= F.col(le))
    emit_once = F.col("__bucket") == F.floor(F.greatest(F.col(ls), F.col(rs)) / w)
    return joined.filter(overlap & emit_once).drop("__bucket")
