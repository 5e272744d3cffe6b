"""Z-order (Morton) clustering expressions — multi-dimensional data
layout for parquet row-group pruning.

Why: parquet keeps per-row-group min/max stats per column. Sorting by ONE
column makes that column's ranges disjoint (``write_parquet(sort_by=...)``)
but leaves every other column's range per row group as wide as the table —
a filter on a second dimension prunes nothing. Interleaving the bits of
2-3 normalized key columns (the Morton space-filling curve) and sorting by
the interleaved code keeps EVERY participating column's per-row-group
range narrow, so a 2-d box predicate skips most row groups. This is the
same layout strategy Delta Lake's OPTIMIZE ZORDER BY and Databricks
clustering use; here it is plain Spark expressions — shift/mask bit
spreading is whole-stage-codegen JVM work, no UDF.

Scale: one tiny min/max aggregate per column (a broadcast one-row join,
never a driver collect), one narrow projection computing the code, one
range repartition on the code (the sort that any clustered write pays).

All functions return Columns; :func:`zorder_code` is the user surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BITS = 16
_MAX = (1 << _BITS) - 1

# Classic bit-spreading magic numbers: spread a 16-bit int so its bits
# occupy every 2nd (dim=2) or 3rd (dim=3) position of the result.
_SPREAD2 = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)
_SPREAD3 = (
    (16, 0x0000FF0000FF),
    (8, 0x00F00F00F00F),
    (4, 0x0C30C30C30C3),
    (2, 0x249249249249),
)


def _spread(c: Column, table) -> Column:
    for shift, mask in table:
        c = (c.bitwiseOR(F.shiftleft(c, shift))).bitwiseAND(F.lit(mask))
    return c


def _normalize(c: Column, mn: Column, mx: Column) -> Column:
    """Scale a numeric column into [0, 2^16-1] given its min/max (constant
    range collapses to 0 — every row equal, nothing to cluster)."""
    span = mx.cast("double") - mn.cast("double")
    scaled = F.when(
        span > 0,
        ((c.cast("double") - mn.cast("double")) / span * _MAX),
    ).otherwise(F.lit(0.0))
    return F.least(F.lit(_MAX), F.greatest(F.lit(0), scaled.cast("bigint")))


def _interleave_generic(normalized: list[Column]) -> Column:
    """Per-bit interleave for 4+ dimensions — O(bits x dims) expression
    nodes, the fallback when no spread table applies. Bit layout matches
    the spread form: column i occupies bits i, i+n, i+2n, ..."""
    n = len(normalized)
    z = F.lit(0).cast("long")
    for b in range(_BITS):
        for i, c in enumerate(normalized):
            bit = F.shiftrightunsigned(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def zorder_code(normalized: list[Column]) -> Column:
    """Morton code of >=2 columns already scaled to [0, 65535]. 2-3
    columns use constant-count shift/mask spreading (4-5 ops per column);
    4+ fall back to the per-bit form."""
    if len(normalized) == 2:
        a = _spread(normalized[0], _SPREAD2)
        b = _spread(normalized[1], _SPREAD2)
        return a.bitwiseOR(F.shiftleft(b, 1))
    if len(normalized) == 3:
        a = _spread(normalized[0], _SPREAD3)
        b = _spread(normalized[1], _SPREAD3)
        c = _spread(normalized[2], _SPREAD3)
        return a.bitwiseOR(F.shiftleft(b, 1)).bitwiseOR(F.shiftleft(c, 2))
    if len(normalized) >= 4:
        return _interleave_generic(normalized)
    raise ValueError("zorder_code interleaves 2 or more columns")


def with_zorder(df: DataFrame, cols: list[str], out_col: str = "__zorder") -> DataFrame:
    """Attach the Morton code of ``cols`` (auto min/max-normalized).

    The per-column min/max come from ONE tiny aggregate joined back as a
    broadcast one-row cross join — the stats never route through the
    driver, so this composes inside any lazy plan."""
    if len(cols) < 2:
        raise ValueError("z-ordering takes at least 2 columns")
    stats = df.agg(
        *[F.min(c).alias(f"__mn_{c}") for c in cols],
        *[F.max(c).alias(f"__mx_{c}") for c in cols],
    )
    joined = df.crossJoin(F.broadcast(stats))
    normalized = [
        _normalize(F.col(c), F.col(f"__mn_{c}"), F.col(f"__mx_{c}")) for c in cols
    ]
    drop = [f"__mn_{c}" for c in cols] + [f"__mx_{c}" for c in cols]
    return joined.withColumn(out_col, zorder_code(normalized)).drop(*drop)
