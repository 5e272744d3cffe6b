"""Stream-stream joins — the streaming capability furthest beyond the
reference (which never joins anything): correlate two live streams with
bounded state.

Unbounded stream⋈stream would need infinite state (any future left row
could match any past right row). Spark bounds it with BOTH:
- watermarks on each side (how late either stream can be), and
- a time-range join condition (how far apart matching events can be).
State for a row is dropped once the other side's watermark passes beyond
its match window — state size ≈ rate × (watermark + tolerance), regardless
of total stream length. Shuffle is on the equi key, same as a batch join.

Outer variants emit the null-padded row only when the watermark proves no
match can arrive — expect delay, not absence."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    watermark: str = "10 minutes",
    tolerance: str = "15 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``on`` where ``right_ts`` lies within
    ``[left_ts - tolerance, left_ts + tolerance]``.

    ``left``/``right`` must have distinct column names apart from ``on``
    (rename upstream). ``how``: inner, left_outer, right_outer, full_outer
    (outer sides require the watermark+range bound — enforced by Spark)."""
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}") >= F.expr(f"l.{left_ts} - INTERVAL {tolerance}"))
        & (F.col(f"r.{right_ts}") <= F.expr(f"l.{left_ts} + INTERVAL {tolerance}"))
    )
    joined = l.join(r, cond, how)
    # drop the duplicate right-side key column (kept once from the left)
    return joined.drop(F.col(f"r.{on}"))
