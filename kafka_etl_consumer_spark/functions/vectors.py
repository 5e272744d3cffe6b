"""Vector (array<float/double>) column math, JVM-side.

All built on higher-order functions (``zip_with`` / ``aggregate``) so the
arithmetic stays inside whole-stage codegen — no Python, no UDF, no Arrow
round-trip. Accumulation is left-to-right with a 0.0 init, which is exactly
what DuckDB's ``list_reduce(list_transform(...))`` computes, so doubles match
bit-for-bit and the DuckDB oracle hash-compares cleanly.

At 100 TB: these are narrow per-row ops (no shuffle); cost scales linearly
and vectorizes in codegen. For very wide vectors (>4k dims) a Pandas UDF
with numpy BLAS may win — benchmarked at 64 dims the built-ins are faster
(no serialization).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def as_double(col: Column | str) -> Column:
    """Cast array<float> → array<double> so both engines do double math."""
    return _c(col).cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    prods = F.zip_with(as_double(a), as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    sq = F.transform(as_double(a), lambda x: x * x)
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
