"""Embedding-column maintenance operators (array<float>).

``quantize_int8``: per-dimension min/max (affine) int8 quantization — the
standard trick for shrinking an embedding store 4× before ANN serving.

Scale design (100 TB): the stats pass is ``posexplode`` → ``groupBy(dim)``
min/max. posexplode is a narrow map and the aggregate has map-side partial
combine, so the shuffle carries only d rows PER TASK (d≈64-4096), not d×N.
The d-row stats table collapses to ONE row of aligned arrays and is
broadcast back; the quantize pass is then a pure per-row projection
(``zip_with``/``arrays_zip`` + ``transform``, whole-stage codegen). Two
corpus scans total, zero corpus shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, q_sum, q_min, q_max, mae) — per-vector summary of the int8
    quantization plus its mean-absolute reconstruction error.

    q[i] = round((x[i]-mn[i]) / (mx[i]-mn[i]) * 255) - 128 (0 when the
    dimension is constant); mae = mean |dequant(q[i]) - x[i]|. Scalars
    only, so the result is hashable cross-engine (rounded to 6 d.p.).
    """
    v = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v"))

    dims = v.select(F.posexplode("__v").alias("i", "x"))
    stats = dims.groupBy("i").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    # d rows -> one row of index-aligned arrays (array_sort on struct(i) keys)
    packed = stats.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "mn", "mx"))), lambda s: s.mn
        ).alias("__mns"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "mn", "mx"))), lambda s: s.mx
        ).alias("__mxs"),
    )

    z = v.crossJoin(F.broadcast(packed))
    # per-element structs (x, mn, mx) -> quantized value
    trip = F.arrays_zip(
        F.col("__v").alias("x"), F.col("__mns").alias("mn"), F.col("__mxs").alias("mx")
    )
    q = F.transform(
        trip,
        lambda t: F.when(
            t.mx > t.mn,
            F.round((t.x - t.mn) / (t.mx - t.mn) * 255, 0).cast("long") - 128,
        ).otherwise(F.lit(0)),
    )
    err = F.transform(
        F.arrays_zip(trip.alias("t"), q.alias("qv")),
        lambda p: F.when(
            p.t.mx > p.t.mn,
            F.abs((p.qv + 128) / 255.0 * (p.t.mx - p.t.mn) + p.t.mn - p.t.x),
        ).otherwise(F.lit(0.0)),  # constant dim dequantizes to mn == x exactly
    )
    n = F.size(F.col("__v"))
    return z.select(
        F.col(id_col),
        F.aggregate(q, F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
        F.array_min(q).alias("q_min"),
        F.array_max(q).alias("q_max"),
        F.round(
            F.aggregate(err, F.lit(0.0), lambda a, x: a + x) / n, 6
        ).alias("mae"),
    )
