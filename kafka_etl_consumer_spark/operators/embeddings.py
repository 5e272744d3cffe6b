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


def pca_top_component(
    df: DataFrame,
    dims: int,
    iters: int = 3,
    vec_col: str = "embedding",
    use_arrow: bool = True,
    use_gram: bool = True,
) -> DataFrame:
    """Top principal component of the (uncentered) embedding matrix via
    POWER ITERATION — no driver-side loop, no collect.

    ``use_gram=True`` (default, optimization r11): ONE data pass computes
    per-task partial Gram matrices G = Σ embₙembₙᵀ (d² doubles per task —
    4 KB·d²/64² — summed by one d²-row hash-agg), and the whole
    iteration runs on the reduced d×d grid in a single downstream task:
    C·v = G·v, Σ(emb⋅v)² = vᵀGv, Σ‖emb‖² = trace(G). The previous shape
    (one matvec data pass PER iteration, ``iters``+1 passes total)
    measured 1.9-6.8 s at sf0.1 — all per-stage scheduling latency on a
    4-pass chain of broadcast/agg micro-stages. For d where d² rows per
    task is too heavy (d ≳ 2048: 32 MB/task partial), pass
    ``use_gram=False`` for the per-iteration matvec shape, which never
    materializes d² anywhere; at d = 64 the Gram is 32 KB and strictly
    the better 100 TB plan (1 scan instead of 4, guide §1.2).

    ``use_arrow`` only affects the matvec (non-Gram) path: True computes
    each partition's partial as one numpy ``Mᵀ(Mv)`` per Arrow batch
    (measured 1.9x at sf0.1); False keeps the pure-codegen posexplode +
    hash-agg form.

    Cross-engine determinism (both paths): after each normalization the
    vector is ROUNDED to 9 decimals — float summation order differs
    between engines (and between Spark partials), but the noise (~1e-13
    relative) sits far below the rounding grid, so both engines
    re-synchronize on identical doubles before the next pass. The Gram
    path mirrors Spark's F.round exactly (HALF_UP over the shortest
    decimal repr — Decimal(repr), the BigDecimal.valueOf contract). The
    final sign is canonicalized (first component >= 0): power iteration
    converges to ±v.

    Returns ONE row: (explained_ratio, component: array<double> at the
    iteration's 9-decimal grid — callers round for display), where
    explained_ratio = Σ(emb⋅v)² / Σ‖emb‖² — the Rayleigh quotient over
    the total variance.
    """
    from kafka_etl_consumer_spark.functions.vectors import as_double, dot

    spark = df.sparkSession
    e = df.select(as_double(vec_col).alias("__e"))

    if use_gram:
        import numpy as np
        import pandas as pd
        from pyspark.sql import types as T

        gschema = T.StructType(
            [
                T.StructField("__i", T.IntegerType()),
                T.StructField("__x", T.DoubleType()),
            ]
        )

        def gram_partial(batches):
            acc = None
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                m = np.asarray(
                    [np.asarray(x, dtype=np.float64) for x in pdf["__e"]]
                )
                g = m.T @ m
                acc = g if acc is None else acc + g
            if acc is not None:
                flat = acc.ravel()
                yield pd.DataFrame(
                    {"__i": np.arange(flat.size, dtype="int32"), "__x": flat}
                )

        gram = (
            e.mapInPandas(gram_partial, gschema)
            .groupBy("__i")
            .agg(F.sum("__x").alias("__x"))
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__i", "__x"))),
                    lambda s: s["__x"],
                ).alias("__g")
            )
        )

        out_schema = T.StructType(
            [
                T.StructField("explained_ratio", T.DoubleType()),
                T.StructField("component", T.ArrayType(T.DoubleType())),
            ]
        )

        def solve(batches):
            from decimal import ROUND_HALF_UP, Decimal

            def r(x: float, d: int) -> float:
                return float(
                    Decimal(repr(float(x))).quantize(
                        Decimal(1).scaleb(-d), rounding=ROUND_HALF_UP
                    )
                )

            for pdf in batches:
                for gl in pdf["__g"]:
                    if gl is None or len(gl) != dims * dims:
                        continue  # empty input: emit nothing
                    g = np.asarray(gl, dtype=np.float64).reshape(dims, dims)
                    v = np.full(dims, 1.0 / float(dims) ** 0.5)
                    for _ in range(iters):
                        w = g @ v
                        nrm = float(np.sqrt((w * w).sum()))
                        v = np.array([r(x / nrm, 9) for x in w])
                    if v[0] < 0:
                        v = -v
                    num = float(v @ g @ v)
                    den = float(np.trace(g))
                    yield pd.DataFrame(
                        {
                            "explained_ratio": [r(num / den, 6)],
                            "component": [v.tolist()],
                        }
                    )

        return gram.mapInPandas(solve, out_schema)

    v_df = spark.range(1).select(
        F.array(*([F.lit(1.0 / float(dims) ** 0.5)] * dims)).alias("__v")
    )

    part_schema = None
    if use_arrow:
        import numpy as np
        import pandas as pd
        from pyspark.sql import types as T

        part_schema = T.StructType(
            [T.StructField("__wv", T.ArrayType(T.DoubleType()))]
        )

        def blas_partial(batches):
            acc = None
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                m = np.asarray(
                    [np.asarray(x, dtype=np.float64) for x in pdf["__e"]]
                )
                v = np.asarray(pdf["__v"].iloc[0], dtype=np.float64)
                w = m.T @ (m @ v)
                acc = w if acc is None else acc + w
            if acc is not None:
                yield pd.DataFrame({"__wv": [acc.tolist()]})

    for _ in range(iters):
        joined = e.crossJoin(F.broadcast(v_df))
        if use_arrow:
            w = (
                joined.mapInPandas(blas_partial, part_schema)
                .select(F.posexplode("__wv").alias("__d", "__x"))
                .groupBy("__d")
                .agg(F.sum("__x").alias("__w"))
            )
        else:
            rows = joined.select(
                F.posexplode("__e").alias("__d", "__val"),
                dot("__e", "__v").alias("__dot"),
            )
            w = rows.groupBy("__d").agg(
                F.sum(F.col("__val") * F.col("__dot")).alias("__w")
            )
        nrm = w.agg(F.sqrt(F.sum(F.col("__w") * F.col("__w"))).alias("__n"))
        v_df = (
            w.crossJoin(F.broadcast(nrm))
            .select("__d", F.round(F.col("__w") / F.col("__n"), 9).alias("__x"))
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__d", "__x"))),
                    lambda s: s["__x"],
                ).alias("__v")
            )
        )
    sign = F.when(F.element_at("__v", 1) < 0, -1.0).otherwise(1.0)
    v_df = v_df.select(
        F.transform("__v", lambda x: x * sign).alias("__v")
    )
    lam = e.crossJoin(F.broadcast(v_df)).agg(
        F.sum(F.pow(dot("__e", "__v"), 2)).alias("__num"),
        F.sum(dot("__e", "__e")).alias("__den"),
        F.first("__v").alias("__v"),
    )
    return lam.select(
        F.round(F.col("__num") / F.col("__den"), 6).alias("explained_ratio"),
        F.col("__v").alias("component"),
    )


def pq_assign(
    df: DataFrame,
    dims: int,
    subspaces: int = 8,
    codebook_size: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product-quantization code assignment: split each vector into
    ``subspaces`` contiguous subvectors and replace each with the id of
    its nearest codebook centroid — the compression layer vector stores
    put UNDER an IVF index (`ivf_ann_topk`): memory per vector drops from
    dims·4 bytes to ``subspaces`` code bytes, and distances against a
    query become table lookups (ADC).

    Codebooks here are SEEDED deterministically — centroid c of subspace
    s is the s-th subvector of the vector with ``id_col == c`` — so the
    assignment has an exact SQL oracle; production training would refine
    them with :func:`operators.similarity.kmeans_refine`'s Lloyd pass,
    which leaves this assignment plan untouched.

    Returns (id, subspace, code, sqerr): per-subspace squared
    reconstruction error, dist ROUNDED to 9 before the argmin in both
    engines so float summation-order ulp can't flip a near-tie (ties then
    break to the smallest code).

    Scale shape: the codebook is subspaces·codebook_size rows (broadcast
    always); assignment is a per-row codegen fold over each
    (vector, centroid) pair — narrow, no shuffle; downstream aggregations
    group on the bounded (subspace, code) key space.
    """
    from pyspark.sql import Window

    sub = dims // subspaces
    if sub * subspaces != dims:
        raise ValueError(f"dims {dims} not divisible by {subspaces} subspaces")
    from kafka_etl_consumer_spark.functions.vectors import as_double

    e = df.select(F.col(id_col), as_double(vec_col).alias("__e"))
    spark = df.sparkSession
    sdf = spark.range(subspaces).select(F.col("id").cast("int").alias("__s"))
    codebook = (
        e.filter(F.col(id_col) < codebook_size)
        .select(F.col(id_col).cast("int").alias("__code"), "__e")
        .crossJoin(sdf)
        .select(
            "__s",
            "__code",
            F.slice("__e", F.col("__s") * sub + 1, sub).alias("__cent"),
        )
    )
    dist = F.round(
        F.aggregate(
            F.zip_with(
                F.slice("__e", F.col("__s") * sub + 1, sub),
                F.col("__cent"),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        9,
    )
    w = Window.partitionBy(id_col, "__s").orderBy(F.col("__d"), F.col("__code"))
    return (
        e.crossJoin(F.broadcast(codebook))
        .select(F.col(id_col), "__s", "__code", dist.alias("__d"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col(id_col),
            F.col("__s").alias("subspace"),
            F.col("__code").alias("code"),
            F.col("__d").alias("sqerr"),
        )
    )
