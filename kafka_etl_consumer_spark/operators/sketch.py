"""Sketch operators: approximate distinct counting with deterministic,
cross-engine-verifiable results.

``theta_distinct`` is the fixed-threshold θ-sketch idea (the KMV family):
hash every value uniformly into [0, 2⁶⁰); keep only hashes below
2⁶⁰/scale; then ``distinct(kept) × scale`` estimates the true distinct
count with relative error ≈ 1/√kept. Because the hash is the engine's
deterministic md5-based hash64 (functions/hashing.py), the estimate is
bit-reproducible in DuckDB — an approximate algorithm with an EXACT oracle.

Scale story vs exact countDistinct: the filter drops (scale-1)/scale of the
data BEFORE the distinct's shuffle — at scale=256, the distinct shuffle
carries ~0.4% of the values. Spark's built-in approx_count_distinct (HLL)
is the production default where cross-run determinism isn't contractual;
this operator is for pipelines that must reproduce counts exactly across
engines/runs (audits, incremental dedup accounting).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.functions.hashing import hash64

_HASH_SPACE = 1 << 60  # hash64 yields 60-bit values


def theta_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    scale: int = 256,
) -> DataFrame:
    """Per-group approximate distinct count of ``value_col``.

    Returns group cols + ``est_distinct`` (double). ``scale``: sampling
    factor; kept-set size ≈ distinct/scale, relative error ≈ √(scale/distinct).
    """
    threshold = _HASH_SPACE // scale
    h = hash64(F.col(value_col).cast("string"))
    kept = df.filter(h < threshold)
    agg = F.countDistinct(value_col).cast("double") * float(scale)
    if group_cols:
        return kept.groupBy(*group_cols).agg(agg.alias("est_distinct"))
    return kept.agg(agg.alias("est_distinct"))


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: list[float],
    bins: int = 1000,
) -> DataFrame:
    """Mergeable approximate quantiles via a fixed-width histogram — the
    deterministic scale path exact ``percentile`` defers to (stats_agg's
    docstring): exact percentile buffers every group value; this sketches
    the distribution in ``bins`` counters with error ≤ one bin width, is
    mergeable across partitions/batches (counters add), and — unlike
    t-digest/approx_percentile — is bit-reproducible cross-engine, so it
    carries an EXACT oracle.

    Estimate: linear interpolation inside the bin where the running count
    crosses q·N (the textbook grouped-data quantile formula).

    Returns ONE row: (n, q_<pct> ... one column per requested quantile).

    Scale shape: pass 1 is a min/max aggregate (one row, crossJoin-broadcast
    back — no driver collect); pass 2 is a ``bins``-key hash-agg whose
    partial counters collapse map-side; the cumulative scan runs over the
    ``bins``-row table (constant, independent of data size).
    """
    if not quantiles:
        raise ValueError("need at least one quantile")
    from pyspark.sql import Window

    v = F.col(value_col).cast("double")
    mm = df.agg(
        F.min(v).alias("__lo"), F.max(v).alias("__hi"), F.count(v).alias("__n")
    )
    width = (F.col("__hi") - F.col("__lo")) / bins
    bin_idx = F.least(
        F.floor((v - F.col("__lo")) / width).cast("int"), F.lit(bins - 1)
    )
    counts = (
        df.crossJoin(F.broadcast(mm))
        .select(bin_idx.alias("__bin"), "__lo", "__hi", "__n")
        .groupBy("__bin", "__lo", "__hi", "__n")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w = Window.orderBy("__bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "*",
        (F.sum("__c").over(w) - F.col("__c")).alias("__before"),
        ((F.col("__hi") - F.col("__lo")) / bins).alias("__w"),
    )
    aggs = [F.first("__n").cast("bigint").alias("n")]
    for q in quantiles:
        target = F.lit(q) * F.col("__n")
        est = (
            F.col("__lo")
            + (F.col("__bin") + (target - F.col("__before")) / F.col("__c"))
            * F.col("__w")
        )
        hit = F.when(
            (F.col("__before") < target) & (target <= F.col("__before") + F.col("__c")),
            est,
        )
        name = f"q_{str(q).replace('.', '_')}"
        aggs.append(F.round(F.max(hit), 6).alias(name))
    return cum.agg(*aggs)


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    m: int = 64,
) -> DataFrame:
    """Deterministic HyperLogLog distinct estimate (Flajolet et al. 2007),
    register-exact across engines.

    Spark's built-in ``approx_count_distinct`` IS HLL but its xxhash64
    register state isn't reproducible in another engine; this variant runs
    the identical algorithm over the md5-based :func:`hash64` so every
    register value — and therefore the estimate — has an exact DuckDB
    oracle (the point of this module; see ``theta_distinct``).

    Layout of the 60-bit hash: low ``log2(m)`` bits pick the register, the
    remaining ``54`` bits (for m=64) feed ρ = 1 + leading-zero count,
    computed portably as the first-'1' position of the zero-padded binary
    string (``bin``/``lpad``/``instr`` exist with identical semantics in
    Spark SQL and DuckDB — no float log2, whose ulp could flip a register).
    Small-range correction: linear counting when E <= 2.5m and empty
    registers exist, exactly per the paper.

    Scale shape: ONE hash-agg with ``m``-bounded keys per group (max ρ per
    register, partials collapse map-side — registers are where HLL beats
    the θ-sketch's kept-VALUE distinct at extreme cardinalities), then an
    ``m``-row-per-group rollup. State is m·6 bits/group and registers
    MERGE by max, so the sketch maintains incrementally across batches.
    """
    return hll_estimate_from_registers(
        hll_registers(df, value_col, group_cols, m), group_cols, m
    )


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    m: int = 64,
) -> DataFrame:
    """The HLL register STATE: (group cols..., __reg, __mrho) — one row
    per present register. Exposed separately from the estimate because
    registers are the MERGEABLE artifact: registers from disjoint batches
    combine by ``max`` per register (see :func:`hll_merge_registers`), so
    a table of them maintains incrementally — per micro-batch, per day,
    per partition — and the estimate is recomputed from state in O(m)
    whenever asked."""
    import math

    if m & (m - 1) or m < 16:
        raise ValueError(f"m must be a power of two >= 16, got {m}")
    p = int(math.log2(m))
    suffix_bits = 60 - p
    gcols = list(group_cols or [])
    # NULLs never count toward a distinct estimate (count(DISTINCT x)
    # semantics); without this filter the NULL hash would become a phantom
    # NULL-keyed register row inflating __present and skewing the
    # linear-counting correction.
    df = df.filter(F.col(value_col).isNotNull())
    h = hash64(F.col(value_col).cast("string"))
    reg = (h % m).alias("__reg")
    # bit shift, not division: h exceeds 2^53, double arithmetic would
    # corrupt the suffix (and the oracle's integer // would not)
    suffix = F.shiftright(h, p)
    rho = F.when(suffix == 0, F.lit(suffix_bits + 1)).otherwise(
        F.instr(F.lpad(F.bin(suffix), suffix_bits, "0"), "1")
    )
    return (
        df.select(*gcols, reg, rho.alias("__rho"))
        .groupBy(*gcols, "__reg")
        .agg(F.max("__rho").alias("__mrho"))
    )


def hll_merge_registers(
    a: DataFrame, b: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Union two register tables into one: max per (group, register).
    Associative and commutative — merge order never matters, which is
    what makes incremental/streaming maintenance exact."""
    gcols = list(group_cols or [])
    return (
        a.unionByName(b)
        .groupBy(*gcols, "__reg")
        .agg(F.max("__mrho").alias("__mrho"))
    )


def hll_estimate_from_registers(
    regs: DataFrame, group_cols: list[str] | None = None, m: int = 64
) -> DataFrame:
    """(group cols..., hll_estimate) from a register table — the paper's
    harmonic-mean estimate with the small-range linear-counting
    correction; see :func:`hll_distinct` for the full algorithm notes."""
    # the paper's alpha_m: closed form for m >= 128, tabulated below that
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    gcols = list(group_cols or [])
    sums = regs.groupBy(*gcols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("__mrho"))).alias("__s"),
        F.count(F.lit(1)).alias("__present"),
    )
    zeros = F.lit(m) - F.col("__present")
    raw = F.lit(alpha * m * m) / (F.col("__s") + zeros.cast("double"))
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return sums.select(*gcols, F.round(est, 6).alias("hll_estimate"))


def cms_estimate(
    df: DataFrame,
    col: str,
    candidates: DataFrame,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch frequency estimation: ``depth × width`` counters
    (here 4×256 = 1 KiB of state regardless of cardinality), estimate =
    min over rows of the hashed-cell counter. Always >= the true count
    (collisions only add). Like everything in this module the hashes are
    md5-derived, so the sketch — an approximate structure — still has an
    exact DuckDB oracle.

    ``candidates`` must carry a column named like ``col`` (CMS can answer
    point queries only; pair with a candidate stream — e.g. the exact
    vocabulary cut or last batch's heavy hitters — for top-k).

    Returns candidates + ``cms_est``.

    Scale shape: counter build is ONE hash-agg over (row, cell) pairs
    (depth rows per value, map-side collapse, ≤ depth×width result rows —
    constant); counters broadcast to the candidate probe. Counters from
    disjoint batches ADD (:func:`cms_merge_counters`), so the sketch
    maintains incrementally — streaming twin in tests/test_stream_sketches.py.
    """
    counters = cms_counters(df, col, depth, width)
    return cms_estimate_from_counters(candidates, counters, col, depth, width)


def _cms_cells(col: str, depth: int, width: int):
    cell = lambda j: (  # noqa: E731
        hash64(F.concat(F.lit(f"cms-{j}:"), F.col(col))) % width
    ).alias("__cell")
    return [F.struct(F.lit(j).alias("__j"), cell(j)) for j in range(depth)]


def cms_counters(
    df: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """The mergeable CMS state: (__j, __cell, __c) counter rows (≤
    depth×width of them regardless of input size)."""
    rows = _cms_cells(col, depth, width)
    pairs = df.select(F.explode(F.array(*rows)).alias("__s")).select(
        "__s.__j", "__s.__cell"
    )
    return pairs.groupBy("__j", "__cell").agg(F.count(F.lit(1)).alias("__c"))


def cms_merge_counters(a: DataFrame, b: DataFrame) -> DataFrame:
    """Counters from disjoint row sets ADD per cell — associative and
    commutative, the streaming/incremental maintenance contract."""
    return (
        a.unionByName(b)
        .groupBy("__j", "__cell")
        .agg(F.sum("__c").alias("__c"))
    )


def cms_estimate_from_counters(
    candidates: DataFrame,
    counters: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """candidates + ``cms_est`` from a (possibly merged) counter table."""
    rows = _cms_cells(col, depth, width)
    probe = candidates.select(
        "*", F.explode(F.array(*rows)).alias("__s")
    ).select("*", "__s.__j", "__s.__cell").drop("__s")
    return (
        probe.join(F.broadcast(counters), ["__j", "__cell"])
        .groupBy(*candidates.columns)
        .agg(F.min("__c").cast("bigint").alias("cms_est"))
    )


def bloom_bits(df: DataFrame, col: str, m: int = 4096, k: int = 3) -> DataFrame:
    """Build a Bloom filter as a DataFrame of set bit positions (one row
    per DISTINCT set bit, <= m rows total): k md5-derived hash positions
    per value. Deterministic like every sketch here, so membership results
    have exact oracles.

    The bit-set stays a DataFrame (broadcastable at any m) — no driver
    collect, and bit-sets from disjoint batches UNION to the combined
    filter (:func:`bloom_merge_bits`; streaming twin in
    tests/test_stream_sketches.py).
    """
    pos = [
        (hash64(F.concat(F.lit(f"bloom-{j}:"), F.col(col))) % m).alias("bit")
        for j in range(k)
    ]
    return (
        df.select(F.explode(F.array(*pos)).alias("bit")).distinct()
    )


def bloom_merge_bits(a: DataFrame, b: DataFrame) -> DataFrame:
    """Bit-sets from disjoint row sets UNION — the Bloom merge law."""
    return a.unionByName(b).distinct()


def bloom_might_contain(
    queries: DataFrame, col: str, bits: DataFrame, m: int = 4096, k: int = 3
) -> DataFrame:
    """queries + ``bloom_hit`` (true iff ALL k bit positions are set — may
    false-positive, never false-negative). The probe is a broadcast join on
    the bit position + a count == k check; the query side never shuffles.
    """
    pos = [
        (hash64(F.concat(F.lit(f"bloom-{j}:"), F.col(col))) % m).alias("bit")
        for j in range(k)
    ]
    probe = queries.select("*", F.explode(F.array(*pos)).alias("bit"))
    hit = F.lit(1).alias("__hit")
    return (
        probe.join(F.broadcast(bits.select("bit", hit)), "bit", "left")
        .groupBy(*queries.columns)
        .agg((F.count("__hit") == k).alias("bloom_hit"))
    )


def theta_kept_keys(df: DataFrame, value_col: str, scale: int = 256) -> DataFrame:
    """The theta sketch's MERGEABLE state: the distinct kept keys
    (hash < space/scale) as a one-column frame named ``key``.

    Union-merge with :func:`theta_merge_kept`; estimate with
    :func:`theta_estimate_from_kept`; set algebra (union/intersect
    estimates, as in the ``sketch_theta_set_ops`` query) works directly
    on kept-key frames because every sketch keeps the SAME hash region.
    """
    threshold = _HASH_SPACE // scale
    h = hash64(F.col(value_col).cast("string"))
    return (
        df.filter(h < threshold)
        .select(F.col(value_col).cast("string").alias("key"))
        .distinct()
    )


def theta_merge_kept(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union-merge two kept-key states (same scale required)."""
    return a.unionByName(b).distinct()


def theta_estimate_from_kept(kept: DataFrame, scale: int = 256) -> DataFrame:
    """Distinct estimate from an accumulated kept-key state."""
    return kept.agg(
        (F.countDistinct("key").cast("double") * float(scale)).alias(
            "est_distinct"
        )
    )
