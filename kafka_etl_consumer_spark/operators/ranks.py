"""Tie-averaged ranks without a per-row sort — the scale substrate for
the rank-statistic family (Mann-Whitney U, Kruskal-Wallis H, Cliff's
delta, rank-formula ROC AUC).

The naive plan ranks every row with ``Window.partitionBy(group)
.orderBy(x)``: parallelism collapses to |groups| and each task sorts its
whole partition — terabytes per task at 100 TB. But tie-averaged ranks
are a pure function of VALUE-GROUPED COUNTS:

    avg_rank(x) = cum_count(<= x) - t(x) + (t(x) + 1) / 2

so the heavy lifting is ONE hash aggregate (map-side partial combine,
full parallelism) down to a (group, cohort, value) cell table, and the
only window runs over the per-group VALUE GRID — |distinct values| rows,
not |rows|. With ``num_bins`` set, values quantize to an equi-width grid
first and the window input is <= num_bins rows per group: a bounded grid
at any data size, the documented 100 TB path for this family
(VERDICT.md round 4 "binned ranks from bucket counts").

Exactness: ranks are half-integers and cell counts are integers, so
every downstream rank-sum (sum of cnt * avg_rank) is a sum of exactly
representable halves — identical to the per-row formulation bit for bit,
which is why the exact statistics queries switch to this shape WITHOUT
changing their DuckDB oracles.

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283 of mykidong/kafka-etl-consumer).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["tie_avg_ranks", "tie_term", "grid_median", "grid_quantiles"]


def tie_avg_ranks(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    cohort_cols: Sequence[str] = (),
    num_bins: int | None = None,
) -> DataFrame:
    """Per-(group, cohort, value) cell table with pooled tie-averaged
    ranks: columns ``group_cols + cohort_cols + [value_col, cnt, t,
    avg_rank]`` where ``cnt`` is the cell's row count, ``t`` the pooled
    (all-cohort) count at that value, and ``avg_rank`` the tie-averaged
    rank every row of the cell would carry under ``rank() + (peers-1)/2``
    within its group.

    ``num_bins``: quantize values to that many equi-width bins per group
    first (bin MIDPOINT replaces the value — a monotone injective map,
    so bin order == value order). Per-group [min, max] come from one
    broadcast aggregate; the formula ``least(B-1, floor((x-lo)/(hi-lo)
    *B))`` is spelled identically in the DuckDB oracles of the
    ``_binned`` queries so tie structure is cross-engine identical.

    Shuffle inventory: one hash agg to cells (+ one broadcast of the
    |groups|-row range table when binning), one exchange for the grid
    window — whose input is bounded by num_bins per group when binned.
    """
    groups = list(group_cols)
    cohorts = list(cohort_cols)
    if num_bins is not None:
        rng = df.groupBy(*groups).agg(
            F.min(value_col).alias("__lo"), F.max(value_col).alias("__hi")
        )
        lo, hi = F.col("__lo"), F.col("__hi")
        if groups:
            df = df.join(F.broadcast(rng), groups)
        else:
            df = df.crossJoin(F.broadcast(rng))
        b = F.least(
            F.lit(num_bins - 1),
            F.floor((F.col(value_col) - lo) / (hi - lo) * num_bins),
        )
        # NULL contract (both modes): a NULL value stays a distinct NULL
        # rank cell, as in the unbinned path. The explicit first branch
        # is load-bearing in BOTH the other branches' failure modes
        # (ADVICE r5, extended): the constant-range arm (hi == lo) never
        # inspects x, and in the varying arm Spark's least() SKIPS NULLs
        # — least(num_bins-1, floor(NULL)) = num_bins-1 — so without the
        # guard a NULL coerces to lo or to the TOP bin respectively.
        mid = (
            F.when(F.col(value_col).isNull(), F.lit(None))
            .when(hi == lo, lo)
            .otherwise(lo + (b + 0.5) * (hi - lo) / num_bins)
        )
        df = df.select(*groups, *cohorts, mid.alias(value_col))
    cell = df.groupBy(*groups, *cohorts, value_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    # default window frame with an ORDER BY is RANGE UNBOUNDED
    # PRECEDING..CURRENT ROW: the cumulative sum INCLUDES all tie peers
    # at the current value, which is exactly what the formula wants
    w_cum = Window.partitionBy(*groups).orderBy(value_col)
    w_tie = Window.partitionBy(*groups, value_col)
    t = F.sum("cnt").over(w_tie)
    cum = F.sum("cnt").over(w_cum)
    return cell.select(
        *groups,
        *cohorts,
        value_col,
        "cnt",
        t.alias("t"),
        (cum - t + (t + F.lit(1)) / 2.0).alias("avg_rank"),
    )


def tie_term(
    ranked: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str = "ts3",
) -> DataFrame:
    """Per-group tie-correction term ``sum(t^3 - t)`` over distinct
    values, from a :func:`tie_avg_ranks` result. Exact integer — both
    sigma corrections (MWU) and the H denominator (KW) consume it."""
    groups = list(group_cols)
    return (
        ranked.select(*groups, value_col, "t")
        .distinct()
        .groupBy(*groups)
        .agg(
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
            .cast("bigint")
            .alias(out_col)
        )
    )


def grid_median(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str = "median",
) -> DataFrame:
    """EXACT per-group interpolated median (``percentile(x, 0.5)``
    semantics: average of the two middle order statistics at even n)
    computed from the value-count grid instead of Spark's ``percentile``
    aggregate — which buffers every value of a group in one aggregation
    buffer, the same parallelism-collapse hazard as the per-row rank
    sort. Here the heavy step is the hash agg to (group, value) cells;
    the order statistics come from cumulative counts over the per-group
    value grid, and the interpolation replays percentile's own
    ``lower + (upper - lower) * frac`` arithmetic so the result is the
    identical double. NULL values are excluded, as percentile does."""
    groups = list(group_cols)
    df = df.filter(F.col(value_col).isNotNull())
    cell = df.groupBy(*groups, value_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    w_cum = Window.partitionBy(*groups).orderBy(value_col)
    w_all = Window.partitionBy(*groups)
    g = cell.select(
        *groups,
        F.col(value_col).alias("__x"),
        F.sum("__c").over(w_cum).alias("__cum"),
        F.sum("__c").over(w_all).alias("__n"),
    )
    # 0-indexed lower-middle order statistic; the cell whose cumulative
    # count first covers an index HOLDS that order statistic (a single
    # cell with multiplicity >= 2 can hold both middles)
    k = F.expr("(__n - 1) DIV 2")
    v1 = F.min(F.when(F.col("__cum") >= k + 1, F.col("__x")))
    v2 = F.min(F.when(F.col("__cum") >= k + 2, F.col("__x")))
    agg = g.groupBy(*groups).agg(
        v1.alias("__v1"), v2.alias("__v2"), F.max("__n").alias("__nn")
    )
    frac = F.when(F.col("__nn") % 2 == 0, F.lit(0.5)).otherwise(F.lit(0.0))
    # k+2 can exceed n (single-value group): the upper middle IS the
    # lower middle then, not NULL
    v2c = F.coalesce(F.col("__v2"), F.col("__v1"))
    return agg.select(
        *groups,
        (F.col("__v1") + (v2c - F.col("__v1")) * frac).alias(out_col),
    )


def grid_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    probs: Sequence[float],
    out_cols: Sequence[str],
) -> DataFrame:
    """EXACT per-group interpolated quantiles at several probabilities in
    ONE pass over the value-count grid — :func:`grid_median`
    generalized. Order statistics come from cumulative counts; the
    interpolation ``v_k + (v_{k+1} - v_k) * (p*(n-1) - k)`` is spelled
    exactly like DuckDB's ``quantile_cont`` (and the pos arithmetic like
    Spark's ``percentile``), so oracle-paired queries keep matching.
    Unlike the ``percentile`` aggregate there is no per-group value map
    living in one aggregation buffer — the heavy step is a fully
    parallel hash agg to (group, value) cells. NULLs are excluded,
    as percentile does."""
    groups = list(group_cols)
    df = df.filter(F.col(value_col).isNotNull())
    cell = df.groupBy(*groups, value_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    w_cum = Window.partitionBy(*groups).orderBy(value_col)
    w_all = Window.partitionBy(*groups)
    g = cell.select(
        *groups,
        F.col(value_col).alias("__x"),
        F.sum("__c").over(w_cum).alias("__cum"),
        F.sum("__c").over(w_all).alias("__n"),
    )
    aggs = []
    for p, name in zip(probs, out_cols):
        pos = F.lit(float(p)) * (F.col("__n") - 1).cast("double")
        k = F.floor(pos)
        aggs.append(
            F.min(F.when(F.col("__cum") >= k + 1, F.col("__x"))).alias(f"__v1_{name}")
        )
        aggs.append(
            F.min(F.when(F.col("__cum") >= k + 2, F.col("__x"))).alias(f"__v2_{name}")
        )
        aggs.append(F.max(pos - k).alias(f"__f_{name}"))  # constant per group
    agg = g.groupBy(*groups).agg(*aggs)
    outs = []
    for name in out_cols:
        v1 = F.col(f"__v1_{name}")
        v2 = F.coalesce(F.col(f"__v2_{name}"), v1)
        outs.append((v1 + (v2 - v1) * F.col(f"__f_{name}")).alias(name))
    return agg.select(*groups, *outs)
