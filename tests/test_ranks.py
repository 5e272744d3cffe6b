"""operators/ranks.py: count-grid tie-averaged ranks and grid median —
the rank-statistic family's scale substrate. Cross-checked against the
per-row window formulation they replace (which must stay bit-identical)
and percentile semantics."""

from __future__ import annotations

from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.operators.ranks import (
    grid_median,
    tie_avg_ranks,
    tie_term,
)


def _df(spark, rows):
    return spark.createDataFrame([Row(g=g, c=c, x=float(x)) for g, c, x in rows])


def test_tie_avg_ranks_matches_per_row_window(spark):
    rows = [
        ("a", 0, 1.0), ("a", 0, 2.0), ("a", 1, 2.0), ("a", 1, 2.0),
        ("a", 0, 5.0), ("b", 0, 7.0), ("b", 1, 7.0), ("b", 1, 9.0),
    ]
    df = _df(spark, rows)
    got = {
        (r.g, r.c, r.x): (r.cnt, r.t, r.avg_rank)
        for r in tie_avg_ranks(df, ["g"], "x", cohort_cols=["c"]).collect()
    }
    wr = Window.partitionBy("g").orderBy("x")
    wt = Window.partitionBy("g", "x")
    ref = df.select(
        "g", "c", "x",
        (F.rank().over(wr) + (F.count(F.lit(1)).over(wt) - 1) / 2.0).alias("ar"),
    ).collect()
    for r in ref:
        cnt, t, ar = got[(r.g, r.c, r.x)]
        assert ar == r.ar, (r, got)
    # cell counts reconstruct the multiset
    assert sum(v[0] for v in got.values()) == len(rows)


def test_tie_term_sums_t3_minus_t(spark):
    df = _df(spark, [("a", 0, 1.0), ("a", 1, 1.0), ("a", 0, 1.0), ("a", 0, 3.0)])
    rk = tie_avg_ranks(df, ["g"], "x", cohort_cols=["c"])
    ts3 = {r.g: r.ts3 for r in tie_term(rk, ["g"], "x").collect()}
    # t=3 at x=1 -> 24; t=1 at x=3 -> 0
    assert ts3 == {"a": 24}


def test_tie_avg_ranks_binned_bounds_grid(spark):
    rows = [("a", 0, float(i)) for i in range(100)]
    rk = tie_avg_ranks(_df(spark, rows), ["g"], "x", cohort_cols=["c"], num_bins=8)
    out = rk.collect()
    assert len(out) <= 8
    assert sum(r.cnt for r in out) == 100
    # ranks still average to (n+1)/2 over the multiset
    assert sum(r.cnt * r.avg_rank for r in out) == 100 * 101 / 2


def test_tie_avg_ranks_binned_constant_value(spark):
    rk = tie_avg_ranks(
        _df(spark, [("a", 0, 4.0)] * 5), ["g"], "x", cohort_cols=["c"], num_bins=8
    )
    out = rk.collect()
    assert len(out) == 1 and out[0].x == 4.0 and out[0].avg_rank == 3.0


def test_grid_median_matches_percentile(spark):
    # odd n, even n, heavy ties, two groups
    rows = (
        [("odd", 0, v) for v in (3, 1, 2, 9, 5)]
        + [("even", 0, v) for v in (4, 1, 3, 8)]
        + [("ties", 0, v) for v in (2, 2, 2, 7, 7)]
    )
    df = _df(spark, rows)
    got = {r.g: r.md for r in grid_median(df, ["g"], "x", out_col="md").collect()}
    want = {
        r.g: r.md
        for r in df.groupBy("g")
        .agg(F.percentile("x", F.lit(0.5)).alias("md"))
        .collect()
    }
    assert got == want  # exact doubles, not approx


def test_grid_median_single_value_group(spark):
    # k+2 exceeds n for a 1-row group: the upper middle must fall back
    # to the lower middle, not NULL
    df = _df(spark, [("solo", 0, 42.0)])
    got = grid_median(df, ["g"], "x", out_col="md").collect()
    assert got[0].md == 42.0


def test_grid_quantiles_match_percentile(spark):
    from kafka_etl_consumer_spark.operators.ranks import grid_quantiles

    rows = [("a", 0, v) for v in (5, 1, 9, 3, 7, 7, 2, 8)] + [
        ("b", 0, v) for v in (10, 20, 30)
    ] + [("solo", 0, 4)]
    df = _df(spark, rows)
    probs = [0.05, 0.25, 0.5, 0.9, 0.95]
    names = ["p05", "p25", "p50", "p90", "p95"]
    got = {
        r.g: [getattr(r, n) for n in names]
        for r in grid_quantiles(df, ["g"], "x", probs, names).collect()
    }
    want = {
        r.g: list(r.q)
        for r in df.groupBy("g")
        .agg(F.expr(f"percentile(x, array({','.join(map(str, probs))}))").alias("q"))
        .collect()
    }
    for g in want:
        for a, b in zip(got[g], want[g]):
            assert abs(a - b) < 1e-12, (g, got[g], want[g])


def test_binned_constant_range_keeps_nulls_null(spark):
    """NULL contract (ADVICE r5): in binned mode a NULL value must stay a
    distinct NULL cell even when the group's range is constant (hi == lo)
    — the constant-range branch used to coerce NULLs to lo, diverging
    from both the non-constant and the unbinned paths."""
    from pyspark.sql import Row

    from kafka_etl_consumer_spark.operators.ranks import tie_avg_ranks

    rows = [
        # group "c": constant range (all 5.0) plus NULLs
        Row(g="c", x=5.0), Row(g="c", x=5.0), Row(g="c", x=None),
        # group "v": varying range plus a NULL (the already-correct path)
        Row(g="v", x=1.0), Row(g="v", x=2.0), Row(g="v", x=None),
    ]
    df = spark.createDataFrame(rows)
    out = tie_avg_ranks(df, ["g"], "x", num_bins=4)
    cells = {(r["g"], r["x"], r["cnt"]) for r in out.collect()}
    # the constant group: one 5.0 cell of 2 and one NULL cell of 1 —
    # NOT a single coerced cell of 3
    assert ("c", 5.0, 2) in cells
    assert ("c", None, 1) in cells
    assert ("v", None, 1) in cells
