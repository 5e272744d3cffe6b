"""Degenerate-statistic rot guard (VERDICT r8 item 4).

Round 8 shipped (and caught, twice) indicators that were degenerate BY
CONSTRUCTION: stats_cochran_q's first indicator saturated to a 0/0 at
sf0.1 and its second was identically 0 at every SF because the
above-own-median flag fixed the column margins — and the DuckDB oracle
happily agreed with the degenerate value, so cross-engine parity was
green the whole time. Parity cannot catch "both engines compute the
same constant"; only looking at the VALUE can.

This guard automates the sanity-print-the-statistic protocol: for every
stats-family query (``stats_*`` / ``ts_*``), at every test scale factor,
the result must carry SIGNAL in at least one double column — a cell
outside {NULL, NaN, +-Inf, 0.0, 1.0} (0 and 1 are the classic saturated
statistic / saturated p-value pair). A query whose every float output is
degenerate at some SF is either rotted or mis-designed for the fixture
data, and must be redesigned (like stats_cochran_q was) rather than
whitelisted silently.

The detector itself is negatively tested on a constructed degenerate
frame, so the guard cannot rot into a tautology.
"""

from __future__ import annotations

import math
import os

import pytest

from kafka_etl_consumer_spark.plans import QUERIES

SF_DIRS = [
    os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"),
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

STAT_NAMES = sorted(n for n in QUERIES if n.startswith(("stats_", "ts_")))

# query -> justification for carrying no non-degenerate double at SOME SF.
# Add entries only with a written reason the degeneracy is SEMANTIC — the
# correct answer happens to be a degenerate value on this fixture data —
# never as a shortcut past a rotted indicator.
WHITELIST: dict[str, str] = {
    # fixture user_ids are dense (0..N-1), so the even/odd variant split is
    # EXACTLY 50/50 at sf0.01/sf0.1 and chi2 = (n0-n1)^2/n = 0, p = 1 is the
    # correct no-mismatch verdict, not rot. The formula's signal is proven
    # at sf0.001, where an odd user count gives chi2 = 0.066667 (adjudicated
    # round 9; driver hash-verified against the oracle at sf0.01 besides).
    "stats_srm_check": "balanced fixture split: chi2=0/p=1 is the true value",
}


def _is_degenerate_cell(v: object) -> bool:
    if v is None:
        return True
    f = float(v)
    return math.isnan(f) or math.isinf(f) or f == 0.0 or f == 1.0


def _has_signal(rows, double_cols) -> bool:
    """True iff at least one double cell falls outside the degenerate set."""
    return any(
        not _is_degenerate_cell(row[c]) for row in rows for c in double_cols
    )


def _double_cols(df) -> list[str]:
    return [f.name for f in df.schema.fields if f.dataType.typeName() == "double"]


@pytest.mark.parametrize("name", STAT_NAMES)
def test_stat_query_carries_signal_at_every_sf(spark, name):
    signal_sfs = []
    for sf_dir in SF_DIRS:
        df = QUERIES[name](spark, sf_dir)
        cols = _double_cols(df)
        assert cols, f"{name}: no double column to carry the statistic"
        rows = df.collect()
        assert rows, f"{name}: empty result at {sf_dir}"
        if _has_signal(rows, cols):
            signal_sfs.append(sf_dir)
        else:
            assert name in WHITELIST, (
                f"{name}: every double column is degenerate "
                f"(NULL/NaN/Inf/0/1) in all {len(rows)} rows at {sf_dir} — "
                "the statistic has rotted or saturated; redesign the "
                "indicator (see stats_cochran_q, round 8) or whitelist "
                "with a written semantic justification"
            )
    # even a whitelisted query must prove its formula produces signal
    # SOMEWHERE — a query degenerate at every SF is untestable rot
    assert signal_sfs, (
        f"{name}: degenerate at every SF despite whitelist "
        f"({WHITELIST.get(name)}) — the indicator carries no evidence at all"
    )


def test_detector_flags_constructed_degenerate_frame(spark):
    """Negative control: a frame shaped like the round-8 cochran_q bug
    (statistic identically 0, p identically 1) must be flagged."""
    import pyspark.sql.functions as F

    bad = spark.range(3).select(
        F.lit(0.0).alias("q_stat"),
        F.lit(1.0).alias("p_value"),
        F.lit(None).cast("double").alias("z"),
        F.lit(float("inf")).alias("ratio"),
    )
    assert not _has_signal(bad.collect(), _double_cols(bad))
    good = spark.range(3).select(
        F.lit(0.0).alias("q_stat"), F.lit(0.42).alias("p_value")
    )
    assert _has_signal(good.collect(), _double_cols(good))
