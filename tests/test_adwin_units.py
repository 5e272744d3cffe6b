"""Pure-python unit/property tests for the ADWIN exponential-histogram
helpers (no Spark): the streaming tests prove end-to-end parity; these
prove the INVARIANTS the monitor's state depends on, under
hypothesis-driven insert sequences."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_etl_consumer_spark.streaming.drift import adwin_insert, adwin_try_cut

values = st.lists(
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False), min_size=1, max_size=200
)


def _is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


@given(values, st.integers(min_value=1, max_value=6))
@settings(max_examples=100, deadline=None)
def test_insert_preserves_histogram_invariants(xs, max_buckets):
    sums: list = []
    counts: list = []
    for x in xs:
        adwin_insert(sums, counts, x, max_buckets)
        # counts are powers of two, non-increasing oldest -> newest
        assert all(_is_pow2(c) for c in counts)
        assert all(a >= b for a, b in zip(counts, counts[1:]))
        # at most max_buckets buckets per capacity level
        for cap in set(counts):
            assert counts.count(cap) <= max_buckets
    # nothing is lost by merging: totals are exact
    assert sum(counts) == len(xs)
    assert math.isclose(sum(sums), sum(xs), rel_tol=0, abs_tol=1e-9)


@given(values, st.integers(min_value=1, max_value=6))
@settings(max_examples=100, deadline=None)
def test_cut_only_drops_oldest_and_preserves_suffix(xs, max_buckets):
    sums: list = []
    counts: list = []
    for x in xs:
        adwin_insert(sums, counts, x, max_buckets)
    before = list(zip(sums, counts))
    dropped = adwin_try_cut(sums, counts, delta=0.002, value_range=1.0)
    # the surviving window is exactly a SUFFIX of the old bucket list
    assert dropped == len(before) - len(counts)
    assert list(zip(sums, counts)) == before[dropped:]
    # the newest bucket always survives
    assert len(counts) >= 1


def test_cut_fires_on_an_obvious_change():
    sums: list = []
    counts: list = []
    for x in [0.0] * 200 + [1.0] * 200:
        adwin_insert(sums, counts, x, 5)
    assert adwin_try_cut(sums, counts, delta=0.002, value_range=1.0) > 0
    width = sum(counts)
    mean = sum(sums) / width
    assert width < 400
    assert mean > 0.5  # pre-shift zeros were discarded


def test_cut_never_fires_on_constant_stream():
    sums: list = []
    counts: list = []
    for x in [0.5] * 300:
        adwin_insert(sums, counts, x, 5)
        assert adwin_try_cut(sums, counts, delta=0.002, value_range=1.0) == 0
    assert sum(counts) == 300
