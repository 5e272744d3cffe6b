"""Property tests for the batch-45 rank statistics' GRID formulas.

stats_kendall_tau_b and ts_pettitt_changepoint never materialize row
pairs: tau-b comes from the (x, y) count-cell grid and Pettitt's U_t
from midranks (2*cumrank - t*(n+1)). These tests prove the algebraic
identities those plans rely on against independent brute-force pair
enumeration in plain Python (no Spark, no DuckDB — so a shared engine
bug cannot self-confirm), under hypothesis-driven tie-heavy inputs.
"""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

# small domains => heavy ties, the regime where naive rank formulas break
xy_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-3, max_value=3),
        st.integers(min_value=0, max_value=4),
    ),
    min_size=2,
    max_size=60,
)

series_strategy = st.lists(
    st.integers(min_value=0, max_value=6), min_size=2, max_size=50
)


def _brute_tau_b(pts: list[tuple[int, int]]) -> tuple[int, int, float | None]:
    conc = disc = tx = ty = 0
    n = len(pts)
    for i in range(n):
        for j in range(i + 1, n):
            dx = pts[j][0] - pts[i][0]
            dy = pts[j][1] - pts[i][1]
            if dx == 0 and dy == 0:
                continue
            if dx == 0:
                tx += 1
            elif dy == 0:
                ty += 1
            elif (dx > 0) == (dy > 0):
                conc += 1
            else:
                disc += 1
    n0 = n * (n - 1) // 2
    # n1/n2 count ALL pairs tied on x (resp. y), including both-tied
    n1 = sum(c * (c - 1) // 2 for c in Counter(x for x, _ in pts).values())
    n2 = sum(c * (c - 1) // 2 for c in Counter(y for _, y in pts).values())
    den = math.sqrt((n0 - n1) * (n0 - n2))
    return conc, disc, (conc - disc) / den if den else None


def _grid_tau_b(pts: list[tuple[int, int]]) -> tuple[int, int, float | None]:
    """The exact arithmetic stats_kendall_tau_b's plan performs, on the
    count-cell grid instead of row pairs."""
    cell = Counter(pts)
    items = list(cell.items())
    conc = disc = 0
    for (xa, ya), ca in items:
        for (xb, yb), cb in items:
            if xb > xa:
                if yb > ya:
                    conc += ca * cb
                elif yb < ya:
                    disc += ca * cb
    n = len(pts)
    n0 = n * (n - 1) / 2.0
    n1 = sum(c * (c - 1) / 2.0 for c in Counter(x for x, _ in pts).values())
    n2 = sum(c * (c - 1) / 2.0 for c in Counter(y for _, y in pts).values())
    den = math.sqrt((n0 - n1) * (n0 - n2))
    return conc, disc, (conc - disc) / den if den else None


@settings(max_examples=200)
@given(xy_strategy)
def test_kendall_grid_equals_pairwise(pts):
    bc, bd, bt = _brute_tau_b(pts)
    gc, gd, gt = _grid_tau_b(pts)
    assert (bc, bd) == (gc, gd)
    if bt is None or gt is None:
        assert bt is None and gt is None
    else:
        assert math.isclose(bt, gt, rel_tol=0, abs_tol=1e-12)


def _brute_pettitt_u(xs: list[int]) -> list[int]:
    """U_t = sum_{i<=t} sum_{j>t} sgn(x_j - x_i) for t = 1..n-1 (1-based)."""
    n = len(xs)
    out = []
    for t in range(1, n):
        u = 0
        for i in range(t):
            for j in range(t, n):
                u += (xs[j] > xs[i]) - (xs[j] < xs[i])
        out.append(u)
    return out


def _midrank_pettitt_u(xs: list[int]) -> list[float]:
    """The plan's formula: U_t = t*(n+1) - 2*cumrank_t, with midranks.

    (Sign convention: sum sgn(x_j - x_i) over i<=t, j>t equals
    t*(n+1) - 2*sum_{i<=t} r_i — large early ranks push U negative.)
    """
    n = len(xs)
    order = Counter(xs)
    # midrank per value from cumulative counts
    rank = {}
    below = 0
    for v in sorted(order):
        c = order[v]
        rank[v] = below + (c + 1) / 2.0
        below += c
    cum = 0.0
    out = []
    for t, v in enumerate(xs[:-1], start=1):
        cum += rank[v]
        out.append(t * (n + 1) - 2 * cum)
    return out


@settings(max_examples=200)
@given(series_strategy)
def test_pettitt_midrank_equals_pairwise(xs):
    brute = _brute_pettitt_u(xs)
    mid = _midrank_pettitt_u(xs)
    assert len(brute) == len(mid)
    for b, m in zip(brute, mid):
        assert math.isclose(b, m, rel_tol=0, abs_tol=1e-9), (xs, brute, mid)


def test_pettitt_constant_series_is_null_signal():
    xs = [3] * 10
    assert all(u == 0 for u in _brute_pettitt_u(xs))
    assert all(abs(u) < 1e-12 for u in _midrank_pettitt_u(xs))
