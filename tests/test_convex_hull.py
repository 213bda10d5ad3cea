"""Distributed QuickHull (operators/spatial.convex_hull).

The DuckDB gate replays the identical recursion; these tests pin the
GEOMETRY against an independent algorithm (Andrew's monotone chain)
plus the degenerate-input dialect the docstring promises.
"""

from __future__ import annotations

import pytest

from osm2gtfs_spark.operators.spatial import convex_hull


def _monotone_chain(pts: list[tuple[int, float, float]]) -> set[int]:
    """Independent reference: strict-turn monotone chain over (key, x, y)
    — collinear points interior to an edge are NOT vertices, matching
    the operator's strict cross > 0 dialect."""
    pts = sorted(pts, key=lambda p: (p[1], p[2], p[0]))
    if len(pts) <= 2:
        return {p[0] for p in pts}

    def cross(o, a, b):
        return (a[1] - o[1]) * (b[2] - o[2]) - (a[2] - o[2]) * (b[1] - o[1])

    def half(seq):
        out = []
        for p in seq:
            while len(out) >= 2 and cross(out[-2], out[-1], p) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(list(reversed(pts)))
    return {p[0] for p in lower[:-1]} | {p[0] for p in upper[:-1]}


def _run(spark, rows):
    df = spark.createDataFrame(rows, "nationkey long, stop_key long, lat double, lon double")
    got = convex_hull(df)
    by_grp: dict[int, set[int]] = {}
    for r in got.collect():
        by_grp.setdefault(r.nationkey, set()).add(r.stop_key)
    return by_grp


def test_hull_matches_monotone_chain(spark):
    """Pseudo-random scatter in two groups: QuickHull vertex set ==
    monotone-chain vertex set, per group."""
    rows = []
    for g in (0, 1):
        for k in range(80):
            lat = ((k * 7919 + g * 131) % 1700) / 10.0 - 85.0
            lon = ((k * 104729 + g * 977) % 3400) / 10.0 - 170.0
            rows.append((g, k + g * 1000, lat, lon))
    got = _run(spark, rows)
    for g in (0, 1):
        pts = [(k, lon, lat) for gg, k, lat, lon in rows if gg == g]
        assert got[g] == _monotone_chain(pts), f"group {g}"


def test_hull_grid_is_four_corners(spark):
    """Filled integer grid: every edge-interior point is collinear on a
    hull edge and must be excluded — hull is exactly the 4 corners."""
    rows = [
        (0, 10 * i + j, float(i), float(j)) for i in range(5) for j in range(5)
    ]
    got = _run(spark, rows)
    assert got[0] == {0, 4, 40, 44}


def test_hull_degenerate_groups(spark):
    """Single point → itself; two points → both; collinear line → the
    two extremes only."""
    rows = (
        [(0, 1, 3.0, 4.0)]
        + [(1, 10, 0.0, 0.0), (1, 11, 1.0, 1.0)]
        + [(2, 20 + k, float(k), 2.0 * k) for k in range(6)]
    )
    got = _run(spark, rows)
    assert got[0] == {1}
    assert got[1] == {10, 11}
    assert got[2] == {20, 25}


def test_hull_nonconvergence_guard(spark):
    rows = [(0, k, float(k % 7), float(k % 11)) for k in range(40)]
    df = spark.createDataFrame(rows, "nationkey long, stop_key long, lat double, lon double")
    with pytest.raises(RuntimeError, match="converge"):
        convex_hull(df, max_iters=1)
