"""Distributed Douglas-Peucker + chainage (operators/spatial).

The DuckDB gate replays the identical recursion; these pin the
geometry against an independent recursive implementation and the
DP tolerance guarantee the oracle can't state.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from osm2gtfs_spark.operators.spatial import polyline_chainage, simplify_polyline


def _py_dp(seqs: list[tuple[int, float, float]], eps: float) -> set[int]:
    """Independent reference: classic recursive Douglas-Peucker with
    the operator's dialect — perpendicular LINE distance, strict >,
    argmax tie-break on max seq."""
    pts = sorted(seqs)

    def rec(lo: int, hi: int, out: set[int]):
        a, b = pts[lo], pts[hi]
        best, best_i = -1.0, None
        len2 = (b[1] - a[1]) ** 2 + (b[2] - a[2]) ** 2
        for i in range(lo + 1, hi):
            p = pts[i]
            if len2 == 0:
                m = (p[1] - a[1]) ** 2 + (p[2] - a[2]) ** 2
            else:
                cr = (b[1] - a[1]) * (p[2] - a[2]) - (b[2] - a[2]) * (p[1] - a[1])
                m = cr * cr
            if m > best or (m == best and best_i is not None and i > best_i):
                best, best_i = m, i
        thresh = eps * eps * len2 if len2 != 0 else eps * eps
        if best_i is not None and best > thresh:
            rec(lo, best_i, out)
            rec(best_i, hi, out)
        else:
            out.add(pts[lo][0])
            out.add(pts[hi][0])

    out: set[int] = set()
    rec(0, len(pts) - 1, out)
    return out


@pytest.fixture(scope="module")
def shapes(spark):
    rows = []
    for g in (0, 1, 2):
        for i in range(60):
            lat = ((i * 7919 + g * 3571) % 1300) / 10.0 - 65.0
            lon = ((i * 104729 + g * 6007) % 2600) / 10.0 - 130.0
            rows.append((g, i, lat, lon))
    return spark.createDataFrame(rows, "shape_id long, seq long, lat double, lon double").cache()


def test_dp_matches_recursive_reference(shapes):
    eps = 30.0
    got: dict[int, set[int]] = {}
    for r in simplify_polyline(shapes, eps=eps).collect():
        got.setdefault(r.shape_id, set()).add(r.seq)
    rows = shapes.collect()
    for g in (0, 1, 2):
        pts = [(r.seq, r.lon, r.lat) for r in rows if r.shape_id == g]
        assert got[g] == _py_dp(pts, eps), f"shape {g}"


def test_dp_tolerance_guarantee(shapes):
    """Every dropped vertex lies within eps of the simplified chain's
    covering chord — the property DP promises."""
    eps = 30.0
    kept = {
        (r.shape_id, r.seq) for r in simplify_polyline(shapes, eps=eps).collect()
    }
    rows = sorted((r.shape_id, r.seq, r.lon, r.lat) for r in shapes.collect())
    by_shape: dict[int, list] = {}
    for g, i, x, y in rows:
        by_shape.setdefault(g, []).append((i, x, y))
    for g, pts in by_shape.items():
        anchors = [p for p in pts if (g, p[0]) in kept]
        for lo, hi in zip(anchors, anchors[1:]):
            len_ = math.hypot(hi[1] - lo[1], hi[2] - lo[2])
            for i, x, y in pts:
                if lo[0] < i < hi[0]:
                    cr = (hi[1] - lo[1]) * (y - lo[2]) - (hi[2] - lo[2]) * (x - lo[1])
                    assert abs(cr) / len_ <= eps + 1e-9


def test_dp_degenerates(spark):
    rows = (
        [(0, 0, 1.0, 1.0)]
        + [(1, 0, 0.0, 0.0), (1, 1, 5.0, 5.0)]
        + [(2, k, float(k), 2.0 * float(k)) for k in range(8)]  # straight line
    )
    df = spark.createDataFrame(rows, "shape_id long, seq long, lat double, lon double")
    got: dict[int, set[int]] = {}
    for r in simplify_polyline(df, eps=0.5).collect():
        got.setdefault(r.shape_id, set()).add(r.seq)
    assert got[0] == {0}
    assert got[1] == {0, 1}
    assert got[2] == {0, 7}  # collinear interior all dropped even at tiny eps


def test_dp_frontier_path_matches_kernel(shapes):
    """Forcing small_threshold=10 routes every polyline through the
    broadcast-frontier giant path; the kept set must be bit-identical
    to the applyInPandas kernel (the default at this size)."""
    eps = 30.0
    kernel = {
        (r.shape_id, r.seq) for r in simplify_polyline(shapes, eps=eps).collect()
    }
    frontier = {
        (r.shape_id, r.seq)
        for r in simplify_polyline(shapes, eps=eps, small_threshold=10).collect()
    }
    assert kernel == frontier


def test_dp_mixed_small_and_giant_groups(shapes):
    """small_threshold between the group sizes: shape 0 padded to 75
    vertices goes through the frontier, shapes 1-2 (60) through the
    kernel, and the union matches the all-kernel answer."""
    extra = shapes.sparkSession.createDataFrame(
        [
            (0, 60 + i, ((i * 31 + 7) % 1300) / 10.0 - 65.0, ((i * 57 + 11) % 2600) / 10.0 - 130.0)
            for i in range(15)
        ],
        "shape_id long, seq long, lat double, lon double",
    )
    df = shapes.unionByName(extra)
    eps = 30.0
    mixed = {
        (r.shape_id, r.seq)
        for r in simplify_polyline(df, eps=eps, small_threshold=70).collect()
    }
    all_kernel = {
        (r.shape_id, r.seq) for r in simplify_polyline(df, eps=eps).collect()
    }
    assert mixed == all_kernel


def test_chainage_monotone_and_total(shapes):
    out = polyline_chainage(shapes, int_scale=1_000_000)
    rows = sorted(
        ((r.shape_id, r.seq, r.lon, r.lat, r.chainage_scaled) for r in out.collect())
    )
    by_shape: dict[int, list] = {}
    for g, i, x, y, c in rows:
        by_shape.setdefault(g, []).append((i, x, y, c))
    for g, pts in by_shape.items():
        assert pts[0][3] == 0  # first vertex: zero chainage
        acc = 0
        prev = None
        for i, x, y, c in pts:
            if prev is not None:
                acc += math.floor(math.hypot(x - prev[0], y - prev[1]) * 1e6)
            assert c == acc  # running sum reproduced exactly
            prev = (x, y)


def test_chainage_double_dialect(shapes):
    out = polyline_chainage(shapes)
    first = (
        out.filter((F.col("shape_id") == 0) & (F.col("seq") == 0)).first().chainage
    )
    assert first == 0.0
    mono = out.groupBy("shape_id").agg(
        (F.max("chainage") >= F.min("chainage")).alias("ok")
    )
    assert all(r.ok for r in mono.collect())
