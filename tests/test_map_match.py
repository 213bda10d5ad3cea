"""Monotone map-matching (operators/spatial.map_match_polyline).

The recursive-CTE gate replays the greedy recursion value-exactly;
these pin the semantic properties the oracle can't state.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm2gtfs_spark.operators.spatial import map_match_polyline


def _mk_segments(spark, shape_id, verts):
    """verts: [(lat, lon), ...] -> segment rows with integer chainage."""
    import math

    rows, chain = [], 0
    for i, (a, b) in enumerate(zip(verts, verts[1:])):
        step = math.floor(math.hypot(b[1] - a[1], b[0] - a[0]) * 1e6)
        rows.append((shape_id, i, a[0], a[1], b[0], b[1], chain, step))
        chain += step
    return spark.createDataFrame(
        rows,
        "shape_id long, seg_id long, lat1 double, lon1 double, "
        "lat2 double, lon2 double, chain_start long, seg_len long",
    )


def _mk_obs(spark, trace_id, shape_id, pts):
    return spark.createDataFrame(
        [(trace_id, i, p[0], p[1], shape_id) for i, p in enumerate(pts)],
        "trace_id long, obs_seq long, lat double, lon double, shape_id long",
    )


def test_map_match_follows_route(spark):
    # straight horizontal route; pings progress along it with noise
    seg = _mk_segments(spark, 0, [(0.0, float(i)) for i in range(6)])
    obs = _mk_obs(
        spark, 0, 0, [(0.1, 0.4), (-0.05, 1.6), (0.02, 2.5), (0.0, 4.9)]
    )
    rows = sorted(
        (r.obs_seq, r.seg_id, r.p_scaled)
        for r in map_match_polyline(obs, seg).collect()
    )
    # each ping lands on the segment containing its lon
    assert [r[1] for r in rows] == [0, 1, 2, 4]
    # cursor positions are non-decreasing (forward-only)
    ps = [r[2] for r in rows]
    assert all(a <= b for a, b in zip(ps, ps[1:]))
    # positions approximate the ping's lon in scaled units
    assert abs(ps[0] - 400_000) <= 2
    assert abs(ps[3] - 4_900_000) <= 6


def test_map_match_monotone_overrides_nearest(spark):
    # second ping is geometrically nearest to a segment BEHIND the
    # cursor; the monotone constraint must re-clamp it forward
    seg = _mk_segments(spark, 0, [(0.0, 0.0), (0.0, 1.0), (0.0, 2.0)])
    obs = _mk_obs(spark, 0, 0, [(0.0, 1.5), (0.0, 0.2)])
    rows = {r.obs_seq: r for r in map_match_polyline(obs, seg).collect()}
    assert rows[0].seg_id == 1
    # nearest point to (0, 0.2) is lon 0.2 on seg 0 — but cursor is at
    # 1.5e6, so the match clamps to the cursor position on seg 1
    assert rows[1].p_scaled >= rows[0].p_scaled
    assert rows[1].seg_id == 1


def test_map_match_multiple_traces_isolated(spark):
    seg0 = _mk_segments(spark, 0, [(0.0, 0.0), (0.0, 2.0)])
    seg1 = _mk_segments(spark, 1, [(5.0, 0.0), (5.0, 2.0)])
    seg = seg0.unionByName(seg1)
    obs = _mk_obs(spark, 0, 0, [(0.0, 0.5), (0.0, 1.5)]).unionByName(
        _mk_obs(spark, 1, 1, [(5.0, 1.0)])
    )
    out = map_match_polyline(obs, seg).collect()
    by_trace = {}
    for r in out:
        by_trace.setdefault(r.trace_id, []).append(r)
    assert len(by_trace[0]) == 2 and len(by_trace[1]) == 1
    assert abs(by_trace[1][0].p_scaled - 1_000_000) <= 2
