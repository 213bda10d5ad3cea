"""Round-5 geospatial operators: Morton keys, line rasterization,
hierarchical cell compaction.

The DuckDB gate (morton_cell_encode / polyline_cell_coverage /
cell_compact) enforces cross-engine value parity; these pin the
structural properties the oracle can't express — hierarchy-by-shift,
endpoint coverage, exact compaction round-trip.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm2gtfs_spark.functions.geo import cell_id, cell_parent, morton_key
from osm2gtfs_spark.operators.spatial import cell_compact, polyline_cell_coverage


@pytest.fixture(scope="module")
def pts(spark):
    rows = [
        (i, -80.0 + (i * 37) % 160 + 0.25, -170.0 + (i * 91) % 340 + 0.25)
        for i in range(200)
    ]
    return spark.createDataFrame(rows, "pid long, lat double, lon double").cache()


def test_morton_parent_is_shift(pts):
    """Z-order hierarchy: the key at a coarser resolution IS the fine
    key shifted by 2 bits per level — one column supports locality
    layout and prefix pruning simultaneously."""
    out = pts.select(
        morton_key("lat", "lon", 12).alias("m12"),
        morton_key("lat", "lon", 10).alias("m10"),
        morton_key("lat", "lon", 6).alias("m6"),
    )
    bad = out.filter(
        (F.shiftright("m12", 4) != F.col("m10"))
        | (F.shiftright("m12", 12) != F.col("m6"))
    ).count()
    assert bad == 0


def test_morton_preserves_cell_identity(pts):
    """Two points share a Morton key iff they share the grid cell (the
    key is a bijection of (ix, iy))."""
    out = pts.select(
        "pid", morton_key("lat", "lon", 9).alias("mz"), cell_id("lat", "lon", 9).alias("c")
    )
    r = out.agg(
        F.countDistinct("mz").alias("nm"),
        F.countDistinct("c").alias("nc"),
        F.countDistinct(F.struct("mz", "c")).alias("np"),
    ).first()
    # bijection on the observed data: |mz| == |c| == |(mz, c)| pairs
    assert r.nm == r.nc == r.np and r.nm > 1


def test_polyline_coverage_endpoints_and_degenerate(spark):
    """Sampled rasterization always covers both endpoint cells; a
    zero-length segment covers exactly its own cell; an axis-aligned
    segment covers every cell between its endpoints."""
    rows = [
        (1, 10.1, 20.1, 10.1, 20.1),     # degenerate point
        (2, 0.1, -10.0, 0.1, 10.0),      # axis-aligned west->east
        (3, -45.0, 100.0, 30.0, -120.0), # long diagonal
    ]
    seg = spark.createDataFrame(
        rows, "seg_id long, lat1 double, lon1 double, lat2 double, lon2 double"
    )
    res = 7
    cov = {
        (r.seg_id, r.cell_id)
        for r in polyline_cell_coverage(seg, res=res).collect()
    }
    ends = spark.createDataFrame(rows, "seg_id long, a1 double, o1 double, a2 double, o2 double")
    for latc, lonc in (("a1", "o1"), ("a2", "o2")):
        for r in ends.select("seg_id", cell_id(latc, lonc, res).alias("c")).collect():
            assert (r.seg_id, r.c) in cov, (r.seg_id, latc)
    assert sum(1 for s, _ in cov if s == 1) == 1
    # axis-aligned: lon -10..10 at res 7 (128 cols, 2.8125 deg each) ->
    # contiguous column range, all covered
    import math

    n = 2**res
    c1 = math.floor((-10.0 + 180.0) / 360.0 * n)
    c2 = math.floor((10.0 + 180.0) / 360.0 * n)
    row_iy = math.floor((0.1 + 90.0) / 180.0 * n)
    want_cols = {(res * 2**52 + ix * 2**26 + row_iy) for ix in range(c1, c2 + 1)}
    got_cols = {c for s, c in cov if s == 2}
    assert got_cols == want_cols


def test_cell_compact_roundtrip(spark):
    """Compaction invariant: expanding every compacted cell back to the
    fine resolution reproduces EXACTLY the occupied input set — nothing
    gained, nothing lost; and at least one promotion happened on a
    seeded complete quartet."""
    # seed: one complete res-5 quartet (shares a res-4 parent) + stragglers
    quartet = [(5, 2 * 10 + dx, 2 * 7 + dy) for dx in (0, 1) for dy in (0, 1)]
    strag = [(5, 30, 9), (5, 31, 11)]
    cells = [r * 2**52 + ix * 2**26 + iy for r, ix, iy in quartet + strag]
    df = spark.createDataFrame([(c,) for c in cells], "cell_id long")
    out = cell_compact(df, res_from=5, res_to=3).collect()
    assert any(r.cell_res < 5 for r in out), "quartet must promote"
    # expand back to res 5
    expanded = set()
    for r in out:
        c = r.cell_id - r.cell_res * 2**52
        ix, iy = c // 2**26, c % 2**26
        depth = 5 - r.cell_res
        for dx in range(2**depth):
            for dy in range(2**depth):
                expanded.add(
                    5 * 2**52 + (ix * 2**depth + dx) * 2**26 + (iy * 2**depth + dy)
                )
    assert expanded == set(cells)


def test_snap_to_polyline_geometry(spark):
    """Closed-form snap correctness: a point beside a segment's middle
    snaps perpendicular (t ≈ middle); a point past the end clamps to
    t=1000; a zero-length segment snaps at t=0; the nearer of two
    segments wins."""
    from osm2gtfs_spark.operators.spatial import snap_to_polyline

    segs = [
        (1, 0.0, 0.0, 0.0, 10.0),   # along the equator, lon 0..10
        (2, 5.0, 0.0, 5.0, 10.0),   # parallel, 5 deg north
        (3, -20.0, 3.0, -20.0, 3.0) # degenerate point-segment
    ]
    seg = spark.createDataFrame(
        segs, "seg_id long, lat1 double, lon1 double, lat2 double, lon2 double"
    )
    pts = [
        (10, 1.0, 5.0),    # 1 deg above seg 1's midpoint -> seg 1, t=500
        (11, 0.5, 20.0),   # past seg 1's far end -> clamps t=1000
        (12, 4.0, 2.0),    # nearer seg 2 than seg 1 -> seg 2, t=200
        (13, -19.5, 3.2),  # near the degenerate segment -> t=0
    ]
    p = spark.createDataFrame(pts, "station_key long, lat double, lon double")
    out = {
        r.station_key: (r.nearest_seg_id, r.t_permille)
        for r in snap_to_polyline(
            p, seg, res=4, k_ring=1, point_key="station_key", seg_key="seg_id"
        ).collect()
    }
    assert out[10] == (1, 500)
    assert out[11] == (1, 1000)
    assert out[12] == (2, 200)
    assert out[13] == (3, 0)


def test_raster_regions_seeded(spark):
    """Region extraction on a seeded map: an L-shaped region, a
    separate 2x2 block, an isolated cell, and a pair adjacent ONLY
    across the antimeridian (ix 0 and n-1) — labels are min-cell-id
    per region; boundary = fewer than 4 occupied neighbors (the 2x2
    block is all-boundary, a plus-sign center is interior)."""
    from osm2gtfs_spark.operators.spatial import raster_regions

    res, n = 4, 16

    def cid(ix, iy):
        return res * 2**52 + ix * 2**26 + iy

    plus = [cid(5, 5), cid(4, 5), cid(6, 5), cid(5, 4), cid(5, 6)]  # + shape
    block = [cid(10, 10), cid(11, 10), cid(10, 11), cid(11, 11)]
    lone = [cid(2, 13)]
    wrap = [cid(0, 8), cid(n - 1, 8)]  # adjacent only via lon wrap
    cells = plus + block + lone + wrap
    df = spark.createDataFrame([(c,) for c in cells], "cell_id long")
    got = {r.cell_id: (r.region_id, r.is_boundary) for r in raster_regions(df, res=res).collect()}
    assert len(got) == len(cells)
    # one label per region, equal to the min member
    for group in (plus, block, wrap):
        labels = {got[c][0] for c in group}
        assert labels == {min(group)}, group
    assert got[lone[0]] == (lone[0], True)
    # the plus center has all 4 neighbors occupied -> interior
    assert got[cid(5, 5)] == (min(plus), False)
    assert all(got[c][1] for c in block)  # 2x2: every cell misses >=2 nbrs
    # regions are distinct from each other
    assert len({got[g[0]][0] for g in (plus, block, lone, wrap)}) == 4


def test_cell_compact_validates_res(spark):
    df = spark.createDataFrame([(5 * 2**52,)], "cell_id long")
    with pytest.raises(ValueError, match="coarser"):
        cell_compact(df, res_from=3, res_to=5)
