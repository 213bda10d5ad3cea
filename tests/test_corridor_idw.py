"""corridor_match and idw_grid (operators/spatial.py) on hand-built
geometry with known containment / interpolation answers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm2gtfs_spark.operators.spatial import corridor_match, idw_grid


def _pts(spark, rows):
    return spark.createDataFrame(rows, "stop_key long, lat double, lon double")


def _segs(spark, rows):
    return spark.createDataFrame(
        rows, "route_id long, lat1 double, lon1 double, lat2 double, lon2 double"
    )


def test_corridor_match_hits_and_misses(spark):
    segs = _segs(spark, [(1, 0.0, 0.0, 0.0, 10.0), (2, 5.0, 0.0, 5.0, 10.0)])
    pts = _pts(
        spark,
        [
            (100, 0.04, 5.0),   # 0.04 off route 1 → hit
            (101, 0.2, 5.0),    # 0.2 off → miss
            (102, 5.0, 3.0),    # on route 2 → hit
            (103, 2.5, 5.0),    # between both → miss
            (104, 0.03, -0.02), # near route 1's endpoint (clamped t=0) → hit
        ],
    )
    out = {(r.stop_key, r.route_id) for r in
           corridor_match(pts, segs, res=6, radius_deg=0.05).collect()}
    assert out == {(100, 1), (102, 2), (104, 1)}


def test_corridor_match_multi_segment_route_one_row(spark):
    # two touching segments of one route both within reach of a point →
    # exactly one (stop, route) row
    segs = _segs(spark, [(7, 0.0, 0.0, 0.0, 1.0), (7, 0.0, 1.0, 0.0, 2.0)])
    pts = _pts(spark, [(5, 0.01, 1.0)])
    out = corridor_match(pts, segs, res=6, radius_deg=0.05).collect()
    assert len(out) == 1 and (out[0].stop_key, out[0].route_id) == (5, 7)


def test_corridor_match_radius_guard(spark):
    segs = _segs(spark, [(1, 0.0, 0.0, 0.0, 1.0)])
    pts = _pts(spark, [(5, 0.0, 0.5)])
    with pytest.raises(ValueError, match="ring reach"):
        corridor_match(pts, segs, res=6, radius_deg=10.0)


def _obs(spark, rows):
    return spark.createDataFrame(rows, "lat double, lon double, value long")


def _grid(spark, rows):
    return spark.createDataFrame(rows, "gid long, lat double, lon double")


def test_idw_exact_hit_dominates(spark):
    # one obs exactly on the grid point (w = 1e12), one far (tiny w):
    # integer-div prediction rounds to the coincident value
    obs = _obs(spark, [(10.0, 10.0, 50), (10.5, 10.5, 1000)])
    grid = _grid(spark, [(1, 10.0, 10.0)])
    r = idw_grid(obs, grid, res=6, k_ring=1).collect()[0]
    assert r.n_obs == 2
    assert r.pred == 50  # 1e12*50 + eps*1000 over 1e12 + eps floors to 50


def test_idw_symmetric_average(spark):
    # two equidistant obs → exact mean
    obs = _obs(spark, [(10.0, 10.1, 40), (10.0, 9.9, 60)])
    grid = _grid(spark, [(1, 10.0, 10.0)])
    r = idw_grid(obs, grid, res=6, k_ring=1).collect()[0]
    assert r.pred == 50


def test_idw_out_of_ring_excluded(spark):
    # obs two rings away at res=6 (cell 2.8 deg) → grid point unserved
    obs = _obs(spark, [(10.0, 50.0, 40)])
    grid = _grid(spark, [(1, 10.0, 10.0)])
    assert idw_grid(obs, grid, res=6, k_ring=1).count() == 0


def test_focal_sum_neighborhood(spark):
    from osm2gtfs_spark.functions.geo import cell_id as _cid
    from osm2gtfs_spark.operators.spatial import focal_sum
    from pyspark.sql import functions as F

    # three occupied cells in a row (same iy), counts 1, 10, 100; plus a
    # far cell with 1000 — middle cell's focal = 111, ends see two each
    pts = spark.createDataFrame(
        [(2.0, 2.0, 1), (2.0, 8.0, 10), (2.0, 14.0, 100), (50.0, 120.0, 1000)],
        "lat double, lon double, n long",
    )  # res 6 cells are 5.625 deg wide → adjacent columns
    counts = pts.select(_cid("lat", "lon", 6).alias("cell_id"), "n")
    cells = {r.n_self: r.focal_sum for r in focal_sum(counts, res=6).collect()}
    assert cells == {1: 11, 10: 111, 100: 110, 1000: 1000}


def test_zonal_stats_known_zone(spark):
    from pyspark.sql import functions as F
    from osm2gtfs_spark.operators.spatial import zonal_stats

    # one diamond around (0,0), radius 2; three points inside with
    # values 5, 7, 11; one outside
    polys = spark.createDataFrame(
        [(1, [(-2.0, 0.0), (0.0, 2.0), (2.0, 0.0), (0.0, -2.0)])],
        "polygon_id long, vertices array<struct<lat double, lon double>>",
    )
    pts = spark.createDataFrame(
        [(1, 0.0, 0.0, 5), (2, 0.5, 0.5, 7), (3, -0.5, 0.5, 11), (4, 3.0, 3.0, 99)],
        "stop_key long, lat double, lon double, value long",
    )
    out = zonal_stats(pts, polys, res=4).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.polygon_id, r.n_points, r.sum_v, r.min_v, r.max_v) == (1, 3, 23, 5, 11)
