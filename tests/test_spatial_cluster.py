"""J10/O2 greedy clustering + adaptive resolution + ring semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm2gtfs_spark.functions.geo import cell_id, cell_ring
from osm2gtfs_spark.operators.spatial import adaptive_resolution, cluster_stops_greedy


def test_greedy_cluster_first_fit(spark):
    # same name; 3 points: a, b within 400m of a, c ~2km away
    rows = [
        ("node/1", 1, "Terminal X", 5.5000, -0.2000),
        ("node/2", 2, "Terminal X", 5.5030, -0.2000),  # ~330 m north of a
        ("node/3", 3, "Terminal X", 5.5200, -0.2000),  # ~2.2 km north
        ("node/9", 9, "Other", 5.5000, -0.2000),
    ]
    df = spark.createDataFrame(rows, "stop_key string, osm_id long, name string, lat double, lon double")
    out = {r.stop_key: r for r in cluster_stops_greedy(df).collect()}
    assert out["node/1"].is_center and out["node/1"].cluster_id == "area_node/1"
    assert not out["node/2"].is_center and out["node/2"].cluster_id == "area_node/1"
    assert out["node/3"].is_center and out["node/3"].cluster_id == "area_node/3"
    # different name never clusters together
    assert out["node/9"].cluster_id == "area_node/9"


def test_greedy_cluster_order_dependence(spark):
    """The reference's first-fit is order-dependent: a chain a-b-c where
    b is within 500m of both a and c must attach b to a (lower osm_id
    area), and c starts its own area (c is >500m from a, the center)."""
    rows = [
        ("node/1", 1, "Y", 5.5000, -0.2),
        ("node/2", 2, "Y", 5.5040, -0.2),  # ~445 m from node/1 → joins area_1
        ("node/3", 3, "Y", 5.5080, -0.2),  # ~890 m from node/1 → new area
    ]
    df = spark.createDataFrame(rows, "stop_key string, osm_id long, name string, lat double, lon double")
    out = {r.stop_key: r.cluster_id for r in cluster_stops_greedy(df).collect()}
    assert out == {"node/1": "area_node/1", "node/2": "area_node/1", "node/3": "area_node/3"}


def test_adaptive_resolution_splits_hot_cells(spark):
    # 50 points in one res-3 cell, 3 points in another
    hot = [(i, 10.0 + i * 1e-4, 10.0) for i in range(50)]
    cold = [(100 + i, 60.0 + i * 1e-4, 120.0) for i in range(3)]
    df = spark.createDataFrame(hot + cold, "stop_key long, lat double, lon double")
    out = adaptive_resolution(df, res=3, max_per_cell=30, fine_res=7)
    res_by_key = {r.stop_key: r.cell_res for r in out.collect()}
    assert all(res_by_key[k] == 7 for k, _, _ in hot)
    assert all(res_by_key[k] == 3 for k, _, _ in cold)


def test_cell_ring_wraps_and_clamps(spark):
    df = spark.createDataFrame([(89.9, 179.9), (0.0, -179.9)], "lat double, lon double")
    out = df.select(
        cell_ring(cell_id("lat", "lon", 4), 4, 1).alias("ring"),
        cell_id("lat", "lon", 4).alias("c"),
    ).collect()
    for r in out:
        assert r.c in r.ring
        # pole row: iy+1 out of grid → ring smaller than 9
        assert 6 <= len(r.ring) <= 9
    # antimeridian wrap: ring of lon=179.9 contains a cell with ix=0
    ring = out[0].ring
    ixs = {(c - 4 * 2**52) // 2**26 for c in ring}
    assert 0 in ixs and 15 in ixs
