"""Round-5c spatial analytics: Gi* hotspots, grid DBSCAN, tile pyramid.

The DuckDB gate (gi_star_hotspots / grid_dbscan_clusters /
tile_pyramid) enforces cross-engine value parity at sf0.01; these pin
the statistical/structural properties the oracle can't express —
z-score direction on a planted hotspot, DBSCAN's noise/merge
semantics, and pyramid mass conservation per level.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from osm2gtfs_spark.functions.geo import cell_id
from osm2gtfs_spark.operators.spatial import cell_pyramid, gi_star, grid_dbscan

RES = 8


@pytest.fixture(scope="module")
def planted(spark):
    """A flat background plus one dense 2x2 blob of points."""
    rows = []
    # background: one point per scattered cell
    for i in range(120):
        rows.append((i, -40.0 + (i * 17) % 80 + 0.3, -90.0 + (i * 53) % 180 + 0.3))
    # hotspot: 40 points packed into ~2 adjacent cells near (10, 10)
    for j in range(40):
        rows.append((1000 + j, 10.0 + (j % 2) * 0.7, 10.0 + (j % 4) * 0.3))
    return spark.createDataFrame(rows, "pid long, lat double, lon double").cache()


def cells_of(planted):
    return planted.groupBy(cell_id("lat", "lon", RES).alias("cell_id")).agg(
        F.count(F.lit(1)).alias("n")
    )


def test_gi_star_flags_the_planted_hotspot(planted):
    out = gi_star(cells_of(planted), res=RES).cache()
    top = out.orderBy(F.desc("gi_z")).first()
    # the hottest z-score sits on one of the blob cells (n >> background)
    assert top.n_self >= 10
    assert top.gi_z > 2.0
    # background singleton cells with singleton neighborhoods sit below 0
    bg = out.filter((F.col("n_self") == 1) & (F.col("w_ring") == 1)).agg(
        F.max("gi_z").alias("m")
    ).first()
    assert bg.m < 0.0


def test_gi_star_matches_closed_form_on_singletons(planted):
    """For a cell with w_ring = 1 and n_self = 1 the statistic reduces
    to (1 - mean) / (s * sqrt((n-1)/(n-1))) = (1 - mean)/s — check one
    against moments computed driver-side."""
    cells = cells_of(planted)
    stats = cells.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    ).first()
    mean = stats.s1 / stats.n
    var = stats.s2 / stats.n - mean * mean
    expect = (1.0 - mean) / math.sqrt(var * (stats.n - 1) / (stats.n - 1))
    got = (
        gi_star(cells, res=RES)
        .filter((F.col("n_self") == 1) & (F.col("w_ring") == 1))
        .first()
    )
    assert got is not None
    assert abs(got.gi_z - expect) < 1e-9


def test_grid_dbscan_merges_blob_and_drops_noise(planted):
    out = grid_dbscan(planted, res=RES, min_pts=5).cache()
    rows = out.collect()
    # only blob cells are core (background cells hold 1 point each)
    assert 1 <= len(rows) <= 4
    assert all(r.n >= 5 for r in rows)
    # adjacent core cells collapse into ONE cluster
    assert len({r.cluster_id for r in rows}) == 1
    # cluster label is the min member cell id (deterministic)
    assert min(r.cell_id for r in rows) == rows[0].cluster_id


def test_grid_dbscan_isolated_core_cell_is_its_own_cluster(spark):
    pts = spark.createDataFrame(
        [(i, 5.05, 5.05) for i in range(6)] + [(100, -60.05, -60.05)],
        "pid long, lat double, lon double",
    )
    out = grid_dbscan(pts, res=RES, min_pts=3).collect()
    assert len(out) == 1  # the singleton point is noise
    assert out[0].cluster_id == out[0].cell_id


def test_pyramid_conserves_mass_per_level(planted):
    counts = cells_of(planted)
    pyr = cell_pyramid(counts, res_fine=RES, res_coarse=0).cache()
    total = planted.count()
    per_level = pyr.groupBy("res").agg(F.sum("n").alias("t")).collect()
    assert len(per_level) == RES + 1
    assert all(r.t == total for r in per_level)
    # level-0 is the single root cell
    root = pyr.filter(F.col("res") == 0).collect()
    assert len(root) == 1 and root[0].n == total


def test_pyramid_parent_child_sums(planted):
    """Every level-(r-1) cell's count equals the sum of its level-r
    children — the invariant a tile server relies on."""
    from osm2gtfs_spark.functions.geo import cell_parent

    pyr = cell_pyramid(cells_of(planted), res_fine=RES, res_coarse=0)
    fine = pyr.filter(F.col("res") == RES).select(
        cell_parent("cell_id", RES, RES - 1).alias("p"), "n"
    )
    rolled = fine.groupBy("p").agg(F.sum("n").alias("n_sum"))
    coarse = pyr.filter(F.col("res") == RES - 1).select(
        F.col("cell_id").alias("p"), F.col("n").alias("n_coarse")
    )
    bad = (
        rolled.join(coarse, "p", "full")
        .filter(
            F.col("n_sum").isNull()
            | F.col("n_coarse").isNull()
            | (F.col("n_sum") != F.col("n_coarse"))
        )
        .count()
    )
    assert bad == 0


def test_gi_star_single_occupied_cell_is_zero(spark):
    """Review r5c: n = 1 divides by (n-1) = 0 inside the denominator
    (NULL in Spark, NaN in DuckDB) — the explicit branch must win."""
    one = (
        spark.createDataFrame([(10.0, 10.0, 5)], "lat double, lon double, n long")
        .select(cell_id("lat", "lon", RES).alias("cell_id"), "n")
    )
    row = gi_star(one, res=RES).first()
    assert row.gi_z == 0.0 and row.n_self == 5
