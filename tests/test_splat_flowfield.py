"""Round-5c batch G: bilinear splat conservation, flow vector field."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm2gtfs_spark.operators.mobility import grid_flow_field
from osm2gtfs_spark.operators.spatial import bilinear_splat

RES = 6


def _pts(spark, coords):
    return spark.createDataFrame(coords, "lat double, lon double")


def test_splat_conserves_mass_exactly(spark):
    pts = _pts(
        spark,
        [(i * 13.7 - 80.0, i * 29.3 - 170.0) for i in range(37)]
        + [(89.9, 10.0), (-89.9, -10.0), (0.0, 179.97), (0.0, -179.97)],
    )
    out = bilinear_splat(pts, res=RES)
    total = out.agg(F.sum("w_permille")).first()[0]
    assert total == 41 * 1000  # exact, incl. polar clamps and wrap
    # every emitted weight is a valid permille share
    assert out.filter((F.col("w_permille") < 0)).count() == 0


def test_splat_cell_center_point_is_pure(spark):
    # a point exactly at a cell center (fx = fy = 0) puts all 1000 on
    # that node: center of cell (ix=33, iy=33) at res 6
    lon = (33 + 0.5) / 64 * 360.0 - 180.0
    lat = (33 + 0.5) / 64 * 180.0 - 90.0
    out = bilinear_splat(_pts(spark, [(lat, lon)]), res=RES).collect()
    nonzero = [r for r in out if r.w_permille != 0]
    assert len(nonzero) == 1 and nonzero[0].w_permille == 1000


def test_splat_boundary_point_splits_evenly(spark):
    # a point exactly on the corner between 4 nodes (fx = fy = 0.5):
    # grid coordinate x - 0.5 integer+0.5 -> choose lon so x = k + 0.5
    lon = (34.0) / 64 * 360.0 - 180.0  # x = 33.5
    lat = (34.0) / 64 * 180.0 - 90.0   # y = 33.5
    out = [r for r in bilinear_splat(_pts(spark, [(lat, lon)]), res=RES).collect() if r.w_permille]
    assert sorted(r.w_permille for r in out) == [250, 250, 250, 250]


def test_flow_field_exact_partials(spark):
    tr = spark.createDataFrame(
        [
            (1, 0, 0.0, 0.0),
            (1, 1, 20.0, 40.0),  # dlat +20, dlon +40 (origin cell of (0,0))
            (1, 2, 0.0, 0.0),    # dlat -20, dlon -40 (origin cell of (20,40))
            (2, 0, 0.0, 0.1),
            (2, 1, 0.0, 0.1),    # hold -> dropped
        ],
        "trace_id long, obs_seq long, lat double, lon double",
    )
    out = grid_flow_field(tr, res=5)
    rows = out.collect()
    assert sum(r.n for r in rows) == 2
    assert sum(r.sum_dlat_e6 for r in rows) == 0  # exact antisymmetry
    assert sum(r.sum_dlon_e6 for r in rows) == 0
    vecs = {(r.sum_dlat_e6, r.sum_dlon_e6) for r in rows}
    assert vecs == {(20_000_000, 40_000_000), (-20_000_000, -40_000_000)}
