"""Equal-interval resampling + exact Hausdorff (operators/spatial).

The DuckDB gate replays both dialects value-exactly; these pin the
geometric properties the oracle can't state.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from osm2gtfs_spark.operators.spatial import hausdorff_pairs, resample_polyline


def test_resample_straight_line_spacing(spark):
    # one horizontal segment of length 1.0 deg = 1_000_000 chainage
    # units; step 250_000 -> targets k=0..3 (k=4 == end is half-open out)
    df = spark.createDataFrame(
        [(0, 0, 10.0, 0.0), (0, 1, 10.0, 1.0)],
        "shape_id long, seq long, lat double, lon double",
    )
    rows = sorted(
        (r.k, r.lon, r.lat)
        for r in resample_polyline(df, step_scaled=250_000).collect()
    )
    assert [k for k, *_ in rows] == [0, 1, 2, 3]
    for k, lon, lat in rows:
        assert lat == 10.0
        assert abs(lon - 0.25 * k) < 1e-12


def test_resample_multi_segment_monotone(spark):
    rows = [
        (0, i, float(i % 3), float(i))  # zig-zag polyline
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "shape_id long, seq long, lat double, lon double")
    out = sorted(
        (r.k, r.lon, r.lat) for r in resample_polyline(df, step_scaled=500_000).collect()
    )
    ks = [k for k, *_ in out]
    assert ks == list(range(len(ks)))  # dense target indices, no dup/gap
    # consecutive resampled points are at most step apart along the
    # path — up to the integer-chainage quantization (1e-6 deg floored
    # per segment, so targets can drift ~n_segments*1e-6 along the line)
    for (k1, x1, y1), (k2, x2, y2) in zip(out, out[1:]):
        assert math.hypot(x2 - x1, y2 - y1) <= 0.5 + 1e-4


def test_resample_duplicate_vertex_no_div_by_zero(spark):
    df = spark.createDataFrame(
        [(0, 0, 0.0, 0.0), (0, 1, 0.0, 0.0), (0, 2, 0.0, 1.0)],
        "shape_id long, seq long, lat double, lon double",
    )
    out = resample_polyline(df, step_scaled=400_000).collect()
    assert {r.k for r in out} == {0, 1, 2}
    assert all(not math.isnan(r.lon) for r in out)


@pytest.fixture(scope="module")
def haus_inputs(spark):
    pts = spark.createDataFrame(
        # shape 0: unit square corners; shape 1: same shifted +3 lon;
        # shape 2: identical to shape 0
        [(0, 0, 0.0, 0.0), (0, 1, 0.0, 1.0), (0, 2, 1.0, 1.0), (0, 3, 1.0, 0.0)]
        + [(1, 0, 0.0, 3.0), (1, 1, 0.0, 4.0), (1, 2, 1.0, 4.0), (1, 3, 1.0, 3.0)]
        + [(2, 0, 0.0, 0.0), (2, 1, 0.0, 1.0), (2, 2, 1.0, 1.0), (2, 3, 1.0, 0.0)],
        "shape_id long, seq long, lat double, lon double",
    )
    pairs = spark.createDataFrame(
        [(0, 0, 1), (1, 0, 2), (2, 1, 1)],
        "pair_id long, group_a long, group_b long",
    )
    return pairs, pts


def test_hausdorff_known_values(spark, haus_inputs):
    pairs, pts = haus_inputs
    got = {r.pair_id: r for r in hausdorff_pairs(pairs, pts).collect()}
    # square shifted +3 lon: the far corners (lon 0 vs lon 3 / lon 4
    # vs lon 1) are 3.0 from their nearest counterpart -> squared 9.0,
    # symmetric by construction
    assert got[0].h_ab == pytest.approx(9.0)
    assert got[0].h_ba == pytest.approx(9.0)
    assert got[0].h_sym == pytest.approx(9.0)
    # identical shapes: zero
    assert got[1].h_ab == 0.0 and got[1].h_ba == 0.0 and got[1].h_sym == 0.0
    # self-pair: zero
    assert got[2].h_sym == 0.0


def test_hausdorff_asymmetric(spark):
    # A is a single point ON B, so h(A->B)=0; B has a far vertex, so
    # h(B->A) > 0 — directed distances must differ
    pts = spark.createDataFrame(
        [(0, 0, 0.0, 0.0), (1, 0, 0.0, 0.0), (1, 1, 0.0, 5.0)],
        "shape_id long, seq long, lat double, lon double",
    )
    pairs = spark.createDataFrame([(0, 0, 1)], "pair_id long, group_a long, group_b long")
    r = hausdorff_pairs(pairs, pts).collect()[0]
    assert r.h_ab == 0.0
    assert r.h_ba == pytest.approx(25.0)
    assert r.h_sym == pytest.approx(25.0)
