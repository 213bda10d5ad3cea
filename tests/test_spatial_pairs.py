"""Round-5 continuation operators: within-distance pair join, polygon
shoelace stats, geohash interop.

The DuckDB gate (within_distance_pairs / polygon_area_centroid /
geohash_encode) enforces cross-engine value parity; these pin the
structural properties the oracle can't express — ring-reach
validation, pair uniqueness, the production double dialect, and
conformance to the public geohash spec via an independent pure-Python
encoder.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm2gtfs_spark.functions.geo import GEOHASH_B32, geohash
from osm2gtfs_spark.operators.spatial import polygon_stats, within_distance_pairs


@pytest.fixture(scope="module")
def pts(spark):
    # clustered + scattered: three tight clusters (intra-cluster pairs,
    # some straddling a cell boundary) plus a sparse background
    rows = []
    pid = 0
    for base_lat, base_lon in ((0.0, 0.0), (44.9, 89.9), (-30.05, -120.05)):
        for j in range(6):
            rows.append((pid, base_lat + j * 0.11, base_lon + j * 0.07))
            pid += 1
    for j in range(40):
        rows.append((pid, -80.0 + (j * 37) % 160, -170.0 + (j * 91) % 340))
        pid += 1
    return spark.createDataFrame(rows, "stop_key long, lat double, lon double").cache()


def _brute_pairs(df, radius):
    pdf = df.toPandas()
    out = set()
    for a in pdf.itertuples(index=False):
        for b in pdf.itertuples(index=False):
            if a.stop_key < b.stop_key:
                d2 = (a.lat - b.lat) ** 2 + (a.lon - b.lon) ** 2
                if d2 <= radius * radius:
                    out.add((a.stop_key, b.stop_key))
    return out


def test_pairs_match_brute_force(pts):
    """The cell-bucketed join reproduces O(n^2) semantics, including
    pairs that straddle cell boundaries (cluster 2 sits on the 45/90
    res-6 cell corner)."""
    radius = 1.0
    got = {
        (r.key_a, r.key_b)
        for r in within_distance_pairs(pts, res=6, radius_deg=radius).collect()
    }
    assert got == _brute_pairs(pts, radius)
    assert len(got) >= 3 * 15  # every intra-cluster pair found


def test_pairs_emitted_exactly_once(pts):
    out = within_distance_pairs(pts, res=6, radius_deg=1.0)
    assert out.count() == out.distinct().count()
    assert out.filter(F.col("key_a") >= F.col("key_b")).count() == 0


def test_pairs_ring_reach_validated(pts):
    """A radius beyond the ring's Chebyshev reach would silently drop
    pairs — the operator must refuse instead."""
    with pytest.raises(ValueError, match="ring reach"):
        within_distance_pairs(pts, res=6, radius_deg=3.0, k_ring=1)
    # same radius is fine with a wider ring
    within_distance_pairs(pts, res=6, radius_deg=3.0, k_ring=2)


def test_pairs_carry_cols(pts):
    out = within_distance_pairs(
        pts.withColumn("tag", F.col("stop_key") % 3),
        res=6,
        radius_deg=1.0,
        carry_cols=("tag",),
    )
    row = out.first()
    assert row is not None and row.a_tag == row.key_a % 3 and row.b_tag == row.key_b % 3


def test_polygon_stats_double_dialect(spark):
    """Production dialect: shoelace area of a CCW diamond is 2·dx·dy,
    centroid is its center; CW orientation flips the sign."""
    diamond = [(-2.0, 10.0), (0.0, 13.0), (2.0, 10.0), (0.0, 7.0)]  # (lat, lon)
    polys = spark.createDataFrame(
        [(1, [{"lat": la, "lon": lo} for la, lo in diamond]),
         (2, [{"lat": la, "lon": lo} for la, lo in reversed(diamond)])],
        "polygon_id long, vertices array<struct<lat:double,lon:double>>",
    )
    rows = {r.polygon_id: r for r in polygon_stats(polys).collect()}
    ccw, cw = rows[1], rows[2]
    assert ccw.area_deg2 == pytest.approx(2 * 3.0 * 2.0)
    assert ccw.centroid_lat == pytest.approx(0.0)
    assert ccw.centroid_lon == pytest.approx(10.0)
    assert ccw.n_vertices == 4
    assert cw.area_deg2 == pytest.approx(-ccw.area_deg2)
    # centroid is orientation-invariant (numerator and denominator flip)
    assert cw.centroid_lon == pytest.approx(10.0)


def test_polygon_stats_int_dialect_consistent(spark):
    """The oracle-exact integer dialect approximates the double dialect
    to the chosen scale (floor error ≤ n_edges/scale)."""
    tri = [(0.0, 0.0), (0.0, 4.0), (3.0, 0.0)]  # CCW? cross: (4-0)... area +6
    polys = spark.createDataFrame(
        [(1, [{"lat": la, "lon": lo} for la, lo in tri])],
        "polygon_id long, vertices array<struct<lat:double,lon:double>>",
    )
    d = polygon_stats(polys).first()
    i = polygon_stats(polys, int_scale=1_000_000).first()
    assert abs(i.area2_scaled / 1e6 - 2 * d.area_deg2) < 3 / 1e6
    assert i.n_vertices == 3


def _py_geohash(lat: float, lon: float, length: int) -> str:
    """Independent reference encoder straight from the public spec:
    alternating lon/lat interval bisection, base-32 per 5 bits."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits = []
    even = True
    while len(bits) < 5 * length:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    out = []
    for i in range(length):
        idx = 0
        for b in bits[5 * i : 5 * i + 5]:
            idx = idx * 2 + b
        out.append(GEOHASH_B32[idx])
    return "".join(out)


def test_geohash_matches_public_spec(pts):
    """Spread-bits encoder == independent bisection encoder for every
    point (the gate only proves Spark==DuckDB on the same formula;
    this proves the formula IS geohash)."""
    rows = pts.select(
        "stop_key", "lat", "lon", geohash("lat", "lon", 6).alias("gh")
    ).collect()
    for r in rows:
        assert r.gh == _py_geohash(r.lat, r.lon, 6), (r.lat, r.lon)


def test_geohash_prefix_hierarchy(pts):
    """Shorter geohashes are prefixes of longer ones — the property
    that makes prefix grouping equal cell-hierarchy grouping."""
    bad = (
        pts.select(
            geohash("lat", "lon", 4).alias("g4"), geohash("lat", "lon", 8).alias("g8")
        )
        .filter(~F.col("g8").startswith(F.col("g4")))
        .count()
    )
    assert bad == 0


def test_geohash_rejects_odd_length():
    with pytest.raises(ValueError, match="even"):
        geohash("lat", "lon", 5)
