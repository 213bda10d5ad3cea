"""Round-5c batch B: quadkey naming, polygon rasterization, integer
PageRank. The gate (tile_quadkeys / polygon_fill_cells /
flow_pagerank) pins cross-engine parity; these pin the structural
invariants — prefix = parent tile, fill vs brute-force grid scan,
hand-computed ranks and shuffle-order determinism.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm2gtfs_spark.functions.geo import cell_id, quadkey
from osm2gtfs_spark.operators.mobility import pagerank_bounded
from osm2gtfs_spark.operators.spatial import polygon_rasterize


def test_quadkey_known_digits(spark):
    # res 2: 4x4 grid. (lat 80, lon 170) -> ix 3, iy 3 -> digits 3,3
    # (lat -80, lon -170) -> ix 0, iy 0 -> "00"
    df = spark.createDataFrame(
        [(80.0, 170.0), (-80.0, -170.0), (-80.0, 170.0)],
        "lat double, lon double",
    )
    out = df.select(quadkey("lat", "lon", 2).alias("qk")).collect()
    assert [r.qk for r in out] == ["33", "00", "11"]


def test_quadkey_parent_is_prefix(spark):
    pts = spark.createDataFrame(
        [(i * 7.3 - 80.0, i * 13.7 - 170.0) for i in range(20)],
        "lat double, lon double",
    )
    both = pts.select(
        quadkey("lat", "lon", 8).alias("q8"), quadkey("lat", "lon", 7).alias("q7")
    )
    bad = both.filter(F.substring("q8", 1, 7) != F.col("q7")).count()
    assert bad == 0
    assert both.filter(F.length("q8") != 8).count() == 0


def _diamond(spark, polygon_id=1, lat0=0.0, lon0=0.0, dy=5.0, dx=7.0):
    return spark.createDataFrame(
        [(polygon_id, lat0, lon0, dy, dx)], "polygon_id long, lat0 double, lon0 double, dy double, dx double"
    ).select(
        "polygon_id",
        F.array(
            F.struct((F.col("lat0") - F.col("dy")).alias("lat"), F.col("lon0").alias("lon")),
            F.struct(F.col("lat0").alias("lat"), (F.col("lon0") + F.col("dx")).alias("lon")),
            F.struct((F.col("lat0") + F.col("dy")).alias("lat"), F.col("lon0").alias("lon")),
            F.struct(F.col("lat0").alias("lat"), (F.col("lon0") - F.col("dx")).alias("lon")),
        ).alias("vertices"),
    )


def test_fill_matches_bruteforce_grid_scan(spark):
    res, n = 6, 64
    got = {
        r.cell_id
        for r in polygon_rasterize(_diamond(spark), res=res).collect()
    }
    # brute force: test EVERY cell center of the whole grid
    centers = spark.range(n * n).select(
        (F.col("id") % n).alias("ix"), F.expr(f"id div {n}").alias("iy")
    ).select(
        "ix", "iy",
        ((F.col("iy") + 0.5) / n * 180.0 - 90.0).alias("clat"),
        ((F.col("ix") + 0.5) / n * 360.0 - 180.0).alias("clon"),
    )
    # |clat|/5 + |clon|/7 <= 1 is the diamond's exact interior (center 0,0)
    inside = centers.filter(
        F.abs(F.col("clat")) / 5.0 + F.abs(F.col("clon")) / 7.0 <= 1.0
    )
    expect = {
        r.c
        for r in inside.select(
            (F.lit(res).cast("long") * F.lit(2**52)
             + F.col("ix").cast("long") * F.lit(2**26)
             + F.col("iy").cast("long")).alias("c")
        ).collect()
    }
    assert got == expect and len(got) > 0


def test_fill_cap_raises(spark):
    with pytest.raises(Exception) as ei:
        polygon_rasterize(_diamond(spark, dy=20.0, dx=30.0), res=8, max_cells=10).collect()
    assert "max_cells" in str(ei.value)


def test_pagerank_hand_computed(spark):
    edges = spark.createDataFrame([(1, 2, 1)], "src long, dst long, w long")
    out = {r.node: r.rank for r in pagerank_bounded(edges, iters=3).collect()}
    # A: never receives -> 150000 after iter1 onward.
    # B: it1 rank 1_000_000; it2/it3: 150000 + 850*150000//1000 = 277500
    assert out[1] == 150000
    assert out[2] == 277500


def test_pagerank_weighted_split(spark):
    # C splits mass 3:1 between A and B in one iteration
    edges = spark.createDataFrame(
        [(9, 1, 3), (9, 2, 1)], "src long, dst long, w long"
    )
    out = {r.node: r.rank for r in pagerank_bounded(edges, iters=1).collect()}
    # contrib(A) = 1e6*3//4 = 750000 -> 150000 + 637500
    # contrib(B) = 1e6*1//4 = 250000 -> 150000 + 212500
    assert out[1] == 150000 + 850 * 750000 // 1000
    assert out[2] == 150000 + 850 * 250000 // 1000
    assert out[9] == 150000


def test_pagerank_deterministic_across_partitioning(spark):
    import random

    rng = random.Random(7)
    rows = [
        (rng.randrange(40), rng.randrange(40), rng.randrange(1, 9))
        for _ in range(300)
    ]
    edges = spark.createDataFrame(rows, "src long, dst long, w long")
    a = sorted(
        (r.node, r.rank)
        for r in pagerank_bounded(edges.repartition(1), iters=3).collect()
    )
    b = sorted(
        (r.node, r.rank)
        for r in pagerank_bounded(edges.repartition(17), iters=3).collect()
    )
    assert a == b


def test_pagerank_iter_bound(spark):
    edges = spark.createDataFrame([(1, 2, 1)], "src long, dst long, w long")
    with pytest.raises(ValueError):
        pagerank_bounded(edges, iters=0)
