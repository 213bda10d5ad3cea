"""Round-5c batch E: media context pairs, global Moran's I, LOCF fill.

The gate pins cross-engine parity; these pin the statistical sign
conventions and edge semantics the oracle replay can't single out.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from osm2gtfs_spark.functions.geo import cell_id
from osm2gtfs_spark.operators.interval import locf_fill
from osm2gtfs_spark.operators.spans import media_context
from osm2gtfs_spark.operators.spatial import moran_i

RES = 8


def _doc(spark, doc_id, spans):
    rows = [(doc_id, [(k, t, r, 0) for k, t, r in spans])]
    return spark.createDataFrame(
        rows,
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )


def test_media_context_nearest_text_neighbors(spark):
    docs = _doc(
        spark,
        1,
        [
            ("text", "alpha", ""),
            ("image", "", "m://x"),
            ("text", "beta", ""),
            ("image", "", "m://y"),
        ],
    )
    out = {r.media_ref: r for r in media_context(docs).collect()}
    assert out["m://x"].before_text == "alpha" and out["m://x"].after_text == "beta"
    assert out["m://y"].before_text == "beta" and out["m://y"].after_text == ""


def test_media_context_leading_media_and_media_runs(spark):
    # doc starts with two images: both coalesce before to '', and an
    # intervening image never shadows a text neighbor
    docs = _doc(
        spark,
        2,
        [
            ("image", "", "m://a"),
            ("image", "", "m://b"),
            ("text", "gamma", ""),
        ],
    )
    out = {r.media_ref: r for r in media_context(docs).collect()}
    assert out["m://a"].before_text == "" and out["m://a"].after_text == "gamma"
    assert out["m://b"].before_text == "" and out["m://b"].after_text == "gamma"


def _cells(spark, triples):
    df = spark.createDataFrame(triples, "lat double, lon double, n long")
    return df.select(cell_id("lat", "lon", RES).alias("cell_id"), "n")


def _row_of_cells(values, lat=0.1):
    # consecutive res-8 columns are 1.40625 deg apart at lon 0.1 + k*1.40625
    return [(lat, 0.1 + i * 1.40625, v) for i, v in enumerate(values)]


def test_moran_positive_on_clustered_raster(spark):
    # two adjacent hot cells inside a cold row -> high values cluster
    cells = _cells(spark, _row_of_cells([1, 1, 10, 10, 1, 1]))
    out = moran_i(cells, res=RES).first()
    assert out.n_cells == 6
    # closed form: mean 4, devs [-3,-3,6,6,-3,-3], directed cross sum 36,
    # W = 10, denom 108 -> I = (6/10)*(36/108) = 0.2
    assert abs(out.moran_i - 0.2) < 1e-12


def test_moran_negative_on_checkerboard(spark):
    cells = _cells(spark, _row_of_cells([10, 0, 10, 0, 10, 0]))
    out = moran_i(cells, res=RES).first()
    assert out.moran_i < -0.5


def test_moran_zero_on_constant_and_isolated(spark):
    const = _cells(spark, _row_of_cells([5, 5, 5, 5]))
    assert moran_i(const, res=RES).first().moran_i == 0.0
    isolated = _cells(spark, [(0.1, 0.1, 7), (50.0, 120.0, 3)])
    out = moran_i(isolated, res=RES).first()
    assert out.w_pairs == 0 and out.moran_i == 0.0


def test_locf_fills_and_leading_nulls_stay(spark):
    rows = [
        (1, 1, None), (1, 2, 10), (1, 3, None), (1, 4, None), (1, 5, 7),
        (2, 1, 3), (2, 2, None),
    ]
    df = spark.createDataFrame(rows, "k long, seq long, v long")
    out = {
        (r.k, r.seq): r.filled
        for r in locf_fill(df, "k", ["seq"], "v").collect()
    }
    assert out[(1, 1)] is None  # leading null has nothing to carry
    assert out[(1, 2)] == 10
    assert out[(1, 3)] == 10 and out[(1, 4)] == 10
    assert out[(1, 5)] == 7
    assert out[(2, 2)] == 3
