"""Round-5c batch F: frame sampling plan, Gini diversity, quadkey rollup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm2gtfs_spark.functions.geo import quadkey
from osm2gtfs_spark.operators.mobility import cell_mix_gini
from osm2gtfs_spark.operators.multimodal import frame_sample
from osm2gtfs_spark.operators.spatial import quadkey_rollup


def _meta(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, media_ref string, n_frames int"
    )


def test_frame_sample_even_spacing_and_short_assets(spark):
    meta = _meta(spark, [("d1", "m1", 30), ("d2", "m2", 2), ("d3", "m3", 1)])
    out = frame_sample(meta, k=4)
    got = {}
    for r in out.collect():
        got.setdefault(r.media_ref, set()).add(r.frame_idx)
    assert got["m1"] == {0, 7, 15, 22}  # j*30 div 4
    assert got["m2"] == {0, 1}          # every frame when n <= k
    assert got["m3"] == {0}
    with pytest.raises(ValueError):
        frame_sample(meta, k=0)


def test_cell_mix_gini_known_mixes(spark):
    rows = (
        [("a", 10.0, 10.0)] * 5                      # pure cell (n=5) -> 0
        + [("a", -50.0, -50.0), ("b", -50.0, -50.0)] * 3  # 50/50 (n=6) -> 500
        + [("a", 70.0, 120.0)] * 3 + [("b", 70.0, 120.0)]  # 3:1 (n=4) -> 375
    )
    df = spark.createDataFrame(rows, "event_type string, lat double, lon double")
    out = {r.n: r.gini_permille for r in cell_mix_gini(df, res=5, category_col="event_type").collect()}
    assert out[5] == 0
    assert out[6] == 500  # 1000 - 1000*18//36
    assert out[4] == 1000 - (1000 * (9 + 1)) // 16  # 375


def test_quadkey_rollup_conserves_mass_and_matches_parent_prefix(spark):
    pts = spark.createDataFrame(
        [(i * 7.1 - 80.0, i * 11.3 - 170.0, 1 + i % 3) for i in range(40)],
        "lat double, lon double, n long",
    )
    counts = pts.groupBy(quadkey("lat", "lon", 6).alias("qk")).agg(
        F.sum("n").alias("n")
    )
    total = pts.agg(F.sum("n")).first()[0]
    roll = quadkey_rollup(counts, res=6).cache()
    per_level = roll.groupBy("lvl").agg(F.sum("n").alias("t")).collect()
    assert len(per_level) == 7
    assert all(r.t == total for r in per_level)
    root = roll.filter(F.col("lvl") == 0).collect()
    assert len(root) == 1 and root[0].qk == "" and root[0].n == total
    # every level-5 key is the 5-prefix of some level-6 key with the
    # same rolled-up mass
    l6 = roll.filter(F.col("lvl") == 6).select(
        F.substring("qk", 1, 5).alias("p"), "n"
    ).groupBy("p").agg(F.sum("n").alias("n6"))
    l5 = roll.filter(F.col("lvl") == 5).select(F.col("qk").alias("p"), F.col("n").alias("n5"))
    bad = l6.join(l5, "p", "full").filter(
        F.col("n6").isNull() | F.col("n5").isNull() | (F.col("n6") != F.col("n5"))
    ).count()
    assert bad == 0
