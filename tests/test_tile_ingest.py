"""Incremental tile-pyramid ingest: multi-batch equivalence, replay
idempotency, compaction; tile snapshot diff semantics.

The gate (tile_pyramid_ingest / tile_snapshot_diff) pins value parity
on the single-batch drain; these pin the multi-batch and failure-replay
behavior the oracle can't reach.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from osm2gtfs_spark.operators.spatial import tile_snapshot_diff
from osm2gtfs_spark.streaming import tile_ingest as TI

RES = 6


def _points(spark, seed, n):
    return spark.range(n).select(
        (F.col("id") * 7919 % 170_000 / 1000.0 - 85.0 + seed).alias("lat"),
        (F.col("id") * 104_729 % 340_000 / 1000.0 - 170.0).alias("lon"),
    )


def _pyramid_of(df):
    from osm2gtfs_spark.functions.geo import cell_id
    from osm2gtfs_spark.operators.spatial import cell_pyramid

    counts = df.groupBy(cell_id("lat", "lon", RES).alias("cell_id")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return cell_pyramid(counts, res_fine=RES, res_coarse=0)


def test_multi_batch_ingest_equals_batch_pyramid(spark, tmp_path):
    import glob
    import os
    import shutil

    src = str(tmp_path / "src")
    os.makedirs(src)
    batches = [_points(spark, s, 400) for s in (0.0, 1.0, 2.0)]
    for i, b in enumerate(batches):
        stage = str(tmp_path / f"stage{i}")
        b.coalesce(1).write.parquet(stage)
        shutil.copy(glob.glob(f"{stage}/part-*.parquet")[0], f"{src}/f{i}.parquet")
    stream = (
        spark.readStream.schema("lat double, lon double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    TI.tile_ingest_available_now(
        stream,
        state_dir=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ck"),
        res_fine=RES,
    )
    got = {
        (r.res, r.cell_id): r.n
        for r in TI.read_pyramid(spark, str(tmp_path / "state")).collect()
    }
    all_pts = batches[0].unionByName(batches[1]).unionByName(batches[2])
    want = {(r.res, r.cell_id): r.n for r in _pyramid_of(all_pts).collect()}
    assert got == want and len(got) > 0
    # partials really are batch-partitioned (per-partition lineage)
    batch_ids = {
        r._batch_id
        for r in spark.read.parquet(str(tmp_path / "state/tiles"))
        .select("_batch_id").distinct().collect()
    }
    assert len(batch_ids) == 3


def test_replayed_batch_is_idempotent_under_static_session_mode(spark, tmp_path):
    # the overwrite mode rides on the WRITER (review r5c): under the
    # session default 'static' a bare overwrite would truncate every
    # other batch's partition — replay both batches and re-replay one
    state = str(tmp_path / "state")
    # FORCE static for the duration (other suite tests may leave the
    # shared session at dynamic): the per-writer option must win
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        _run_static_replay(spark, state)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def _run_static_replay(spark, state):
    TI.process_batch(_points(spark, 0.0, 300), 0, state, res_fine=RES)
    TI.process_batch(_points(spark, 1.0, 200), 1, state, res_fine=RES)
    once = {
        (r.res, r.cell_id): r.n for r in TI.read_pyramid(spark, state).collect()
    }
    # a failure replay re-runs batch 0 with the same data: batch 1's
    # partials must survive and the merged pyramid must be unchanged
    TI.process_batch(_points(spark, 0.0, 300), 0, state, res_fine=RES)
    twice = {
        (r.res, r.cell_id): r.n for r in TI.read_pyramid(spark, state).collect()
    }
    assert once == twice


def test_read_before_first_drain_is_none(spark, tmp_path):
    assert TI.read_pyramid(spark, str(tmp_path / "nothing")) is None


def test_compact_state_preserves_pyramid(spark, tmp_path):
    state = str(tmp_path / "state")
    TI.process_batch(_points(spark, 0.0, 200), 0, state, res_fine=RES)
    TI.process_batch(_points(spark, 1.0, 200), 1, state, res_fine=RES)
    snap = str(tmp_path / "snap")
    TI.compact_state(spark, state, snap)
    a = {(r.res, r.cell_id): r.n for r in TI.read_pyramid(spark, state).collect()}
    b = {(r.res, r.cell_id): r.n for r in TI.read_pyramid(spark, snap).collect()}
    assert a == b
    # the snapshot is ONE folded partition
    ids = {
        r._batch_id
        for r in spark.read.parquet(f"{snap}/tiles")
        .select("_batch_id").distinct().collect()
    }
    assert ids == {-1}


def test_snapshot_diff_semantics(spark):
    old = spark.createDataFrame(
        [(10, 5), (20, 3), (30, 1)], "cell_id long, n long"
    )
    new = spark.createDataFrame(
        [(10, 5), (20, 7), (40, 2)], "cell_id long, n long"
    )
    out = {r.cell_id: r for r in tile_snapshot_diff(old, new).collect()}
    assert set(out) == {20, 30, 40}  # unchanged cell 10 is dropped
    assert (out[20].n_old, out[20].n_new, out[20].delta) == (3, 7, 4)
    assert (out[30].n_old, out[30].n_new, out[30].delta) == (1, 0, -1)
    assert (out[40].n_old, out[40].n_new, out[40].delta) == (0, 2, 2)
