"""Incremental tile-pyramid maintenance: the resumable-tiling half of
the north rule ("the job resumes mid-tiling without recomputation") as
a streaming ingest.

Design: tile counts are ADDITIVE, so unlike the near-dup ingest
(``streaming/ingest.py``, whose admission decision must read the
accumulated state) each micro-batch is self-contained — it aggregates
its OWN points into pyramid partials
(:func:`~osm2gtfs_spark.operators.spatial.cell_pyramid` over the batch)
and writes them under ``_batch_id`` with dynamic partition overwrite.
That makes replay idempotency trivial (a replayed batch overwrites its
own partition with the identical recomputation — no self-exclusion
dance needed), the per-batch write is the per-partition lineage log the
north rule asks for, and ingest never rescans history. The current
pyramid is one merging aggregate over the partials at read time;
long-running feeds periodically fold old partitions into a snapshot via
:func:`compact_state` so the read-side merge stays O(snapshot + recent
batches).

This is the streaming twin of the classic partial-aggregate /
delta-compaction layout (what an Iceberg MERGE-on-read table does for
additive metrics), expressed with the engine's own operators.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from osm2gtfs_spark.functions.geo import cell_id
from osm2gtfs_spark.operators.spatial import cell_pyramid

_TILES_SCHEMA = T.StructType(
    [
        T.StructField("res", T.LongType()),
        T.StructField("cell_id", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("_batch_id", T.IntegerType()),
    ]
)


def _tiles_path(state_dir: str) -> str:
    return os.path.join(state_dir, "tiles")


def process_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    res_fine: int,
    res_coarse: int = 0,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> None:
    """One micro-batch: aggregate the batch's points to the finest
    level, ladder them into pyramid partials, write the partials as
    this batch's partition (dynamic overwrite → idempotent replay).
    Module-level so replay idempotency is directly testable.

    The dynamic overwrite mode is set PER WRITER (review r5c), not via
    the session conf: this function is a public replay entry point,
    and under the session default ``static`` a bare mode("overwrite")
    would truncate the ENTIRE tiles directory — silently destroying
    every other batch's partials — instead of replacing just this
    batch's partition."""
    counts = batch_df.groupBy(
        cell_id(lat_col, lon_col, res_fine).alias("cell_id")
    ).agg(F.count(F.lit(1)).alias("n"))
    partials = cell_pyramid(counts, res_fine=res_fine, res_coarse=res_coarse)
    partials.withColumn("_batch_id", F.lit(batch_id)).write.partitionBy(
        "_batch_id"
    ).option("partitionOverwriteMode", "dynamic").mode("overwrite").parquet(
        _tiles_path(state_dir)
    )


def read_pyramid(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """The CURRENT pyramid: one merging aggregate over all partials
    (None before the first drain). Schema-explicit, filesystem-agnostic
    (no os.path.exists — false on S3/HDFS; zero-row partition dirs read
    as empty frames instead of failing inference)."""
    try:
        partials = spark.read.schema(_TILES_SCHEMA).parquet(_tiles_path(state_dir))
    except Exception as e:  # PATH_NOT_FOUND / AnalysisException pre-4.0
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return None
        raise
    return partials.groupBy("res", "cell_id").agg(F.sum("n").alias("n"))


def compact_state(spark: SparkSession, state_dir: str, snapshot_dir: str) -> None:
    """Fold every partial into one snapshot table at ``snapshot_dir``
    (a NEW directory — never rewrite live state in place on an object
    store). A long-running feed points new ingest at a fresh state dir
    seeded by the snapshot; reads union both."""
    merged = read_pyramid(spark, state_dir)
    if merged is None:
        raise ValueError(f"no tile state under {state_dir}")
    merged.withColumn("_batch_id", F.lit(-1)).write.partitionBy(
        "_batch_id"
    ).mode("overwrite").parquet(_tiles_path(snapshot_dir))


def tile_ingest_available_now(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    res_fine: int,
    res_coarse: int = 0,
    lat_col: str = "lat",
    lon_col: str = "lon",
    timeout_sec: int = 600,
) -> None:
    """Drain the bounded point source, writing per-batch pyramid
    partials. Restartable: the stream checkpoint skips processed files
    and a replayed batch overwrites its own partition with an identical
    recomputation (additive partials need no state read at all). The
    dynamic overwrite mode rides on each writer (process_batch), so no
    session conf is mutated — concurrent writes in a shared session
    keep their own overwrite semantics."""
    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_batch(
            batch_df,
            batch_id,
            state_dir,
            res_fine=res_fine,
            res_coarse=res_coarse,
            lat_col=lat_col,
            lon_col=lon_col,
        )

    from osm2gtfs_spark.streaming.drain import drain_available_now

    drain_available_now(stream_df, _process, checkpoint_dir, timeout_sec,
                        "tile ingest")
