"""CDC upsert/delete ingest: Iceberg-style MERGE semantics on plain
parquet — the third ingest shape in the engine's streaming family:

- ``streaming/tile_ingest.py``  — ADDITIVE partials (counts merge);
- ``streaming/ingest.py``       — ADMISSION (near-dup gatekeeping);
- this module                   — KEYED LATEST-WINS (OSM changesets:
  create/modify = upsert, delete = tombstone).

The reference consumes OSM snapshots; a production feed consumes OSM
DIFFS. ``apply_changeset`` is the batch MERGE (one anti join + one
union — the plain-DataFrame expression of ``MERGE INTO``), and the
streaming path writes each micro-batch's changes as a DELTA partition
under ``_batch_id`` with per-writer dynamic overwrite — the same
merge-on-read layout an Iceberg table uses for row-level deletes:

- replay idempotency is structural (a replayed batch overwrites its
  own partition; no read-modify-write of live state);
- ``read_snapshot`` resolves base ⊎ deltas by per-key max(struct(
  batch, seq)) then drops tombstones — one combine-friendly aggregate,
  never a window over history;
- ``compact_snapshot`` folds base + deltas into a new base directory
  (merge-on-read → copy-on-write compaction), bounding read-side work.

Within one batch, ``seq`` orders changes to the same key (last change
wins — OSM changeset semantics); across batches, ``_batch_id`` orders.
All arithmetic integer/string — oracle bit-exact.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

UPSERT = "upsert"
DELETE = "delete"


def apply_changeset(
    base: DataFrame,
    changes: DataFrame,
    key_col: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Batch MERGE: the snapshot after applying ``changes`` to ``base``.

    ``changes``: base's columns plus ``op`` (``upsert``/``delete``) and
    ``seq`` (intra-changeset order; the LAST change to a key wins, as
    in an OSM changeset). Plan: elect each key's final change with one
    max(struct) aggregate (map-side combined), anti-join base on
    changed keys, union the upsert payloads — two shuffles keyed by
    ``key_col``, no windows over base, base never rewritten per
    change."""
    payload = [c for c in base.columns]
    final = (
        changes.groupBy(key_col)
        .agg(
            F.max(
                F.struct(
                    F.col(seq_col).alias("s"),
                    F.col(op_col).alias("op"),
                    *[F.col(c).alias(f"p_{c}") for c in payload if c != key_col],
                )
            ).alias("_f")
        )
    )
    untouched = base.join(final.select(key_col), key_col, "left_anti")
    upserts = final.filter(F.col("_f.op") == UPSERT).select(
        key_col,
        *[F.col(f"_f.p_{c}").alias(c) for c in payload if c != key_col],
    )
    return untouched.unionByName(upserts.select(*payload))


def _deltas_path(state_dir: str) -> str:
    return os.path.join(state_dir, "deltas")


def _delta_schema(base: DataFrame, seq_col: str, op_col: str) -> T.StructType:
    return T.StructType(
        list(base.schema.fields)
        + [
            T.StructField(seq_col, T.LongType()),
            T.StructField(op_col, T.StringType()),
            T.StructField("_batch_id", T.IntegerType()),
        ]
    )


def process_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    base_columns: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> None:
    """One micro-batch: append the batch's changes as its own DELTA
    partition. No state read (merge happens at read time), so replay
    idempotency is structural; the overwrite mode rides on the writer
    (a static-mode session must not truncate other batches' deltas —
    same review-r5c contract as tile_ingest)."""
    cols = [*base_columns, seq_col, op_col]
    batch_df.select(*cols).withColumn("_batch_id", F.lit(batch_id)).write.partitionBy(
        "_batch_id"
    ).option("partitionOverwriteMode", "dynamic").mode("overwrite").parquet(
        _deltas_path(state_dir)
    )


def read_snapshot(
    spark: SparkSession,
    base: DataFrame,
    state_dir: str,
    key_col: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """The current snapshot: base ⊎ all delta partitions resolved by
    per-key LATEST-WINS — max(struct(_batch_id, seq)) elects each key's
    final state in one combine-friendly aggregate (base rows rank below
    every delta), then tombstones drop. Missing delta directory (no
    drain yet) reads as the base unchanged."""
    payload = [c for c in base.columns]
    try:
        deltas = spark.read.schema(_delta_schema(base, seq_col, op_col)).parquet(
            _deltas_path(state_dir)
        )
    except Exception as e:  # PATH_NOT_FOUND / AnalysisException pre-4.0
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return base
        raise
    tagged_base = base.select(
        key_col,
        F.lit(-1).alias("_b"),
        F.lit(-1).cast("long").alias("_s"),
        F.lit(UPSERT).alias("_op"),
        *[F.col(c).alias(f"p_{c}") for c in payload if c != key_col],
    )
    tagged_deltas = deltas.select(
        key_col,
        F.col("_batch_id").alias("_b"),
        F.col(seq_col).cast("long").alias("_s"),
        F.col(op_col).alias("_op"),
        *[F.col(c).alias(f"p_{c}") for c in payload if c != key_col],
    )
    merged = tagged_base.unionByName(tagged_deltas)
    latest = merged.groupBy(key_col).agg(
        F.max(
            F.struct(
                F.col("_b").alias("b"),
                F.col("_s").alias("s"),
                F.col("_op").alias("op"),
                *[
                    F.col(f"p_{c}").alias(f"p_{c}")
                    for c in payload
                    if c != key_col
                ],
            )
        ).alias("_f")
    )
    return latest.filter(F.col("_f.op") == UPSERT).select(
        key_col,
        *[F.col(f"_f.p_{c}").alias(c) for c in payload if c != key_col],
    ).select(*payload)


def compact_snapshot(
    spark: SparkSession,
    base: DataFrame,
    state_dir: str,
    snapshot_dir: str,
    key_col: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> None:
    """Merge-on-read → copy-on-write: fold base + deltas into a fresh
    base directory (never rewrite live state in place); a long feed
    re-points at the compacted base with an empty delta dir."""
    read_snapshot(spark, base, state_dir, key_col, seq_col, op_col).write.mode(
        "overwrite"
    ).parquet(snapshot_dir)


def cdc_upsert_available_now(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    base_columns: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
    timeout_sec: int = 600,
) -> None:
    """Drain a bounded change stream into delta partitions. Restart
    skips processed files via the stream checkpoint; replays overwrite
    their own partition with an identical recomputation."""
    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_batch(
            batch_df, batch_id, state_dir, base_columns, seq_col, op_col
        )

    q = (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout_sec)
    if not finished:
        q.stop()
        raise TimeoutError(f"cdc drain exceeded {timeout_sec}s; stopped")
