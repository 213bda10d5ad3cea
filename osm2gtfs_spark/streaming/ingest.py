"""Streaming NEAR-duplicate ingest: the production append pipeline.

:func:`dedup_stream <osm2gtfs_spark.streaming.events.dedup_stream>`
drops exact replays by key; this module drops *near*-duplicates of
everything already admitted — the streaming composition of
``operators/dedup.incremental_dedup`` via ``foreachBatch`` over an
accumulating on-disk state:

- ``<state>/admitted``  — the admitted new documents (text), batch-
  partitioned;
- ``<state>/bands``     — the minhash BAND table of base corpus +
  admitted docs, batch-partitioned. Each micro-batch bands only its
  own admitted rows and appends them; old text is NEVER re-banded
  (the incremental property that makes the append O(batch), not
  O(corpus)). Corpus text is only read for the candidates' exact-
  Jaccard verify lookups.

Exactly-once effect: ``foreachBatch`` is at-least-once, so both state
writes are partitioned by ``_batch_id`` under dynamic partition
overwrite — a replayed batch overwrites its own partition instead of
appending twice (the standard idempotent-sink recipe).

Scale: per batch, work = band join of the batch against the persisted
band table (equi join on (band_idx, band_hash)) + verify on candidate
pairs only. State grows with admitted volume; the band table is the
compact artifact (k/band_size hashes per doc, no text).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm2gtfs_spark.operators import dedup as DD


def _admitted_path(state_dir: str) -> str:
    return os.path.join(state_dir, "admitted")


def _bands_path(state_dir: str) -> str:
    return os.path.join(state_dir, "bands")


def seed_state(
    base_corpus: DataFrame,
    state_dir: str,
    k: int = 8,
    band_size: int = 2,
    doc_id: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Write the base corpus's band table as batch −1 (run once per
    corpus snapshot; the stream then only ever appends)."""
    DD.minhash_bands(doc_id, text_col, base_corpus, k, band_size).withColumn(
        "_batch_id", F.lit(-1)
    ).write.partitionBy("_batch_id").mode("overwrite").parquet(_bands_path(state_dir))


def read_admitted(spark: SparkSession, state_dir: str) -> DataFrame | None:
    p = _admitted_path(state_dir)
    return spark.read.parquet(p) if os.path.exists(p) else None


def neardup_ingest_available_now(
    stream_df: DataFrame,
    base_corpus: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    k: int = 8,
    band_size: int = 2,
    jaccard_threshold_permille: int = 800,
    max_bucket: int | None = 1000,
    doc_id: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Drain the bounded source, admitting each micro-batch against
    base corpus + previously admitted docs. Requires :func:`seed_state`
    to have been run for ``state_dir``. Restartable: the checkpoint
    skips already-processed files, and batch-partitioned dynamic
    overwrite makes replays idempotent."""
    spark = stream_df.sparkSession
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        admitted_prev = read_admitted(s, state_dir)
        corpus_text = (
            base_corpus.select(doc_id, text_col)
            if admitted_prev is None
            else base_corpus.select(doc_id, text_col).unionByName(
                admitted_prev.select(doc_id, text_col)
            )
        )
        cb = s.read.parquet(_bands_path(state_dir)).select(
            doc_id, "band_idx", "band_hash"
        )
        admitted = DD.incremental_dedup(
            batch_df.select(doc_id, text_col),
            corpus_text,
            doc_id=doc_id,
            text_col=text_col,
            k=k,
            band_size=band_size,
            jaccard_threshold_permille=jaccard_threshold_permille,
            max_bucket=max_bucket,
            corpus_bands=cb,
        ).persist()
        try:
            # materialize BEFORE writing: the plan reads the state paths
            # this write appends to — cache first so the write job reads
            # blocks, not the paths it is mutating
            admitted.count()
            admitted.withColumn("_batch_id", F.lit(batch_id)).write.partitionBy(
                "_batch_id"
            ).mode("overwrite").parquet(_admitted_path(state_dir))
            DD.minhash_bands(doc_id, text_col, admitted, k, band_size).withColumn(
                "_batch_id", F.lit(batch_id)
            ).write.partitionBy("_batch_id").mode("overwrite").parquet(
                _bands_path(state_dir)
            )
        finally:
            admitted.unpersist()

    try:
        q = (
            stream_df.writeStream.foreachBatch(_process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
