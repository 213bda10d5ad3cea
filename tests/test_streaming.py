"""Structured Streaming: windowed agg parity with batch + sessionizer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm2gtfs_spark.streaming import events as SE


def test_windowed_counts_match_batch(spark, sf_dir, tmp_path):
    stream = SE.stream_events(spark, sf_dir)
    assert stream.isStreaming
    agg = SE.windowed_counts(stream)
    SE.run_available_now(agg, "win_counts", str(tmp_path / "ck1"))
    got = {
        (r.window_start, r.event_type): (r.n, r.cents)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "cents")
    )
    want = {(r.window_start, r.event_type): (r.n, r.cents) for r in batch.collect()}
    assert got == want, "availableNow streaming agg must equal batch agg"


def test_sessionize_stateful(spark, sf_dir, tmp_path):
    stream = SE.stream_events(spark, sf_dir)
    sess = SE.sessionize(stream)
    SE.run_available_now(sess, "sessions", str(tmp_path / "ck2"))
    rows = spark.sql("SELECT * FROM sessions").collect()
    # bounded single-batch input: only CLOSED sessions are emitted
    # (the trailing open session per user stays in state)
    assert rows, "expected closed sessions"
    for r in rows:
        assert r.session_end >= r.session_start
        assert r.n_events >= 1
    # verify one user's sessions against a pandas recompute
    pdf = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("user_id") == rows[0].user_id)
        .orderBy("ts")
        .toPandas()
    )
    gaps = pdf.ts.diff().dt.total_seconds().fillna(0)
    n_breaks = int((gaps > 1800).sum())
    got_user = [r for r in rows if r.user_id == rows[0].user_id]
    assert len(got_user) == n_breaks, "closed sessions = number of >30min gaps"
