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


def test_tile_coverage_stream_matches_batch(spark, sf_dir, tmp_path):
    """Streaming tile coverage (watermarked window × cell) equals the
    batch groupBy on the bounded source."""
    from osm2gtfs_spark.functions.geo import cell_id

    def to_points(df):
        # deterministic synthetic coords from event fields (events carry
        # no geo columns; the operator only needs (ts, lat, lon))
        return df.select(
            "ts",
            ((F.col("user_id") % 180) - 90 + F.col("value") / 1000.0).alias("lat"),
            ((F.col("event_id") % 360) - 180 + F.col("value") / 1000.0).alias("lon"),
        )

    stream = to_points(SE.stream_events(spark, sf_dir))
    out = SE.tile_coverage_stream(stream, res=5, window="1 hour", watermark="2 hours")
    SE.run_available_now(out, "tiles_stream", str(tmp_path / "ckpt_tiles"))
    got = {
        (r.window_start, r.cell_id): r.n_points
        for r in spark.sql("SELECT * FROM tiles_stream").collect()
    }
    batch = to_points(spark.read.parquet(f"{sf_dir}/events.parquet"))
    want = {
        (r.w, r.cell_id): r.n_points
        for r in batch.groupBy(
            F.window("ts", "1 hour").start.alias("w"),
            cell_id("lat", "lon", 5).alias("cell_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_points"))
        .collect()
    }
    assert got == want and len(got) > 10


def test_dedup_stream_drops_replays(spark, sf_dir, tmp_path):
    """Streaming exact dedup: a replayed batch of the same events must
    pass through exactly once (bounded drain equals batch distinct)."""
    src = str(tmp_path / "dup_src")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(200)
    # two overlapping files: the second replays half of the first
    ev.write.parquet(src)
    ev.filter(F.col("event_id") % 2 == 0).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(SE.EVENTS_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    deduped = SE.dedup_stream(stream)
    SE.run_available_now(deduped, "dedup_sink", str(tmp_path / "ck_dd"))
    got = spark.sql("SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS d FROM dedup_sink").collect()[0]
    want = ev.select("event_id").distinct().count()
    assert got.d == want, "every original event id exactly once"
    assert got.n == got.d, "no duplicate rows in the deduped stream"


def test_sessionize_batch_matches_streaming_closed_sessions(spark, sf_dir, tmp_path):
    """The batch sessionizer and the stateful streaming sessionizer are
    the SAME semantics at the same (millisecond) precision: the
    streaming drain's closed sessions equal the batch result minus each
    user's final (still-open) session."""
    import pandas as pd
    from pyspark.sql import functions as F

    from osm2gtfs_spark.streaming.events import sessionize, sessionize_batch, stream_events

    out = sessionize(stream_events(spark, sf_dir))
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_equiv")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.user_id, int(pd.Timestamp(r.session_start).value // 10**6),
         int(pd.Timestamp(r.session_end).value // 10**6), r.n_events)
        for r in spark.sql("SELECT * FROM sessions_equiv").collect()
    }

    batch = sessionize_batch(spark.read.parquet(f"{sf_dir}/events.parquet"))
    rows = batch.select(
        "user_id",
        F.unix_millis(F.col("session_start").cast("timestamp")).alias("s"),
        F.unix_millis(F.col("session_end").cast("timestamp")).alias("e"),
        "n_events",
    ).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.user_id, r.s, r.e, r.n_events))
    closed = set()
    for sess in by_user.values():
        sess.sort(key=lambda t: t[1])
        closed.update(sess[:-1])  # every session but the user's last
    assert streamed == closed and len(closed) > 0
