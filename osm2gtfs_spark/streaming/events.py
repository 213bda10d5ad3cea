"""Streaming operators over the events table.

The reference is strictly batch (SURVEY.md §2.8); this module is the
engine's Structured Streaming surface for the same operator shapes at
ingest time:

- :func:`windowed_counts` — watermarked tumbling-window aggregation
  (late data dropped past the watermark); identical results to the
  batch groupBy on a bounded input, which is exactly what the test
  asserts via ``Trigger.AvailableNow``.
- :func:`sessionize` — custom stateful operator via
  ``applyInPandasWithState``: gap-based user sessions (the streaming
  analog of the J7-style per-key sequential kernels).

At production scale the source is a stream of doc/tile events; here the
parquet events table doubles as a file-stream source.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream source over the events parquet (one file = one batch)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )


def windowed_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts + cents sum per event_type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "cents")
    )


_SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.IntegerType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("last_ms", T.LongType()),
        T.StructField("n", T.IntegerType()),
    ]
)

SESSION_GAP_MS = 30 * 60 * 1000


def _sessionize_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Gap-based sessionizer: emits a session row whenever a >30 min gap
    closes one. State = (start_ms, last_ms, n) of the open session.

    Event-time timeout (VERDICT r4 item 3): when the watermark passes
    an open session's gap horizon (last_ms + gap), the session is
    emitted as final and its state row is REMOVED — state size is
    bounded by the watermark horizon × active-user rate, never by the
    lifetime user count (an idle user's last session used to sit in
    state forever and was never emitted)."""
    (user_id,) = key
    rows = []
    if state.hasTimedOut:
        # watermark passed last_ms + gap with no new events: the open
        # session is final — emit it and drop the state row
        start_ms, last_ms, n = state.get
        rows.append((user_id, start_ms, last_ms, n))
        state.remove()
    else:
        # INTERVAL MERGE, not a tail-append fold (review r5): a late-
        # but-admitted event can arrive in a LATER micro-batch with an
        # earlier timestamp than the open session's last_ms (or even its
        # start_ms). Appending it to the tail would move last_ms
        # backward and mis-split sessions the batch twin keeps whole.
        # Instead the open-session state participates as one interval in
        # a time-ordered sweep over [state] + this batch's events —
        # identical result to re-running the batch sessionizer over the
        # union, which is exactly the equivalence the gate asserts.
        intervals: list[list[int]] = []  # [start, end, n], time-ordered sweep input
        if state.exists:
            s0, e0, n0 = state.get
            intervals.append([s0, e0, n0])
        ts_list: list[int] = []
        for pdf in pdfs:
            ts_list.extend(int(t.value // 10**6) for t in pd.to_datetime(pdf.ts))
        intervals.extend([t, t, 1] for t in ts_list)
        intervals.sort(key=lambda iv: (iv[0], iv[1]))
        merged: list[list[int]] = []
        for iv in intervals:
            if merged and iv[0] - merged[-1][1] <= SESSION_GAP_MS:
                merged[-1][1] = max(merged[-1][1], iv[1])
                merged[-1][2] += iv[2]
            else:
                merged.append(iv)
        # all but the trailing interval are gap-closed; the trailing one
        # is the open session unless the watermark already passed it
        for s0, e0, n0 in merged[:-1]:
            rows.append((user_id, s0, e0, n0))
        if merged:
            s0, e0, n0 = merged[-1]
            wm = state.getCurrentWatermarkMs()
            if wm > e0 + SESSION_GAP_MS:
                # late-but-admitted batch: the horizon already passed
                rows.append((user_id, s0, e0, n0))
                state.remove()
            else:
                state.update((s0, e0, n0))
                state.setTimeoutTimestamp(e0 + SESSION_GAP_MS)
    if rows:
        yield pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "session_start": [pd.Timestamp(r[1], unit="ms") for r in rows],
                "session_end": [pd.Timestamp(r[2], unit="ms") for r in rows],
                "n_events": [r[3] for r in rows],
            }
        )


def sessionize(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState,
    EventTimeTimeout): closed sessions emit in-batch; each open session
    emits when the watermark passes its gap horizon, clearing state."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            outputStructType=_SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def tile_coverage_stream(
    points: DataFrame,
    res: int = 6,
    window: str = "1 hour",
    watermark: str = "2 hours",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Streaming raster↔vector tile assignment: watermarked per-window
    per-cell coverage counts over a stream of (ts, lat, lon) points —
    the north star's 'schedule coverage maps' shape at ingest time.

    Identical cell math as the batch operator (functions/geo.cell_id),
    so a bounded drain equals the batch groupBy — asserted in
    tests/test_streaming.py. Late points past the watermark are dropped;
    state is bounded by (windows in flight × occupied cells)."""
    from osm2gtfs_spark.functions.geo import cell_id

    return (
        points.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window).alias("w"),
            cell_id(lat_col, lon_col, res).alias("cell_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_points"))
        .select(F.col("w.start").alias("window_start"), "cell_id", "n_points")
    )


def dedup_stream(
    events: DataFrame,
    key_cols: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup at ingest: first occurrence of each key
    passes, replays/duplicates are dropped — the streaming twin of the
    batch exact-dedup operator (operators/dedup), and the standard
    exactly-once-ingest building block.

    ``dropDuplicatesWithinWatermark`` keeps state only until the
    watermark passes a key's event time, so state is bounded by the
    watermark horizon × arrival rate (a plain dropDuplicates would grow
    state forever on an unbounded stream). Late duplicates beyond the
    watermark are already out of the dedup horizon by definition."""
    key_cols = key_cols or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(key_cols)


def run_available_now(stream_df: DataFrame, query_name: str, checkpoint_dir: str) -> None:
    """Drain the bounded source into a memory sink (test/bench helper)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(
            "append"
            if ("session" in query_name or "dedup" in query_name)
            else "complete"
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def sessionize_batch(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Batch twin of the stateful streaming sessionizer: gap-based
    sessions per user as pure window algebra — break where the gap to
    the previous event exceeds ``gap_minutes``, session id = running
    count of breaks, then one aggregate per (user, session).

    Returns (user_id, session_start, session_end, n_events) for ALL
    sessions. The streaming twin emits gap-closed sessions in-batch and
    each open session once the watermark passes its gap horizon
    (EventTimeTimeout) — on a fully-drained bounded source the only
    residual difference is sessions still inside the final watermark
    horizon, which the equivalence test accounts for. Windows are
    partitioned by user — no global ordering, scale-safe."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    # millisecond epochs — the SAME precision as the streaming
    # sessionizer's state (SESSION_GAP_MS), so batch and streaming agree
    # on boundary gaps; NTZ-safe via the session-UTC timestamp cast
    es = F.unix_millis(F.col(ts_col).cast("timestamp"))
    gap = es - F.lag(es).over(w)
    brk = F.when(gap.isNull() | (gap > gap_minutes * 60_000), 1).otherwise(0)
    sess = (
        events.select(F.col(user_col), F.col(ts_col))
        .withColumn("_brk", brk)
        .withColumn(
            "_sid", F.sum("_brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
    )
    return (
        sess.groupBy(user_col, "_sid")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("_sid")
    )


def hot_cells_stream(
    points: DataFrame,
    res: int,
    min_points: int,
    window: str = "6 hours",
    watermark: str = "2 hours",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Streaming hotspot detection: the (window, cell) coverage rows
    whose count reaches ``min_points`` — the alerting tail of the
    coverage map ("this tile just went dense") at ingest time.

    The filter sits ON TOP of the watermarked windowed aggregate, so in
    append mode an alert is emitted exactly once, when the watermark
    finalizes its window — no flapping partial counts; a bounded drain
    equals the batch GROUP BY ... HAVING truth, which is exactly what
    the gate asserts. State stays the coverage aggregate's (windows in
    flight × occupied cells); the filter adds none."""
    cov = tile_coverage_stream(points, res, window, watermark, lat_col, lon_col)
    return cov.filter(F.col("n_points") >= min_points)


def geofence_stream(
    points: DataFrame,
    polygons: DataFrame,
    res: int = 4,
    window: str = "1 hour",
    watermark: str = "2 hours",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Streaming geofencing: watermarked per-window occupancy counts of
    a point stream inside each fence polygon —
    (window_start, polygon_id, n_events). "How many vehicles entered
    each district this hour", answered at ingest time.

    The containment test is the SAME cell-bucketed stream-static join
    as the batch operator (operators/spatial.polygon_table_join): the
    static polygon side explodes its bbox cells once per micro-batch
    and Spark broadcasts it (stream-static inner equi join — fully
    supported, no stream-side state); the exact per-edge cross-product
    fold runs post-join. State is only the downstream windowed
    aggregate's (windows in flight × occupied fences); a bounded drain
    equals the batch GROUP BY truth, which is what the gate asserts.
    Overlapping fences each count the point — join semantics, same as
    batch."""
    from osm2gtfs_spark.operators.spatial import polygon_table_join

    hits = polygon_table_join(
        points.withWatermark("ts", watermark), polygons, res, lat_col, lon_col
    )
    return (
        hits.groupBy(F.window("ts", window).alias("w"), "polygon_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "polygon_id", "n_events")
    )
