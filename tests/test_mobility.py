"""Mobility operators (operators/mobility.py): OD matrix, headway
stats, spatiotemporal matching — hand-built inputs, known answers."""

from __future__ import annotations

from datetime import datetime, timezone

from osm2gtfs_spark.functions.geo import cell_id
from osm2gtfs_spark.operators.mobility import (
    headway_stats,
    od_matrix,
    space_time_match,
)


def _ts(minute, second=0):
    return datetime(2024, 1, 1, 12, minute, second, tzinfo=timezone.utc)


def test_od_matrix_endpoints_and_counts(spark):
    rows = [
        # two traces with the same O→D cells, one reversed
        (1, 0, 10.0, 10.0), (1, 1, 11.0, 11.0), (1, 2, 40.0, 40.0),
        (2, 5, 10.1, 10.1), (2, 9, 40.1, 40.1),
        (3, 0, 40.0, 40.0), (3, 1, 10.0, 10.0),
    ]
    traces = spark.createDataFrame(
        rows, "trace_id long, obs_seq long, lat double, lon double"
    )
    out = {(r.o_cell, r.d_cell): r.n_trips for r in od_matrix(traces, res=4).collect()}
    # compute expected cells via the same engine function
    cells = spark.createDataFrame(
        [(10.0, 10.0), (40.0, 40.0)], "lat double, lon double"
    ).select(cell_id("lat", "lon", 4).alias("c")).collect()
    c10, c40 = cells[0].c, cells[1].c
    assert out == {(c10, c40): 2, (c40, c10): 1}


def test_headway_stats_gaps(spark):
    rows = [
        (1, 7, 5, _ts(0)),
        (2, 7, 5, _ts(10)),
        (3, 7, 5, _ts(25)),
        (4, 9, 5, _ts(0)),  # lone arrival on another route → no gap row
    ]
    arr = spark.createDataFrame(
        rows, "event_id long, route_id long, stop_id long, ts timestamp"
    )
    out = headway_stats(arr).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.route_id, r.stop_id, r.n_trips) == (7, 5, 3)
    assert r.min_gap_ms == 600_000 and r.max_gap_ms == 900_000
    assert r.sum_gap_ms == 1_500_000


def test_headway_stats_tiebreak_deterministic(spark):
    # two arrivals at the identical timestamp: gap 0 exists, order fixed
    rows = [(2, 1, 1, _ts(0)), (1, 1, 1, _ts(0)), (3, 1, 1, _ts(5))]
    arr = spark.createDataFrame(
        rows, "event_id long, route_id long, stop_id long, ts timestamp"
    )
    r = headway_stats(arr).collect()[0]
    assert r.n_trips == 3 and r.min_gap_ms == 0 and r.max_gap_ms == 300_000


def test_space_time_match_prefers_space_within_window(spark):
    events = spark.createDataFrame(
        [(100, 10.0, 10.0, _ts(30))], "event_id long, lat double, lon double, ts timestamp"
    )
    pts = spark.createDataFrame(
        [
            # close in space, 20 min away (inside 30-min window) → winner
            (1, 5, 10.001, 10.001, _ts(50)),
            # closer in time but further in space
            (1, 6, 10.5, 10.5, _ts(31)),
            # closest in space but outside the window
            (2, 7, 10.0, 10.0, _ts(0) .replace(hour=9)),
        ],
        "trace_id long, obs_seq long, lat double, lon double, ts timestamp",
    )
    out = space_time_match(events, pts, res=5, window_ms=1_800_000).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.trace_id, r.obs_seq) == (1, 5)
    assert r.dt_ms == 20 * 60 * 1000


def test_space_time_match_no_candidate_omits_event(spark):
    events = spark.createDataFrame(
        [(100, 10.0, 10.0, _ts(30))], "event_id long, lat double, lon double, ts timestamp"
    )
    pts = spark.createDataFrame(
        [(1, 5, -60.0, 120.0, _ts(31))],
        "trace_id long, obs_seq long, lat double, lon double, ts timestamp",
    )
    assert space_time_match(events, pts, res=5, window_ms=1_800_000).count() == 0


def test_mixture_sample_exact_quotas(spark):
    from osm2gtfs_spark.operators.sampling import mixture_sample

    rows = [(i, "web" if i < 60 else ("code" if i < 80 else "books"))
            for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    # web 60, code 20, books 20; targets 50/30/20 → T capped by code:
    # 20*1000//300 = 66 → quotas web 33, code 19, books 13
    out = mixture_sample(df, "source", {"web": 500, "code": 300, "books": 200},
                         key_col="doc_id")
    got = {s: n for s, n in out.groupBy("source").count().collect()}
    assert got == {"web": 33, "code": 19, "books": 13}
    # determinism: same subset on re-run after a repartition
    ids1 = {r.doc_id for r in out.collect()}
    ids2 = {
        r.doc_id
        for r in mixture_sample(
            df.repartition(13), "source",
            {"web": 500, "code": 300, "books": 200}, key_col="doc_id"
        ).collect()
    }
    assert ids1 == ids2


def test_mixture_sample_validates_targets(spark):
    import pytest as _pytest

    from osm2gtfs_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with _pytest.raises(ValueError):
        mixture_sample(df, "source", {}, key_col="doc_id")
    with _pytest.raises(ValueError):
        mixture_sample(df, "source", {"a": 800, "b": 800}, key_col="doc_id")


def test_route_overlap_jaccard_known_overlap(spark):
    from osm2gtfs_spark.operators.mobility import route_overlap_jaccard

    # route 1: two segments spanning cells x=[0..2] at one row;
    # route 2: one segment over x=[1..3] same row → share 2 cells
    # at res=6 (cell 5.625 deg) rows chosen well inside cells
    segs = spark.createDataFrame(
        [
            (1, 2.0, 2.0, 2.0, 8.0),     # cells x 32..33 (lon 2→8)
            (1, 2.0, 8.0, 2.0, 14.0),    # cells x 33..34
            (2, 2.0, 8.0, 2.0, 20.0),    # cells x 33..35
        ],
        "route_id long, lat1 double, lon1 double, lat2 double, lon2 double",
    )
    out = route_overlap_jaccard(segs, res=6).collect()
    assert len(out) == 1
    r = out[0]
    # route 1 cells {32,33,34}, route 2 {33,34,35} → inter 2, union 4
    assert (r.route_a, r.route_b, r.n_shared, r.jaccard_permille) == (1, 2, 2, 500)


def test_route_overlap_disjoint_routes_absent(spark):
    from osm2gtfs_spark.operators.mobility import route_overlap_jaccard

    segs = spark.createDataFrame(
        [(1, 0.0, 0.0, 0.0, 1.0), (2, 50.0, 50.0, 50.0, 51.0)],
        "route_id long, lat1 double, lon1 double, lat2 double, lon2 double",
    )
    assert route_overlap_jaccard(segs, res=6).count() == 0
