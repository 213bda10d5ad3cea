"""speed_map: hand-computed great-circle speeds, drop rules, partials."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from osm2gtfs_spark.operators.mobility import speed_map

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _pings(spark, rows):
    return spark.createDataFrame(
        [(i, u, T0 + dt.timedelta(seconds=s), la, lo) for i, (u, s, la, lo) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp, lat double, lon double",
    )


def test_speed_hand_computed(spark):
    # 1 degree of longitude at the equator in 1000 s:
    # 6371000 m * pi/180 = 111194.9 m -> 111194 mm/s after floor
    pings = _pings(spark, [(1, 0, 0.0, 0.0), (1, 1000, 0.0, 1.0)])
    out = speed_map(pings, res=5).collect()
    assert len(out) == 1
    assert out[0].n_segments == 1
    assert 111000 <= out[0].sum_speed_mm_s <= 111400


def test_speed_drops_holds_and_clock_skew(spark):
    pings = _pings(
        spark,
        [
            (1, 0, 0.0, 0.0),
            (1, 100, 0.0, 0.0),   # zero displacement -> dropped
            (1, 100, 0.0, 0.5),   # zero time gap -> dropped
            (1, 200, 0.0, 1.0),   # valid segment
        ],
    )
    out = speed_map(pings, res=5).collect()
    assert sum(r.n_segments for r in out) == 1


def test_speed_partials_merge_per_cell(spark):
    # two users produce segments starting in the same origin cell
    pings = _pings(
        spark,
        [
            (1, 0, 0.0, 0.0), (1, 1000, 0.0, 1.0),
            (2, 0, 0.1, 0.1), (2, 500, 0.1, 1.1),
        ],
    )
    out = speed_map(pings, res=4).collect()  # coarse cell: both origins inside
    assert len(out) == 1
    assert out[0].n_segments == 2
    # second user covered ~the same distance in half the time
    assert out[0].sum_speed_mm_s > 3 * 111194
