"""Round-5c: cell anomaly z-scores, flow rose sectors, distinct sketch.

The gate pins cross-engine parity; these pin the statistics the oracle
replay can't single out — planted anomaly direction, exact sector
geometry, and sketch-vs-truth behavior.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from osm2gtfs_spark.operators.aggregates import distinct_buckets
from osm2gtfs_spark.operators.mobility import cell_anomaly, flow_rose


def test_cell_anomaly_flags_planted_spike(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # cell A (lat/lon ~ 10,10): 1 event in hours 0-2, 10 events in hour 3
    for h in range(3):
        rows.append((base + dt.timedelta(hours=h), 10.0, 10.0))
    for i in range(10):
        rows.append((base + dt.timedelta(hours=3, minutes=i), 10.0, 10.0))
    # cell B (lat/lon ~ -50,-50): constant 2 events/hour -> z = 0
    for h in range(4):
        for i in range(2):
            rows.append((base + dt.timedelta(hours=h, minutes=i), -50.0, -50.0))
    pts = spark.createDataFrame(rows, "ts timestamp, lat double, lon double")
    out = cell_anomaly(pts, res=5, window="1 hour").collect()
    by = {}
    for r in out:
        by.setdefault((r.cell_id), []).append(r)
    cells = sorted(by, key=lambda c: -max(r.n for r in by[c]))
    spike_cell = cells[0]
    spike = max(by[spike_cell], key=lambda r: r.n)
    assert spike.n == 10
    # counts [1,1,1,10]: mean 3.25, pstd sqrt(15.1875) -> z ~ 1.732
    assert abs(spike.z - (10 - 3.25) / math.sqrt(15.1875)) < 1e-9
    lows = [r for r in by[spike_cell] if r.n == 1]
    assert all(r.z < 0 for r in lows)
    const_cell = [c for c in by if c != spike_cell][0]
    assert all(r.z == 0.0 and r.n == 2 for r in by[const_cell])


def test_flow_rose_exact_sectors(spark):
    # one trace stepping E, N, W, S, NE, NW, SW, SE from the origin
    steps = [
        (1.0, 0.0, 0.0),    # placeholder replaced below
    ]
    moves = {
        0: (0.0, 1.0),   # E: dlon > 0, |dlon| >= |dlat|
        1: (1.0, 0.0),   # N with dlon >= 0 -> sector 1 branch (adlat > adlon)
        4: (0.0, -1.0),  # W
        5: (-1.0, 0.0),  # S with dlon <= 0 -> sector 5 branch
        7: (-0.5, 1.0),  # SE-ish: dlon > 0, |dlon| >= |dlat|, dlat < 0
        2: (1.0, -0.5),  # N-NW side: adlat > adlon, dlat > 0, dlon < 0
        6: (-1.0, 0.5),  # S-SE side: adlat > adlon, dlat < 0, dlon > 0
        3: (0.5, -1.0),  # NW-W side: adlon >= adlat, dlon < 0, dlat > 0
    }
    rows = []
    tid = 0
    for sector, (dlat, dlon) in moves.items():
        rows.append((tid, 0, 0.0, 0.0))
        rows.append((tid, 1, dlat, dlon))
        tid += 1
    # zero-displacement pair -> dropped
    rows += [(99, 0, 5.0, 5.0), (99, 1, 5.0, 5.0)]
    tr = spark.createDataFrame(
        rows, "trace_id long, obs_seq long, lat double, lon double"
    )
    out = flow_rose(tr, res=4)
    got = {}
    for r in out.collect():
        got[r.sector] = got.get(r.sector, 0) + r.n
    assert got == {s: 1 for s in moves}


def test_distinct_buckets_tracks_truth_and_bounds(spark):
    df = spark.createDataFrame(
        [("a", i % 7) for i in range(1000)] + [("b", i) for i in range(3000)],
        "grp string, v long",
    )
    out = {r.grp: r for r in distinct_buckets(df, "grp", "v").collect()}
    # low cardinality: every distinct value its own bucket (7 << 4096,
    # deterministic for these fixed values)
    assert out["a"].occupied_buckets == 7 and out["a"].n_rows == 1000
    # high cardinality: bounded by the register count, close to truth
    occ = out["b"].occupied_buckets
    assert occ <= 4096
    est = -4096 * math.log(1 - occ / 4096)
    assert abs(est - 3000) / 3000 < 0.1
    with pytest.raises(ValueError):
        distinct_buckets(df, "grp", "v", hex_chars=0)
