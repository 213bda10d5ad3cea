"""Accra golden parity: reference fixture XML → engine → golden zip.

The strongest correctness evidence available: the reference repo ships
its own Accra acceptance fixtures (Overpass XML inputs) and golden GTFS
(``gh_accra_gtfs.zip.ref``). We ingest the same XML through the engine
and assert the reference test contract (tests_gh_accra.py:15-27):
routes=277, stop points=2529, stop areas=1656, and exact stop_times
(trip_id, stop_id, stop_sequence, arrival, departure) for route
7551952 against the golden zip.
"""

from __future__ import annotations

import csv
import io
import os
import zipfile

import pytest
from pyspark.sql import functions as F

from osm2gtfs_spark.plans.accra import build_accra_tables
from osm2gtfs_spark.sources.osm_xml import xml_docs_df

FX = "/root/reference/osm2gtfs/tests/creators/fixtures/gh_accra"
GOLDEN = f"{FX}/gh_accra_gtfs.zip.ref"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="reference fixtures not available"
)


@pytest.fixture(scope="module")
def tables(spark):
    stops_docs = xml_docs_df(spark, [f"{FX}/overpass-stops.xml"])
    routes_docs = xml_docs_df(spark, [f"{FX}/overpass-routes.xml"])
    return build_accra_tables(stops_docs, routes_docs)


def _golden(table: str) -> list[dict]:
    with zipfile.ZipFile(GOLDEN) as z:
        return list(csv.DictReader(io.TextIOWrapper(z.open(table), encoding="utf-8")))


def test_reference_counts(tables):
    """tests_gh_accra.py required_variables contract."""
    stops = tables.stops.collect()
    points = [s for s in stops if s.location_type == ""]
    areas = [s for s in stops if s.location_type == "1"]
    assert len(points) == 2529
    assert len(areas) == 1656
    assert tables.routes.count() == 277
    assert tables.trips.count() == 554


def test_golden_route_stop_times(tables):
    """check_osm_route_stop_times for route 7551952 — exact equality of
    (trip_id, stop_id, stop_sequence, arrival, departure)."""
    golden_trips = {t["trip_id"] for t in _golden("trips.txt") if t["route_id"] == "7551952"}
    got_trips = {
        t.trip_id for t in tables.trips.filter(F.col("route_id") == "7551952").collect()
    }
    assert got_trips == golden_trips, f"trip ids differ: {got_trips} vs {golden_trips}"

    golden_st = sorted(
        (r["trip_id"], r["stop_sequence"], r["stop_id"], r["arrival_time"], r["departure_time"])
        for r in _golden("stop_times.txt")
        if r["trip_id"] in golden_trips
    )
    got_st = sorted(
        (r.trip_id, r.stop_sequence, r.stop_id, r.arrival_time, r.departure_time)
        for r in tables.stop_times.filter(F.col("trip_id").isin(list(golden_trips))).collect()
    )
    assert got_st == golden_st


def test_golden_trips_table(tables):
    """Full trips.txt equality (all 554 rows, all columns)."""
    golden = sorted(
        (t["trip_id"], t["route_id"], t["service_id"], t["shape_id"], t["direction_id"], t["trip_headsign"])
        for t in _golden("trips.txt")
    )
    got = sorted(
        (t.trip_id, t.route_id, t.service_id, t.shape_id, t.direction_id, t.trip_headsign)
        for t in tables.trips.collect()
    )
    assert got == golden


def test_golden_routes_table(tables):
    golden = sorted(
        (r["route_id"], r["route_short_name"], r["route_long_name"], r["route_type"], r["route_color"])
        for r in _golden("routes.txt")
    )
    got = sorted(
        (r.route_id, r.route_short_name, r.route_long_name, r.route_type, r.route_color)
        for r in tables.routes.collect()
    )
    assert got == golden


def test_golden_stops_sample(tables):
    """stop ids, parents and coordinates match the golden stops.txt."""
    golden = {r["stop_id"]: r for r in _golden("stops.txt")}
    got = {r.stop_id: r for r in tables.stops.collect()}
    assert set(got) == set(golden)
    for sid in list(golden)[:200]:
        g, o = golden[sid], got[sid]
        assert o.parent_station == g["parent_station"], sid
        assert abs(float(o.stop_lat) - float(g["stop_lat"])) < 1e-9
        assert o.stop_name == g["stop_name"]


def test_shapes_full_equality(tables):
    """O1 stitcher orientation-exact vs the Accra golden (92,599 rows)."""
    golden = sorted(
        (r["shape_id"], int(r["shape_pt_sequence"]), r["shape_pt_lat"], r["shape_pt_lon"])
        for r in _golden("shapes.txt")
    )
    got = sorted(
        (r["shape_id"], int(r["shape_pt_sequence"]), r["shape_pt_lat"], r["shape_pt_lon"])
        for r in tables.shapes.collect()
    )
    assert len(got) == len(golden)
    diffs = [(a, b) for a, b in zip(golden, got) if a != b]
    assert not diffs, f"{len(diffs)} differing shape rows; first: {diffs[0]}"
