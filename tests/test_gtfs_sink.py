"""GTFS zip sink determinism + feed validation (S8/S9)."""

from __future__ import annotations

import zipfile

import pytest

from osm2gtfs_spark.plans.pipeline import run_frequency_pipeline
from osm2gtfs_spark.sources import docs as D
from osm2gtfs_spark.sources.gtfs_sink import validate_feed, write_gtfs_zip


@pytest.fixture(scope="module")
def tables(spark):
    return run_frequency_pipeline(D.docs_df(spark, D.CitySpec(n_lines=3, with_stop_areas=True)))


def test_zip_members_and_determinism(tables, tmp_path):
    p1 = write_gtfs_zip(tables, str(tmp_path / "a.zip"))
    p2 = write_gtfs_zip(tables, str(tmp_path / "b.zip"))
    b1, b2 = open(p1, "rb").read(), open(p2, "rb").read()
    assert b1 == b2, "zip must be byte-stable across runs (O5)"
    with zipfile.ZipFile(p1) as z:
        names = set(z.namelist())
        assert {
            "stops.txt",
            "routes.txt",
            "trips.txt",
            "stop_times.txt",
            "shapes.txt",
            "calendar.txt",
            "frequencies.txt",
            "agency.txt",
        } <= names
        st = z.read("stop_times.txt").decode().splitlines()
        assert st[0] == "trip_id,arrival_time,departure_time,stop_id,stop_sequence,timepoint"
        # ordered by (trip_id numeric, stop_sequence)
        keys = [(float(r.split(",")[0]), int(r.split(",")[4])) for r in st[1:]]
        assert keys == sorted(keys)
        # station rows flagged location_type=1 with empty parent
        stops_rows = z.read("stops.txt").decode().splitlines()[1:]
        assert any(r.split(",")[4] == "1" for r in stops_rows)


def test_validate_feed_clean(tables):
    checks = {r.check: r.n_bad for r in validate_feed(tables).collect()}
    assert set(checks) == {
        "stop_times_fk_trip",
        "stop_times_fk_stop",
        "trips_fk_route",
        "trips_fk_service",
        "bad_time_format",
        "bad_stop_sequence",
        "empty_stop_name",
    }
    assert all(v == 0 for v in checks.values()), f"validation failures: {checks}"
