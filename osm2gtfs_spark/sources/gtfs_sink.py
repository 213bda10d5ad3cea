"""GTFS zip sink + feed validation.

S8: the reference hands a transitfeed ``Schedule`` to
``WriteGoogleTransitFeed`` (osm2gtfs/osm2gtfs.py:93) producing a zip of
CSV tables. Here each table is globally ordered (O5 determinism), written
through Spark's CSV writer as a single part, and assembled into the zip
on the driver — byte-stable across runs and cluster layouts.

S9: transitfeed's ``feed.Validate`` (osm2gtfs.py:90) becomes a set of
assertion DataFrames: FK joins across stops↔stop_times↔trips↔routes and
format predicates; violations are returned as (check, n_bad) rows, not
exceptions, so callers can route them to a metrics sink.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import zipfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# column order observed in the reference's golden zips (FIXTURES.md §5)
GTFS_COLUMNS: dict[str, list[str]] = {
    "stops.txt": ["stop_lon", "stop_name", "stop_lat", "stop_id", "location_type", "parent_station"],
    "routes.txt": [
        "route_type",
        "route_id",
        "route_short_name",
        "route_long_name",
        "route_color",
    ],
    "trips.txt": ["route_id", "trip_id", "service_id", "shape_id", "direction_id", "trip_headsign"],
    "stop_times.txt": [
        "trip_id",
        "arrival_time",
        "departure_time",
        "stop_id",
        "stop_sequence",
        "timepoint",
    ],
    "shapes.txt": ["shape_id", "shape_pt_lat", "shape_pt_lon", "shape_pt_sequence"],
    "calendar.txt": [
        "service_id",
        "monday",
        "tuesday",
        "wednesday",
        "thursday",
        "friday",
        "saturday",
        "sunday",
        "start_date",
        "end_date",
    ],
    "calendar_dates.txt": ["service_id", "date", "exception_type"],
    "frequencies.txt": ["trip_id", "start_time", "end_time", "headway_secs", "exact_times"],
}

SORT_KEYS: dict[str, list[str]] = {
    "stops.txt": ["stop_id"],
    "routes.txt": ["route_id"],
    "trips.txt": ["route_id", "trip_id"],
    "stop_times.txt": ["trip_id", "stop_sequence"],
    "shapes.txt": ["shape_id", "shape_pt_sequence"],
    "calendar.txt": ["service_id"],
    "calendar_dates.txt": ["service_id", "date"],
    "frequencies.txt": ["trip_id", "start_time"],
}


def _write_csv(df: DataFrame, filename: str, out_dir: str) -> str:
    cols = [c for c in GTFS_COLUMNS[filename] if c in df.columns]
    missing = [c for c in GTFS_COLUMNS[filename] if c not in df.columns]
    sel = df.select(
        *[F.col(c).cast("string") for c in cols],
        *[F.lit("").alias(c) for c in missing],
    ).select(*GTFS_COLUMNS[filename])
    # numeric-string sort keys sort numerically when castable
    keys = [
        F.col(k).cast("double").asc_nulls_last() if k in ("trip_id", "stop_sequence", "shape_pt_sequence") else F.col(k).asc()
        for k in SORT_KEYS[filename]
    ]
    tmp = tempfile.mkdtemp(prefix="gtfs_csv_")
    (
        sel.orderBy(*keys)
        .coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .option("emptyValue", "")
        .option("nullValue", "")
        .csv(tmp)
    )
    part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
    dest = os.path.join(out_dir, filename)
    shutil.move(part, dest)
    shutil.rmtree(tmp, ignore_errors=True)
    return dest


def write_gtfs_zip(tables, zip_path: str, agency: dict | None = None) -> str:
    """tables: GtfsTables (plans.pipeline). Returns the zip path."""
    out_dir = tempfile.mkdtemp(prefix="gtfs_feed_")
    # stops.txt needs stop_id/location_type; stations are location_type=1
    stops = tables.stops.select(
        F.col("lon").alias("stop_lon"),
        F.col("name").alias("stop_name"),
        F.col("lat").alias("stop_lat"),
        "stop_id",
        F.lit("0").alias("location_type"),
        F.coalesce("parent_station", F.lit("")).alias("parent_station"),
    ).unionByName(
        tables.stations.select(
            F.col("lon").alias("stop_lon"),
            F.col("name").alias("stop_name"),
            F.col("lat").alias("stop_lat"),
            F.col("station_key").alias("stop_id"),
            F.lit("1").alias("location_type"),
            F.lit("").alias("parent_station"),
        )
    )
    members = {
        "stops.txt": stops,
        "routes.txt": tables.routes,
        "trips.txt": tables.trips,
        "stop_times.txt": tables.stop_times.withColumnRenamed("stop_key", "stop_id"),
        "shapes.txt": tables.shapes,
        "calendar.txt": tables.calendar,
        "frequencies.txt": tables.frequencies,
    }
    if getattr(tables, "calendar_dates", None) is not None:
        members["calendar_dates.txt"] = tables.calendar_dates
    files = []
    for filename, df in members.items():
        files.append(_write_csv(df, filename, out_dir))
    # agency.txt / feed_info.txt are config projections (S6)
    agency = agency or {"agency_id": "O", "agency_name": "Synthetic", "agency_url": "https://example.org", "agency_timezone": "UTC"}
    ag = os.path.join(out_dir, "agency.txt")
    with open(ag, "w") as f:
        f.write(",".join(agency.keys()) + "\n" + ",".join(agency.values()) + "\n")
    files.append(ag)
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(files):
            # fixed timestamp → byte-stable zip
            info = zipfile.ZipInfo(os.path.basename(p), date_time=(2024, 1, 1, 0, 0, 0))
            with open(p, "rb") as f:
                z.writestr(info, f.read())
    shutil.rmtree(out_dir, ignore_errors=True)
    return zip_path


def validate_feed(tables) -> DataFrame:
    """S9: assertion checks → DataFrame(check string, n_bad long)."""
    spark = tables.trips.sparkSession
    st = tables.stop_times.withColumnRenamed("stop_key", "stop_id")
    all_stop_ids = tables.stops.select(F.col("stop_key").alias("stop_id")).unionByName(
        tables.stations.select(F.col("station_key").alias("stop_id"))
    )
    checks = {
        "stop_times_fk_trip": st.join(tables.trips, "trip_id", "left_anti"),
        "stop_times_fk_stop": st.join(all_stop_ids, "stop_id", "left_anti"),
        "trips_fk_route": tables.trips.join(tables.routes, "route_id", "left_anti"),
        "trips_fk_service": tables.trips.join(tables.calendar, tables.trips.service_id == tables.calendar.service_id, "left_anti"),
        "bad_time_format": st.filter(
            ~F.col("arrival_time").rlike(r"^\d{2,}:\d{2}:\d{2}$")
        ),
        "bad_stop_sequence": st.groupBy("trip_id").agg(
            (F.count(F.lit(1)) != F.max("stop_sequence")).alias("bad")
        ).filter("bad"),
        "empty_stop_name": tables.stops.filter((F.col("name").isNull()) | (F.col("name") == "")),
    }
    rows = [(k, df.count()) for k, df in checks.items()]
    return spark.createDataFrame(rows, "check string, n_bad long")


def transitfeed_csv_bytes(header: list[str], rows) -> bytes:
    """Serialize one GTFS member in the exact transitfeed dialect the
    reference's golden zips use: QUOTE_MINIMAL, CRLF, utf-8."""
    import csv as _csv
    import io as _io

    buf = _io.StringIO()
    w = _csv.writer(buf, lineterminator="\r\n")
    w.writerow(header)
    w.writerows(rows)
    return buf.getvalue().encode("utf-8")
