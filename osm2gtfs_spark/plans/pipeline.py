"""End-to-end pipeline: interleaved docs → GTFS tables (Accra path).

The driver-side orchestration mirrors the reference's fixed stage order
(``osm2gtfs/osm2gtfs.py:78-93``): stops → routes → trips → prune. Every
stage is a DataFrame; callers may checkpoint between stages via
:mod:`osm2gtfs_spark.sources.checkpoint`.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm2gtfs_spark.plans import gtfs
from osm2gtfs_spark.sources import docs as docs_mod


@dataclass
class GtfsTables:
    stops: DataFrame
    routes: DataFrame
    trips: DataFrame
    stop_times: DataFrame
    shapes: DataFrame
    frequencies: DataFrame
    calendar: DataFrame
    stations: DataFrame


def run_frequency_pipeline(
    docs: DataFrame,
    name_without: str = "stop",
    feed_start: str = "20240101",
    feed_end: str = "20250101",
    persist: bool = True,
) -> GtfsTables:
    """docs → decoded entities → GTFS tables via the frequency path.

    ``persist=True`` caches the stages consumed by multiple sinks
    (decoded entities, trips) — the GTFS DAG fans out into 6+ output
    tables, and without this every sink re-runs the decode and joins.
    On a cluster these become checkpoint table writes instead
    (sources/checkpoint.py), which also give resume."""
    nodes = docs_mod.decode_nodes(docs)
    ways = docs_mod.decode_ways(docs)
    relations = docs_mod.decode_relations(docs)
    if persist:
        nodes, ways, relations = nodes.cache(), ways.cache(), relations.cache()

    stops = gtfs.build_stops(nodes, ways, name_without)
    stations, parent_map = gtfs.build_stations(relations, stops)
    lines, itineraries = gtfs.build_lines(relations)
    itin_stops = gtfs.itinerary_stops(relations)
    shapes = gtfs.build_shapes(relations, ways, nodes).withColumn(
        "shape_id",
        F.concat(F.lit("relation/"), F.col("itinerary_osm_id").cast("string")),
    )
    trips_full = gtfs.build_trips(lines, itineraries)
    if persist:
        trips_full = trips_full.cache()
    frequencies = gtfs.build_frequencies(trips_full)
    stop_times = gtfs.build_stop_times(trips_full, itin_stops)
    if persist:
        stop_times = stop_times.cache()
    trips = trips_full.drop("itinerary_osm_id", "frequency_min", "travel_min")

    stops_final = gtfs.prune_unused_stops(stops, stop_times).join(
        F.broadcast(parent_map), "stop_key", "left"
    )
    routes_final = gtfs.prune_unused_routes(lines, trips).select(
        "route_id",
        F.col("name").alias("route_long_name"),
        F.col("route_id").alias("route_short_name"),
        "route_type",
        F.col("colour").alias("route_color"),
    )
    spark = docs.sparkSession
    calendar = spark.createDataFrame(
        [("always", 1, 1, 1, 1, 1, 1, 1, feed_start, feed_end)],
        "service_id string, monday int, tuesday int, wednesday int, thursday int,"
        " friday int, saturday int, sunday int, start_date string, end_date string",
    )
    return GtfsTables(
        stops=stops_final,
        routes=routes_final,
        trips=trips,
        stop_times=stop_times,
        shapes=shapes,
        frequencies=frequencies,
        calendar=calendar,
        stations=stations,
    )
