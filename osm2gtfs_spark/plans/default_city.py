"""Default-creator golden pipeline (Estelí / GAM / Managua semantics).

The reference's default creators (no city overrides): schedule-join
trips (trips_creator.py), P11 stop ids, OSM-stop_area stations, colour
normalization + contrast text colours (routes_creator.py). Reproduces
the committed goldens ``ni_esteli_gtfs.zip.ref`` / ``cr_gam_gtfs.zip.ref``
modulo calendar start/end dates (generated from "now" at reference run
time — inherently unreproducible, compared as day-flags only).

Exact-order contract (O5): transitfeed assigns integer trip ids in
insertion order = lines sorted by ref (lexicographic), itineraries in
master-member order, services in first-occurrence (union-walk) order,
then timetable rows in array order; ids start at 0 and are consumed by
every AddTrip, including trips whose stop walk later breaks.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osm2gtfs_spark.functions.colors import contrast_text_colour, normalize_colour
from osm2gtfs_spark.operators.indexing import global_index
from osm2gtfs_spark.plans import gtfs
from osm2gtfs_spark.plans import schedule_path as SP
from osm2gtfs_spark.sources import docs as docs_mod


@dataclass
class CityTables:
    stops: DataFrame
    routes: DataFrame
    trips: DataFrame
    stop_times: DataFrame
    calendar: DataFrame
    shapes: DataFrame


def verify_itineraries(itineraries: DataFrame, schedule: DataFrame) -> DataFrame:
    """_verify_data (trips_creator.py:119-159): keep itineraries whose
    ref exists in the schedule and whose (from,to)-matching rows all
    have stations[0]==from and stations[-1]==to."""
    refs = schedule.select(F.col("route_ref").alias("route_id")).distinct()
    bad = (
        itineraries.join(
            # schedule rows scale with the corpus — AQE decides
            schedule.select(
                "route_ref",
                F.col("from").alias("s_fr"),
                F.col("to").alias("s_to"),
                "stations",
            ),
            (F.col("route_id") == F.col("route_ref"))
            & (F.col("fr") == F.col("s_fr"))
            & (F.col("to") == F.col("s_to")),
        )
        .filter(
            (F.get("stations", 0) != F.col("fr"))
            | (F.element_at("stations", -1) != F.col("to"))
        )
        .select("itinerary_osm_id")
        .distinct()
    )
    return itineraries.join(F.broadcast(refs), "route_id", "left_semi").join(
        F.broadcast(bad), "itinerary_osm_id", "left_anti"
    )


def build_city_tables(
    stops_docs: DataFrame,
    routes_docs: DataFrame,
    timetable_docs: DataFrame,
    name_without: str = "stop",
    feed_start: str = "20240101",
    feed_end: str = "20250101",
) -> CityTables:
    nodes_s = docs_mod.decode_nodes(stops_docs)
    ways_s = docs_mod.decode_ways(stops_docs)
    rels_s = docs_mod.decode_relations(stops_docs)
    rels_r = docs_mod.decode_relations(routes_docs)
    schedule = docs_mod.decode_schedule(timetable_docs).cache()

    # --- stops + stations (P11 ids; station name WITHOUT brackets) -----
    stops = gtfs.build_stops(nodes_s, ways_s, name_without).cache()
    stations, parent_map = gtfs.build_stations(rels_s, stops)
    stations = stations.withColumn(
        "name", F.when(F.col("name") == "[station]", name_without).otherwise(F.col("name"))
    ).cache()
    stops_txt = (
        stops.join(parent_map, "stop_key", "left")
        .select(
            gtfs.py2_float_str("lon").alias("stop_lon"),
            F.col("name").alias("stop_name"),
            gtfs.py2_float_str("lat").alias("stop_lat"),
            "stop_id",
            F.lit("0").alias("location_type"),
            F.coalesce("parent_station", F.lit("")).alias("parent_station"),
        )
        .unionByName(
            stations.select(
                gtfs.py2_float_str("lon").alias("stop_lon"),
                F.col("name").alias("stop_name"),
                gtfs.py2_float_str("lat").alias("stop_lat"),
                F.col("station_key").alias("stop_id"),
                F.lit("1").alias("location_type"),
                F.lit("").alias("parent_station"),
            )
        )
    )

    # --- lines → routes.txt (colour normalization + contrast) ----------
    lines, itins = gtfs.build_lines(rels_r)
    lines = normalize_colour(lines, "colour", "colour_norm").cache()
    route_type_num = (
        F.when(F.col("route_type") == "Tram", "0")
        .when(F.col("route_type") == "Subway", "1")
        .when(F.col("route_type") == "Rail", "2")
        .when(F.col("route_type") == "Bus", "3")
        .when(F.col("route_type") == "Ferry", "4")
        .otherwise("3")
    )
    text_colour = F.coalesce(
        gtfs.tag("ref:colour_tx"), contrast_text_colour(F.col("colour_norm"))
    )
    routes_txt = lines.select(
        route_type_num.alias("route_type"),
        F.col("route_id"),
        F.col("route_id").alias("route_short_name"),
        F.coalesce("name", F.lit("")).alias("route_long_name"),
        # reference strips the first character unconditionally
        # (routes_creator.py:102-107) — '#rrggbb' → 'rrggbb'
        F.substring(F.coalesce("colour_norm", F.lit("#FFFFFF")), 2, 10).alias("route_color"),
        F.substring(text_colour, 2, 10).alias("route_text_color"),
        F.concat(F.lit("https://osm.org/relation/"), F.col("line_osm_id").cast("string")).alias(
            "route_url"
        ),
    )

    # --- trips + stop_times (schedule join path, exact order) ----------
    itins_ok = verify_itineraries(itins, schedule)
    matched = SP.match_schedule(itins_ok, schedule)
    per_service = SP.itinerary_service_schedule(matched).cache()

    itin_stops_named = (
        gtfs.itinerary_stops(rels_r)
        .join(stops.select("stop_key", "name"), "stop_key", "left")
        .join(parent_map, "stop_key", "left")
        .join(
            # stations scale with the corpus like parent_map — AQE decides
            stations.select(
                F.col("station_key").alias("parent_station"),
                F.col("name").alias("parent_name"),
            ),
            "parent_station",
            "left",
        )
        .select("itinerary_osm_id", "pos", "stop_key", "name", "parent_name")
    )
    aligned = SP.align_stops(itin_stops_named, per_service)
    filled = SP.interpolate_times_distance(aligned, stops.select("stop_key", "lat", "lon"))

    trips_full = (
        global_index(
            per_service.select(
                "itinerary_osm_id",
                "service",
                "route_id",
                "to",
                "itinerary_id",
                "seq",
                "svc_order",
                F.posexplode("times").alias("trip_seq", "_t"),
            ),
            ["route_id", "seq", "itinerary_osm_id", "svc_order", "trip_seq"],
            "_trip_idx",
            start=0,
        )
        .withColumn("trip_id", F.col("_trip_idx").cast("string"))
        .drop("_trip_idx")
        .cache()
    )
    trips_txt = trips_full.select(
        "route_id",
        "trip_id",
        F.col("to").alias("trip_headsign"),
        SP.service_id_col().alias("service_id"),
        F.col("itinerary_id").alias("shape_id"),
    )
    st_order = Window.partitionBy("trip_id").orderBy("pos")
    stop_times_txt = (
        filled.join(
            trips_full.select("trip_id", "itinerary_osm_id", "service", "trip_seq"),
            ["itinerary_osm_id", "service", "trip_seq"],
        )
        .filter(F.col("time_secs_filled").isNotNull())
        .join(stops.select("stop_key", "stop_id"), "stop_key")
        .select(
            "trip_id",
            gtfs.secs_to_gtfs(F.col("time_secs_filled")).alias("arrival_time"),
            gtfs.secs_to_gtfs(F.col("time_secs_filled")).alias("departure_time"),
            "stop_id",
            F.row_number().over(st_order).cast("string").alias("stop_sequence"),
        )
    )
    calendar, _ = SP.build_calendar(per_service.select("service"), feed_start, feed_end)

    # --- shapes: one per itinerary that produced trips (W4/O1) ----------
    # reference _add_shape_to_feed (trips_creator.py:161-176): shape_id =
    # itinerary osm id; transitfeed point sequences are 1-based
    nodes_r = docs_mod.decode_nodes(routes_docs)
    ways_r = docs_mod.decode_ways(routes_docs)
    shapes_txt = (
        gtfs.build_shapes(rels_r, ways_r, nodes_r)
        .join(
            trips_full.select("itinerary_osm_id", "itinerary_id").distinct(),
            "itinerary_osm_id",
        )
        .select(
            F.col("itinerary_id").alias("shape_id"),
            gtfs.py2_float_str("shape_pt_lat").alias("shape_pt_lat"),
            gtfs.py2_float_str("shape_pt_lon").alias("shape_pt_lon"),
            (F.col("shape_pt_sequence") + 1).cast("string").alias("shape_pt_sequence"),
        )
    )
    return CityTables(
        stops=stops_txt,
        routes=routes_txt,
        trips=trips_txt,
        stop_times=stop_times_txt,
        calendar=calendar,
        shapes=shapes_txt,
    )
