"""Config-driven CLI: the reference's front door, Spark-first.

Mirrors ``osm2gtfs -c config.json`` (reference osm2gtfs/osm2gtfs.py:30-99):
the same flags (``--config/-c``, ``--output/-o``, and the mutually
exclusive ``--refresh-routes/--refresh-stops/--refresh-osm/
--refresh-schedule-source/--refresh-all`` group) and the same config
schema (selector, query, agency, feed_info, stops.name_without,
output_file), with two Spark-native substitutions:

- **inputs** replace the Overpass/network source: the config's
  ``inputs`` section points at fixture XML (``stops_xml``/``routes_xml``),
  a timetable JSON (``timetable``), a Fenix-style schedule
  (``fenix_json``), or an interleaved docs parquet table
  (``docs_parquet``). No network is ever touched.
- **refresh flags** map onto ``CheckpointCatalog.invalidate`` of the
  corresponding stage groups (the reference's pickle-cache refresh,
  core/cache.py) when the config carries a ``cache_dir``.

Operational note for long backfills (ADVICE r4): operators that take a
reliable ``checkpoint_dir`` (e.g. ``dedup.connected_components``) call
``SparkContext.setCheckpointDir``, which is process-global and set-only
— if no checkpoint dir existed before, the setting persists for later
jobs on the same context. Spark also keeps superseded per-iteration
checkpoint copies unless ``spark.cleaner.referenceTracking.
cleanCheckpoints=true`` is set (or the directory is cleaned after the
job).

Selector resolution mirrors the creator factory
(core/creator_factory.py:40-133): a selector with a dedicated plan
module (gh_accra, ci_abidjan, br_florianopolis) dispatches to it;
anything else — including absent — falls back to the default creators
(the factory's ImportError → Default path), logged the same way.
"""

from __future__ import annotations

import argparse
import json
import logging
import os

log = logging.getLogger("osm2gtfs_spark.cli")

# stage groups for --refresh-* → CheckpointCatalog.invalidate, matching
# the checkpointed pipeline's stage DAG (plans/pipeline.py): each group
# is the dependency closure of the data the reference flag refetches
# schedule-path stages carry a sched_ prefix wherever their schema
# differs from the frequency pipeline's same-role stage (so toggling
# schedule_source against an existing cache_dir can never resume
# schema-incompatible data); each closure below lists every stage whose
# output depends on the refreshed source, per pipeline
_SCHED_DOWNSTREAM = [
    "per_service", "sched_filled", "sched_trips", "sched_stop_times",
    "sched_stops_final", "sched_routes_final",
]
STOP_STAGES = [
    "nodes", "ways", "stops", "stations", "parent_map", "stops_final",
    # schedule path: alignment + everything derived from it uses stops
    "sched_filled", "sched_stop_times", "sched_stops_final", "sched_routes_final",
]
ROUTE_STAGES = [
    "relations", "lines", "itineraries", "itin_stops", "shapes",
    "trips", "frequencies", "stop_times", "routes_final", "stops_final",
] + _SCHED_DOWNSTREAM
SCHEDULE_STAGES = ["schedule"] + _SCHED_DOWNSTREAM

DEDICATED_SELECTORS = ("gh_accra", "ci_abidjan", "br_florianopolis")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="osm2gtfs_spark", description="Create GTFS from OpenStreetMap data."
    )
    parser.add_argument("--config", "-c", metavar="FILE", required=True,
                        help="Configuration file")
    parser.add_argument("--output", "-o", metavar="FILENAME", type=str,
                        help="Specify GTFS output zip file")
    group = parser.add_mutually_exclusive_group()
    group.add_argument("--refresh-routes", action="store_true",
                       help="Refresh OSM data for all routes")
    group.add_argument("--refresh-stops", action="store_true",
                       help="Refresh OSM data for all stops")
    group.add_argument("--refresh-osm", action="store_true",
                       help="Refresh all OSM data")
    group.add_argument("--refresh-schedule-source", action="store_true",
                       help="Refresh data for time information")
    group.add_argument("--refresh-all", action="store_true",
                       help="Refresh all OSM and time information data")
    return parser


def load_config(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def resolve_selector(config: dict) -> str:
    """Factory precedence: dedicated plan if one exists, else default."""
    selector = config.get("selector")
    if selector in DEDICATED_SELECTORS:
        log.info("Creators: %s", selector)
        return selector
    log.info("Creators: Default (selector=%s)", selector)
    return "default"


def _refresh_stages(args) -> list[str]:
    if args.refresh_routes:
        return ROUTE_STAGES
    if args.refresh_stops:
        return STOP_STAGES
    if args.refresh_osm:
        return sorted(set(ROUTE_STAGES + STOP_STAGES))
    if args.refresh_schedule_source:
        return SCHEDULE_STAGES
    if args.refresh_all:
        return sorted(set(ROUTE_STAGES + STOP_STAGES + SCHEDULE_STAGES))
    return []


def _output_path(args, config: dict) -> str:
    # precedence mirrors Configuration._define_output_file
    if args.output:
        return args.output
    if "output_file" in config:
        return config["output_file"]
    raise SystemExit("no output file: pass -o or set output_file in the config")


def run(args, spark=None) -> str:
    """Execute the configured pipeline; returns the written zip path."""
    from osm2gtfs_spark.session import build_session
    from osm2gtfs_spark.sources import feed_members as FM
    from osm2gtfs_spark.sources.gtfs_sink import validate_feed
    from osm2gtfs_spark.sources.osm_xml import timetable_docs_df, xml_docs_df

    config = load_config(args.config)
    selector = resolve_selector(config)
    out = _output_path(args, config)
    spark = spark or build_session("osm2gtfs")

    catalog = None
    if config.get("cache_dir"):
        from osm2gtfs_spark.sources.checkpoint import CheckpointCatalog

        catalog = CheckpointCatalog(spark, config["cache_dir"])
        for stage in _refresh_stages(args):
            if catalog.manifest(stage) is None:
                # visible no-op instead of a silent one: e.g. the
                # schedule path is not checkpointed, so
                # --refresh-schedule-source has nothing to clear until a
                # 'schedule' stage exists in this cache_dir
                log.warning("refresh: no cached stage %r to invalidate", stage)
            catalog.invalidate(stage)

    inputs = config.get("inputs", {})
    name_without = config.get("stops", {}).get("name_without", "stop")
    fi = config.get("feed_info", {})

    if "docs_parquet" in inputs:
        # interleaved docs table → the generic scalable pipelines + the
        # sharded distributed sink (corpus-scale path)
        from osm2gtfs_spark.plans.pipeline import (
            run_frequency_pipeline,
            run_frequency_pipeline_checkpointed,
            run_schedule_pipeline,
            run_schedule_pipeline_checkpointed,
        )
        from osm2gtfs_spark.sources.gtfs_sink import write_gtfs_zip

        docs = spark.read.parquet(inputs["docs_parquet"])
        feed_start = fi.get("start_date", "20240101")
        feed_end = fi.get("end_date", "20250101")
        has_schedule = "timetable" in inputs or config.get("schedule_source")
        if has_schedule:
            if "timetable" in inputs:
                # a configured timetable file is DATA, not just a mode
                # switch: its schedule docs join the interleaved corpus
                docs = docs.unionByName(timetable_docs_df(spark, inputs["timetable"]))
            if catalog is not None:
                # ADVICE r3 follow-through: cache_dir is honored on the
                # schedule path too (stage-checkpointed, resume-capable)
                tables = run_schedule_pipeline_checkpointed(
                    docs, catalog, name_without,
                    feed_start=feed_start, feed_end=feed_end,
                )
            else:
                tables = run_schedule_pipeline(
                    docs, name_without=name_without,
                    feed_start=feed_start, feed_end=feed_end, eager=True,
                )
        elif catalog is not None:
            tables = run_frequency_pipeline_checkpointed(
                docs, catalog, name_without, feed_start=feed_start, feed_end=feed_end
            )
        else:
            tables = run_frequency_pipeline(
                docs, name_without=name_without,
                feed_start=feed_start, feed_end=feed_end, eager=True,
            )
        _log_validation(validate_feed(tables))
        return write_gtfs_zip(
            tables, out, agency=config.get("agency"), shards=int(config.get("sink_shards", 1))
        )

    stops_docs = xml_docs_df(spark, [inputs["stops_xml"]])
    routes_docs = xml_docs_df(spark, [inputs["routes_xml"]])

    if selector == "gh_accra":
        from osm2gtfs_spark.plans.accra import build_accra_tables

        tables = build_accra_tables(stops_docs, routes_docs)
        members = FM.members_gh_accra(tables, config)
    elif selector == "ci_abidjan":
        from osm2gtfs_spark.plans.abidjan import build_abidjan_tables

        tables = build_abidjan_tables(
            stops_docs,
            routes_docs,
            default_agency=config.get("agency"),
            start_date=fi.get("start_date", "20200101"),
            end_date=fi.get("end_date", "20201231"),
            solar_times=config.get("solar_times"),
        )
        members = FM.members_ci_abidjan(tables, config)
    elif selector == "br_florianopolis":
        from osm2gtfs_spark.plans.florianopolis import build_florianopolis_tables
        from osm2gtfs_spark.sources.fenix import fenix_docs_df

        tables = build_florianopolis_tables(
            stops_docs,
            routes_docs,
            fenix_docs_df(spark, inputs["fenix_json"]),
            start_date=fi.get("start_date", "20180301"),
            end_date=fi.get("end_date", "20190228"),
        )
        members = FM.members_br_florianopolis(tables, config)
    else:
        from osm2gtfs_spark.plans.default_city import build_city_tables

        tables = build_city_tables(
            stops_docs,
            routes_docs,
            timetable_docs_df(spark, inputs["timetable"]),
            name_without=name_without,
            feed_start=fi.get("start_date", "20240101"),
            feed_end=fi.get("end_date", "20250101"),
        )
        members = FM.members_default(tables, config)

    _log_validation(validate_feed(tables))
    return FM.write_members_zip(members, out)


def _log_validation(report) -> None:
    """feed.Validate equivalent: violations are logged, not fatal (the
    reference uses ProblemReporter, which warns and continues)."""
    for r in report.collect():
        if r.n_bad:
            log.warning("validation: %s -> %d violations", r.check, r.n_bad)


def main(argv: list[str] | None = None) -> None:
    logging.basicConfig(level=os.environ.get("LOGLEVEL", "INFO"))
    args = build_parser().parse_args(argv)
    path = run(args)
    log.info("GTFS feed written to %s", path)
