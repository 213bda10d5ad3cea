"""Overpass-XML fixture ingestion → interleaved docs table.

The reference's tests feed Overpass XML fixtures through overpy
(``tests/creators/creators_tests.py:116-138``). We ingest the same XML
files, re-encode each OSM entity as an interleaved document (the
engine's canonical input shape, FIXTURES.md §1), and let the normal
column-only span decode take it from there — so the *entire* engine
path from docs onward is identical for fixture data and synthetic data.

The XML parse itself runs on the driver (fixtures are ≤ 20 MB test
assets, not the data plane); at corpus scale the XML payloads arrive
already sharded inside docs spans and are decoded by pandas UDFs.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

from osm2gtfs_spark.sources.docs import DOCS_SCHEMA, _interleave, _tag_spans


def parse_overpass_xml(path: str) -> list[dict]:
    """XML file → list of {doc_id, spans} dicts (driver-side)."""
    docs: list[dict] = []

    def add(doc_id: str, text_spans: list[tuple[str, str]]) -> None:
        docs.append({"doc_id": doc_id, "spans": _interleave(doc_id, text_spans, every=2)})

    for _ev, el in ET.iterparse(path):
        if el.tag == "node":
            tags = {t.get("k"): t.get("v") for t in el.findall("tag")}
            spans = [("geom", f"{el.get('lat')},{el.get('lon')}")] + _tag_spans(tags)
            add(f"node/{el.get('id')}", spans)
            el.clear()
        elif el.tag == "way":
            tags = {t.get("k"): t.get("v") for t in el.findall("tag")}
            spans = [("noderef", n.get("ref")) for n in el.findall("nd")] + _tag_spans(tags)
            add(f"way/{el.get('id')}", spans)
            el.clear()
        elif el.tag == "relation":
            tags = {t.get("k"): t.get("v") for t in el.findall("tag")}
            spans = [
                ("member", f"{m.get('type')}/{m.get('ref')}/{m.get('role') or ''}")
                for m in el.findall("member")
            ] + _tag_spans(tags)
            add(f"relation/{el.get('id')}", spans)
            el.clear()
    return docs


def timetable_docs_df(spark: SparkSession, path: str, n_partitions: int = 8) -> DataFrame:
    """Reference timetable.json → schedule docs (one doc per schedule
    row, FIXTURES.md §3 shape). Consumption mirrors
    ``trips_creator.py:334-376``."""
    import json

    with open(path) as f:
        tt = json.load(f)
    rows = []
    for ref, trips in tt["lines"].items():
        for i, trip in enumerate(trips):
            payload = {
                "route_ref": ref,
                "from": trip.get("from"),
                "to": trip.get("to"),
                "via": trip.get("via"),
                "services": trip.get("services", []),
                "stations": trip.get("stations", []),
                "times": trip.get("times", []),
            }
            doc_id = f"schedule/{ref}/{i}"
            spans = _interleave(doc_id, [("schedule", json.dumps(payload, sort_keys=True))], 2)
            rows.append((doc_id, [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]))
    return spark.createDataFrame(rows, DOCS_SCHEMA).repartition(n_partitions, "doc_id")


def xml_docs_df(spark: SparkSession, paths: list[str], n_partitions: int = 32) -> DataFrame:
    """One or more Overpass XML files → docs DataFrame (deduplicated:
    the same entity may appear in several query results, reference
    keeps the first — overpy unions by id)."""
    seen: set[str] = set()
    rows = []
    for p in paths:
        for d in parse_overpass_xml(p):
            if d["doc_id"] in seen:
                continue
            seen.add(d["doc_id"])
            rows.append(
                (
                    d["doc_id"],
                    [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]],
                )
            )
    return spark.createDataFrame(rows, DOCS_SCHEMA).repartition(n_partitions, "doc_id")
