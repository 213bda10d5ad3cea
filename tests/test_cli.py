"""Config-driven CLI (reference osm2gtfs.py:30-99 front door).

The strongest check: the Accra golden driven END-TO-END through the CLI
— reference config schema in, byte-parity zip out. Plus the factory
selector precedence and the --refresh-* → checkpoint invalidation map.
"""

from __future__ import annotations

import collections
import json
import os
import zipfile

import pytest

from osm2gtfs_spark import cli

FIX = "/root/reference/osm2gtfs/tests/creators/fixtures"
GOLDEN = f"{FIX}/gh_accra/gh_accra_gtfs.zip.ref"


def _args(argv):
    return cli.build_parser().parse_args(argv)


def test_selector_precedence_mirrors_factory():
    assert cli.resolve_selector({"selector": "gh_accra"}) == "gh_accra"
    assert cli.resolve_selector({"selector": "br_florianopolis"}) == "br_florianopolis"
    # ImportError → Default path: unknown selector falls back
    assert cli.resolve_selector({"selector": "xx_nowhere"}) == "default"
    assert cli.resolve_selector({}) == "default"


def test_refresh_flag_stage_groups():
    assert cli._refresh_stages(_args(["-c", "x", "--refresh-stops"])) == cli.STOP_STAGES
    assert cli._refresh_stages(_args(["-c", "x", "--refresh-routes"])) == cli.ROUTE_STAGES
    both = cli._refresh_stages(_args(["-c", "x", "--refresh-osm"]))
    assert set(both) == set(cli.ROUTE_STAGES) | set(cli.STOP_STAGES)
    assert cli._refresh_stages(_args(["-c", "x", "--refresh-all"])) == sorted(
        set(cli.ROUTE_STAGES + cli.STOP_STAGES + cli.SCHEDULE_STAGES)
    )
    assert cli._refresh_stages(_args(["-c", "x"])) == []


def test_output_precedence(tmp_path):
    cfg = {"output_file": "from_config.zip"}
    assert cli._output_path(_args(["-c", "x", "-o", "cli.zip"]), cfg) == "cli.zip"
    assert cli._output_path(_args(["-c", "x"]), cfg) == "from_config.zip"
    with pytest.raises(SystemExit):
        cli._output_path(_args(["-c", "x"]), {})


def test_cli_docs_parquet_scalable_path(spark, tmp_path):
    """The corpus-scale front door: an interleaved docs parquet table in,
    the sharded distributed sink out."""
    from osm2gtfs_spark.sources import docs as D

    docs_path = str(tmp_path / "docs")
    D.docs_df(spark, D.CitySpec(n_lines=2)).write.parquet(docs_path)
    config = {
        "inputs": {"docs_parquet": docs_path},
        "stops": {"name_without": "stop"},
        "agency": {"agency_id": "X", "agency_name": "X", "agency_url": "u", "agency_timezone": "UTC"},
        "feed_info": {"start_date": "20230601", "end_date": "20240531"},
        "output_file": str(tmp_path / "generic.zip"),
        "sink_shards": 2,
    }
    cfg_path = tmp_path / "c.json"
    cfg_path.write_text(json.dumps(config))
    out = cli.run(_args(["-c", str(cfg_path)]), spark=spark)
    with zipfile.ZipFile(out) as z:
        assert {"stops.txt", "routes.txt", "trips.txt", "stop_times.txt"} <= set(z.namelist())
        assert len(z.read("stop_times.txt").splitlines()) > 1
        # review r3: configured feed dates must reach calendar.txt on
        # the docs-parquet path (were silently defaulted before)
        cal = z.read("calendar.txt").decode()
        assert "20230601" in cal and "20240531" in cal


def test_cli_refresh_invalidates_checkpoint_stages(spark, tmp_path):
    """--refresh-stops through the CLI: stop-side checkpoint stages are
    recomputed (new snapshot ids), route-side stages resume untouched —
    the reference's selective cache refresh mapped onto the catalog."""
    from osm2gtfs_spark.sources import docs as D
    from osm2gtfs_spark.sources.checkpoint import CheckpointCatalog

    docs_path = str(tmp_path / "docs")
    D.docs_df(spark, D.CitySpec(n_lines=2)).write.parquet(docs_path)
    config = {
        "inputs": {"docs_parquet": docs_path},
        "cache_dir": str(tmp_path / "ckpt"),
        "agency": {"agency_id": "X", "agency_name": "X", "agency_url": "u", "agency_timezone": "UTC"},
        "output_file": str(tmp_path / "a.zip"),
    }
    cfg = tmp_path / "c.json"
    cfg.write_text(json.dumps(config))

    cli.run(_args(["-c", str(cfg)]), spark=spark)
    cat = CheckpointCatalog(spark, config["cache_dir"])
    snaps1 = {m["stage"]: m["snapshot_id"] for m in cat.metrics()}
    assert "nodes" in snaps1 and "relations" in snaps1

    # plain re-run: everything resumes (no snapshot changes)
    cli.run(_args(["-c", str(cfg), "-o", str(tmp_path / "b.zip")]), spark=spark)
    snaps2 = {m["stage"]: m["snapshot_id"] for m in cat.metrics()}
    assert snaps2 == snaps1

    # --refresh-stops: stop-side stages recomputed, relations untouched
    cli.run(_args(["-c", str(cfg), "-o", str(tmp_path / "c.zip"), "--refresh-stops"]), spark=spark)
    snaps3 = {m["stage"]: m["snapshot_id"] for m in cat.metrics()}
    assert snaps3["nodes"] != snaps1["nodes"]
    assert snaps3["stops"] != snaps1["stops"]
    assert snaps3["relations"] == snaps1["relations"]
    assert snaps3["lines"] == snaps1["lines"]


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="reference fixtures not available")
def test_cli_managua_counts(spark, tmp_path):
    """ni_managua through the CLI (default creators): the reference's
    count contract (tests_ni_managua.py) — its golden zip is absent
    upstream, so counts are the strongest available check."""
    import csv
    import io

    fx = f"{FIX}/ni_managua"
    config = {
        "selector": "ni_managua",
        "stops": {"name_without": "Parada sin nombre"},
        "agency": {"agency_id": "NI-Managua", "agency_name": "Managua",
                   "agency_url": "https://mapanica.net", "agency_timezone": "America/Managua",
                   "agency_lang": "es"},
        "feed_info": {"publisher_name": "MapaNica.net", "publisher_url": "https://mapanica.net",
                      "version": "0.1", "start_date": "20240101", "end_date": "20250101"},
        "inputs": {
            "stops_xml": f"{fx}/overpass-stops.xml",
            "routes_xml": f"{fx}/overpass-routes.xml",
            "timetable": f"{fx}/timetable.json",
        },
        "output_file": str(tmp_path / "managua.zip"),
    }
    cfg = tmp_path / "c.json"
    cfg.write_text(json.dumps(config))
    out = cli.run(_args(["-c", str(cfg)]), spark=spark)
    with zipfile.ZipFile(out) as z:
        stops = list(csv.DictReader(io.TextIOWrapper(z.open("stops.txt"), encoding="utf-8")))
        points = [s for s in stops if s["location_type"] == "0"]
        stations = [s for s in stops if s["location_type"] == "1"]
        assert len(points) == 1450
        assert len(stations) == 547
        routes = list(csv.DictReader(io.TextIOWrapper(z.open("routes.txt"), encoding="utf-8")))
        assert len(routes) == 45


def test_cli_abidjan_selector_smoke(spark, tmp_path):
    """ci_abidjan selector through the CLI on the synthetic opening_hours
    fixtures (the upstream routes XML is absent, so no golden parity —
    the check is the dispatch, member assembly and frequency windows)."""
    from tests.test_opening_hours import ROUTES_XML, STOPS_XML

    (tmp_path / "stops.xml").write_text(STOPS_XML)
    (tmp_path / "routes.xml").write_text(ROUTES_XML)
    config = {
        "selector": "ci_abidjan",
        "agency": {
            "agency_id": "divers",
            "agency_name": "Divers opérateurs",
            "agency_url": "https://example.org",
            "agency_timezone": "Africa/Abidjan",
        },
        "feed_info": {"start_date": "20200101", "end_date": "20201231"},
        "inputs": {
            "stops_xml": str(tmp_path / "stops.xml"),
            "routes_xml": str(tmp_path / "routes.xml"),
        },
        "output_file": str(tmp_path / "abj.zip"),
    }
    cfg = tmp_path / "c.json"
    cfg.write_text(json.dumps(config))
    out = cli.run(_args(["-c", str(cfg)]), spark=spark)
    with zipfile.ZipFile(out) as z:
        assert {"agency.txt", "routes.txt", "trips.txt", "stop_times.txt",
                "frequencies.txt", "calendar.txt", "stops.txt"} <= set(z.namelist())
        ag = z.read("agency.txt").decode().splitlines()
        assert any("Wibus" in line for line in ag)  # per-network agency
        freq = z.read("frequencies.txt").decode().splitlines()
        assert any(",600," in line for line in freq)  # 00:10 peak window
        stops = z.read("stops.txt").decode().splitlines()[1:]
        assert all(line.split(",")[0] not in ("", "None") for line in stops)


def _assert_zip_parity(out_zip: str, golden_zip: str, skip=()):
    with zipfile.ZipFile(out_zip) as ours, zipfile.ZipFile(golden_zip) as gold:
        gold_names = set(gold.namelist()) - set(skip)
        assert set(ours.namelist()) >= gold_names
        for name in sorted(gold_names):
            a, b = ours.read(name), gold.read(name)
            assert len(a) == len(b), f"{name}: size {len(a)} != golden {len(b)}"
            diff = (collections.Counter(a.split(b"\r\n")) - collections.Counter(b.split(b"\r\n"))) + (
                collections.Counter(b.split(b"\r\n")) - collections.Counter(a.split(b"\r\n"))
            )
            assert not diff, f"{name}: {sum(diff.values())} differing lines {list(diff)[:2]}"


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="reference fixtures not available")
def test_cli_florianopolis_golden_end_to_end(spark, tmp_path):
    """Dedicated-selector Fenix path through the CLI, golden parity."""
    fx = f"{FIX}/br_florianopolis"
    config = {
        "selector": "br_florianopolis",
        "agency": {
            "agency_phone": "+55 (48) 3025-6868",
            "agency_url": "http://www.consorciofenix.com.br/",
            "agency_id": "BR-Floripa",
            "agency_name": "Consórcio Fênix",
            "agency_timezone": "America/Sao_Paulo",
            "agency_lang": "pt",
        },
        "feed_info": {
            "publisher_name": "Torsten Grote",
            "publisher_url": "https://transportr.grobox.de",
            "version": "0.1",
            "start_date": "20180301",
            "end_date": "20190228",
        },
        "inputs": {
            "stops_xml": f"{fx}/overpass-stops.xml",
            "routes_xml": f"{fx}/overpass-routes.xml",
            "fenix_json": f"{fx}/timetable.json",
        },
        "output_file": str(tmp_path / "floripa.zip"),
    }
    cfg = tmp_path / "config.json"
    cfg.write_text(json.dumps(config))
    out = cli.run(_args(["-c", str(cfg)]), spark=spark)
    _assert_zip_parity(out, f"{fx}/br_florianopolis_gtfs.zip.ref")


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="reference fixtures not available")
def test_cli_default_city_esteli_golden_end_to_end(spark, tmp_path):
    """Default-selector schedule path through the CLI (Estelí golden)."""
    fx = f"{FIX}/ni_esteli"
    config = {
        "selector": "ni_esteli",  # no dedicated plan → Default creators
        "stops": {"name_without": "Parada sin nombre"},
        "agency": {
            "agency_url": "https://wiki.openstreetmap.org/wiki/ES:Wikiproyecto_Nicaragua/Transporte_p%C3%BAblico/Estel%C3%AD",
            "agency_name": "Estelí",
            "agency_id": "NI-Estelí",
            "agency_timezone": "America/Managua",
            "agency_lang": "es",
        },
        "feed_info": {
            "publisher_name": "MapaNica.net",
            "publisher_url": "https://mapanica.net",
            "version": "0.1",
            "start_date": "20191201",
            "end_date": "20201130",
        },
        "inputs": {
            "stops_xml": f"{fx}/overpass-stops.xml",
            "routes_xml": f"{fx}/overpass-routes.xml",
            "timetable": f"{fx}/timetable.json",
        },
        "output_file": str(tmp_path / "esteli.zip"),
    }
    cfg = tmp_path / "config.json"
    cfg.write_text(json.dumps(config))
    out = cli.run(_args(["-c", str(cfg)]), spark=spark)
    # calendar dates are generated from "now" in the reference; the
    # committed golden's calendar start/end differ from any fixed config
    # → compared by the esteli golden-parity test at table level, here
    # the CLI check is the byte parity of the data members
    _assert_zip_parity(out, f"{fx}/ni_esteli_gtfs.zip.ref")


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="reference fixtures not available")
def test_cli_accra_golden_end_to_end(spark, tmp_path):
    """osm2gtfs_spark -c accra.json → zip whose members are byte-size +
    line-multiset equal to the committed reference golden."""
    config = {
        "selector": "gh_accra",
        "query": {"tags": {"route": "bus"}},
        "stops": {"name_without": "Add a name to the stop with JungleBus app", "name_auto": "yes"},
        "agency": {
            "agency_id": "AM3",
            "agency_name": "Accra Tro tro",
            "agency_url": "https://ama.gov.gh/welcome/transport/",
            "agency_timezone": "Africa/Accra",
            "agency_lang": "en",
        },
        "feed_info": {"start_date": "20170901", "end_date": "20180730"},
        "inputs": {
            "stops_xml": f"{FIX}/gh_accra/overpass-stops.xml",
            "routes_xml": f"{FIX}/gh_accra/overpass-routes.xml",
        },
        "output_file": str(tmp_path / "gh-accra.zip"),
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(config))

    out = cli.run(_args(["-c", str(cfg_path)]), spark=spark)
    assert out == config["output_file"]

    with zipfile.ZipFile(out) as ours, zipfile.ZipFile(GOLDEN) as gold:
        gold_names = set(gold.namelist())
        assert set(ours.namelist()) >= gold_names - {"feed_info.txt"}
        for name in sorted(gold_names):
            if name == "feed_info.txt":
                continue  # reference golden carries none for Accra
            a, b = ours.read(name), gold.read(name)
            assert len(a) == len(b), f"{name}: size {len(a)} != golden {len(b)}"
            diff = (collections.Counter(a.split(b"\r\n")) - collections.Counter(b.split(b"\r\n"))) + (
                collections.Counter(b.split(b"\r\n")) - collections.Counter(a.split(b"\r\n"))
            )
            assert not diff, f"{name}: {sum(diff.values())} differing lines {list(diff)[:2]}"


def test_cli_schedule_path_checkpointed(spark, tmp_path):
    """ADVICE r3 follow-through: cache_dir + a schedule source now runs
    the stage-checkpointed schedule pipeline — stages materialize, plain
    re-runs resume, and --refresh-schedule-source recomputes exactly the
    schedule-side closure."""
    from osm2gtfs_spark.sources import docs as D
    from osm2gtfs_spark.sources.checkpoint import CheckpointCatalog

    docs_path = str(tmp_path / "docs")
    D.docs_df(spark, D.CitySpec(n_lines=2, with_schedule=True)).write.parquet(docs_path)
    config = {
        "inputs": {"docs_parquet": docs_path},
        "cache_dir": str(tmp_path / "ckpt"),
        "schedule_source": "docs",
        "agency": {"agency_id": "X", "agency_name": "X", "agency_url": "u", "agency_timezone": "UTC"},
        "output_file": str(tmp_path / "w.zip"),
    }
    cfg = tmp_path / "c.json"
    cfg.write_text(json.dumps(config))
    out = cli.run(_args(["-c", str(cfg)]), spark=spark)
    with zipfile.ZipFile(out) as z:
        assert len(z.read("stop_times.txt").splitlines()) > 1

    cat = CheckpointCatalog(spark, config["cache_dir"])
    snaps1 = {m["stage"]: m["snapshot_id"] for m in cat.metrics()}
    assert {"schedule", "per_service", "sched_filled", "sched_stop_times"} <= set(snaps1)

    # plain re-run resumes every stage
    cli.run(_args(["-c", str(cfg), "-o", str(tmp_path / "w2.zip")]), spark=spark)
    snaps2 = {m["stage"]: m["snapshot_id"] for m in cat.metrics()}
    assert snaps2 == snaps1

    # --refresh-schedule-source: schedule closure recomputed, OSM decode kept
    cli.run(
        _args(["-c", str(cfg), "-o", str(tmp_path / "w3.zip"), "--refresh-schedule-source"]),
        spark=spark,
    )
    snaps3 = {m["stage"]: m["snapshot_id"] for m in cat.metrics()}
    assert snaps3["schedule"] != snaps1["schedule"]
    assert snaps3["per_service"] != snaps1["per_service"]
    assert snaps3["nodes"] == snaps1["nodes"]
    assert snaps3["relations"] == snaps1["relations"]

    # checkpointed output == non-checkpointed output, member for member
    config2 = {k: v for k, v in config.items() if k != "cache_dir"}
    config2["output_file"] = str(tmp_path / "plain.zip")
    cfg2 = tmp_path / "c2.json"
    cfg2.write_text(json.dumps(config2))
    out_plain = cli.run(_args(["-c", str(cfg2)]), spark=spark)
    with zipfile.ZipFile(out) as za, zipfile.ZipFile(out_plain) as zb:
        assert set(za.namelist()) == set(zb.namelist())
        for name in za.namelist():
            assert sorted(za.read(name).splitlines()) == sorted(zb.read(name).splitlines()), name
