"""Fenix schedule ingestion (br_florianopolis path).

The reference fetches ``linhas.json`` from the Consórcio Fênix API
(config ``schedule_source``) and consumes it in
``creators/br_florianopolis/trips_creator_br_florianopolis.py``:
per line ref → nome, tempo_de_percurso ("HH:MM aproximado"), horarios
keyed "«day» - Saída «place»" with values [[ [time, opt], ... ], ...],
and operacoes (service-exception dates).

We encode each linha as one interleaved doc (span kind ``fenix``) and
decode with column-only ``from_json`` — the same docs-table shape every
other source uses, so the engine path is uniform.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from osm2gtfs_spark.sources.docs import DOCS_SCHEMA, _interleave

WEEKDAY, SATURDAY, SUNDAY = "Dias Úteis", "Sábado", "Domingo"
NO_DURATION = "não encontrado"

FENIX_PAYLOAD = StructType(
    [
        StructField("ref", StringType()),
        StructField("nome", StringType()),
        StructField("tempo_de_percurso", StringType()),
        StructField("horarios", MapType(StringType(), ArrayType(ArrayType(ArrayType(StringType()))))),
        StructField(
            "operacoes",
            ArrayType(
                StructType(
                    [StructField("data", StringType()), StructField("tipo", StringType())]
                )
            ),
        ),
    ]
)


def fenix_docs_df(spark: SparkSession, path: str, n_partitions: int = 8) -> DataFrame:
    """linhas.json (reference fixture ``timetable.json``) → docs table."""
    with open(path) as f:
        data = json.load(f)["data"]
    rows = []
    for ref, linha in data.items():
        payload = {
            "ref": ref,
            "nome": linha.get("nome"),
            "tempo_de_percurso": linha.get("tempo_de_percurso"),
            "horarios": linha.get("horarios", {}),
            "operacoes": [
                {"data": o["data"], "tipo": o["tipo"]} for o in linha.get("operacoes", [])
            ],
        }
        doc_id = f"fenix/{ref}"
        spans = _interleave(doc_id, [("fenix", json.dumps(payload, sort_keys=True))], 2)
        rows.append(
            (doc_id, [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans])
        )
    return spark.createDataFrame(rows, DOCS_SCHEMA).repartition(n_partitions, "doc_id")


def decode_fenix(docs: DataFrame) -> DataFrame:
    """docs → one row per linha with typed horarios/operacoes columns."""
    payload = F.filter("spans", lambda s: s.kind == F.lit("fenix"))[0]["text"]
    return docs.filter(
        F.exists("spans", lambda s: s.kind == F.lit("fenix"))
    ).select(F.from_json(payload, FENIX_PAYLOAD).alias("p")).select("p.*")


def fenix_lines(fenix: DataFrame) -> DataFrame:
    """Per-ref line attributes: nome + parsed duration.

    ``tempo_de_percurso`` "HH:MM[ aproximado]" → seconds; the literal
    "não encontrado" marks the route invalid (reference skips it with
    an error, trips_creator_br_florianopolis.py:80-84)."""
    dur = F.trim(F.regexp_replace("tempo_de_percurso", "aproximado", ""))
    return fenix.select(
        "ref",
        "nome",
        F.when(
            F.col("tempo_de_percurso").contains(NO_DURATION), F.lit(None).cast("long")
        )
        .otherwise(
            F.split(dur, ":")[0].cast("long") * 3600 + F.split(dur, ":")[1].cast("long") * 60
        )
        .alias("duration_secs"),
    )


def fenix_departures(fenix: DataFrame) -> DataFrame:
    """Exploded departures: (ref, day_kind, saida, grp, pt, dep_secs).

    horarios keys "«day» - Saída «place»" split into the service kind
    (weekday/saturday/sunday, trips_creator_br_florianopolis.py:108-117)
    and the departure-place name used for first-stop matching."""
    h = fenix.select("ref", F.explode("horarios").alias("day_key", "groups"))
    day_kind = (
        F.when(F.col("day_key").startswith(WEEKDAY), "weekday")
        .when(F.col("day_key").startswith(SATURDAY), "saturday")
        .when(F.col("day_key").startswith(SUNDAY), "sunday")
    )
    saida = F.regexp_replace(
        "day_key", "^(" + WEEKDAY + "|" + SATURDAY + "|" + SUNDAY + ") - Saída ", ""
    )
    return (
        h.select(
            "ref",
            day_kind.alias("day_kind"),
            saida.alias("saida"),
            F.posexplode("groups").alias("grp", "points"),
        )
        .select(
            "ref",
            "day_kind",
            "saida",
            "grp",
            F.posexplode("points").alias("pt", "point"),
        )
        .select(
            "ref",
            "day_kind",
            "saida",
            "grp",
            "pt",
            F.col("point")[0].alias("dep_hm"),
            (
                F.split(F.col("point")[0], ":")[0].cast("long") * 3600
                + F.split(F.col("point")[0], ":")[1].cast("long") * 60
            ).alias("dep_secs"),
        )
    )


def fenix_exceptions(fenix: DataFrame) -> DataFrame:
    """(ref, exc_idx, date 'YYYY-MM-DD', tipo) service-exception rows.

    ``exc_idx`` preserves the operacoes array order — the reference
    iterates it directly (trips_creator_br_florianopolis.py:137-151),
    which fixes the trip insertion order when exceptions are active."""
    return fenix.select("ref", F.posexplode("operacoes").alias("exc_idx", "o")).select(
        "ref", "exc_idx", F.col("o.data").alias("data"), F.col("o.tipo").alias("tipo")
    )
