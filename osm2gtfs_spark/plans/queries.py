"""Driver-contract queries: Spark plan + equivalent DuckDB oracle SQL.

One entry per operator claimed done in SURVEY.md §2. Each Spark callable
takes ``(spark, sf_dir)`` and returns a DataFrame whose column names
match the oracle exactly.

Oracle-parity conventions (hash-compare is exact, so):
- compared outputs are integers / strings / booleans only — monetary
  aggregates emitted as cents (BIGINT), distances never emitted (trig
  differs at ulp level between JVM and libm);
- float columns are used for *ordering* (argmin/argmax) only, where ulp
  differences can't flip the result except on exact ties, which are
  broken by integer keys;
- double sums are pre-rounded to integers per row before aggregation so
  addition order (distributed vs sequential) cannot change the result.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from osm2gtfs_spark.functions.geo import (
    cell_id,
    cell_id_sql,
    cell_ix,
    cell_iy,
    in_bbox,
)
from osm2gtfs_spark.operators.spatial import (
    knn_snap,
    point_in_convex_polygon,
    point_in_convex_polygon_sql,
    tile_coverage,
)
from osm2gtfs_spark.sources import tpch

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


# ---------------------------------------------------------------------------
# A-family: aggregations
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT))        AS sum_qty_x100,
           SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))   AS sum_base_cents,
           SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT))
                                                                  AS sum_disc_cents,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship scan→filter→partial-agg shape (TPC-H Q1 analog).

    Exercises: predicate pushdown to parquet, column pruning, map-side
    combine. The reference's closest analog is its per-route trip/stop
    counting (``trips_creator.py:63-72``)."""
    li = tpch.load(spark, sf_dir, "lineitem")
    cents = lambda c: F.round(c * 100, 0).cast("long")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(cents(F.col("l_quantity"))).alias("sum_qty_x100"),
            F.sum(cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "sum_disc_cents"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Spatial family (north rule): cell encode, tiles, bbox, polygon, kNN
# ---------------------------------------------------------------------------

@register(
    "cell_encode",
    f"""
    WITH s AS ({tpch.STOPS_SQL})
    SELECT stop_key,
           {cell_id_sql('lat', 'lon', 6)}  AS cell_r6,
           {cell_id_sql('lat', 'lon', 12)} AS cell_r12
    FROM s
    """,
)
def cell_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched grid-cell encoding (H3/S2 role) — pure column math."""
    s = tpch.stops(spark, sf_dir)
    return s.select(
        "stop_key",
        cell_id("lat", "lon", 6).alias("cell_r6"),
        cell_id("lat", "lon", 12).alias("cell_r12"),
    )


@register(
    "tile_coverage",
    f"""
    WITH s AS ({tpch.STOPS_SQL})
    SELECT {cell_id_sql('lat', 'lon', 4)} AS cell_id,
           COUNT(*) AS n_points,
           COUNT(DISTINCT nationkey) AS n_nationkey
    FROM s
    GROUP BY 1
    """,
)
def tile_coverage_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster↔vector tile assignment: per-cell coverage aggregates."""
    return tile_coverage(tpch.stops(spark, sf_dir), res=4, count_distinct_col="nationkey")


@register(
    "bbox_filter",
    f"""
    WITH s AS ({tpch.STOPS_SQL})
    SELECT stop_key, nationkey FROM s
    WHERE lat BETWEEN -10.0 AND 40.0 AND lon BETWEEN -20.0 AND 60.0
    """,
)
def bbox_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-bbox (reference J12, Overpass bbox pushdown)."""
    s = tpch.stops(spark, sf_dir)
    return s.filter(in_bbox("lat", "lon", -10.0, -20.0, 40.0, 60.0)).select(
        "stop_key", "nationkey"
    )


# CCW pentagon roughly over Africa/Europe — exercises >4 half-planes.
_PENTAGON = [(-30.0, -10.0), (-10.0, 50.0), (30.0, 60.0), (55.0, 10.0), (20.0, -30.0)]


@register(
    "point_in_polygon",
    f"""
    WITH s AS ({tpch.STOPS_SQL})
    SELECT stop_key FROM s
    WHERE {point_in_convex_polygon_sql(_PENTAGON, 'lat', 'lon')}
    """,
)
def point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon via exact half-plane tests (J12 generalized)."""
    return point_in_convex_polygon(tpch.stops(spark, sf_dir), _PENTAGON).select("stop_key")


@register(
    "knn_snap",
    f"""
    WITH s AS ({tpch.STOPS_SQL}),
         t AS ({tpch.STATIONS_SQL}),
         sc AS (SELECT stop_key, lat, lon,
                       {cell_id_sql('lat', 'lon', 5)} AS cell,
                       LEAST(CAST(FLOOR((lon + 180.0) / 360.0 * 32.0) AS BIGINT), 31) AS ix,
                       LEAST(CAST(FLOOR((lat + 90.0) / 180.0 * 32.0) AS BIGINT), 31) AS iy
                FROM s),
         tc AS (SELECT station_key, lat, lon,
                       LEAST(CAST(FLOOR((lon + 180.0) / 360.0 * 32.0) AS BIGINT), 31) AS ix,
                       LEAST(CAST(FLOOR((lat + 90.0) / 180.0 * 32.0) AS BIGINT), 31) AS iy
                FROM t),
         cand AS (
            SELECT sc.stop_key, tc.station_key,
                   (sc.lat - tc.lat) * (sc.lat - tc.lat)
                 + (sc.lon - tc.lon) * (sc.lon - tc.lon) AS d,
                   ROW_NUMBER() OVER (
                     PARTITION BY sc.stop_key
                     ORDER BY (sc.lat - tc.lat) * (sc.lat - tc.lat)
                            + (sc.lon - tc.lon) * (sc.lon - tc.lon) ASC,
                            tc.station_key ASC) AS rnk
            FROM sc JOIN tc
              ON LEAST(ABS(sc.ix - tc.ix), 32 - ABS(sc.ix - tc.ix)) <= 2
             AND ABS(sc.iy - tc.iy) <= 2)
    SELECT stop_key, station_key AS nearest_station_key
    FROM cand WHERE rnk = 1
    """,
)
def knn_snap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN snap via cell-ring expansion join — NO cross join (J9).

    Candidates = stations within Chebyshev ring k=2 at res 5; winner by
    exact squared-degree distance, tie-broken by station key. The oracle
    reproduces the ring semantics with an |Δix|,|Δiy| ≤ k predicate
    (lon derivation keeps everything off the antimeridian, so the
    engine's pmod wrap and the oracle's plain diff agree)."""
    out = knn_snap(
        tpch.stops(spark, sf_dir),
        tpch.stations(spark, sf_dir),
        res=5,
        k_ring=2,
        distance="sqdeg",
    )
    return out.select("stop_key", "nearest_station_key")


# ---------------------------------------------------------------------------
# Join family: anti joins (P15/P16), full outer residuals (J1)
# ---------------------------------------------------------------------------

@register(
    "unused_stops_anti",
    """
    SELECT c_custkey AS stop_key FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def unused_stops_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P15/P16: prune stops with no trips — left anti join."""
    c = tpch.load(spark, sf_dir, "customer")
    o = tpch.load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select(F.col("c_custkey").alias("stop_key"))
    )


@register(
    "master_variant_full_outer",
    """
    WITH masters AS (SELECT c_custkey AS key, c_name AS master_name
                     FROM customer WHERE c_custkey % 3 = 0),
         variants AS (SELECT o_custkey AS key, COUNT(*) AS n_variants
                      FROM orders GROUP BY o_custkey)
    SELECT COALESCE(m.key, v.key) AS key,
           m.master_name,
           COALESCE(v.n_variants, 0) AS n_variants,
           (m.key IS NOT NULL AND v.key IS NULL) AS masterless_master,
           (m.key IS NULL) AS masterless_variant
    FROM masters m FULL OUTER JOIN variants v ON m.key = v.key
    """,
)
def master_variant_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: route_master↔variant resolution with both-side residuals.

    The reference pops matched variants and keeps leftovers as masterless
    routes (``osm_connector.py:133-204``) — full-outer join semantics."""
    c = tpch.load(spark, sf_dir, "customer")
    o = tpch.load(spark, sf_dir, "orders")
    masters = c.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("m_key"), F.col("c_name").alias("master_name")
    )
    variants = o.groupBy(F.col("o_custkey").alias("v_key")).agg(
        F.count(F.lit(1)).alias("n_variants_raw")
    )
    j = masters.join(variants, masters.m_key == variants.v_key, "full_outer")
    return j.select(
        F.coalesce("m_key", "v_key").alias("key"),
        F.col("master_name"),
        F.coalesce("n_variants_raw", F.lit(0)).alias("n_variants"),
        (F.col("m_key").isNotNull() & F.col("v_key").isNull()).alias("masterless_master"),
        F.col("m_key").isNull().alias("masterless_variant"),
    )


@register(
    "duplicate_ref_guard",
    """
    WITH flagged AS (
      SELECT o_orderkey, o_custkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey ASC) AS rn
      FROM orders)
    SELECT o_orderkey, o_custkey FROM flagged WHERE rn = 1
    """,
)
def duplicate_ref_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: first-wins duplicate route_id guard as a window dedup."""
    o = tpch.load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderkey").asc())
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderkey", "o_custkey")
    )


# ---------------------------------------------------------------------------
# Projection family: stop_id precedence, route-type mapping
# ---------------------------------------------------------------------------

@register(
    "stop_id_precedence",
    """
    SELECT c_custkey,
           COALESCE(CASE WHEN c_custkey % 7 = 0 THEN NULL
                         ELSE 'ref_' || CAST(c_custkey AS VARCHAR) END,
                    'node/' || CAST(c_custkey AS VARCHAR)) AS stop_id
    FROM customer
    """,
)
def stop_id_precedence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11: stop_id = coalesce(ref:gtfs, ref, osm_type/osm_id)."""
    c = tpch.load(spark, sf_dir, "customer")
    ref = F.when(F.col("c_custkey") % 7 == 0, F.lit(None)).otherwise(
        F.concat(F.lit("ref_"), F.col("c_custkey").cast("string"))
    )
    return c.select(
        "c_custkey",
        F.coalesce(ref, F.concat(F.lit("node/"), F.col("c_custkey").cast("string"))).alias(
            "stop_id"
        ),
    )


@register(
    "route_type_mapping",
    """
    SELECT p_partkey,
           CASE WHEN p_type LIKE '%BRASS%' THEN 0
                WHEN p_type LIKE '%COPPER%' THEN 1
                WHEN p_type LIKE '%NICKEL%' THEN 2
                WHEN p_type LIKE '%STEEL%' THEN 3
                WHEN p_type LIKE '%TIN%' THEN 4
                ELSE 3 END AS route_type
    FROM part
    """,
)
def route_type_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: OSM route tag → GTFS route_type CASE-WHEN lookup
    (``elements.py:55-83`` semantics: tram→0, subway→1, rail→2, bus→3,
    ferry→4, unknown→bus)."""
    p = tpch.load(spark, sf_dir, "part")
    rt = (
        F.when(F.col("p_type").contains("BRASS"), 0)
        .when(F.col("p_type").contains("COPPER"), 1)
        .when(F.col("p_type").contains("NICKEL"), 2)
        .when(F.col("p_type").contains("STEEL"), 3)
        .when(F.col("p_type").contains("TIN"), 4)
        .otherwise(3)
    )
    return p.select("p_partkey", rt.alias("route_type"))


# ---------------------------------------------------------------------------
# Text / dedup family over documents (training-data pipeline surface)
# ---------------------------------------------------------------------------

@register(
    "dedup_exact",
    """
    SELECT MD5(text) AS text_md5,
           MIN(doc_id) AS keeper_doc_id,
           COUNT(*) AS dup_count
    FROM documents
    GROUP BY MD5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy keeping min doc_id per identical text."""
    d = tpch.load(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("text_md5")).agg(
        F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("dup_count")
    )


@register(
    "token_count",
    """
    SELECT doc_id,
           LEN(string_split(text, ' ')) AS n_tokens,
           LENGTH(text) AS n_chars_actual
    FROM documents
    """,
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting over documents."""
    d = tpch.load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ", -1)).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_actual"),
    )


@register(
    "quality_score",
    """
    SELECT doc_id,
           LEN(string_split(text, ' ')) AS n_tokens,
           LEN(list_filter(string_split(text, ' '),
                           t -> t IN ('the', 'a', 'and', 'of', 'to'))) AS n_stopwords,
           CAST(FLOOR((LEN(list_filter(string_split(text, ' '),
                            t -> t IN ('the', 'a', 'and', 'of', 'to'))) * 1000.0)
             / LEN(string_split(text, ' '))) AS BIGINT) AS stopword_permille
    FROM documents
    """,
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio as integer permille (no floats)."""
    d = tpch.load(spark, sf_dir, "documents")
    toks = F.split("text", " ", -1)
    stop = F.filter(toks, lambda t: t.isin("the", "a", "and", "of", "to"))
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(stop).cast("long").alias("n_stopwords"),
        F.floor(F.size(stop).cast("long") * 1000.0 / F.size(toks)).cast("long").alias(
            "stopword_permille"
        ),
    )
