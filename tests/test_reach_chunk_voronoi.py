"""Round-5c: grid Voronoi allocation, bounded-hop reachability,
overlapped chunking.

The DuckDB gate (grid_voronoi_alloc / network_reach_cost /
chunk_text_overlap) enforces cross-engine value parity; these pin the
semantics the oracle replay can't single out — wrap-around claims,
nearest/tie determinism, the Bellman-Ford "indirect beats direct"
case, and chunk tail coverage.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm2gtfs_spark.functions.geo import cell_id
from osm2gtfs_spark.operators.mobility import reach_min_cost
from osm2gtfs_spark.operators.spatial import grid_voronoi
from osm2gtfs_spark.operators.text import chunk_documents

RES = 8


def _cells(spark, pts):
    df = spark.createDataFrame(pts, "lat double, lon double, n long")
    return df.select(
        cell_id("lat", "lon", RES).alias("cell_id"), "n"
    ).groupBy("cell_id").agg(F.sum("n").alias("n"))


def _seeds(spark, pts):
    df = spark.createDataFrame([(la, lo) for la, lo in pts], "lat double, lon double")
    return df.select(cell_id("lat", "lon", RES).alias("seed_cell")).distinct()


def test_voronoi_assigns_nearest_and_drops_far(spark):
    # res-8 columns are 1.40625 deg wide: lon 0.1 -> col 128,
    # 1.5 -> col 129, 3.0 -> col 130
    cells = _cells(
        spark,
        [
            (0.1, 0.1, 5),   # on seed A -> dist 0
            (0.1, 1.5, 7),   # 1 column right of A -> dist 1
            (0.1, 3.0, 2),   # on seed B
            (40.0, 40.0, 9),  # far from both -> dropped
        ],
    )
    seeds = _seeds(spark, [(0.1, 0.1), (0.1, 3.0)])
    out = grid_voronoi(cells, seeds, res=RES, k_max=2).collect()
    assert len(out) == 3
    by_n = {r.n: r for r in out}
    a = _seeds(spark, [(0.1, 0.1)]).first().seed_cell
    b = _seeds(spark, [(0.1, 3.0)]).first().seed_cell
    assert by_n[5].seed_cell == a and by_n[5].grid_dist == 0
    assert by_n[7].seed_cell == a and by_n[7].grid_dist == 1
    assert by_n[2].seed_cell == b and by_n[2].grid_dist == 0


def test_voronoi_tie_breaks_to_smaller_seed_id(spark):
    # a cell exactly between two seeds (1 column to each side:
    # cols 128 / 129 / 130)
    cells = _cells(spark, [(0.1, 1.5, 1)])
    seeds = _seeds(spark, [(0.1, 0.1), (0.1, 3.0)])
    srows = sorted(r.seed_cell for r in seeds.collect())
    out = grid_voronoi(cells, seeds, res=RES, k_max=2).first()
    assert out.grid_dist == 1
    assert out.seed_cell == srows[0]


def test_voronoi_wraps_antimeridian(spark):
    # seed in the last column, occupied cell in the first: wrap dist 1
    cells = _cells(spark, [(0.1, -179.9, 3)])
    seeds = _seeds(spark, [(0.1, 179.9)])
    out = grid_voronoi(cells, seeds, res=RES, k_max=2).collect()
    assert len(out) == 1
    assert out[0].grid_dist == 1


def test_voronoi_rejects_oversized_disk(spark):
    cells = _cells(spark, [(0.1, 0.1, 1)])
    with pytest.raises(ValueError):
        grid_voronoi(cells, _seeds(spark, [(0.1, 0.1)]), res=RES, k_max=7)


def _graph(spark, edges, sources):
    e = spark.createDataFrame(edges, "src long, dst long, cost long")
    und = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "cost")
    )
    s = spark.createDataFrame([(x,) for x in sources], "node long")
    return und, s


def test_reach_indirect_beats_direct(spark):
    # A(1)->B(2) direct cost 10; A->C(3) 1 + C->B 2 = 3 in 2 hops
    edges, src = _graph(spark, [(1, 2, 10), (1, 3, 1), (3, 2, 2)], [1])
    out = {r.node: r for r in reach_min_cost(edges, src, hops=3).collect()}
    assert out[1].min_cost == 0 and out[1].hops == 0
    assert out[2].min_cost == 3 and out[2].hops == 2
    assert out[3].min_cost == 1 and out[3].hops == 1


def test_reach_hop_bound_and_unreachable(spark):
    # chain 1-2-3-4-5, unit costs; hops=2 reaches only through node 3
    chain = [(i, i + 1, 1) for i in range(1, 5)]
    edges, src = _graph(spark, chain, [1])
    nodes = {r.node for r in reach_min_cost(edges, src, hops=2).collect()}
    assert nodes == {1, 2, 3}
    # isolated node 99 never appears
    edges2, src2 = _graph(spark, chain + [(50, 51, 1)], [1])
    nodes2 = {r.node for r in reach_min_cost(edges2, src2, hops=4).collect()}
    assert nodes2 == {1, 2, 3, 4, 5}


def test_reach_equal_cost_prefers_fewer_hops(spark):
    # two cost-4 routes to node 4: 1->4 (4, one hop) vs 1->2->4 (2+2)
    edges, src = _graph(spark, [(1, 4, 4), (1, 2, 2), (2, 4, 2)], [1])
    out = {r.node: r for r in reach_min_cost(edges, src, hops=3).collect()}
    assert out[4].min_cost == 4 and out[4].hops == 1


def test_reach_multi_source_takes_cheapest(spark):
    edges, src = _graph(spark, [(1, 10, 5), (2, 10, 1)], [1, 2])
    out = {r.node: r for r in reach_min_cost(edges, src, hops=1).collect()}
    assert out[10].min_cost == 1 and out[10].hops == 1


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_chunk_exact_layout(spark):
    toks = [f"w{i}" for i in range(15)]
    out = (
        chunk_documents(_docs(spark, [" ".join(toks)]), window=6, stride=4)
        .orderBy("chunk_idx")
        .collect()
    )
    # n=15, w=6, s=4 -> 1 + ceil(9/4) = 4 chunks at 0/4/8/12
    assert [r.start_tok for r in out] == [0, 4, 8, 12]
    assert [r.n_tok for r in out] == [6, 6, 6, 3]
    assert out[0].chunk_text == "w0 w1 w2 w3 w4 w5"
    assert out[3].chunk_text == "w12 w13 w14"


def test_chunk_short_doc_single_chunk(spark):
    out = chunk_documents(_docs(spark, ["a b c"]), window=6, stride=4).collect()
    assert len(out) == 1
    assert out[0].start_tok == 0 and out[0].n_tok == 3
    assert out[0].chunk_text == "a b c"


def test_chunk_covers_every_token_with_overlap(spark):
    texts = [" ".join(f"t{i}" for i in range(n)) for n in (1, 7, 12, 13, 40, 99)]
    out = chunk_documents(_docs(spark, texts), window=12, stride=6)
    cover = out.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("start_tok"), F.col("start_tok") + F.col("n_tok") - 1)
        ).alias("pos"),
    ).distinct()
    n_tokens = out.groupBy("doc_id").agg(
        F.max(F.col("start_tok") + F.col("n_tok")).alias("hi")
    )
    covered = cover.groupBy("doc_id").agg(F.count(F.lit(1)).alias("c"))
    joined = n_tokens.join(covered, "doc_id").collect()
    assert all(r.hi == r.c for r in joined)  # contiguous full coverage
    # consecutive chunks overlap by window - stride when both are full
    full = out.filter(F.col("n_tok") == 12)
    lag = full.withColumn(
        "prev_end",
        F.lag(F.col("start_tok") + F.col("n_tok")).over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window
            .partitionBy("doc_id").orderBy("chunk_idx")
        ),
    ).filter(F.col("prev_end").isNotNull())
    bad = lag.filter(F.col("prev_end") - F.col("start_tok") != 6).count()
    assert bad == 0
