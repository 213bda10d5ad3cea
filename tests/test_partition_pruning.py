"""Cell-partitioned layout: spatial filters must prune partitions.

The north rule's bbox pruning (reference embeds the bbox in the
Overpass query so the SERVER prunes, osm_connector.py:38-41,570-585)
maps to writing the corpus hive-partitioned by a coarse cell id and
letting Catalyst turn cell predicates into partition filters — a scan
of a city-sized bbox over a planet-sized corpus must touch only that
city's partitions, not the whole table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from osm2gtfs_spark.functions.geo import cell_id, in_bbox
from osm2gtfs_spark.sources import tpch


def test_bbox_scan_prunes_cell_partitions(spark, sf_dir, tmp_path):
    pts = tpch.stops(spark, sf_dir).withColumn("cell_r4", cell_id("lat", "lon", 4))
    out = str(tmp_path / "pts_by_cell")
    pts.write.partitionBy("cell_r4").mode("overwrite").parquet(out)

    back = spark.read.parquet(out)
    n_cells = pts.select("cell_r4").distinct().count()
    assert n_cells > 3  # the fixture spreads over several coarse cells

    one_cell = pts.groupBy("cell_r4").count().orderBy(F.desc("count")).first()
    q = back.filter(F.col("cell_r4") == one_cell["cell_r4"])

    plan = q._jdf.queryExecution().executedPlan().toString()
    # the cell predicate must reach the scan as a PARTITION filter —
    # pruned reads, not a full-table scan + post-filter
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters:", 1)[1].split("]", 1)[0]
    assert "cell_r4" in seg, f"cell predicate not pushed to partitions: {seg}"
    assert q.count() == one_cell["count"]

    # end-to-end: bbox filter composed with the partition column —
    # Catalyst derives the cell from the same lat/lon the bbox uses,
    # so the scan reads only the bbox's coarse cells
    sample = pts.first()
    bbox = (sample["lat"] - 1.0, sample["lon"] - 1.0, sample["lat"] + 1.0, sample["lon"] + 1.0)
    cells = [
        r["cell_r4"]
        for r in pts.filter(in_bbox("lat", "lon", *bbox)).select("cell_r4").distinct().collect()
    ]
    pruned = back.filter(F.col("cell_r4").isin(cells)).filter(in_bbox("lat", "lon", *bbox))
    full = pts.filter(in_bbox("lat", "lon", *bbox))
    assert pruned.count() == full.count()
    plan2 = pruned._jdf.queryExecution().executedPlan().toString()
    assert "cell_r4" in plan2.split("PartitionFilters:", 1)[1].split("]", 1)[0]


def test_ivf_postings_partition_pruned_probe(spark, sf_dir, tmp_path):
    """The IVF 100 TB story made concrete: posting lists written
    hive-partitioned by cell; a probe of nprobe cells must reach the
    scan as a PARTITION filter (reads only those cells' files) and
    return exactly the brute recomputation's rows."""
    from osm2gtfs_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    cents = S.ivf_centroids(emb, n_cells=8, iters=2)
    postings = S.ivf_assign(emb, cents)
    out = str(tmp_path / "postings_by_cell")
    postings.write.partitionBy("cell").mode("overwrite").parquet(out)

    back = spark.read.parquet(out)
    probe_cells = [0, 3]
    q = back.filter(F.col("cell").isin(probe_cells))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters:", 1)[1].split("]", 1)[0]
    assert "cell" in seg, f"cell probe not pushed to partitions: {seg}"

    want = {r.vec_id for r in postings.filter(F.col("cell").isin(probe_cells)).collect()}
    got = {r.vec_id for r in q.collect()}
    assert got == want and 0 < len(got) < emb.count()
