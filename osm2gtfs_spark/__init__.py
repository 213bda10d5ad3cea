"""osm2gtfs_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the data semantics of the reference (grote/osm2gtfs, a
single-process Python ETL: OSM route relations + schedule JSON → GTFS)
as distributed DataFrame operators: grid/H3-style cell encoding,
point-in-polygon, ring-expansion kNN snap, raster↔vector tile coverage,
greedy stop clustering, schedule alignment, and GTFS table assembly —
plus the training-data-pipeline surface (dedup, similarity search,
text analysis, multimodal plumbing) needed at 100 TB scale.

Design rules (see SURVEY.md §4):
- declarative DataFrame/SQL plans; Catalyst + AQE pick physical strategy
- built-in column expressions in every hot path; pandas/Arrow UDFs only
  for genuinely sequential kernels (shape stitching, cursor alignment,
  greedy clustering); never per-row Python UDFs
- no cross joins; kNN via bounded cell-ring expansion
- explicit skew handling (salting + adaptive cell resolution)
- deterministic output ordering before every sink
"""

__version__ = "0.1.0"
