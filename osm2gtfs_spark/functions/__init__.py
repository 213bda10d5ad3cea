"""Scalar / column function surface (SURVEY.md §2.7).

All hot-path functions are pure ``pyspark.sql.functions`` column
expressions that stay inside whole-stage codegen. Pandas UDFs appear
only in :mod:`osm2gtfs_spark.operators` for sequential kernels.
"""

from osm2gtfs_spark.functions.geo import (  # noqa: F401
    EARTH_RADIUS_M,
    cell_id,
    cell_ix,
    cell_iy,
    cell_ring,
    haversine_m,
    in_bbox,
    spherical_centroid_aggs,
)
