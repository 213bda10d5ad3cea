"""Range (point-in-interval) join — a classic operator Spark lacks.

A naive `points JOIN intervals ON ts BETWEEN start AND end` plans as a
broadcast-nested-loop or cartesian (banned session-wide). This module
equi-izes it: time is bucketed into coarse cells, each interval is
exploded across the buckets it spans, the join runs equi on the bucket,
and the exact BETWEEN predicate filters the candidates.

Scale shape: shuffle keyed by time bucket; an interval costs
ceil(span/bucket)+1 rows, so pick `bucket_secs` near the typical span.
Hot buckets (event storms) are ordinary group skew — AQE skew-join
splits them, or salt the bucket. This is the temporal analog of the
cell-ring spatial join (operators/spatial.knn_snap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_secs: int = 3600,
) -> DataFrame:
    """Inner-join each point row to every interval row containing its
    timestamp (inclusive bounds). Column names must be disjoint apart
    from the join machinery; the `_bkt` helper column is dropped.
    (Outer variants would need the BETWEEN predicate folded into the
    join condition rather than a post-filter — not provided.)
    """
    pb = points.withColumn(
        "_bkt", F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_secs)
    )
    ib = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bucket_secs),
                F.floor(F.unix_timestamp(F.col(end_col)) / bucket_secs),
            )
        ),
    )
    return (
        pb.join(ib, "_bkt")
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("_bkt")
    )
