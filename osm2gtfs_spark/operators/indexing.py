"""Scale-safe global row indexing (deterministic id assignment).

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY funnels the
entire table through one task — fine for bounded dims, fatal for
row-scale tables (trips = itineraries × services × time-rows). The
reference assigns ids by driver-side insertion order
(transitfeed Schedule.AddTripObject auto-increment); we reproduce the
same total order distributedly in two phases:

1. partition-local ``row_number`` within a *bucket* (the leading prefix
   of the ordering, e.g. route_id) — parallel across buckets;
2. a running offset per bucket, computed by a window over the
   bucket-count aggregate — one narrow row per bucket, so the single
   required SinglePartition exchange only ever sees the aggregate,
   never the row-scale table.

The result is bit-identical to the naive global window whenever the
ordering key is unique (ties keep the same arbitrary-within-group
freedom both formulations have).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# Below this many rows the two-phase machinery costs more than it saves:
# a single-partition window over <=100k narrow rows is one ~10 MB sort
# task (the same bound AQE uses to justify broadcasting a whole table),
# while the two-phase plan adds two extra shuffles and ~4 AQE stage
# rounds of driver latency. Measured at the bench city (2,750 rows,
# local[32]): 0.45 s vs 2.2 s for bit-identical output.
SMALL_INDEX_THRESHOLD = 100_000


def global_index(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "gidx",
    bucket_cols: list[str] | None = None,
    start: int = 1,
    small_threshold: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = global 1-based (or ``start``-based) row index
    under ``ORDER BY order_cols``, without a single-partition window
    over the data.

    ``bucket_cols`` must be a leading prefix of ``order_cols`` (or a
    monotone coarsening of it, e.g. a string prefix of the first
    ordering column added by the caller): ordering rows by
    (bucket, order_cols-within-bucket) must equal ordering by
    ``order_cols``. Defaults to the first ordering column.

    Shuffle shape: one hash exchange on ``bucket_cols`` for the local
    window, one for the count aggregate (AQE-broadcast back), and a
    SinglePartition exchange over *one row per bucket* for the running
    offset. Null bucket keys are handled (null-safe join).

    ``small_threshold``: runtime physical-plan choice in the AQE
    spirit — when set, the input is counted and, if it holds at most
    that many rows, indexed with a plain single-partition window
    (bit-identical output, bounded by the threshold ≈ one sort task).
    Only pass it when ``df`` is cached or cheap to compute: the count
    is an extra action over the input. Callers that cannot bound the
    input leave it ``None`` and always get the scale-safe plan.
    """
    if small_threshold is not None and df.count() <= small_threshold:
        w = Window.orderBy(*[F.col(c) for c in order_cols])
        return df.withColumn(
            out_col, (F.row_number().over(w) + F.lit(start - 1)).cast("long")
        )
    bucket_cols = list(bucket_cols or order_cols[:1])
    local_w = Window.partitionBy(*bucket_cols).orderBy(*[F.col(c) for c in order_cols])

    # window first, then derive bucket sizes as max(local_rn) from the
    # windowed output: the groupBy keys equal the window partitioning, so
    # Catalyst reuses the window's exchange instead of re-scanning df
    local = df.withColumn("_local_rn", F.row_number().over(local_w))
    counts = local.groupBy(*bucket_cols).agg(F.max("_local_rn").alias("_bucket_n"))
    off_w = Window.orderBy(*[F.col(c) for c in bucket_cols]).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.withColumn(
        "_offset", F.coalesce(F.sum("_bucket_n").over(off_w), F.lit(0).cast("long"))
    ).drop("_bucket_n")
    for c in bucket_cols:
        offsets = offsets.withColumnRenamed(c, f"_b_{c}")

    cond = reduce(
        lambda a, b: a & b,
        [F.col(c).eqNullSafe(F.col(f"_b_{c}")) for c in bucket_cols],
    )
    return (
        local.join(offsets, cond)
        .drop(*[f"_b_{c}" for c in bucket_cols])
        .withColumn(out_col, F.col("_local_rn") + F.col("_offset") + F.lit(start - 1))
        .drop("_local_rn", "_offset")
    )
