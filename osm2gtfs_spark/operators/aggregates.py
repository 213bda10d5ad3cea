"""Exact order-statistic aggregates.

Spark's ``percentile_approx`` is the scale default but its sketches are
engine-specific — useless against a cross-engine value oracle and
occasionally surprising in pipelines that need reproducible cut
points. These operators compute EXACT order statistics with
deterministic semantics instead: the k-th order statistic is selected
by row_number inside each group, which is well-defined under duplicate
values (the VALUE picked is the same whichever tied row wins the rank).

Scale shape: one window partitioned by the group key — the sort is
per-group, never global; skew is bounded by the hottest group's row
count (same bound as any per-key window in the engine)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_median(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """(group, median): the exact LOWER median — the ceil(n/2)-th
    ascending value per group (for even n the smaller middle value; no
    interpolation, so integer columns stay integers and every engine
    agrees bit-for-bit).

    NULL values are excluded before ranking (ADVICE r4): Spark's asc
    sorts NULLs FIRST while most SQL engines default NULLS LAST, so a
    null-bearing column would otherwise shift the selected rank — and a
    median over the non-null population is the standard aggregate
    semantics anyway (COUNT/AVG ignore NULLs too)."""
    df = df.filter(F.col(value_col).isNotNull())
    w = Window.partitionBy(group_col).orderBy(F.col(value_col).asc())
    ranked = df.select(
        F.col(group_col),
        F.col(value_col),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy(group_col)).alias("_n"),
    )
    return ranked.filter(F.col("_rn") == F.floor((F.col("_n") + 1) / 2)).select(
        group_col, F.col(value_col).alias("median")
    )
