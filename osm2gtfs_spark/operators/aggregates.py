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


def grouped_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: tuple[int, ...] = (25, 50, 75),
) -> DataFrame:
    """(group, q, value): exact per-group empirical quantiles at the
    given PERCENT points — for q the ceil(n·q/100)-th ascending
    non-null value (the 'lower' empirical quantile: type-preserving,
    no interpolation, bit-identical across engines; q=50 coincides with
    :func:`grouped_median`). Rank targets use pure integer arithmetic
    ((n·q + 99) div 100), so no float boundary can flip a selection.

    ONE ranked window pass serves every requested quantile (the rank
    column is computed once; each row then matches against the
    broadcast-free in-row quantile array) — adding quantiles costs no
    extra shuffle. Skew bound: the hottest group's row count, as for
    any per-key window."""
    # integer percents only (review r5): silently truncating 99.9 → 99
    # would answer a different question, and coercion-after-dedup could
    # emit duplicate (group, q) rows
    if not quantiles or not all(
        float(q) == int(q) and 1 <= int(q) <= 100 for q in quantiles
    ):
        raise ValueError(
            f"quantiles must be whole percents in [1, 100], got {quantiles}"
        )
    qs = sorted({int(x) for x in quantiles})
    df = df.filter(F.col(value_col).isNotNull())
    w = Window.partitionBy(group_col).orderBy(F.col(value_col).asc())
    ranked = df.select(
        F.col(group_col),
        F.col(value_col),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy(group_col)).alias("_n"),
    )
    q = F.explode(F.array(*[F.lit(x) for x in qs])).alias("q")
    return (
        ranked.select(group_col, value_col, "_rn", "_n", q)
        .filter(F.col("_rn") == F.expr("(_n * q + 99) div 100"))
        .select(group_col, F.col("q").cast("int").alias("q"), F.col(value_col).alias("value"))
    )


def topk_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    k: int,
    ascending: bool = False,
    tie_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The k extreme rows per group with a DETERMINISTIC rank column:
    row_number over (order_col asc|desc, tie_cols asc). Callers must
    pass ``tie_cols`` forming a unique key within a group whenever
    ``order_col`` can tie — otherwise the selected rows depend on
    shuffle order (the same contract as every deterministic-id operator
    in the engine).

    Scale shape: one per-group window; Spark's WindowExec evaluates
    rank streaming over the sorted group, and rows past k are dropped
    before any downstream exchange. For group-free global top-k use
    orderBy().limit() instead (TakeOrderedAndProject)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    order = [F.col(order_col).asc() if ascending else F.col(order_col).desc()]
    order += [F.col(c).asc() for c in tie_cols]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def distinct_buckets(
    df: DataFrame,
    group_col: str,
    value_col: str,
    hex_chars: int = 3,
) -> DataFrame:
    """Deterministic cardinality sketch (linear counting registers):
    (group, occupied_buckets, n_rows) where ``occupied_buckets`` counts
    the DISTINCT md5-prefix buckets (16^hex_chars of them) the group's
    values hash into. The linear-counting estimate
    ``-m·ln(1 − occupied/m)`` is a client-side formula over the exact
    integer this emits — the engine keeps the output integer-exact
    (ln() drifts across engines; same dialect decision as
    bigram_fluency_score's bit-length log2).

    Why not ``approx_count_distinct``: Spark's HLL++ sketch is
    engine-internal — not reproducible against any oracle, nor stable
    across Spark versions. Bucketed counting is deterministic,
    mergeable, and the bucket-id domain is BOUNDED (≤ 16^hex_chars per
    group), so the exact count-distinct underneath dedupes map-side to
    at most m values per partition before the shuffle — per-group
    state is O(m) regardless of true cardinality, which is the whole
    point at 10^12 rows (an exact distinct on the raw values would
    shuffle every distinct value).
    """
    if not 1 <= hex_chars <= 8:
        raise ValueError(f"hex_chars must be in [1, 8], got {hex_chars}")
    bucket = F.substring(F.md5(F.col(value_col).cast("string")), 1, hex_chars)
    return df.groupBy(group_col).agg(
        F.countDistinct(bucket).alias("occupied_buckets"),
        F.count(F.lit(1)).alias("n_rows"),
    )
