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


def histogram_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bucket_width: int,
    quantiles_permille: tuple[int, ...] = (500, 900, 990),
) -> DataFrame:
    """Mergeable histogram quantiles — the SCALE path paired with the
    exact :func:`grouped_quantiles` (the same pairing discipline as
    fast-minhash vs md5-minhash): values bucket to
    ``floor(v / bucket_width)``, and the q‰ quantile is reported as
    the LOWER EDGE of the bucket holding the ceil(q·n/1000)-th value —
    deterministic, engine-independent, error bounded by one
    ``bucket_width``.

    Why at 10^12 rows: the exact operator sorts each group inside a
    window (state = the group's rows); this one keeps ≤ |buckets|
    counters per group, combines map-side, and the bucket table is
    MERGEABLE across partitions, days, or tables — add the counts, the
    quantiles still resolve. Output one row per (group, q‰):
    (group, q_permille, n, bucket_lo).

    NULL values are excluded (same dialect decision as
    :func:`grouped_quantiles`/``grouped_median``: Spark sorts NULLs
    first, DuckDB last — an unfiltered NULL shifts ranks differently
    per engine AND breaks the one-width error bound). Bucketing is
    true FLOOR division (exact integer form ``(v − pmod(v, w)) div
    w``), so negative values get their genuine lower edge — Spark's
    ``div`` truncates toward zero, which would both violate the edge
    contract and diverge from DuckDB's floor ``//`` on negatives.
    """
    if bucket_width < 1:
        raise ValueError(f"bucket_width must be >= 1, got {bucket_width}")
    if (
        not quantiles_permille
        or any(not isinstance(q, int) for q in quantiles_permille)
        or any(not 0 < q <= 1000 for q in quantiles_permille)
    ):
        # reject non-integers loudly: silently truncating 999.5 -> 999
        # would answer a different question (grouped_quantiles rule)
        raise ValueError(f"quantiles must be ints in (0, 1000]: {quantiles_permille}")
    b = F.expr(
        f"({value_col} - pmod({value_col}, {bucket_width})) div {bucket_width}"
    ).alias("_b")
    hist = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col), b)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy(group_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.withColumn("_cum", F.sum("_c").over(w)).withColumn(
        "_n", F.sum("_c").over(wn)
    )
    qs = F.explode(
        F.array(*[F.lit(q).cast("long") for q in quantiles_permille])
    ).alias("q_permille")
    # target rank = ceil(q*n/1000) in pure integer arithmetic
    ranked = cum.select(group_col, "_b", "_c", "_cum", "_n", qs).withColumn(
        "_target", F.expr("(q_permille * _n + 999) div 1000")
    )
    # the quantile bucket: smallest _b whose cumulative count reaches
    # the target — min over qualifying buckets, one combine-friendly agg
    hit = ranked.filter(F.col("_cum") >= F.col("_target"))
    return (
        hit.groupBy(group_col, "q_permille")
        .agg(F.min("_b").alias("_qb"), F.max("_n").alias("n"))
        .select(
            group_col,
            "q_permille",
            "n",
            (F.col("_qb") * bucket_width).alias("bucket_lo"),
        )
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    support_permille: int,
    n_buckets: int = 4096,
) -> DataFrame:
    """Frequent items above a support threshold — the two-pass
    bucket-prefilter plan for UNBOUNDED key domains: pass 1 hashes
    keys into ``n_buckets`` md5-prefix buckets and keeps only buckets
    whose TOTAL count could contain a frequent key (a key's count
    never exceeds its bucket's count, so no frequent key is lost —
    no false negatives, same guarantee direction as LSH candidate
    banding); pass 2 counts exactly, but only rows whose bucket
    survived, then applies the exact threshold.

    Output (key, n_key, n_total) for keys with
    ``n_key ≥ ceil(support_permille·n_total/1000)``. At 10^12 rows
    with billions of distinct keys, pass 1 state is bounded by the
    bucket count (``n_buckets`` rounded UP to the next power of 16 —
    the bucket id is an md5 hex prefix) and pass 2's shuffle carries
    only the hot buckets' rows — a plain groupBy-then-HAVING shuffles
    every distinct key.

    Fully LAZY: the threshold derives from the pass-1 histogram's own
    total via an unpartitioned window over the BUCKET table (≤ 16^h
    rows — bounded metadata, the corpus_stats argument), never a
    separate count action or third scan. NULL keys participate: the
    bucket hash coalesces NULL to a sentinel so a frequent NULL key is
    found like any other (md5(NULL) is NULL and a NULL bucket would
    silently fall out of the pass-2 equi join — the false negative the
    docale guarantee forbids).
    """
    if not 1 <= support_permille <= 1000:
        raise ValueError(f"support_permille must be in [1,1000]: {support_permille}")
    hexc = max(1, ((n_buckets - 1).bit_length() + 3) // 4)
    # prefix real keys so the NULL token cannot collide with a real
    # key's string form
    key_str = F.coalesce(
        F.concat(F.lit("k:"), F.col(key_col).cast("string")), F.lit("null:")
    )
    bucket = F.substring(F.md5(key_str), 1, hexc)
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    hist = df.groupBy(bucket.alias("_bk")).agg(F.count(F.lit(1)).alias("_bc"))
    hist = hist.withColumn("_total", F.sum("_bc").over(w_all)).withColumn(
        "_thr", F.expr(f"({support_permille} * _total + 999) div 1000")
    )
    hot = hist.filter(F.col("_bc") >= F.col("_thr")).select("_bk", "_total", "_thr")
    candidates = df.select(F.col(key_col), bucket.alias("_bk")).join(hot, "_bk")
    return (
        candidates.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_key"),
            F.max("_total").alias("n_total"),
            F.max("_thr").alias("_thr"),
        )
        .filter(F.col("n_key") >= F.col("_thr"))
        .select(key_col, "n_key", "n_total")
    )
