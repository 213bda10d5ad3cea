"""Deterministic sampling for training-data pipelines.

`df.sample()` is seed-dependent per partition layout — re-running after
a repartition yields a different subset, which poisons dataset
reproducibility. These operators gate on a content hash instead, so the
sample is a pure function of the KEY (stable across cluster layouts,
retries, and engines — the DuckDB oracle reproduces it bit-for-bit):

- :func:`deterministic_sample` — uniform: keep a row iff the first six
  hex digits of md5(key) fall under the rate threshold. Map-only, no
  shuffle, whole-stage codegen.
- :func:`stratified_sample` — per-stratum quota: rank rows within each
  stratum by their hash (a deterministic "random" order) and keep the
  first n. One shuffle on the stratum key; skewed strata cost their own
  partition only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash_bucket(key: Column, modulus: int = 1000) -> Column:
    """First 6 hex digits of md5(key) as an integer bucket in [0, modulus)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 6), 16, 10).cast("long")
        % modulus
    )


def deterministic_sample(
    df: DataFrame, key_col: str, rate_permille: int, modulus: int = 1000
) -> DataFrame:
    """Keep ~rate_permille/modulus of rows, chosen by key hash."""
    return df.filter(_hash_bucket(F.col(key_col), modulus) < rate_permille)


def stratified_sample(
    df: DataFrame, key_col: str, strata_col: str, n_per_stratum: int
) -> DataFrame:
    """First ``n_per_stratum`` rows per stratum in hash order (ties broken
    by the key, so the result is total-order deterministic)."""
    h = F.md5(F.col(key_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(h, F.col(key_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    targets_permille: dict[str, int],
    key_col: str,
) -> DataFrame:
    """Down-sample to a target DOMAIN MIXTURE, exactly and
    deterministically: the output contains each stratum in proportion
    ``targets_permille`` (per-mille shares) at the largest total size
    the data affords, rows chosen by content-hash order.

    The pretraining-mixture operator: "train on 50% web, 30% code, 20%
    books" turns into per-stratum quotas k_s = (T · p_s) div 1000 with
    T = min_s (n_s · 1000 div p_s) — the feasible total is capped by
    the scarcest domain relative to its share; strata absent from
    ``targets_permille`` are dropped. All-integer arithmetic, so the
    result set is a pure function of the data (oracle bit-exact,
    stable across layouts/retries).

    Scale shape: one count aggregate (map-side combined), a 1-row
    global min carrying one row per stratum into the exchange (the
    sanctioned tiny-global-agg pattern), quotas broadcast back, and one
    per-stratum hash-order window — the same skew bound as
    :func:`stratified_sample`. No driver-side collect."""
    if not targets_permille or sum(targets_permille.values()) > 1000:
        raise ValueError("targets_permille must be nonempty, summing <= 1000")
    tgt = df.sparkSession.createDataFrame(
        list(targets_permille.items()), f"{strata_col} string, _p long"
    )
    counts = (
        df.groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .join(F.broadcast(tgt), strata_col)
    )
    # global min over the tiny counts table (one row per stratum): an
    # unpartitioned window — the SinglePartition it implies carries
    # |strata| rows only (the sanctioned tiny-global pattern, same as
    # indexing.global_index)
    quotas = counts.withColumn(
        "_t", F.min(F.expr("_n * 1000 div _p")).over(Window.partitionBy())
    ).select(strata_col, F.expr("(_t * _p) div 1000").alias("_k"))
    h = F.md5(F.col(key_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(h, F.col(key_col))
    ranked = df.join(F.broadcast(quotas), strata_col).withColumn(
        "_rk", F.row_number().over(w)
    )
    return ranked.filter(F.col("_rk") <= F.col("_k")).drop("_rk", "_k")
