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
