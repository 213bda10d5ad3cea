"""Batch J: mergeable histogram quantiles + two-pass heavy hitters."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from osm2gtfs_spark.operators.aggregates import heavy_hitters, histogram_quantiles


def test_histogram_quantiles_known_case(spark):
    # group 'a': values 0..99 -> width 10 buckets of 10 each; p50 at
    # rank 50 -> bucket 4 (cum 50), lower edge 40; p90 -> rank 90 ->
    # bucket 8 (cum 90), edge 80; p990 -> rank 99 -> bucket 9, edge 90
    df = spark.createDataFrame([("a", i) for i in range(100)], "grp string, v long")
    out = {
        r.q_permille: r
        for r in histogram_quantiles(df, "grp", "v", bucket_width=10).collect()
    }
    assert out[500].bucket_lo == 40 and out[500].n == 100
    assert out[900].bucket_lo == 80
    assert out[990].bucket_lo == 90


def test_histogram_quantiles_error_bounded_by_width(spark):
    rng = random.Random(11)
    vals = sorted(rng.randrange(0, 10_000) for _ in range(999))
    df = spark.createDataFrame([("g", v) for v in vals], "grp string, v long")
    width = 250
    out = {
        r.q_permille: r.bucket_lo
        for r in histogram_quantiles(df, "grp", "v", bucket_width=width).collect()
    }
    for q in (500, 900, 990):
        exact = vals[(q * 999 + 999) // 1000 - 1]
        assert out[q] <= exact < out[q] + width  # the exact value's bucket


def test_histogram_quantiles_validation(spark):
    df = spark.createDataFrame([("a", 1)], "grp string, v long")
    with pytest.raises(ValueError):
        histogram_quantiles(df, "grp", "v", bucket_width=0)
    with pytest.raises(ValueError):
        histogram_quantiles(df, "grp", "v", 10, quantiles_permille=(0,))


def test_heavy_hitters_matches_plain_having(spark):
    rng = random.Random(5)
    # skew: key 0 gets 40% of rows, the rest spread over 500 keys
    rows = [(0,)] * 4000 + [(1 + rng.randrange(500),) for _ in range(6000)]
    df = spark.createDataFrame(rows, "key long")
    got = {
        (r.key, r.n_key, r.n_total)
        for r in heavy_hitters(df, "key", support_permille=100).collect()
    }
    total = len(rows)
    thr = (100 * total + 999) // 1000
    truth = {
        (r.key, r.n, total)
        for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= thr).collect()
    }
    assert got == truth and (0, 4000, total) in got


def test_heavy_hitters_no_false_negatives_under_forced_collisions(spark):
    # n_buckets=2 rounds up to 16 hex-prefix buckets; 300 distinct cold
    # keys >> 16 buckets, so every bucket collides by pigeonhole —
    # colliding buckets inflate pass-1 counts (more candidates) but
    # never drop the frequent key
    rows = [(i,) for i in range(300) for _ in range(2)] + [(999,)] * 400
    df = spark.createDataFrame(rows, "key long")
    got = {r.key for r in heavy_hitters(df, "key", 250, n_buckets=2).collect()}
    assert got == {999}
    with pytest.raises(ValueError):
        heavy_hitters(df, "key", 0)


def test_heavy_hitters_frequent_null_key_is_found(spark):
    # md5(NULL) is NULL; the bucket hash coalesces so the frequent NULL
    # key survives the pass-2 equi join (review r5c false negative)
    rows = [(None,)] * 600 + [(i,) for i in range(400)]
    df = spark.createDataFrame(rows, "key long")
    out = {r.key: r.n_key for r in heavy_hitters(df, "key", 500).collect()}
    assert out == {None: 600}


def test_histogram_quantiles_ignores_nulls(spark):
    # 8 NULLs must not shift ranks (Spark sorts NULLs first, DuckDB
    # last — the grouped_median dialect rule)
    rows = [("a", 0), ("a", 10)] + [("a", None)] * 8
    df = spark.createDataFrame(rows, "grp string, v long")
    out = {
        r.q_permille: r
        for r in histogram_quantiles(df, "grp", "v", bucket_width=10).collect()
    }
    assert out[900].n == 2  # NULLs excluded from the count
    assert out[900].bucket_lo == 10


def test_histogram_quantiles_floor_division_on_negatives(spark):
    # -15 belongs to bucket [-20, -10): truncating div would claim -10
    df = spark.createDataFrame([("a", -15)] * 3, "grp string, v long")
    out = histogram_quantiles(df, "grp", "v", bucket_width=10).collect()
    assert all(r.bucket_lo == -20 for r in out)


def test_histogram_quantiles_rejects_float_permille(spark):
    df = spark.createDataFrame([("a", 1)], "grp string, v long")
    with pytest.raises(ValueError):
        histogram_quantiles(df, "grp", "v", 10, quantiles_permille=(999.5,))
