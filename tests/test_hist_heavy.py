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


def test_heavy_hitters_no_false_negatives_small_buckets(spark):
    # tiny bucket space forces collisions: colliding buckets inflate
    # pass-1 counts (more candidates) but never drop a frequent key
    rows = [(i % 7,) for i in range(700)] + [(999,)] * 300
    df = spark.createDataFrame(rows, "key long")
    got = {r.key for r in heavy_hitters(df, "key", 250, n_buckets=2).collect()}
    assert got == {999}
    with pytest.raises(ValueError):
        heavy_hitters(df, "key", 0)
