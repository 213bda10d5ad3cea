"""global_index: equivalence with the naive global window + plan shape.

The scale contract (VERDICT r1 item 3): deterministic id assignment must
not funnel row-scale tables through one task. global_index keeps the
same total order as ``row_number() OVER (ORDER BY ...)`` while the only
SinglePartition exchange in the plan carries the per-bucket count
aggregate (a few narrow columns), never the data rows.
"""

from __future__ import annotations

import re

from pyspark.sql import Window
from pyspark.sql import functions as F

from osm2gtfs_spark.operators.indexing import global_index


def _mk(spark, n=500):
    return (
        spark.range(n)
        .select(
            (F.col("id") % 37).cast("string").alias("bucket"),
            ((F.col("id") * 7919) % 1000).alias("sub"),
            F.col("id").alias("payload"),
        )
        .repartition(8)
    )


def test_matches_global_window(spark):
    df = _mk(spark)
    got = global_index(df, ["bucket", "sub", "payload"], "idx")
    want = df.withColumn(
        "idx", F.row_number().over(Window.orderBy("bucket", "sub", "payload"))
    )
    assert got.select("bucket", "sub", "payload", "idx").exceptAll(want).count() == 0
    assert want.exceptAll(got.select("bucket", "sub", "payload", "idx")).count() == 0


def test_start_offset_and_nulls(spark):
    df = _mk(spark, 100).withColumn(
        "bucket", F.when(F.col("payload") < 10, None).otherwise(F.col("bucket"))
    )
    got = global_index(df, ["bucket", "sub", "payload"], "idx", start=0)
    rows = got.orderBy("idx").collect()
    assert [r.idx for r in rows] == list(range(100))
    # Window.orderBy sorts nulls first; the null bucket must survive the
    # null-safe offsets join and take the lowest indexes
    assert all(rows[i].bucket is None for i in range(10))


def _single_partition_inputs(df) -> list[list[str]]:
    """Column lists feeding each SinglePartition exchange in the plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    out = []
    # physical tree: 'Exchange SinglePartition ...' node; its immediate
    # child is the next line at deeper indentation — capture the child's
    # output columns from the explain string
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        child = lines[i + 1] if i + 1 < len(lines) else ""
        cols = re.findall(r"(\w+)#\d+", child)
        out.append(sorted(set(cols)))
    return out


def test_small_threshold_identical_output(spark):
    """The runtime small-input fallback (single bounded window) must be
    bit-identical to the two-phase plan, and must NOT fire when the
    input exceeds the threshold."""
    df = _mk(spark, 300)
    two_phase = global_index(df, ["bucket", "sub", "payload"], "idx")
    small = global_index(df, ["bucket", "sub", "payload"], "idx", small_threshold=1000)
    assert small.schema == two_phase.schema  # both long-typed idx
    assert small.exceptAll(two_phase).count() == 0
    assert two_phase.exceptAll(small).count() == 0
    # over-threshold input keeps the scale-safe plan (no global sort of
    # the data into one partition)
    big = global_index(df, ["bucket", "sub", "payload"], "idx", small_threshold=100)
    big.count()
    for cols in _single_partition_inputs(big):
        assert "payload" not in cols and "sub" not in cols, cols


def test_no_row_scale_single_partition_exchange(spark):
    df = _mk(spark, 2000)
    got = global_index(df, ["bucket", "sub", "payload"], "idx")
    got.count()
    for cols in _single_partition_inputs(got):
        # the offsets path carries only (bucket cols + count) — never the
        # data row payload
        assert "payload" not in cols and "sub" not in cols, cols
