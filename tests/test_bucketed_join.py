"""Bucketed (co-located) joins: the shuffle-elimination story.

The brief's scale guidance calls for bucketing / pre-partitioning so
repeated big-table joins on the same key don't re-shuffle per query.
These tests pin the mechanics end-to-end on real saved tables: a join
of two tables bucketed by the same key must plan with ZERO Exchange
on either side (SortMergeJoin straight over the bucketed scans), and
a bucketed⋈unbucketed join must shuffle ONLY the unbucketed side.

At 100 TB this is the difference between shuffling the corpus once at
write time and shuffling it on every downstream join: the documents ⋈
term-stats / embeddings ⋈ postings joins in this engine are exactly
the repeated-equi-join shape bucketing serves.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def warehouse(spark, tmp_path):
    # saveAsTable writes into the session warehouse; isolate per test
    names = []
    yield names
    for t in names:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"\bExchange\b", plan))


def test_bucketed_join_eliminates_both_shuffles(spark, sf_dir, warehouse):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    left = docs.select("doc_id", "n_chars")
    right = docs.select("doc_id", "lang")
    for name, df in (("bj_left", left), ("bj_right", right)):
        df.write.bucketBy(8, "doc_id").sortBy("doc_id").mode("overwrite").saveAsTable(name)
        warehouse.append(name)
    joined = spark.table("bj_left").join(spark.table("bj_right"), "doc_id")
    assert _exchanges(joined) == 0, "co-bucketed join must not shuffle either side"
    # and it is still correct
    assert joined.count() == docs.count()


def test_bucketed_join_shuffles_only_probe_side(spark, sf_dir, warehouse):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.select("doc_id", "n_chars").write.bucketBy(8, "doc_id").sortBy(
        "doc_id"
    ).mode("overwrite").saveAsTable("bj_built")
    warehouse.append("bj_built")
    # force SMJ so the bucketed side's no-shuffle property is observable
    # (a broadcast would hide it)
    probe = docs.select("doc_id", "lang").hint("merge")
    joined = spark.table("bj_built").join(probe, "doc_id")
    n = _exchanges(joined)
    assert n == 1, f"expected exactly the probe-side shuffle, saw {n} exchanges"
    assert joined.count() == docs.count()


def test_bucketed_aggregation_reuses_layout(spark, sf_dir, warehouse):
    """groupBy on the bucket key over a bucketed table needs no
    exchange either — the write-time partitioning serves aggregation
    and join alike."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.select("doc_id", "n_chars").write.bucketBy(8, "doc_id").mode(
        "overwrite"
    ).saveAsTable("bj_agg")
    warehouse.append("bj_agg")
    agg = spark.table("bj_agg").groupBy("doc_id").agg(F.sum("n_chars").alias("s"))
    assert _exchanges(agg) == 0, "bucket-key aggregation must not shuffle"
    assert agg.count() == docs.select("doc_id").distinct().count()
