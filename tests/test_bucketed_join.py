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
    """saveAsTable writes into the shared session warehouse — uniquify
    table names per test invocation (tmp_path's basename is unique) so
    concurrent runs against one metastore cannot collide."""
    sfx = re.sub(r"[^A-Za-z0-9_]", "_", tmp_path.name).lower()
    created: list[str] = []

    def mk(base: str) -> str:
        name = f"{base}_{sfx}"
        created.append(name)
        return name

    yield mk
    for t in created:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"\bExchange\b", plan))


def test_bucketed_join_eliminates_both_shuffles(spark, sf_dir, warehouse):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    left = docs.select("doc_id", "n_chars")
    right = docs.select("doc_id", "lang")
    tl, tr = warehouse("bj_left"), warehouse("bj_right")
    for name, df in ((tl, left), (tr, right)):
        df.write.bucketBy(8, "doc_id").sortBy("doc_id").mode("overwrite").saveAsTable(name)
    joined = spark.table(tl).join(spark.table(tr), "doc_id")
    assert _exchanges(joined) == 0, "co-bucketed join must not shuffle either side"
    # and it is still correct
    assert joined.count() == docs.count()


def test_bucketed_join_shuffles_only_probe_side(spark, sf_dir, warehouse):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tb = warehouse("bj_built")
    docs.select("doc_id", "n_chars").write.bucketBy(8, "doc_id").sortBy(
        "doc_id"
    ).mode("overwrite").saveAsTable(tb)
    # force SMJ so the bucketed side's no-shuffle property is observable
    # (a broadcast would hide it)
    probe = docs.select("doc_id", "lang").hint("merge")
    joined = spark.table(tb).join(probe, "doc_id")
    n = _exchanges(joined)
    assert n == 1, f"expected exactly the probe-side shuffle, saw {n} exchanges"
    assert joined.count() == docs.count()


def test_bucketed_aggregation_reuses_layout(spark, sf_dir, warehouse):
    """groupBy on the bucket key over a bucketed table needs no
    exchange either — the write-time partitioning serves aggregation
    and join alike."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ta = warehouse("bj_agg")
    docs.select("doc_id", "n_chars").write.bucketBy(8, "doc_id").mode(
        "overwrite"
    ).saveAsTable(ta)
    agg = spark.table(ta).groupBy("doc_id").agg(F.sum("n_chars").alias("s"))
    assert _exchanges(agg) == 0, "bucket-key aggregation must not shuffle"
    assert agg.count() == docs.select("doc_id").distinct().count()
