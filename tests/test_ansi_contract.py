"""Driver-contract hardening: every queries() entry must run under a
session that arrived with ANSI mode ON (PySpark 4.x default).

__spark_entry__ wraps each callable to pin spark.sql.ansi.enabled=false
(the engine relies on permissive element_at / 64-bit wraparound); this
test flips ANSI back on before every call and asserts the wrapper
protects the whole surface, not just the queries spot-checked by hand.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod


def test_repetition_stats_ansi_neutral_direct_call(spark):
    """ADVICE r2: the operator itself (not just the wrapped entry) must
    survive ANSI-on for docs shorter than the n-gram width — F.get
    returns NULL past the array end under both modes."""
    from osm2gtfs_spark.operators.text import repetition_stats

    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        df = spark.createDataFrame([("d1", "one"), ("d2", "a a b")], "doc_id string, text string")
        got = {r.doc_id: r.rep_permille for r in repetition_stats(df, n=2).collect()}
        assert got["d1"] == 1000  # single overhang gram
        assert got["d2"] == 500   # 'a a' once of 2 grams
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")


def test_shingles_ansi_neutral_short_docs(spark):
    """Review r3: shingles()-based operators (decontaminate, minhash,
    fingerprint) called directly under ANSI-on must survive docs shorter
    than the n-gram width."""
    from osm2gtfs_spark.operators.dedup import decontaminate, shingles

    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        df = spark.createDataFrame([(1, "ok"), (2, "a b c d e f")], "doc_id long, text string")
        got = {r.doc_id: r.sh for r in df.select("doc_id", shingles(F.col("text"), 5).alias("sh")).collect()}
        assert got[1] == ["ok"]  # overhang grams collapse, no throw
        assert len(got[2]) == 2
        out = decontaminate(df.filter("doc_id = 2"), df.filter("doc_id = 1"), n=5)
        assert out.count() == 0  # no shared 5-grams, and no ANSI error
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_survives_ansi_on_session(spark, sf_dir, name):
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        fn = entry_mod.queries()[name]
        n = fn(spark, sf_dir).count()
        assert n >= 0
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")
