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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_survives_ansi_on_session(spark, sf_dir, name):
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        fn = entry_mod.queries()[name]
        n = fn(spark, sf_dir).count()
        assert n >= 0
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")
