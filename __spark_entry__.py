"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query at sf0.001 (smoke check).
``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2; the driver compares Spark vs DuckDB at sf0.01.

Implementation lives in :mod:`osm2gtfs_spark.plans.queries`.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from osm2gtfs_spark.plans import queries as _q  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"

# Runtime confs the engine's column expressions assume. The driver may hand
# us a default-config session; PySpark 4.x defaults ANSI *on*, under which
# element_at past the array end (shingles/fingerprint on short docs) and the
# 64-bit wraparound in minhash_signature_fast would raise instead of giving
# the permissive semantics the reference relies on. These are runtime-settable
# session confs, so pinning them on an existing session is safe.
_REQUIRED_CONF = {
    "spark.sql.ansi.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
}


def _pin_conf(spark: SparkSession) -> SparkSession:
    for k, v in _REQUIRED_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf locked by a strict driver
            pass
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.queries()["q1_pricing_summary"](_pin_conf(spark), SF_SMOKE)


def _wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(_pin_conf(spark), sf_dir)

    run.__name__ = getattr(fn, "__name__", "query")
    run.__doc__ = fn.__doc__
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in _q.queries().items()}


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
