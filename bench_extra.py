"""Optimization-round measurement harness (guide §1): NOT the driver metric.

``bench.py`` is frozen; this file exists so per-query work can be timed
in isolation with enough repetitions to beat the sandbox host's 2-3x
interference outliers, and so physical plans can be captured for the
``plans/r06`` record.

Usage::

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench_extra.py q1 knn_snap ...
    BX_REPS=7 BX_EXPLAIN_DIR=plans/r06 BX_SUFFIX=_before python bench_extra.py ...

Methodology mirrors the frozen bench exactly: one warm rep, then R timed
reps of ``fn(spark, sf_dir).count()`` (plan construction included, count
as the action); reports min and median per query as one JSON line.
``BX_NOOP=1`` switches the action to the noop sink (guide §1.4) which
materializes every column — useful to separate count-pruned cost from
full-result cost.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from osm2gtfs_spark.plans import queries as Q
from osm2gtfs_spark.session import build_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("BX_REPS", "5"))
    use_noop = os.environ.get("BX_NOOP") == "1"
    explain_dir = os.environ.get("BX_EXPLAIN_DIR")
    suffix = os.environ.get("BX_SUFFIX", "")
    names = sys.argv[1:]
    spark = build_session("bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    registry = Q.queries()
    if not names:
        names = list(registry)

    def run(fn):
        df = fn(spark, sf_dir)
        if use_noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    out = {}
    for name in names:
        fn = registry[name]
        spark.sparkContext.setJobDescription(name)
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, sf_dir).explain("formatted")
            with open(os.path.join(explain_dir, f"{name}{suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
        run(fn)  # warm: parquet footer cache + JIT
        ts = []
        for _ in range(reps):
            t0 = time.time()
            run(fn)
            ts.append(round(time.time() - t0, 3))
        out[name] = {"min": min(ts), "med": sorted(ts)[len(ts) // 2], "all": ts}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "noop": use_noop, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
