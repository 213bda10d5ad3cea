"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same sf directory, compares row count, sorted column
names, and an order-insensitive value fingerprint. Usage::

    python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from osm2gtfs_spark.session import build_session  # noqa: E402


def normalize(df):
    """pandas DF → (n_rows, sorted col names, canonical sorted tuple set)."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for tup in df.itertuples(index=False):
        canon = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                canon.append("NULL")
            elif isinstance(v, bool):
                canon.append(str(int(v)))
            elif isinstance(v, float) and v.is_integer():
                canon.append(str(int(v)))
            else:
                canon.append(str(v))
        rows.append("|".join(canon))
    rows.sort()
    return len(rows), cols, hash(tuple(rows)), rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as entrymod

    spark = build_session("oracle-check")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(spark_pdf)} (no oracle — rows-only)")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        sn, sc, sh, srows = normalize(spark_pdf)
        dn, dc, dh, drows = normalize(duck_pdf)
        dt = time.time() - t0
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            failures += 1
        elif sn != dn:
            print(f"FAIL {name}: rows spark={sn} duck={dn}")
            failures += 1
        elif sh != dh:
            diff = [(a, b) for a, b in zip(srows, drows) if a != b][:3]
            print(f"FAIL {name}: value hash mismatch; first diffs: {diff}")
            failures += 1
        else:
            print(f"ok   {name}: rows={sn} hash match ({dt:.1f}s)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
