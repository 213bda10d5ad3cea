"""Two-parallelism scaling run: the north rule's N→4N evidence.

No multi-node cluster exists in this sandbox, so the rule's
"N and 4N executors" is evidenced by running the identical workload at
``local[8]`` and ``local[32]`` (driver instruction) and reporting
throughput at both plus efficiency = speedup / 4.

The workload is the engine's CPU-heavy core (so that parallelism, not
fixed overhead, dominates): MinHash+LSH+Jaccard over a ×40-multiplied
document corpus, grid-cell kNN snap over ×20-multiplied point tables,
and res-8 tile coverage. Rows are counted so throughput = rows/sec.

Usage:  python tools/scaling.py            # parent: runs both, writes report
        SPARK_SCALING_CHILD=8 python ...   # child mode (one measurement)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# doc copies collide in LSH buckets by construction (they are true
# near-dups), so candidate pairs grow as MULT² per original doc — keep
# MULT modest or the Jaccard stage dominates everything
DOC_MULT = int(os.environ.get("SPARK_SCALING_DOC_MULT", "8"))
PT_MULT = int(os.environ.get("SPARK_SCALING_PT_MULT", "20"))


def workload(spark, sf_dir: str) -> dict[str, float]:
    from pyspark.sql import functions as F

    from osm2gtfs_spark.operators import dedup as DD
    from osm2gtfs_spark.operators.spatial import knn_snap, tile_coverage
    from osm2gtfs_spark.sources import tpch

    out: dict[str, float] = {}
    rows = 0
    # each sf table is ONE parquet file = one input split; without an
    # explicit repartition the whole map side runs on a single core and
    # the scaling measurement is meaningless
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # 1) dedup chain over multiplied docs (CPU: md5 minhash)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(DOC_MULT - 1))))
        .select(
            (F.col("doc_id") * DOC_MULT + F.col("rep")).alias("doc_id"),
            F.concat_ws(" ", F.col("text"), F.col("rep").cast("string")).alias("text"),
        )
        .repartition(n_part)
    )
    t0 = time.time()
    n_docs = docs.count()
    pairs = DD.lsh_candidate_pairs(DD.minhash_bands("doc_id", "text", docs, 8, 2))
    n_pairs = DD.ngram_jaccard(pairs, docs).count()
    out["dedup_sec"] = time.time() - t0
    rows += n_docs + n_pairs

    # 2) kNN snap over multiplied points (shuffle: cell-ring join)
    def multiply(df, key, mult):
        return (
            df.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(mult - 1))))
            .select(
                (F.col(key) * mult + F.col("rep")).alias(key),
                (F.col("lat") + F.col("rep") * 0.0001).alias("lat"),
                (F.col("lon") + F.col("rep") * 0.0001).alias("lon"),
            )
            .repartition(n_part)
        )

    stops = multiply(tpch.stops(spark, sf_dir), "stop_key", PT_MULT)
    stations = multiply(tpch.stations(spark, sf_dir), "station_key", PT_MULT)
    t0 = time.time()
    n_knn = knn_snap(stops, stations, res=6, k_ring=2, distance="haversine").count()
    out["knn_sec"] = time.time() - t0
    rows += n_knn

    # 3) tile coverage at res 8 over the multiplied points
    t0 = time.time()
    n_tiles = tile_coverage(stops, res=8).count()
    out["tiles_sec"] = time.time() - t0
    rows += n_tiles

    out["rows"] = rows
    return out


def child(cpus: str) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    os.environ["SPARK_GRAFT_SHUFFLE"] = str(int(cpus) * 4)
    from osm2gtfs_spark.session import build_session

    spark = build_session(f"scaling-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: JIT + parquet footers (excluded from measurement)
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    t0 = time.time()
    m = workload(spark, SF_DIR)
    total = time.time() - t0
    print(json.dumps({"cpus": int(cpus), "total_sec": round(total, 2), **{k: round(v, 2) if isinstance(v, float) else v for k, v in m.items()}}))
    spark.stop()


def parent() -> None:
    results = {}
    for cpus in ("8", "32"):
        env = dict(os.environ, SPARK_SCALING_CHILD=cpus)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            timeout=1800,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(line)
    t8, t32 = results["8"]["total_sec"], results["32"]["total_sec"]
    rows = results["32"]["rows"]
    speedup = t8 / t32
    eff = speedup / 4.0
    report = {
        "workload": "minhash+lsh+jaccard (docs x%d), knn ring join (pts x%d), tile coverage" % (DOC_MULT, PT_MULT),
        "sf_dir": SF_DIR,
        "rows_processed": rows,
        "throughput_rows_per_sec_n8": round(rows / t8, 1),
        "throughput_rows_per_sec_n32": round(rows / t32, 1),
        "total_sec_n8": t8,
        "total_sec_n32": t32,
        "speedup_8_to_32": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(report, indent=1))
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.json"), "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    if "SPARK_SCALING_CHILD" in os.environ:
        child(os.environ["SPARK_SCALING_CHILD"])
    else:
        parent()
