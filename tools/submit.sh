#!/usr/bin/env bash
# spark-submit --py-files packaging (north rule: the job must run this way
# on a multi-executor cluster). Packages the engine as a zip and submits
# the bench workload; MASTER defaults to local[32] in the sandbox, and on
# a real cluster is e.g. yarn / k8s://... with --num-executors N.
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=/tmp/osm2gtfs_spark.zip
rm -f "$ZIP"
zip -qr "$ZIP" osm2gtfs_spark -x '*__pycache__*'

MASTER="${MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"
SPARK_SUBMIT="$(python3 -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')"

exec "$SPARK_SUBMIT" \
  --master "$MASTER" \
  --name osm2gtfs-spark-bench \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_SHUFFLE:-32}" \
  --py-files "$ZIP" \
  bench.py
