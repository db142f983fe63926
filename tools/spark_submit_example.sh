#!/usr/bin/env bash
# Launching the engine on a real multi-executor cluster (north rule:
# spark-submit --py-files at N and 4N executors). The sandbox has no
# cluster manager, so this script documents the exact invocation; the
# same code runs unchanged because session defaults never override
# submit-time executor topology.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
EXECUTORS="${EXECUTORS:-8}"          # run again with 4x for the scaling pair
INPUT="${INPUT:-catalog.db.documents}"   # Iceberg table (or a parquet path)
OUTPUT="${OUTPUT:-/indexes/run1}"

cd "$REPO" && zip -qr /tmp/iis_spark.zip inverted_index_and_search_spark

spark-submit \
  --master yarn --deploy-mode cluster \
  --num-executors "$EXECUTORS" --executor-cores 4 --executor-memory 8g \
  --py-files /tmp/iis_spark.zip \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.shuffle.partitions=$((EXECUTORS * 8)) \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  "$REPO/inverted_index_and_search_spark/cli.py" \
  build --input "$INPUT" --output "$OUTPUT"
