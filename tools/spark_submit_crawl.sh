#!/usr/bin/env bash
# Package the engine and run the crawl via spark-submit --py-files —
# the deployment shape the north rule mandates. On a real cluster, swap
# --master for yarn/k8s; nothing else changes.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP=/tmp/crawl4ai_llm_spark.zip
MASTER="${MASTER:-local[8]}"
WAREHOUSE="${WAREHOUSE:-/tmp/crawl_submit_wh}"

rm -f "$ZIP"
(cd "$REPO" && zip -qr "$ZIP" crawl4ai_llm_spark -x '*__pycache__*')

rm -rf "$WAREHOUSE"
"${SPARK_HOME}/bin/spark-submit" \
    --master "$MASTER" \
    --conf spark.sql.session.timeZone=UTC \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.sql.adaptive.coalescePartitions.parallelismFirst=false \
    --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-8}" \
    --py-files "$ZIP" \
    "$REPO/tools/submit_crawl.py" \
    --warehouse "$WAREHOUSE" "$@"
