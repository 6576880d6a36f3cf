#!/usr/bin/env bash
# Build the --py-files archive for cluster submission (north-rule launch
# mode: spark-submit --py-files geoparser_spark.zip job.py run ...).
# Verified against a real /opt/spark/bin/spark-submit from a foreign cwd.
set -euo pipefail
cd "$(dirname "$0")/.."
out="${1:-geoparser_spark.zip}"
rm -f "$out"
zip -qr "$out" geoparser_spark -x '*__pycache__*'
echo "$out"
