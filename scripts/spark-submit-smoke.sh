#!/usr/bin/env bash
# Smoke-test the spark-submit deploy path (docs/spark-submit-runbook.md):
# package the library with sbt, then drive graft.CurateMain through
# /opt/spark/bin/spark-submit — NO sbt on the "edge node" side of the
# submit. Exits nonzero unless the curated-rows JSON line appears.
set -euo pipefail
cd "$(dirname "$0")/.."

sbt -batch package > /dev/null
JAR=target/scala-2.13/qincdcspark_2.13-0.1.0.jar
SF=${1:-/root/testdata/sf0.001}
WORK=$(mktemp -d /tmp/graft-submit-smoke.XXXX)
trap 'rm -rf "$WORK"' EXIT

cat > "$WORK/curate.toml" <<TOML
[input]
path = "$SF/documents.parquet"
[[stages]]
type = "quality-filter"
min-score = 0.5
[[stages]]
type = "dedup-exact"
[output]
dir = "$WORK/out"
TOML

OUT=$(/opt/spark/bin/spark-submit \
  --master 'local[4]' \
  --class graft.CurateMain \
  --conf spark.sql.extensions=graft.GraftExtensions \
  --conf spark.ui.enabled=false \
  "$JAR" --config "$WORK/curate.toml" 2>/dev/null | tail -1)
echo "$OUT"
echo "$OUT" | grep -q '"curated_rows":' || {
  echo "smoke FAILED: no curated_rows line" >&2; exit 1; }
echo "spark-submit smoke OK"
