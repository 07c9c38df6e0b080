#!/usr/bin/env bash
# Scaling-margin evidence (VERDICT r3 item 2): N consecutive official
# `bench.py --scaling` runs, JSON lines appended to a log with timestamps
# and launch load context. Usage: tools/scaling_series.sh [N] [outfile]
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:-5}"
OUT="${2:-/tmp/scaling_series.jsonl}"
for i in $(seq 1 "$N"); do
  echo "== run $i/$N $(date -u +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg)"
  python bench.py --scaling | tail -1 | tee -a "$OUT"
done
echo "series written to $OUT"
