#!/usr/bin/env bash
# Round-close checklist (VERDICT r3 item 6): run before every round ends.
# Usage: tools/round_close.sh <round-number>   (e.g. tools/round_close.sh 4)
#
# Produces, at the repo root:
#   SWEEP_r{N}_sf0.01.txt   full-registry oracle sweep at sf0.01
#   SWEEP_r{N}_sf0.1.txt    full-registry oracle sweep at sf0.1
# and prints the scaling + bench JSON lines to record in BASELINE.md.
# Each step is a fresh process so Ray sessions never overlap.
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:?round number required (e.g. 4)}"

echo "== 1/5 pytest =="
python -m pytest tests/ -q | tail -2

echo "== 2/5 sweep sf0.01 =="
python tools/check_queries.py /root/testdata/sf0.01 2>&1 | tee "SWEEP_r${N}_sf0.01.txt" | tail -2

echo "== 3/5 sweep sf0.1 =="
python tools/check_queries.py /root/testdata/sf0.1 2>&1 | tee "SWEEP_r${N}_sf0.1.txt" | tail -2

echo "== 4/5 bench (sf0.1) =="
python bench.py

echo "== 5/5 scaling, both widths =="
python bench.py --scaling-widths

echo "Done: commit SWEEP_r${N}_*.txt and fold the JSON lines into BASELINE.md."
