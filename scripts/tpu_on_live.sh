#!/bin/bash
# Watch for the tunnel, then immediately fire the staged measurement
# sequence.  The tunnel windows can be SHORT (a ~6 min window observed
# 03:30): the artifact run (bench --all, value-ordered sections with
# incremental saves) goes FIRST; the diagnostic sweep only if the
# window survives it.  The tunnel also appears single-tenant — never
# probe while a measurement runs (the 02:48 false-dead probe).
#
# Usage: bash scripts/tpu_on_live.sh [watch_period_s] [watch_max_hours]
set -u
cd "$(dirname "$0")/.."
bash scripts/tpu_watch.sh "${1:-120}" "${2:-11}" || exit 1
echo "=== live $(date -u +%H:%M:%S) ===" | tee /tmp/live_run.status
timeout 5400 python bench.py --all > /tmp/bench_all.log 2>&1
echo "bench --all exit $? at $(date -u +%H:%M:%S)" | tee -a /tmp/live_run.status
timeout 2400 python scripts/ozaki_diag.py \
  > /tmp/diag.json 2> /tmp/diag.log
echo "diag exit $? at $(date -u +%H:%M:%S)" | tee -a /tmp/live_run.status
