#!/bin/bash
# Watch for the tunnel, then immediately fire the staged measurement
# sequence — most valuable first, each step bounded, all logged under
# /tmp.  The tunnel windows are intermittent (minutes to hours), so
# zero human lag between "live" and "measuring" is the point.
#
# Usage: bash scripts/tpu_on_live.sh [watch_period_s] [watch_max_hours]
set -u
cd "$(dirname "$0")/.."
bash scripts/tpu_watch.sh "${1:-300}" "${2:-11}" || exit 1
echo "=== diag $(date -u +%H:%M:%S) ===" | tee /tmp/live_run.status
timeout 1200 python scripts/ozaki_diag.py \
  > /tmp/diag.json 2> /tmp/diag.log
echo "diag exit $? at $(date -u +%H:%M:%S)" | tee -a /tmp/live_run.status
timeout 2400 python bench.py --ozaki > /tmp/bench_ozaki.log 2>&1
echo "bench --ozaki exit $? at $(date -u +%H:%M:%S)" | tee -a /tmp/live_run.status
timeout 5400 python bench.py --all > /tmp/bench_all.log 2>&1
echo "bench --all exit $? at $(date -u +%H:%M:%S)" | tee -a /tmp/live_run.status
