#!/bin/bash
# Tunnel watcher: probe the TPU tunnel every PERIOD seconds (default
# 600 — the crashed worker's recovery is minutes and aggressive probing
# keeps it down, see CLAUDE.md TUNNEL OPS NOTE) until a small matmul
# round-trips, then exit 0 so the caller can launch the staged
# measurement sequence (scripts/ozaki_diag.py first, then
# `python bench.py --all`).  Exit 1 after MAX_HOURS (default 12).
#
# Usage: bash scripts/tpu_watch.sh [period_s] [max_hours]
set -u
PERIOD=${1:-600}
MAX_HOURS=${2:-12}
DEADLINE=$(( $(date +%s) + MAX_HOURS * 3600 ))
N=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  N=$((N + 1))
  if timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax, numpy as np, jax.numpy as jnp
assert jax.default_backend() == "tpu", jax.default_backend()
x = jnp.ones((128, 128))
y = np.asarray(jnp.dot(x, x))
assert float(y[0, 0]) == 128.0
EOF
  then
    echo "TUNNEL LIVE after $N probes at $(date -u +%H:%M:%S)"
    exit 0
  fi
  echo "probe $N dead at $(date -u +%H:%M:%S); sleeping ${PERIOD}s"
  sleep "$PERIOD"
done
echo "gave up after $N probes / ${MAX_HOURS}h"
exit 1
