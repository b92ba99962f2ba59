#!/bin/bash
# Follow-up to r3q: once the main queue finishes, capture an e2e xplane trace
# with the winning env (attributes the ~0.36 s/call batch-independent fixed
# cost — VAE decode suspected) and aggregate it.
# Usage: bash tools/tpu_queue_r3r.sh <r3q_outdir> <r3q_pid>
set -u
OUT=${1:-/tmp/r3q}
QPID=${2:-}
cd "$(dirname "$0")/.."
if [ -n "$QPID" ]; then
  while kill -0 "$QPID" 2>/dev/null; do sleep 20; done
fi
winner=$(cat "$OUT/winner.env" 2>/dev/null || true)
echo "=== e2e profile (env: '$winner') ==="
rm -rf /tmp/e2e_profile  # stale traces would corrupt the aggregation (ADVICE r3)
env $winner python tools/tpu_profile_e2e.py --logdir /tmp/e2e_profile \
  >"$OUT/e2e_profile.out" 2>"$OUT/e2e_profile.err"
python tools/xplane_groups.py /tmp/e2e_profile --iters 1 \
  >"$OUT/e2e_profile_groups.txt" 2>&1
echo "r3r done"
