#!/bin/bash
# Round-5 queue D: conditioning attribution + inference-step follow-ups.
# Runs after tpu_queue_r5c.sh (train ladder) releases the chip.
#
#   c1_conditioning   per-component fixed-cost re-measure (VERDICT r4 #3's
#                     "close the loop" item) — now with the adaptor running
#                     the lines-kernel path
#   c2_temporal14     unet-only A/B: CAMC2V_TEMPORAL_MAX_WEIGHT_MB=14 admits
#                     the C=1280 (heads=20) ds32/ds64 sites into the fused
#                     temporal-MHA kernel — attacks the ~7 ms temporal
#                     head-split copies pool of the r4 per-op profile
#   c3_e2e            full bench.py refresh (ddim-25 + dpmpp-13 headline)
#   c4_train_profile  xplane re-trace of the train step under the r5c winner
#                     env (edit WINNER below if r5c chose dots)
#
# Usage: bash tools/tpu_queue_r5d.sh [outdir] [wait_pid] [winner_env]
set -u
OUT=${1:-/tmp/r5d}
WAITPID=${2:-}
WINNER=${3:-NOOP=1}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
if [ -n "$WAITPID" ]; then
  while kill -0 "$WAITPID" 2>/dev/null; do sleep 30; done
fi

run() { # name, env..., -- cmd...
  local name=$1; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  if [ -s "$OUT/$name.done" ]; then echo "skip $name (done)"; return; fi
  echo "=== $name: ${envs[*]} $* ===" | tee -a "$OUT/queue.log"
  env CAMC2V_BENCH_WAIT_S=3600 "${envs[@]}" \
    "$@" >"$OUT/$name.out" 2>"$OUT/$name.err"
  local rc=$?
  if [ $rc -eq 0 ] && grep -q '^{' "$OUT/$name.out"; then
    grep '^{' "$OUT/$name.out" | tail -1 >"$OUT/$name.done"
  elif [ $rc -eq 0 ]; then
    echo ok >"$OUT/$name.done"
  else
    echo "FAILED $name rc=$rc (see $OUT/$name.err)" | tee -a "$OUT/queue.log"
  fi
  tail -3 "$OUT/$name.out" 2>/dev/null
}

# e2e refresh FIRST: it also warms the persistent compile cache for the
# driver's end-of-round bench.py run (cold flagship compiles measured up to
# ~60 min through the round-5 tunnel — do not leave this to the queue tail)
run c3_e2e NOOP=1 -- python bench.py
run c2_temporal14 CAMC2V_TEMPORAL_MAX_WEIGHT_MB=14 -- \
  python bench.py --unet-only --iters 3
run c1_conditioning NOOP=1 -- python tools/bench_conditioning.py \
  --iters 12 --out "$OUT/cond_attrib.json"
run c4_train_profile "$WINNER" -- python tools/tpu_profile_train.py \
  --logdir "$OUT/train_profile"

echo "r5d queue complete" | tee -a "$OUT/queue.log"
