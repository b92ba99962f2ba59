#!/bin/bash
# Round-4 queue D: conditioning fast-path e2e re-measure + post-Pallas-bwd
# train-step profile.
#
# * e2e_fastcond: bench.py headline with need_full_z (encode 3 frames, not
#   18) + prefetch_uncond (batched CLIP towers) — expects the 218 ms/call
#   fixed cost to drop by ~55-60 ms (VAE encode 53.6 -> ~9, one text + one
#   vision dispatch saved; tools/bench_conditioning.py attribution).
# * e2e_steps5: 5-step run for the two-point fixed-cost re-fit
#   (fixed = (5*t5 - t25)/4, step = (t25 - t5)/20).
# * train_profile: xplane trace of the 484 ms fwd+bwd step AFTER the Pallas
#   epipolar backward landed (the previous trace attributed the old 580 ms
#   step); groups table -> where the remaining backward time lives.
#
# Usage: bash tools/tpu_queue_r4d.sh [outdir] [wait_pid]
set -u
OUT=${1:-/tmp/r4d}
WAITPID=${2:-}
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
  env CAMC2V_BENCH_SKIP_FLOPS=1 CAMC2V_BENCH_WAIT_S=3600 "${envs[@]}" \
    "$@" >"$OUT/$name.out" 2>"$OUT/$name.err"
  local rc=$?
  if [ $rc -eq 0 ]; then
    printf '{"env": "%s"}\n' "${envs[*]}" >"$OUT/$name.done"
  else
    echo "FAILED $name rc=$rc (see $OUT/$name.err)" | tee -a "$OUT/queue.log"
  fi
  tail -3 "$OUT/$name.out" 2>/dev/null
}

run e2e_fastcond NOOP=1 -- python bench.py --iters 3
run e2e_steps5 NOOP=1 -- python bench.py --steps 5 --iters 3
rm -rf /tmp/train_profile  # stale traces corrupt the aggregation
run train_profile NOOP=1 -- python tools/tpu_profile_train.py --logdir /tmp/train_profile
python tools/xplane_groups.py /tmp/train_profile --iters 1 --top 40 \
  >"$OUT/train_groups.txt" 2>&1 || true
tail -50 "$OUT/train_groups.txt"

echo "r4d queue complete" | tee -a "$OUT/queue.log"
