#!/bin/bash
# Round-4 queue C: fixed-cost attribution + train stability + dpmpp with the
# r4b winner env.
#
# * e2e_steps5: bench.py --steps 5 with the r4b winner; with t25 from
#   r4b/e2e_winner*, fixed = (5*t5 - t25)/4 and step = (t25 - t5)/20.
# * train_50: 50-step flagship train stability (loss finite every step, no
#   HBM creep -> the run either completes or the crash probe raises).
# * dpmpp13_winner: 13-step DPM++(2M) e2e with the winner env (the >=20 v/min
#   headline candidate; solver-accuracy evidence in BASELINE.md).
#
# Usage: bash tools/tpu_queue_r4c.sh [outdir] [wait_pid] [r4b_outdir]
set -u
OUT=${1:-/tmp/r4c}
WAITPID=${2:-}
R4B=${3:-/tmp/r4b}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
if [ -n "$WAITPID" ]; then
  while kill -0 "$WAITPID" 2>/dev/null; do sleep 30; done
fi

winner=$(cat "$R4B/winner.env" 2>/dev/null || true)
echo "winner env: '$winner'" | tee -a "$OUT/queue.log"
echo "$winner" >"$OUT/winner.env"

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
  grep '^{' "$OUT/$name.out" >"$OUT/$name.jsonl"
  if [ $rc -eq 0 ] && [ -s "$OUT/$name.jsonl" ]; then
    printf '{"env": "%s"}\n' "${envs[*]}" >"$OUT/$name.done"
  else
    echo "FAILED $name rc=$rc (see $OUT/$name.err)" | tee -a "$OUT/queue.log"
  fi
  tail -3 "$OUT/$name.jsonl" 2>/dev/null
}

run e2e_steps5 $winner NOOP=1 -- python bench.py --steps 5 --iters 3
run train_50 NOOP=1 -- python tools/bench_trainstep.py --batch 1 --accum 4 --steps 50
run dpmpp13_winner $winner NOOP=1 -- python bench.py --sampler dpmpp_2m --steps 13 --iters 3

echo "r4c queue complete" | tee -a "$OUT/queue.log"
