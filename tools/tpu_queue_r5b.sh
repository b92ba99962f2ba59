#!/bin/bash
# Round-5 queue B: train-step attack ladder (VERDICT r4 "do this" #2 + #3).
#
# The r5 train profile (/tmp/r5/train_profile, 483.8 ms device) attributes:
#   80 ms  epipolar custom-calls (fwd + remat recompute + Pallas bwd)
#   58 ms  27 `while` loops = chunked lax.map VJPs of the materialised-mask
#          flash kernel — 12 adaptor depth layers + 15 UNet spatial attn1
#          sites — plus ~25 ms of their dynamic-slice/update + copy-done halo
#
# Ladder (each rung gated on the previous result being sane):
#   r1  baseline re-measure with the r5 adaptor lines-kernel train routing
#       (CAMC2V_ADAPTOR_KERNEL=1 is now the default): kills the 12 adaptor
#       whiles (dense softmax fwd + chunked bwd)
#   r2  + CAMC2V_REMAT_POLICY=dots (dots_with_no_batch_dims_saveable): save
#       matmul outputs in the block remat, recompute elementwise only.
#       bench_trainstep prints memory_analysis BEFORE running, so an OOM
#       config fails fast at the static check.
#   r3  winner + batch=2 retry (b=2 OOMed at 18.2 GB under blanket remat)
#   r4  adaptor kill-switch A/B (CAMC2V_ADAPTOR_KERNEL=0) — only if r1 looks
#       implausible and needs attribution
#
# Usage: bash tools/tpu_queue_r5b.sh [outdir]
set -u
OUT=${1:-/tmp/r5b}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

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
  # done-marker gated on a result JSON line, not the exit code alone
  # (ADVICE r4: a failed rung must not be marked done and skipped forever)
  if [ $rc -eq 0 ] && grep -q '^{.*"value"' "$OUT/$name.out"; then
    grep '^{' "$OUT/$name.out" | tail -1 >"$OUT/$name.done"
  else
    echo "FAILED $name rc=$rc (see $OUT/$name.err)" | tee -a "$OUT/queue.log"
  fi
  tail -3 "$OUT/$name.out" 2>/dev/null
}

# per-line JSON parse (ADVICE r4: one bad stdout line must not nuke the gate)
last_ms() {
  python - "$OUT/$1.out" <<'EOF'
import json, sys, pathlib
v = None
try:
    for line in pathlib.Path(sys.argv[1]).read_text().splitlines():
        if not line.startswith("{"):
            continue
        try:
            r = json.loads(line)
        except Exception:
            continue
        if "value" in r:
            v = r["value"]
except Exception:
    pass
print(v if v is not None else "")
EOF
}

run r1_adaptor_kernel NOOP=1 -- python tools/bench_trainstep.py --steps 6
run r2_remat_dots CAMC2V_REMAT_POLICY=dots -- python tools/bench_trainstep.py --steps 6

R1=$(last_ms r1_adaptor_kernel)
R2=$(last_ms r2_remat_dots)
echo "r1(base+adaptor-kernel)=$R1 ms  r2(+dots)=$R2 ms" | tee -a "$OUT/queue.log"

# b=2 retry under whichever remat policy won (python picks to avoid bc)
WIN_ENV=$(python - "$R1" "$R2" <<'EOF'
import sys
r1 = float(sys.argv[1]) if sys.argv[1] else 1e9
r2 = float(sys.argv[2]) if sys.argv[2] else 1e9
print("CAMC2V_REMAT_POLICY=dots" if r2 < r1 else "NOOP=1")
EOF
)
run r3_b2 "$WIN_ENV" -- python tools/bench_trainstep.py --steps 4 --batch 2

echo "r5b queue complete" | tee -a "$OUT/queue.log"
