#!/bin/bash
# Round-4 queue B: unet-level epipolar-mode A/B retries.
#
# r4a findings (docs/profiles/r4a): the kv-resident and precomp kernels are
# CORRECT and fast at every flagship shape standalone (precomp+kvres
# 12.1 ms/site at ds8_t16_b2 vs ~13.6 precomp-only), and the precomp UNet
# program statically fits HBM (args 7.3 GB + temps 3.7 GB = 10.4 < 15.75 GB).
# So the r3q zero-buffer "crashes" were NOT kernel bugs or static HBM — retry
# the full unet-only A/B with the hardened strided crash probe, then run e2e
# with the winner. Also re-run the base/kvres bisect ladders, which previously
# "failed" only because the XLA reference slice used default (bf16) einsum
# precision for the mask while the kernel computes exact f32 (fixed by
# Precision.HIGHEST in epipolar_lines/materialize_mask).
#
# Usage: bash tools/tpu_queue_r4b.sh [outdir] [wait_pid]
set -u
OUT=${1:-/tmp/r4b}
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
  grep '^{' "$OUT/$name.out" >"$OUT/$name.jsonl"
  if [ $rc -eq 0 ] && [ -s "$OUT/$name.jsonl" ]; then
    printf '{"env": "%s"}\n' "${envs[*]}" >"$OUT/$name.done"
  else
    echo "FAILED $name rc=$rc (see $OUT/$name.err)" | tee -a "$OUT/queue.log"
  fi
  tail -3 "$OUT/$name.jsonl" 2>/dev/null
}

LADDER=ds16_t16,ds8_t4,ds8_t8,ds8_t16,ds8_t16_b2

# bisect ladders that the bf16-precision reference cut short in r4a
run bisect_base2  NOOP=1 -- python tools/bench_epi_bisect.py --mode base  --rungs $LADDER
run bisect_kvres2 NOOP=1 -- python tools/bench_epi_bisect.py --mode kvres --rungs $LADDER

# unet-level A/B (each ~10-15 min compile; subsequent identical runs cache)
run unet_base    NOOP=1                   -- python bench.py --unet-only --iters 3
run unet_precomp CAMC2V_EPI_PRECOMP=1     -- python bench.py --unet-only --iters 3
run unet_kvres   CAMC2V_EPI_KV_RESIDENT=1 -- python bench.py --unet-only --iters 3
run unet_both    CAMC2V_EPI_PRECOMP=1 CAMC2V_EPI_KV_RESIDENT=1 -- \
    python bench.py --unet-only --iters 3

# pick the winner among VERIFIED runs (crash probe raises on zero buffers,
# so any json that exists is a real measurement)
best=$(python - "$OUT" <<'EOF'
import json, os, sys
d = sys.argv[1]
cands = {"": "unet_base",
         "CAMC2V_EPI_PRECOMP=1": "unet_precomp",
         "CAMC2V_EPI_KV_RESIDENT=1": "unet_kvres",
         "CAMC2V_EPI_PRECOMP=1 CAMC2V_EPI_KV_RESIDENT=1": "unet_both"}
best_env, best_ms = "", 1e9
for env, name in cands.items():
    try:
        v = json.load(open(os.path.join(d, name + ".jsonl")))["unet_step_ms"]
    except Exception:
        continue
    if v < 50:  # physically impossible on this program — distrust
        continue
    if v < best_ms:
        best_env, best_ms = env, v
print(best_env)
EOF
)
echo "e2e winner env: '$best'" | tee -a "$OUT/queue.log"
echo "$best" >"$OUT/winner.env"
if [ -n "$best" ]; then
  run e2e_winner $best -- python bench.py --iters 3
else
  run e2e_ship NOOP=1 -- python bench.py --iters 3
fi
echo "r4b queue complete" | tee -a "$OUT/queue.log"
