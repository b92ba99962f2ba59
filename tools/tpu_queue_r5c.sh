#!/bin/bash
# Round-5 queue C: train-step attack ladder, superseding tpu_queue_r5b.sh
# (whose later rungs were confounded: the flash-attention Pallas backward
# landed while r5b's first rung was compiling, so r5b's "dots" rung would
# have changed two variables at once).
#
# Rungs (all tools/bench_trainstep.py, fetch-synced, b=1 accum=4 unless said):
#   r1_adaptor_kernel   adaptor lines-kernel train routing, flash Pallas bwd
#                       OFF  — isolates the adaptor change vs the r4 484 ms
#   r2_flashbwd         + flash Pallas backward (default env) — isolates the
#                       while-pool kill (15 UNet spatial attn1 sites)
#   r3_dots             + CAMC2V_REMAT_POLICY=dots (saveable matmul outputs
#                       in the block remat; memory_analysis printed pre-run
#                       fails fast if it cannot fit)
#   r4_b2               best-of(r2, r3) env at --batch 2 (b=2 OOMed at
#                       18.2 GB under blanket remat in r4)
#
# Usage: bash tools/tpu_queue_r5c.sh [outdir] [wait_pid]
set -u
OUT=${1:-/tmp/r5b}
WAITPID=${2:-}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
if [ -n "$WAITPID" ]; then
  while kill -0 "$WAITPID" 2>/dev/null; do sleep 30; done
fi

mark_done() { # name — gate the marker on a result JSON line (ADVICE r4)
  local name=$1
  if grep -q '^{.*"value"' "$OUT/$name.out" 2>/dev/null; then
    grep '^{' "$OUT/$name.out" | tail -1 >"$OUT/$name.done"
  fi
}

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
  mark_done "$name"
  [ -s "$OUT/$name.done" ] || \
    echo "FAILED $name rc=$rc (see $OUT/$name.err)" | tee -a "$OUT/queue.log"
  tail -3 "$OUT/$name.out" 2>/dev/null
}

last_ms() { # per-line JSON parse (ADVICE r4)
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

# r1 may have been produced by the (killed) r5b controller's child process
mark_done r1_adaptor_kernel
run r1_adaptor_kernel CAMC2V_FLASH_PALLAS_BWD=0 -- \
  python tools/bench_trainstep.py --steps 6
run r2_flashbwd NOOP=1 -- python tools/bench_trainstep.py --steps 6
run r3_dots CAMC2V_REMAT_POLICY=dots -- python tools/bench_trainstep.py --steps 6

R1=$(last_ms r1_adaptor_kernel); R2=$(last_ms r2_flashbwd); R3=$(last_ms r3_dots)
echo "r1(adaptor-kernel)=$R1  r2(+flash-bwd)=$R2  r3(+dots)=$R3 ms" | tee -a "$OUT/queue.log"

WIN_ENV=$(python - "$R2" "$R3" <<'EOF'
import sys
r2 = float(sys.argv[1]) if sys.argv[1] else 1e9
r3 = float(sys.argv[2]) if sys.argv[2] else 1e9
print("CAMC2V_REMAT_POLICY=dots" if r3 < r2 else "NOOP=1")
EOF
)
run r4_b2 "$WIN_ENV" -- python tools/bench_trainstep.py --steps 4 --batch 2

echo "r5c queue complete" | tee -a "$OUT/queue.log"
