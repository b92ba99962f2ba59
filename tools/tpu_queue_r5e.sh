#!/bin/bash
# Round-5 queue E: Pallas-saveable remat policies + b=2 retry + chain to r5d.
#
# Runs after tpu_queue_r5c.sh (waits on its completion marker). The r5c ladder
# A/Bs CAMC2V_REMAT_POLICY=dots; this queue adds the round-5 "dots_pallas" /
# "pallas" policies (pallas_call outputs saveable => the kernels' custom_vjp
# (out, lse) residuals are STORED and no Pallas forward re-runs in the
# backward — ~58 ms/step of kernel re-runs in docs/profiles/r5_train_top.txt:
# 15 epipolar fwd(+lse) + 12 flash fwd re-runs). Memory risk: the saved
# outs+lse may push the 14.8 GB static HBM over 15.75 — a clean OOM here is a
# result, recorded as such.
#
# After its own rungs it computes the global winner across r5c+r5e train
# rungs, retries b=2 under it if r5c's r4_b2 used a different env, and then
# launches tools/tpu_queue_r5d.sh with that winner for the conditioning /
# temporal14 / e2e / train-profile follow-ups.
#
# Usage: bash tools/tpu_queue_r5e.sh [outdir] [r5c_outdir]
set -u
OUT=${1:-/tmp/r5e}
R5C=${2:-/tmp/r5c}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

# wait for the r5c queue to release the chip
while ! grep -q "r5c queue complete" "$R5C/queue.log" 2>/dev/null; do
  sleep 30
done

mark_done() { # gate the marker on a result JSON line (ADVICE r4)
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

run p1_dots_pallas CAMC2V_REMAT_POLICY=dots_pallas -- \
  python tools/bench_trainstep.py --steps 6

# global winner across the r5c and r5e train rungs
last_ms() { # dir name
  python - "$1/$2.out" <<'EOF'
import json, sys, pathlib
v = None
p = pathlib.Path(sys.argv[1])
if p.exists():
    for line in p.read_text().splitlines():
        if not line.startswith("{"):
            continue
        try:
            r = json.loads(line)
        except Exception:
            continue
        if "value" in r:
            v = r["value"]
print(v if v is not None else "")
EOF
}

R2=$(last_ms "$R5C" r2_flashbwd); R3=$(last_ms "$R5C" r3_dots)
P1=$(last_ms "$OUT" p1_dots_pallas)
echo "train rungs: default=$R2 dots=$R3 dots_pallas=$P1 ms" | tee -a "$OUT/queue.log"

WIN_ENV=$(python - "$R2" "$R3" "$P1" <<'EOF'
import sys
names = ["NOOP=1", "CAMC2V_REMAT_POLICY=dots",
         "CAMC2V_REMAT_POLICY=dots_pallas"]
vals = [float(a) if a else 1e9 for a in sys.argv[1:4]]
print(names[vals.index(min(vals))])
EOF
)
echo "winner: $WIN_ENV" | tee -a "$OUT/queue.log"

# b=2 retry under the winner iff r5c's b=2 ran a different env
R5C_B2_ENV=$(grep -o 'r4_b2: [^-]*' "$R5C/queue.log" 2>/dev/null | head -1)
case "$R5C_B2_ENV" in
  *"$WIN_ENV"*) echo "b2 already measured under $WIN_ENV (r5c)" | tee -a "$OUT/queue.log" ;;
  *) run p3_b2 "$WIN_ENV" -- python tools/bench_trainstep.py --steps 4 --batch 2 ;;
esac

echo "r5e queue complete" | tee -a "$OUT/queue.log"

# chain the e2e-refresh / temporal14 / conditioning / train-profile queue
bash tools/tpu_queue_r5d.sh /tmp/r5d "" "$WIN_ENV" 2>&1 | tee -a "$OUT/r5d_chain.log"

# least-valuable rungs last:
# p2 isolates the dots term of dots_pallas; p4 A/Bs the round-5 adaptor
# lines-kernel TRAIN routing under the winner (r1 measured 509.6 ms vs the
# r4 484 ms baseline — if the regression is the adaptor kernel, this rung
# shows it directly and CAMC2V_ADAPTOR_KERNEL defaults should flip for train)
run p2_pallas CAMC2V_REMAT_POLICY=pallas -- \
  python tools/bench_trainstep.py --steps 6
run p4_adaptor_off "$WIN_ENV" CAMC2V_ADAPTOR_KERNEL=0 -- \
  python tools/bench_trainstep.py --steps 6
