#!/bin/bash
# Round-5 queue A: ds8 full-heads kv-residency experiment.
#
# At flagship ds8 (heads=5, Lk=17408) the kv-resident budget heuristic
# (48 MB, double-buffer-conservative) splits the grid per-head (g=5, hb=1):
# five grid passes over the query axis, heads-major output + an XLA
# transpose. Raising CAMC2V_EPI_RESIDENT_VMEM_MB to 90 prices the full-heads
# residency in (2*2*5*17408*64*2 = 89.1 MB <= budget): one pass, token-major
# output straight from the kernel, no ds8 output relayout — attacking the
# ~13 ms copies/relayouts pool from the r4 per-op profile.
#
# Ladder: cheap single-site ds8 A/B first (minutes-scale compile); the
# flagship UNet A/B only runs if the 90-MB rung compiles AND beats the
# default rung (Mosaic may reject ~121 MB vmem_limit on a 128 MB v5e, or
# actually double-buffer the constant-index block and blow VMEM — cheap to
# learn at the single site).
#
# Usage: bash tools/tpu_queue_r5a.sh [outdir] [wait_pid]
set -u
OUT=${1:-/tmp/r5a}
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

run bisect_48 NOOP=1 -- python tools/bench_epi_bisect.py \
  --mode kvres --rungs ds8_t16_b2 --iters 10
run bisect_90 NOOP=1 -- python tools/bench_epi_bisect.py \
  --mode kvres --resident-mb 90 --rungs ds8_t16_b2 --iters 10

# gate the ~10-min flagship compile on the single-site result
python - "$OUT" <<'EOF'
import json, sys, pathlib
out = pathlib.Path(sys.argv[1])
def last_ms(name):
    try:
        for line in (out / f"{name}.out").read_text().splitlines():
            r = json.loads(line)
            if r.get("rung") and r.get("ok"):
                return r["per_call_ms"]
    except Exception:
        pass
    return None
base, full = last_ms("bisect_48"), last_ms("bisect_90")
print(f"bisect per-call: 48MB={base} 90MB={full}")
go = base is not None and full is not None and full < base
(out / "go_flagship").write_text("1" if go else "0")
EOF

if [ "$(cat "$OUT/go_flagship" 2>/dev/null)" = "1" ]; then
  run unet_fullres CAMC2V_EPI_RESIDENT_VMEM_MB=90 -- \
    python bench.py --unet-only --iters 3
else
  echo "flagship skipped: 90MB rung not faster (or failed)" | tee -a "$OUT/queue.log"
fi

echo "r5a queue complete" | tee -a "$OUT/queue.log"
