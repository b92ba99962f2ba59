#!/bin/bash
# Round-4 data-gathering queue (r4a). Items run SERIALLY (the axon backend is
# single-claim). Persistent compile cache is enabled by every harness
# (camc2v_tpu/utils/tpubench.py), so re-runs of unchanged programs are cheap.
#
# 1-5: epipolar-mode shape bisect (VERDICT r4 #1) — standalone kernel on a
#      size ladder with full value verification; finds where kv-resident /
#      precomp start returning zero buffers, at seconds-per-rung compiles.
# 6:   compile-only HBM accounting of the flagship UNet with precomp
#      penalties (the +1.1 GB HBM-exhaustion hypothesis; cannot crash).
# 7:   e2e xplane profile — attribute the ~0.36 s/call fixed cost
#      (VERDICT r4 #2). Fresh logdir per run (ADVICE r3: stale traces).
# 8-9: VAE GN_BIG4D A/B (cheap compiles).
# 10:  flagship train step b=2 (VERDICT r4 #8).
# 11:  dpmpp_2m 13-step e2e headline candidate (VERDICT r4 #3).
#
# Usage: bash tools/tpu_queue_r4a.sh [outdir]
set -u
OUT=${1:-/tmp/r4a}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name, env..., -- cmd...   (records env with the result, ADVICE r3)
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

# epipolar bisect (the round's #1 item first, in crash-suspect order)
run bisect_kvres   NOOP=1 -- python tools/bench_epi_bisect.py --mode kvres   --rungs $LADDER
run bisect_precomp NOOP=1 -- python tools/bench_epi_bisect.py --mode precomp --rungs $LADDER
run bisect_base    NOOP=1 -- python tools/bench_epi_bisect.py --mode base    --rungs $LADDER
run bisect_both    NOOP=1 -- python tools/bench_epi_bisect.py --mode precomp_kvres --rungs $LADDER
# per-head residency at the flagship rung (does shrinking the resident block fix it?)
run bisect_kvres24 NOOP=1 -- python tools/bench_epi_bisect.py --mode kvres --resident-mb 24 --rungs ds8_t16_b2

# compile-only HBM accounting for the precomp UNet program
run mem_precomp CAMC2V_EPI_PRECOMP=1 -- python tools/unet_mem_analysis.py --program unet

# e2e fixed-cost attribution (fresh logdir per run — ADVICE r3)
if [ ! -s "$OUT/e2e_profile.done" ]; then
  rm -rf "$OUT/e2e_profile_logdir"
  echo "=== e2e_profile ===" | tee -a "$OUT/queue.log"
  python tools/tpu_profile_e2e.py --logdir "$OUT/e2e_profile_logdir" \
    >"$OUT/e2e_profile.out" 2>"$OUT/e2e_profile.err" \
    && python tools/xplane_groups.py "$OUT/e2e_profile_logdir" --iters 1 \
         >"$OUT/e2e_profile_groups.txt" 2>&1 \
    && echo ok >"$OUT/e2e_profile.done" \
    || echo "FAILED e2e_profile" | tee -a "$OUT/queue.log"
fi

# VAE GN_BIG4D A/B (cheap compiles; decode dominates the fixed-cost suspect list)
run vae_base NOOP=1             -- python tools/bench_vae.py --iters 10
run vae_big4d CAMC2V_GN_BIG4D=1 -- python tools/bench_vae.py --iters 10

# flagship train step at b=2 (train-throughput table, VERDICT r4 #8)
run train_b2 NOOP=1 -- python tools/bench_trainstep.py --batch 2 --accum 4 --steps 4

# dpmpp_2m 13-step e2e (the >=20 v/min candidate, VERDICT r4 #3)
run e2e_dpmpp13 NOOP=1 -- python bench.py --sampler dpmpp_2m --steps 13 --iters 3

echo "r4a queue complete" | tee -a "$OUT/queue.log"
