"""Capture a jax.profiler trace of the FULL jitted generation (model.sample).

The batch sweep (BENCH r3: 5.07 s/video b=1, 4.64 b=2, 4.49 b=4) shows
~0.85 s of batch-independent cost per sample() call on top of the 25-step
denoise scan. This traces one whole call so xplane_groups can attribute it
(VAE decode/encode, CLIP towers, conditioning assembly, epipolar prep, DDIM
surgery are all outside the unet-only profile).

Usage: python tools/tpu_profile_e2e.py [--logdir /tmp/e2e_profile] [--steps 25] [--batch 1]
Parse:  python tools/xplane_groups.py <logdir> --iters 1
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/e2e_profile")
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import jax
    from camc2v_tpu.utils.tpubench import enable_compile_cache
    enable_compile_cache()

    import bench

    # reuse the benchmark's exact model/batch/jit assembly, but trace it
    real_time = bench._time

    state = {}

    from camc2v_tpu.utils.tpubench import sync_fetch

    def capture_time(fn, *fargs, iters):
        out = fn(*fargs)
        sync_fetch(out)  # block_until_ready does not sync through the tunnel
        t0 = time.perf_counter()
        with jax.profiler.trace(args.logdir):
            # sync INSIDE the trace context: otherwise the capture closes
            # before the pipelined remote execution finishes
            sync_fetch(fn(*fargs))
        dt = time.perf_counter() - t0
        state["video_s"] = dt
        return dt

    bench._time = capture_time
    try:
        batch_s = bench.bench_e2e(1, args.steps, args.batch)
    finally:
        bench._time = real_time
    print(f"traced one sample() call: {batch_s:.3f}s batch={args.batch} "
          f"steps={args.steps} -> {args.logdir}", flush=True)


if __name__ == "__main__":
    main()
