"""Capture a jax.profiler trace of the flagship fused-CFG UNet denoise on TPU.

Usage:
  python tools/tpu_profile_unet.py [--logdir /tmp/unet_profile] [--mode full|nocam]

Dumps an xplane trace; parse with tools/parse_xplane.py to get the op-level
self-time breakdown that drives the round-2 perf work (VERDICT.md weak #1).
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/unet_profile")
    ap.add_argument("--mode", default="full", choices=["full", "nocam"])
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    from camc2v_tpu.utils.tpubench import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from camc2v_tpu.nn.unet3d import UNetModel
    from camc2v_tpu.presets import camcontexti2v_256
    from __graft_entry__ import _flagship_unet_inputs

    cfg = camcontexti2v_256()
    unet = UNetModel(cfg.unet, dtype=jnp.bfloat16)
    x, t, ctx, fs, camera = _flagship_unet_inputs(batch=2, dtype=jnp.bfloat16)
    if args.mode == "nocam":
        camera = None
    params = jax.eval_shape(lambda: unet.init(jax.random.key(0), x, t, ctx, fs, camera))
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype),
        params,
    )

    # ctx/fs/camera as jit ARGUMENTS: closure arrays are inlined as HLO
    # literals, and the precomp camera payload (~1.1 GB of penalty tiles)
    # would blow the remote-compile request size limit (HTTP 413).
    from camc2v_tpu.utils.tpubench import sync_fetch

    fwd = jax.jit(lambda p, x, t, ctx, fs, camera: unet.apply(p, x, t, ctx, fs, camera))
    print("compiling...", flush=True)
    t0 = time.perf_counter()
    sync_fetch(fwd(params, x, t, ctx, fs, camera))
    print(f"compiled in {time.perf_counter() - t0:.1f}s", flush=True)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        sync_fetch(fwd(params, x, t, ctx, fs, camera))
        times.append(time.perf_counter() - t0)
    print(f"step_ms={np.median(times) * 1000:.2f}", flush=True)

    with jax.profiler.trace(args.logdir):
        for _ in range(args.iters):
            sync_fetch(fwd(params, x, t, ctx, fs, camera))
    print(f"trace written to {args.logdir}", flush=True)


if __name__ == "__main__":
    main()
