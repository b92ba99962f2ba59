"""Per-op xplane profile of the flagship MultiLatentEpipolarAdaptor.

tools/bench_conditioning.py measured the depth-12 adaptor at 44.2 ms/call
(RT-corrected) — ~2.3 TFLOP of bf16 work that should take ~15 ms at the
flash-attention pool's efficiency. This traces the adaptor-only jit at exact
flagship shapes (16384 queries x 3074 kv tokens, mask density ~0.3) so
tools/parse_xplane.py can attribute the gap (flash kernel vs projections/FF
GEMMs vs mask handling vs layout copies).

Usage:
  python tools/profile_adaptor.py [--logdir /tmp/adaptor_profile] [--iters 3]
  python tools/parse_xplane.py /tmp/adaptor_profile   # totals are all-iters
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/adaptor_profile")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from camc2v_tpu.utils.tpubench import (
        enable_compile_cache,
        maybe_wait_at_startup,
        sync_fetch,
        timed,
    )

    maybe_wait_at_startup()
    enable_compile_cache()

    import shutil

    import jax
    import numpy as np

    import bench

    model, params, _ = bench._e2e_setup(1)
    cfg = model.config
    b, n_ctx, hw = 1, 2, 1024

    rng = np.random.default_rng(0)
    lq = cfg.adaptor.num_queries * cfg.adaptor.video_length
    lk = (1 + n_ctx) * hw
    mask = rng.uniform(size=(b, lq, lk)) < 0.3
    mask[..., :8] = True
    import jax.numpy as jnp

    z_tokens = jnp.asarray(
        rng.standard_normal((b, lk, cfg.adaptor.embedding_dim), dtype=np.float32))
    emask = jnp.asarray(mask)

    fn = jax.jit(lambda p, zt, m: model.adaptor.apply(
        {"params": p["adaptor"]}, zt, m, use_mask=True))

    t, _ = timed(fn, params, z_tokens, emask, iters=5)
    print(f"adaptor: {t * 1e3:.2f} ms/call (fetch-synced)", flush=True)

    shutil.rmtree(args.logdir, ignore_errors=True)  # stale traces corrupt aggregation
    with jax.profiler.trace(args.logdir):
        for _ in range(args.iters):
            sync_fetch(fn(params, z_tokens, emask))  # sync INSIDE the trace
    print(f"trace written to {args.logdir} ({args.iters} iters); parse with:\n"
          f"  python tools/parse_xplane.py {args.logdir}")


if __name__ == "__main__":
    main()
