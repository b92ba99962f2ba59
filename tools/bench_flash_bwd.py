"""Standalone fwd+bwd timing of the generic flash-attention kernel at the
flagship train-step shapes, Pallas backward vs the chunked-XLA VJP.

Shapes (from the r5 train profile's while-pool attribution):
  spatial   UNet attn1 at ds8: (B*T=16, L=1024, H=5, D=64), no mask (b=1
            train; the fused-CFG eval shape doubles the batch)
  adaptor   depth-12 MultiLatentEpipolarAdaptor site: (B=1, Lq=16384,
            Lk=3*1024 (+pad), H=8, D=64) with a banded bool mask — the
            TRAIN path now routes this through the epipolar lines kernel,
            so this rung is the fallback/diagnostic shape, not the default

Timing is value-fetch synchronized (tpubench.timed). Usage:
  python tools/bench_flash_bwd.py [--iters 8] [--rungs spatial,adaptor]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--rungs", default="spatial,adaptor")
    ap.add_argument("--cpu", action="store_true", help="interpret-mode smoke")
    args = ap.parse_args()

    from camc2v_tpu.utils.tpubench import enable_compile_cache, maybe_wait_at_startup, timed

    if not args.cpu:
        maybe_wait_at_startup()
    enable_compile_cache()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from camc2v_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(0)

    def qkv(b, lq, lk, h, d=64, dtype=jnp.bfloat16):
        mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.1, dtype)
        return mk(b, lq, h, d), mk(b, lk, h, d), mk(b, lk, h, d)

    def band_mask(b, lq, lk, width_frac=0.3):
        q_pos = np.arange(lq)[:, None] / lq
        k_pos = np.arange(lk)[None, :] / lk
        m = np.abs(q_pos - k_pos) < width_frac / 2
        return jnp.asarray(np.broadcast_to(m, (b, lq, lk)))

    rungs = {}
    if "spatial" in args.rungs:
        rungs["spatial_ds8"] = (*qkv(16, 1024, 1024, 5), None)
    if "adaptor" in args.rungs:
        rungs["adaptor_16k"] = (*qkv(1, 16384, 3072, 8), band_mask(1, 16384, 3072))

    for name, (q, k, v, mask) in rungs.items():
        for env_on, label in ((True, "pallas"), (False, "chunked_xla")):
            import os

            os.environ["CAMC2V_FLASH_PALLAS_BWD"] = "1" if env_on else "0"

            def loss(q, k, v):
                return jnp.sum(flash_attention(q, k, v, mask=mask).astype(jnp.float32) ** 2)

            g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            try:
                ms, out = timed(lambda: g(q, k, v), iters=args.iters)
                gn = float(sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in out))
                ok = np.isfinite(gn) and gn > 0
                print(json.dumps({
                    "rung": name, "mode": label, "per_call_ms": round(ms, 2),
                    "grad_absum": round(gn, 2), "ok": bool(ok),
                }), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"rung": name, "mode": label, "ok": False,
                                  "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
