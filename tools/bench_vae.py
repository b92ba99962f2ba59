"""VAE encode/decode microbench at the flagship generation shapes.

The e2e benchmark carries a ~0.32 s/call fixed cost beyond the 25 UNet steps
(PERF.md); the VAE is the FLOPs- and HBM-heaviest fixed component: decode is
16 frames at 256^2 (reference decodes frame-wise through the same 2D
AutoencoderKL — lvdm/models/autoencoder.py:13, ddpm3d.py:648-669). Its
128^2/256^2 GroupNorms exceed the one-pass Pallas kernel's VMEM row bound and
take the XLA path unless CAMC2V_GN_BIG4D=1 routes them through the chunked
two-phase kernels — this microbench is the cheap-compile A/B for that switch
(a VAE-only program compiles in minutes vs ~20+ for the full e2e jit).

Usage: python tools/bench_vae.py [--frames 16] [--iters 10] [--decode-only]
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
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--img", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--decode-only", action="store_true")
    ap.add_argument("--encode-only", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="host smoke (forces the CPU backend)")
    args = ap.parse_args()

    import jax
    from camc2v_tpu.utils.tpubench import enable_compile_cache
    enable_compile_cache()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from camc2v_tpu.nn.vae import AutoencoderKL
    from camc2v_tpu.presets import camcontexti2v_256

    cfg = camcontexti2v_256().vae
    vae = AutoencoderKL(cfg, dtype=jnp.bfloat16)
    n, img = args.frames, args.img
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(-1, 1, (n, img, img, 3)), jnp.float32)
    # default __call__ = encode+decode roundtrip: builds the full param tree
    params = vae.init(jax.random.key(0), frames[:1])["params"]
    # realized bf16 weights, like bench.py (zeros would flatter HBM compression)
    prng = np.random.default_rng(1)
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(prng.standard_normal(a.shape, np.float32) * 0.02,
                              jnp.bfloat16 if a.dtype == jnp.float32 else a.dtype),
        params,
    )

    z_hw = img // 8
    z = jnp.asarray(rng.normal(size=(n, z_hw, z_hw, cfg.z_channels)), jnp.float32)

    # Time a CHAINED fori_loop inside ONE jit, like bench.py: isolated jit
    # dispatches through the remote tunnel return async handles whose
    # wall-clock does not reflect device time (the first cut of this bench
    # reported a physically impossible 0.22 ms encode that way). The loop
    # carries a data dependency (mean of the output folded into the next
    # input at 1e-12 scale) so XLA cannot parallelise or DCE the iterations.
    inner = 8

    def chained(method, x0):
        def run(p, xc):
            def body(_, carry):
                out = vae.apply({"params": p}, carry, method=method)
                return carry + (jnp.mean(out) * 1e-12).astype(carry.dtype)

            return jax.lax.fori_loop(0, inner, body, xc)

        from camc2v_tpu.utils.tpubench import crash_probe, sync_fetch

        fn = jax.jit(run)
        sync_fetch(fn(params, x0))  # compile + warm (fetch = the only real sync)
        ts = []
        out = None
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = fn(params, x0)
            sync_fetch(out)
            ts.append(time.perf_counter() - t0)
        crash_probe(out, what="vae benchmark output")
        return float(np.median(ts)) / inner

    results = {}
    if not args.decode_only:
        results["encode_ms"] = chained(vae.encode, frames) * 1e3
    if not args.encode_only:
        results["decode_ms"] = chained(vae.decode, z) * 1e3
    import os

    results["gn_big4d"] = os.environ.get("CAMC2V_GN_BIG4D", "0")
    print({k: (round(v, 2) if isinstance(v, float) else v) for k, v in results.items()})


if __name__ == "__main__":
    main()
