"""Standalone flagship-shape epipolar-kernel benchmark (BQ sweep, round 3).

The round-3 profile shows the epipolar pool is 54 ms/step (5 sites x 8.8 ms at
ds8 alone). Per-site k/v DMA at BQ=256 is ~2.8 GB (k/v re-streamed for every
q-tile); raising BLOCK_Q cuts that linearly but unions more queries into each
tile-map row (less subtile skipping). This measures the real trade-off on the
chip, timing a chained fori_loop INSIDE one jit (isolated dispatches carry
~40 ms tunnel overhead; multi-jit sweep harnesses produced bogus traces in
round 2 — see CLAUDE.md).

Usage: python tools/bench_epipolar.py [--ds 8] [--bq 256,512,1024] [--iters 20]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def flagship_lines(ds: int, batch: int = 2):
    import jax
    import jax.numpy as jnp

    from camc2v_tpu.camera import geometry as G
    from camc2v_tpu.ops.epipolar_flash import epipolar_lines

    T = 16
    h = w = 256 // ds
    K = np.array([[256.0, 0, 128.0], [0, 256.0, 128.0], [0, 0, 1]], np.float32)
    c2w = np.tile(np.eye(4, dtype=np.float32), (batch, T, 1, 1))
    c2w[..., 0, 3] = np.linspace(0, 1, T)[None]
    pairs = G.relative_c2w_pairs(jnp.asarray(c2w))
    R, tv = pairs[..., :3, :3], pairs[..., :3, 3:4]
    tv = G.add_small_perturbation(tv, jax.random.key(0))
    F = G.fundamental_matrix(jnp.broadcast_to(jnp.asarray(K), (batch, T, T, 3, 3)), R, tv)
    return epipolar_lines(F, h, w, ds), T, h, w


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ds", type=int, default=8)
    ap.add_argument("--bq", default="256,512,1024")
    ap.add_argument("--bk", type=int, default=None, help="override BLOCK_K")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--outer", type=int, default=3)
    ap.add_argument("--density-only", action="store_true")
    args = ap.parse_args()

    import jax
    from camc2v_tpu.utils.tpubench import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    if args.density_only:
        jax.config.update("jax_platforms", "cpu")

    from camc2v_tpu.ops import epipolar_flash as E

    batch, heads, d, n_reg = 2, 5, 64, 4
    lines, T, h, w = flagship_lines(args.ds, batch)
    bk = args.bk or E.BLOCK_K
    lq = T * h * w
    lk = lq + bk
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(batch, lq, heads, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(batch, lk, heads, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(batch, lk, heads, d)), jnp.bfloat16)

    for bq in [int(x) for x in args.bq.split(",")]:
        amap = E.epipolar_tile_map(lines, T, h, w, args.ds, bq, bk)
        # density over the non-register portion of the key axis
        n_body = (lk - bk) // min(E.SUBTILE, bk, h * w)
        dens = float(np.asarray(amap)[:, :, :n_body].mean())
        print(f"BQ={bq} BK={bk}: active subtile density {dens:.3f}", flush=True)
        if args.density_only:
            continue

        def looped(q0, k, v, lines, bq=bq):
            def body(_, qc):
                out = E.epipolar_flash_attention(
                    qc, k, v, lines, t=T, h=h, w=w, downsample=args.ds,
                    num_registers=n_reg, block_q=bq, block_k=bk,
                )
                return out.astype(qc.dtype)

            return jax.lax.fori_loop(0, args.iters, body, q0)

        from camc2v_tpu.utils.tpubench import sync_fetch

        fn = jax.jit(looped)
        t0 = time.perf_counter()
        sync_fetch(fn(q, k, v, lines))
        print(f"  compiled+first in {time.perf_counter() - t0:.1f}s", flush=True)
        times = []
        for _ in range(args.outer):
            t0 = time.perf_counter()
            sync_fetch(fn(q, k, v, lines))
            times.append((time.perf_counter() - t0) / args.iters)
        print(f"  BQ={bq}: {1e3 * float(np.median(times)):.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
