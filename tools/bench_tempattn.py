"""Temporal-attention (L=16) formulation microbench on the chip.

The round-3 profile shows ~14-18 ms/step of layout copies + tiny-softmax
fusions around the temporal attn1 chains ((B*hw, T, C) with T=16). The XLA
path reshapes projections to (B, L, H, D) and einsums 'bqhd,bkhd->bhqk',
which materialises head-split relayout copies (bf16[2048,16,5,64] x40 in the
trace). Candidate: project DIRECTLY into head-major layout with 3-D weight
einsums so the transpose folds into the projection dot's output layout.

Usage: python tools/bench_tempattn.py [--rows 2048] [--ch 320] [--iters 30]
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
    ap.add_argument("--rows", type=int, default=2048)  # B*hw at ds8 (fused CFG)
    ap.add_argument("--t", type=int, default=16)
    ap.add_argument("--ch", type=int, default=320)
    ap.add_argument("--dhead", type=int, default=64)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    R, T, C, D = args.rows, args.t, args.ch, args.dhead
    H = C // D
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(R, T, C)), jnp.bfloat16)
    wq = jnp.asarray(rng.normal(size=(C, C)) * 0.02, jnp.bfloat16)
    wk = jnp.asarray(rng.normal(size=(C, C)) * 0.02, jnp.bfloat16)
    wv = jnp.asarray(rng.normal(size=(C, C)) * 0.02, jnp.bfloat16)
    wo = jnp.asarray(rng.normal(size=(C, C)) * 0.02, jnp.bfloat16)
    bo = jnp.asarray(rng.normal(size=(C,)) * 0.02, jnp.bfloat16)
    scale = D ** -0.5

    def attn_current(xc):
        q = (xc @ wq).reshape(R, T, H, D)
        k = (xc @ wk).reshape(R, T, H, D)
        v = (xc @ wv).reshape(R, T, H, D)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(xc.dtype), v, preferred_element_type=jnp.float32)
        return o.astype(xc.dtype).reshape(R, T, C) @ wo + bo

    wq3 = wq.reshape(C, H, D)
    wk3 = wk.reshape(C, H, D)
    wv3 = wv.reshape(C, H, D)
    wo3 = wo.reshape(H, D, C)

    def attn_headmajor(xc):
        q = jnp.einsum("blc,chd->bhld", xc, wq3)
        k = jnp.einsum("blc,chd->bhld", xc, wk3)
        v = jnp.einsum("blc,chd->bhld", xc, wv3)
        s = jnp.einsum("bhld,bhmd->bhlm", q, k, preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhlm,bhmd->bhld", p.astype(xc.dtype), v, preferred_element_type=jnp.float32)
        return jnp.einsum("bhld,hdc->blc", o.astype(xc.dtype), wo3) + bo

    def attn_flat_batch(xc):
        # heads folded into the leading batch dim right after projection
        q = (xc @ wq).reshape(R * T, H, D).swapaxes(0, 1).reshape(H, R, T, D)
        k = (xc @ wk).reshape(R * T, H, D).swapaxes(0, 1).reshape(H, R, T, D)
        v = (xc @ wv).reshape(R * T, H, D).swapaxes(0, 1).reshape(H, R, T, D)
        s = jnp.einsum("hbqd,hbkd->hbqk", q, k, preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("hbqk,hbkd->hbqd", p.astype(xc.dtype), v, preferred_element_type=jnp.float32)
        o = o.astype(xc.dtype).reshape(H, R * T, D).swapaxes(0, 1).reshape(R, T, C)
        return o @ wo + bo

    variants = {
        "current(bqhd)": attn_current,
        "headmajor(3d-w)": attn_headmajor,
        "flatbatch(h-major)": attn_flat_batch,
    }
    ref = None
    for name, fn in variants.items():
        looped = jax.jit(
            lambda xc, fn=fn: jax.lax.fori_loop(
                0, args.iters, lambda _, a: fn(a).astype(a.dtype), xc
            )
        )
        t0 = time.perf_counter()
        from camc2v_tpu.utils.tpubench import sync_fetch

        out = looped(x); sync_fetch(out)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync_fetch(looped(x))
            times.append((time.perf_counter() - t0) / args.iters)
        # correctness cross-check (single application)
        one = jax.jit(fn)(x)
        if ref is None:
            ref = np.asarray(one, np.float32)
        else:
            err = np.abs(np.asarray(one, np.float32) - ref).max()
            assert err < 0.25, f"{name} deviates: {err}"  # bf16 tolerance
        print(f"{name:22s}: {1e3 * float(np.median(times)):7.3f} ms/call "
              f"(compile {compile_s:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
