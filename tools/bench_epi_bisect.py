"""Shape bisect for the crashing epipolar kernel modes (VERDICT r3 #1).

Round 3's kv-resident (CAMC2V_EPI_KV_RESIDENT=1) and precomputed-penalty
(CAMC2V_EPI_PRECOMP-equivalent `penalties=` argument) modes compile but crash
at flagship scale INSIDE the full UNet program — the axon tunnel surfaces no
error, the outputs come back zero-filled (PERF.md "r3q"). Both pass CPU
interpret parity, so the math is right; this harness finds the breaking
*scale* by running the STANDALONE kernel over a size ladder on the chip, with
full value verification at every rung:

  * output fetched and checked finite / non-zero,
  * first BLOCK_Q queries compared against a chunked XLA reference
    (materialised mask, f32) — max|err| reported per rung.

Each rung is one small pallas_call program (seconds to compile through the
tunnel, vs ~15 min per flagship UNet variant), so the whole ladder costs less
than one crashed flagship A/B.

Modes: --mode base | kvres | precomp | precomp_kvres. kvres sets
CAMC2V_EPI_KV_RESIDENT=1 in-process before importing the kernel dispatch;
precomp passes materialised penalties explicitly (the sampler's hoisted path,
camc2v_tpu/nn/epipolar.py::add_precomputed_penalties).

Usage:
  python tools/bench_epi_bisect.py --mode kvres \
      --rungs ds16_t16,ds8_t4,ds8_t8,ds8_t16,ds8_t16_b2
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# (ds, T, batch) ladders; flagship = ds8_t16_b2 (the r3q crash point is the
# 15-site UNet at b=2 fused-CFG, whose ds8 sites are exactly ds8_t16_b2).
# ds32 is omitted: hw=64 < 256 fails kernel_tiling_ok — those sites run the
# materialised-mask kernel in production, not this one.
RUNGS = {
    "ds16_t4": (16, 4, 1),  # CPU interpret smoke rung
    "ds16_t16": (16, 16, 2),
    "ds8_t4": (8, 4, 1),
    "ds8_t8": (8, 8, 1),
    "ds8_t16": (8, 16, 1),
    "ds8_t16_b2": (8, 16, 2),
}


def make_inputs(ds: int, T: int, batch: int):
    import jax
    import jax.numpy as jnp

    from camc2v_tpu.camera import geometry as G
    from camc2v_tpu.ops import epipolar_flash as E

    h = w = 256 // ds
    K = np.array([[256.0, 0, 128.0], [0, 256.0, 128.0], [0, 0, 1]], np.float32)
    c2w = np.tile(np.eye(4, dtype=np.float32), (batch, T, 1, 1))
    c2w[..., 0, 3] = np.linspace(0, 1, T)[None]
    pairs = G.relative_c2w_pairs(jnp.asarray(c2w))
    R, tv = pairs[..., :3, :3], pairs[..., :3, 3:4]
    tv = G.add_small_perturbation(tv, jax.random.key(0))
    F = G.fundamental_matrix(jnp.broadcast_to(jnp.asarray(K), (batch, T, T, 3, 3)), R, tv)
    lines = E.epipolar_lines(F, h, w, ds)

    heads, d, n_reg = 5, 64, 4
    bk = E.choose_block_k(h * w)
    lq = T * h * w
    lk = lq + bk
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(batch, lq, heads, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(batch, lk, heads, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(batch, lk, heads, d)), jnp.bfloat16)
    return q, k, v, lines, T, h, w, bk, n_reg


def xla_reference_slice(q, k, v, lines, t, h, w, ds, n_reg, nslice):
    """f32 reference attention for queries [0:nslice] (materialised mask)."""
    import jax.numpy as jnp

    from camc2v_tpu.ops.epipolar_flash import NEG_INF, materialize_mask

    b, _, heads, d = q.shape
    lk = k.shape[1]
    qs = q[:, :nslice].astype(jnp.float32)
    ls = lines[:, :nslice]
    mask = materialize_mask(ls, t, h, w, ds)  # (b, nslice, t*h*w)
    reg = jnp.arange(lk - t * h * w) < n_reg
    mask = jnp.concatenate(
        [mask, jnp.broadcast_to(reg[None, None], (b, nslice, reg.shape[0]))], axis=-1
    )
    s = jnp.einsum("bqhd,bkhd->bhqk", qs, k.astype(jnp.float32)) * (d ** -0.5)
    s = jnp.where(mask[:, None], s, NEG_INF)
    p = jnp.where(jnp.any(mask, axis=-1)[:, None, :, None],
                  jnp.exp(s - jnp.max(s, axis=-1, keepdims=True)), 0.0)
    p = p / jnp.maximum(p.sum(-1, keepdims=True), 1e-30)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))


def run_rung(name: str, mode: str, iters: int) -> dict:
    import jax
    import jax.numpy as jnp

    from camc2v_tpu.ops import epipolar_flash as E

    ds, T, batch = RUNGS[name]
    q, k, v, lines, t, h, w, bk, n_reg = make_inputs(ds, T, batch)
    penalties = None
    if mode in ("precomp", "precomp_kvres"):
        penalties = E.materialize_penalties(lines, t, h, w, ds, n_reg, bk)
        jax.block_until_ready(penalties)

    def looped(q0, k, v, lines, penalties):
        def body(_, qc):
            out = E.epipolar_flash_attention(
                qc, k, v, lines, t=t, h=h, w=w, downsample=ds,
                num_registers=n_reg, block_k=bk, penalties=penalties,
            )
            return out.astype(qc.dtype)

        return jax.lax.fori_loop(0, iters, body, q0)

    from camc2v_tpu.utils.tpubench import sync_fetch

    fn = jax.jit(looped)
    t0 = time.perf_counter()
    out = fn(q, k, v, lines, penalties)
    sync_fetch(out)  # block_until_ready does NOT synchronize through the tunnel
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = fn(q, k, v, lines, penalties)
    sync_fetch(out)
    per_call_ms = 1e3 * (time.perf_counter() - t0) / iters

    # full-value fetch + verification: a crashed axon execution returns
    # zero-filled buffers without raising
    out_np = np.asarray(jax.device_get(out), np.float32)
    finite_frac = float(np.isfinite(out_np).mean())
    zero_frac = float((out_np == 0).mean())

    # single-application output for the reference comparison (the loop above
    # feeds outputs back in as queries, so compare a fresh one-shot call)
    one = jax.jit(lambda q, k, v, lines, pen: E.epipolar_flash_attention(
        q, k, v, lines, t=t, h=h, w=w, downsample=ds,
        num_registers=n_reg, block_k=bk, penalties=pen))
    out1 = np.asarray(jax.device_get(one(q, k, v, lines, penalties)), np.float32)
    nslice = min(E.BLOCK_Q, t * h * w)
    ref = np.asarray(jax.device_get(
        jax.jit(xla_reference_slice, static_argnums=(4, 5, 6, 7, 8, 9))(
            q, k, v, lines, t, h, w, ds, n_reg, nslice)), np.float32)
    err = float(np.max(np.abs(out1[:, :nslice] - ref)))

    return {
        "rung": name, "mode": mode, "ds": ds, "T": T, "batch": batch,
        "lq": t * h * w, "lk": t * h * w + bk, "block_k": bk,
        "per_call_ms": round(per_call_ms, 3), "compile_s": round(compile_s, 1),
        "finite_frac": finite_frac, "zero_frac": round(zero_frac, 4),
        "slice_max_err": err,
        "ok": bool(finite_frac == 1.0 and zero_frac < 0.5 and err < 0.1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="base",
                    choices=["base", "kvres", "precomp", "precomp_kvres"])
    ap.add_argument("--rungs", default="ds16_t16,ds8_t4,ds8_t8,ds8_t16,ds8_t16_b2")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--resident-mb", default=None,
                    help="override CAMC2V_EPI_RESIDENT_VMEM_MB for kvres rungs")
    ap.add_argument("--cpu", action="store_true",
                    help="interpret-mode smoke (the env var alone is overridden "
                         "by the force-registered axon backend)")
    args = ap.parse_args()

    import os

    from camc2v_tpu.utils.tpubench import enable_compile_cache, maybe_wait_at_startup

    maybe_wait_at_startup()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.mode in ("kvres", "precomp_kvres"):
        os.environ["CAMC2V_EPI_KV_RESIDENT"] = "1"
        if args.resident_mb:
            os.environ["CAMC2V_EPI_RESIDENT_VMEM_MB"] = str(args.resident_mb)
    enable_compile_cache()

    results = []
    for name in args.rungs.split(","):
        try:
            r = run_rung(name.strip(), args.mode, args.iters)
        except Exception as e:  # noqa: BLE001
            msg = f"{type(e).__name__}: {e}"
            if any(s in msg for s in ("UNAVAILABLE", "Unable to initialize backend",
                                      "DEADLINE", "INTERNAL", "HTTP 500")):
                from camc2v_tpu.utils.tpubench import retry_transient
                retry_transient(e)
            r = {"rung": name, "mode": args.mode, "ok": False, "error": msg[:500]}
        results.append(r)
        print(json.dumps(r), flush=True)
        if not r["ok"]:
            print(f"# rung {name} FAILED — ladder stops here", flush=True)
            break
    print(json.dumps({"summary": {r["rung"]: r["ok"] for r in results}}), flush=True)


if __name__ == "__main__":
    main()
