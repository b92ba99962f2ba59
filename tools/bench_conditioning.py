"""Attribute the ~110 ms per-call conditioning fixed cost to components.

The round-4 two-point fit (PERF.md) puts the e2e fixed cost at 218 ms/call:
VAE decode 75.5 ms (tools/bench_vae.py) + ~30 ms fetch round-trip + ~110 ms
"conditioning" (everything prepare_batch/build_uncond assemble before the
denoise scan). This harness times each conditioning component as its own jit
at EXACT flagship shapes (b=1, T=16, 256x256, n_ctx=2) so the 110 ms gets
named: VAE encode (18 frames), CLIP text/vision towers, the depth-12
MultiLatentEpipolarAdaptor over 16K queries, the conditional epipolar mask
build, and camera_condition (pose prep + epipolar lines/tile maps).

Every timing is value-fetch-synchronized (tpubench.timed); the `null` row
measures the dispatch+fetch round-trip so per-component times can be read
RT-corrected. Components are timed in ONE process, serially (the axon
backend is single-claim).

Usage: python tools/bench_conditioning.py [--iters 12] [--out /tmp/cond_attrib.json]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--out", default="/tmp/cond_attrib.json")
    args = ap.parse_args()

    from camc2v_tpu.utils.tpubench import (
        enable_compile_cache,
        maybe_wait_at_startup,
        timed,
    )

    maybe_wait_at_startup()
    enable_compile_cache()

    import jax

    trace_only = os.environ.get("CAMC2V_COND_TRACE_ONLY", "0") == "1"
    if trace_only:
        # CPU smoke must not claim the single-claim axon backend (the env var
        # alone is overridden by the force-registered plugin — CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    import bench
    from camc2v_tpu.camera import geometry as G
    from camc2v_tpu.nn.epipolar import EpipolarConfig

    model, params, batch = bench._e2e_setup(1)
    cfg = model.config
    b, T, IMG, n_ctx = 1, 16, 256, 2
    hl = wl = IMG // 8

    rows: dict[str, float] = {}

    def run(name, fn, *fargs, probe=True):
        jfn = jax.jit(fn)
        if trace_only:  # CPU smoke: shape/signature validation without compute
            jfn.lower(*fargs)
            rows[name] = 0.0
            print(f"{name:>24}: traced ok", flush=True)
            return
        t, _ = timed(jfn, *fargs, iters=args.iters, probe=probe)
        rows[name] = t * 1e3
        print(f"{name:>24}: {t * 1e3:8.2f} ms", flush=True)

    # dispatch + one-element fetch round-trip baseline
    run("null_rt", lambda x: x * 1.0002 + 1.0, jnp.ones((8,), jnp.float32),
        probe=False)

    # --- VAE encode over [video ‖ cond_frames] = 18 frames (the sample() path
    # encodes them in one call: models/camcontexti2v.py prepare_batch)
    x_all = jnp.concatenate([batch["video"], batch["cond_frames"]], axis=1)
    key = jax.random.key(0)
    run("vae_encode_18f",
        lambda p, v, k: model.encode_first_stage(p, v, k), params, x_all, key)

    # --- CLIP text tower (cond prompt; null prompt costs the same again)
    run("clip_text_77", lambda p, t: model.encode_text(p, t),
        params, batch["caption_tokens"])

    # --- CLIP vision tower + image projection/resampler (cond frame;
    # build_uncond runs it a second time on the zero image)
    frame = batch["video"][:, 0]
    run("clip_vision_resampler", lambda p, f: model.embed_images(p, f),
        params, frame)

    # --- camera condition: relative poses + plucker + epipolar lines/tile
    # maps for every ds level (hoisted out of the scan)
    idx = jnp.zeros((b,), jnp.int32)
    run("camera_condition",
        lambda p, bt: model.camera_condition(p, bt, idx, 1.0), params, batch)

    # --- conditional epipolar mask for the adaptor (B, T*hw, 3*hw) bool
    epi_cfg = cfg.epipolar if cfg.epipolar is not None else EpipolarConfig()

    def mask_fn(K, RT, RTc):
        return G.conditional_epipolar_mask(
            K, RT, RTc, idx, IMG, IMG, downsample=8, config=epi_cfg)

    run("adaptor_mask_build", mask_fn,
        batch["camera_intrinsics"], batch["RT"], batch["RT_cond"], probe=False)

    # --- the depth-12 adaptor itself over 16384 queries x (3*1024) kv tokens
    mask = np.ones((b, cfg.adaptor.num_queries * cfg.adaptor.video_length,
                    (1 + n_ctx) * hl * wl), bool)
    # realistic ~30% density (PERF.md: query-band unions) so any sparsity
    # handling in the attention path is exercised honestly
    rng = np.random.default_rng(0)
    mask &= rng.uniform(size=mask.shape) < 0.3
    mask[..., :8] = True  # keep every query row non-empty
    z_tokens = jnp.asarray(
        rng.standard_normal((b, (1 + n_ctx) * hl * wl, cfg.adaptor.embedding_dim),
                            dtype=np.float32))
    emask = jnp.asarray(mask)
    run("adaptor_depth12",
        lambda p, zt, m: model.adaptor.apply({"params": p["adaptor"]}, zt, m,
                                             use_mask=True),
        params, z_tokens, emask)

    # --- same adaptor with the in-kernel lines path (generation dispatch)
    from camc2v_tpu.ops import epipolar_flash as ef

    F_cond = G.conditional_fundamental(
        batch["camera_intrinsics"], batch["RT"], batch["RT_cond"],
        jnp.zeros((b,), jnp.int32))
    adapt_lines = ef.epipolar_lines(F_cond, hl, wl, 8)
    blk = ef.BLOCK_K if (hl * wl) % ef.BLOCK_K == 0 else hl * wl
    adapt_tiles = ef.epipolar_tile_map(
        adapt_lines, 1 + n_ctx, hl, wl, 8, block_q=ef.BLOCK_Q, block_k=blk)
    run("adaptor_depth12_kernel",
        lambda p, zt, ln, ta: model.adaptor.apply(
            {"params": p["adaptor"]}, zt, None, use_mask=True,
            lines=ln, geom=(1 + n_ctx, hl, wl, 8, blk), tile_any=ta),
        params, z_tokens, adapt_lines, adapt_tiles)

    # --- whole prepare_batch as sample() calls it (sum check). Keep EVERY
    # cond leaf live (reduce each to a scalar) — returning only z lets XLA
    # DCE the adaptor/CLIP/camera assembly entirely (first run of this
    # harness reported 51.6 ms ~= the VAE encode alone).
    def _live(tree):
        leaves = [l for l in jax.tree_util.tree_leaves(tree)
                  if hasattr(l, "dtype")]
        return sum(jnp.sum(jnp.abs(l[..., :1]).astype(jnp.float32)) for l in leaves)

    def prep_fn(p, bt, full, **kw):
        z, cond = model.prepare_batch(
            p, bt, None, random_uncond=False, rand_cond_frame=False,
            enable_camera_condition=True, need_full_z=full, **kw)
        return _live((z, cond))

    run("prepare_batch_total", lambda p, bt: prep_fn(p, bt, True),
        params, batch, probe=False)
    run("prepare_batch_trimmed", lambda p, bt: prep_fn(p, bt, False),
        params, batch, probe=False)
    # the full production fast path: trimmed encode + batched uncond towers +
    # in-kernel adaptor mask (what sample() actually runs since round 4)
    run("prepare_batch_fast",
        lambda p, bt: prep_fn(p, bt, False, prefetch_uncond=True, inference=True),
        params, batch, probe=False)

    # --- build_uncond on top of a prepared cond (second vision tower + text)
    def uncond_fn(p, bt):
        z, cond = model.prepare_batch(
            p, bt, None, random_uncond=False, rand_cond_frame=False,
            enable_camera_condition=True)
        uc = model.build_uncond(p, cond, b, (IMG, IMG))
        return _live((z, cond, uc))

    run("prepare_plus_uncond", uncond_fn, params, batch, probe=False)

    rt = rows["null_rt"]
    corrected = {k: round(max(v - rt, 0.0), 2) for k, v in rows.items() if k != "null_rt"}
    summary = {
        "raw_ms": {k: round(v, 2) for k, v in rows.items()},
        "rt_corrected_ms": corrected,
        "component_sum_ms": round(
            sum(corrected[k] for k in (
                "vae_encode_18f", "clip_text_77", "clip_vision_resampler",
                "camera_condition", "adaptor_mask_build", "adaptor_depth12")), 2),
    }
    print(json.dumps(summary, indent=2))
    pathlib.Path(args.out).write_text(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
