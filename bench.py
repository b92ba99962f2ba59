"""Benchmark: flagship CamContextI2V generation throughput on one TPU chip.

Two measurements:
  * headline (default): END-TO-END 25-step DDIM generation — conditioning
    assembly (VAE encode, CLIP text+image, resampler, adaptor, camera
    condition) + the fused-CFG denoise scan + VAE decode, one jit, REALIZED
    bf16 weights. Metric: videos/min/chip.
  * --unet-only: one fused-CFG UNet denoise evaluation (the hot op of the
    loop), reported as unet_step_ms.

vs_baseline derivation (the reference publishes NO throughput numbers —
BASELINE.json published: {}): we derive a reference rate from the model's
MXU FLOPs. One fused-CFG UNet eval is 14.3 TFLOP of true matmul/conv work
(tools/flops_audit.py: 10.4 conv+dot via jaxpr walk + 3.9 dense epipolar;
XLA cost_analysis reports ~29 TFLOP but that double-counts non-MXU
elementwise/transcendental ops — see PERF.md). The reference runs the same
maths in PyTorch+xformers on an A100-80GB (312 TFLOP/s bf16): at ~35% MFU —
generous for a conv+attention UNet with per-step Python dispatch
(samplers/ddim.py:169-238 crosses host<->device every step) — that is
14.3e12/(312e12*0.35) = 131 ms per denoise step, 25 steps = 3.3 s/video
=> ~17 videos/min at the kindest reading; the round-1/2 denominator of
6.0 videos/min corresponds to ~13% MFU end-to-end, which real PyTorch
video-diffusion pipelines (unfused CFG, per-step dispatch, mask building)
routinely land at. We KEEP 6.0 videos/min as the denominator for
cross-round comparability; PERF.md documents the v5e roofline (72.8 ms
floor per fused-CFG eval -> the 5x north-star exceeds physics at bf16;
the renegotiated target is >=20 videos/min).

Usage: python bench.py [--unet-only] [--tiny] [--iters N] [--steps N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REFERENCE_VIDEOS_PER_MIN_ESTIMATE = 6.0
DDIM_STEPS = 25


def _realized_params(shapes, seed=0):
    """Random-normal bf16 weights (zeros would flatter HBM compression)."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    rng = np.random.default_rng(seed)
    out = []
    for s in leaves:
        arr = rng.standard_normal(s.shape, dtype=np.float32) * 0.02
        dtype = jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype
        out.append(jnp.asarray(arr, dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def _time(fn, *args, iters):
    # timed() forces a strided VALUE fetch after the loop: through the axon
    # tunnel a failed remote execution (VMEM/HBM exhaustion inside a kernel)
    # does NOT raise from block_until_ready — it hands back zero-filled
    # buffers and a naive harness times pure dispatch, reporting a physically
    # impossible number (r3q unet_kvres "0.79 ms" on a 166 ms program).
    from camc2v_tpu.utils.tpubench import timed

    t, _ = timed(fn, *args, iters=iters)
    return t


def bench_unet(n_iters: int, inner_steps: int = 10):
    """Denoise-step time measured as a CHAINED loop inside ONE jit.

    The production sampler is a single lax.scan program, so per-dispatch host
    overhead (~40 ms through this environment's remote-TPU tunnel) does not
    exist there — timing isolated jit calls would overstate the step cost.
    """
    import jax
    import jax.numpy as jnp

    from camc2v_tpu.nn.unet3d import UNetModel
    from camc2v_tpu.presets import camcontexti2v_256
    from __graft_entry__ import _flagship_unet_inputs

    cfg = camcontexti2v_256()
    unet = UNetModel(cfg.unet, dtype=jnp.bfloat16)
    x, t, ctx, fs, camera = _flagship_unet_inputs(batch=2, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(lambda: unet.init(jax.random.key(0), x, t, ctx, fs, camera))
    params = _realized_params(shapes)

    # Everything is a jit ARGUMENT: closed-over arrays are inlined into the
    # serialized HLO as literals, and with CAMC2V_EPI_PRECOMP=1 the camera
    # payload carries ~1.1 GB of penalty tiles — the remote-compile tunnel
    # rejects the request with HTTP 413 (r3i unet_precomp failure).
    def looped_fn(p, x0, t, ctx, fs, camera):
        def body(_, xc):
            out = unet.apply(p, xc, t, ctx, fs, camera)  # (B, T, h, w, 4)
            return jnp.concatenate([out.astype(xc.dtype), xc[..., 4:]], axis=-1)

        return jax.lax.fori_loop(0, inner_steps, body, x0)

    looped = jax.jit(looped_fn)
    total_s = _time(looped, params, x, t, ctx, fs, camera, iters=n_iters)
    step_s = total_s / inner_steps

    flops = None
    import os

    if os.environ.get("CAMC2V_BENCH_SKIP_FLOPS", "0") == "1":
        return step_s, flops  # A/B queues: skip the second ~10-min remote compile
    try:
        one = jax.jit(lambda p, x, t, ctx, fs, camera: unet.apply(p, x, t, ctx, fs, camera))
        ca = one.lower(params, x, t, ctx, fs, camera).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = ca.get("flops")
    except Exception:
        pass
    return step_s, flops


def _e2e_setup(batch: int):
    """Build (model, realized params, batch dict) once — reused across the
    ddim-25 headline and the dpmpp-13 extra so the ~10-minute host
    realization + device transfer is paid once per process."""
    import jax
    import jax.numpy as jnp

    from camc2v_tpu.models.camcontexti2v import CamContextI2V
    from camc2v_tpu.presets import camcontexti2v_256

    cfg = camcontexti2v_256()
    model = CamContextI2V(cfg, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(lambda: model.init_params(jax.random.key(0), (256, 256)))
    params = _realized_params(shapes)

    b, T, IMG, n_ctx = batch, 16, 256, 2
    rng = np.random.default_rng(0)
    K = np.array([[IMG, 0, IMG / 2], [0, IMG, IMG / 2], [0, 0, 1]], np.float32)
    w2c = np.tile(np.eye(4, dtype=np.float32), (b, T, 1, 1))
    w2c[..., 0, 3] = np.linspace(0, 1, T)[None]
    w2c[..., 1, 3] = 0.05
    w2c_cond = np.tile(np.eye(4, dtype=np.float32), (b, n_ctx, 1, 1))
    w2c_cond[..., 0, 3] = -0.3
    batch = {
        "video": jnp.asarray(rng.uniform(-1, 1, (b, T, IMG, IMG, 3)), jnp.float32),
        "caption_tokens": jnp.zeros((b, 77), jnp.int32),
        "frame_stride": jnp.full((b,), 3, jnp.int32),
        "camera_intrinsics": jnp.broadcast_to(jnp.asarray(K), (b, T, 3, 3)),
        "RT": jnp.asarray(w2c),
        "cond_frames": jnp.asarray(rng.uniform(-1, 1, (b, n_ctx, IMG, IMG, 3)), jnp.float32),
        "RT_cond": jnp.asarray(w2c_cond),
    }
    return model, params, batch


def bench_e2e(n_iters: int, ddim_steps: int, batch: int = 1, sampler: str = "ddim",
              setup=None):
    """Full jitted model.sample at the production recipe."""
    import jax

    model, params, batch = setup if setup is not None else _e2e_setup(batch)
    fn = jax.jit(
        lambda p, batch, key: model.sample(
            p, batch, key,
            ddim_steps=ddim_steps, ddim_eta=1.0, guidance_scale=7.5,
            guidance_rescale=0.7, timestep_spacing="uniform_trailing",
            sampler=sampler,
        )
    )
    video_s = _time(fn, params, batch, jax.random.key(1), iters=n_iters)
    return video_s


def bench_tiny():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    import pathlib
    import sys

    sys.path.append(str(pathlib.Path(__file__).parent / "tests"))
    sys.path.append(str(pathlib.Path(__file__).parent / "tests" / "oracle"))
    import refload

    m = refload.my_model("camcontext")
    refload.patch_my_encoders(m)
    params = m.init_params(jax.random.key(0), (refload.IMG, refload.IMG))
    batch = refload.to_jax_batch(refload.make_batch(b=1, n_ctx=2))
    t0 = time.perf_counter()
    out = m.sample(params, batch, jax.random.key(1), ddim_steps=2, guidance_scale=7.5, decode=False)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def main():
    from camc2v_tpu.utils.tpubench import enable_compile_cache, maybe_wait_at_startup

    maybe_wait_at_startup()
    enable_compile_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="CPU smoke run (tiny config)")
    ap.add_argument("--unet-only", action="store_true", help="benchmark one UNet eval only")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--steps", type=int, default=DDIM_STEPS)
    ap.add_argument("--batch", type=int, default=1,
                    help="e2e generation batch; videos/min scales by batch")
    ap.add_argument("--sampler", default="ddim", choices=["ddim", "dpmpp_2m"],
                    help="non-headline extra: dpmpp_2m needs ~half the steps of ddim")
    args = ap.parse_args()

    if args.tiny:
        dt = bench_tiny()
        print(json.dumps({
            "metric": "tiny_cpu_sample_s", "value": round(dt, 2), "unit": "s",
            "vs_baseline": 1.0,
        }))
        return

    if args.unet_only:
        try:
            step_s, flops = bench_unet(args.iters)
        except Exception as e:  # noqa: BLE001
            from camc2v_tpu.utils.tpubench import retry_transient
            retry_transient(e)
        videos_per_min = 60.0 / (DDIM_STEPS * step_s)
        print(json.dumps({
            "metric": "unet_videos_per_min_per_chip_25step_ddim",
            "value": round(videos_per_min, 3),
            "unit": "videos/min/chip",
            "vs_baseline": round(videos_per_min / REFERENCE_VIDEOS_PER_MIN_ESTIMATE, 3),
            "unet_step_ms": round(step_s * 1000, 2),
            "unet_tflops": None if flops is None else round(flops / 1e12, 2),
        }))
        return

    # one params build + transfer; the headline (ddim, args.steps) compile is
    # the big one (~10 min fresh through the tunnel, seconds when the
    # persistent cache hits), the dpmpp-13 extra adds one cached-or-small
    # compile on the SAME resident params
    try:
        setup = _e2e_setup(args.batch)
        batch_s = bench_e2e(args.iters, args.steps, args.batch, args.sampler, setup=setup)
        dpmpp_s = None
        if (args.sampler == "ddim" and args.steps == DDIM_STEPS
                and os.environ.get("CAMC2V_BENCH_DPMPP13", "1") == "1"):
            # production-throughput extra: 13-step DPM++(2M) (solver-accuracy
            # evidence vs 25-step DDIM in BASELINE.md)
            try:
                dpmpp_s = bench_e2e(args.iters, 13, args.batch, "dpmpp_2m", setup=setup)
            except Exception as e:  # noqa: BLE001
                print(f"bench: dpmpp13 extra failed ({type(e).__name__}) — "
                      "headline unaffected", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        from camc2v_tpu.utils.tpubench import retry_transient
        retry_transient(e)
        raise  # unreachable (retry re-execs or re-raises); keeps flow explicit
    video_s = batch_s / args.batch
    videos_per_min = 60.0 / video_s
    out = {
        "metric": f"e2e_videos_per_min_per_chip_{args.steps}step_{args.sampler}",
        "value": round(videos_per_min, 3),
        "unit": "videos/min/chip",
        "vs_baseline": round(videos_per_min / REFERENCE_VIDEOS_PER_MIN_ESTIMATE, 3),
        "e2e_video_s": round(video_s, 3),
    }
    if dpmpp_s is not None:
        dv = dpmpp_s / args.batch
        out["dpmpp13_videos_per_min"] = round(60.0 / dv, 3)
        out["dpmpp13_video_s"] = round(dv, 3)
        out["dpmpp13_vs_baseline"] = round(60.0 / dv / REFERENCE_VIDEOS_PER_MIN_ESTIMATE, 3)
    if args.batch != 1:
        out["batch"] = args.batch
        out["e2e_batch_s"] = round(batch_s, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
