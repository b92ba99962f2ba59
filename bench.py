"""Benchmark: flagship UNet denoise throughput on one TPU chip.

Measures the hot path of the 25-step DDIM generation loop — one
camera-conditioned CamContextI2V UNet evaluation at the production recipe
(256x256 video, 16 frames, 32x32x4 latents, fused CFG batch of 2, epipolar
masks at ds {8,16,32,64}, Plücker feature pyramid) in bfloat16 — and reports
videos/min/chip at 25 DDIM steps.

vs_baseline: the reference (PyTorch + xformers, samplers/ddim.py 25-step loop,
2 UNet evals/step) has NO published throughput (BASELINE.json published: {}).
We use an ESTIMATED reference rate of 6.0 videos/min on one A100-80GB
(~200 ms/UNet-eval fused-equivalent, typical for a 1.4B-param 16-frame
DynamiCrafter UNet at 256px) as the provisional denominator until a measured
number exists. The north-star is 5x this estimate.

Usage: python bench.py [--tiny] [--steps N]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

REFERENCE_VIDEOS_PER_MIN_ESTIMATE = 6.0
DDIM_STEPS = 25


def bench_flagship(n_iters: int = 10, tiny: bool = False):
    import jax
    import jax.numpy as jnp

    if tiny:
        jax.config.update("jax_platforms", "cpu")

    from camc2v_tpu.nn.unet3d import UNetModel
    from __graft_entry__ import _flagship_unet_inputs

    if tiny:
        from camc2v_tpu.nn.epipolar import EpipolarConfig
        from camc2v_tpu.nn.unet3d import UNetConfig

        epi = EpipolarConfig(origin_h=64, origin_w=64, attention_resolution=(2, 1))
        cfg = UNetConfig(
            in_channels=8, out_channels=4, model_channels=32, num_res_blocks=1,
            attention_resolutions=(2, 1), channel_mult=(1, 2), num_head_channels=8,
            context_dim=16, temporal_length=4, text_context_len=7, img_tokens_per_frame=2,
            image_cross_attention=True, use_camera=True, epipolar=epi,
            add_type="add_to_main_branch",
        )
        unet = UNetModel(cfg, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 4, 8, 8, 8)), jnp.float32)
        t = jnp.full((2,), 500, jnp.int32)
        ctx = jnp.asarray(rng.normal(size=(2, 7 + 4 * 2, 16)), jnp.float32)
        fs = jnp.full((2,), 3, jnp.int32)
        masks = {8: jnp.ones((2, 4 * 64, 4 * 64), bool), 16: jnp.ones((2, 4 * 16, 4 * 16), bool)}
        plucker = (jnp.zeros((2, 4, 8, 8, 32)), jnp.zeros((2, 4, 4, 4, 64)))
        camera = {"plucker": plucker, "masks": masks, "cond_frame_index": jnp.zeros((2,), jnp.int32)}
        params = unet.init(jax.random.key(0), x, t, ctx, fs, camera)
    else:
        from camc2v_tpu.presets import camcontexti2v_256

        cfg = camcontexti2v_256()
        unet = UNetModel(cfg.unet, dtype=jnp.bfloat16)
        x, t, ctx, fs, camera = _flagship_unet_inputs(batch=2, dtype=jnp.bfloat16)
        params = jax.eval_shape(lambda: unet.init(jax.random.key(0), x, t, ctx, fs, camera))
        # zeros are fine for throughput; casting params to bf16 halves HBM traffic
        params = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype),
            params,
        )

    fwd = jax.jit(lambda p, x, t: unet.apply(p, x, t, ctx, fs, camera))
    out = fwd(params, x, t)
    out.block_until_ready()  # compile + warmup

    times = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        fwd(params, x, t).block_until_ready()
        times.append(time.perf_counter() - t0)
    step_ms = float(np.median(times) * 1000)
    videos_per_min = 60.0 / (DDIM_STEPS * np.median(times))
    return step_ms, videos_per_min


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="CPU smoke run on a tiny UNet")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    step_ms, videos_per_min = bench_flagship(args.iters, tiny=args.tiny)
    result = {
        "metric": "videos_per_min_per_chip_25step_ddim" + ("_tiny" if args.tiny else ""),
        "value": round(videos_per_min, 3),
        "unit": "videos/min/chip",
        "vs_baseline": round(videos_per_min / REFERENCE_VIDEOS_PER_MIN_ESTIMATE, 3),
        "unet_step_ms": round(step_ms, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
