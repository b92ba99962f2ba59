"""Flagship CamContextI2V TRAIN-step timing on the real chip (VERDICT r2 #3).

Runs the production make_sharded_train_step (ZeRO-1 layout on a 1-device
mesh, accum per the flagship YAML, trainable set = adaptor/image_proj/
zero_conv) at the 256x256x16f recipe and reports step wall time + peak HBM.

Everything TPU-benchmarked before round 3 was inference; this is the first
number for value_and_grad through the epipolar kernel's O(L*chunk) recompute
backward at flagship scale.

Usage: python tools/bench_trainstep.py [--batch 1] [--accum 4] [--steps 6]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def flagship_batch(b: int):
    import jax.numpy as jnp

    T, IMG, n_ctx = 16, 256, 2
    rng = np.random.default_rng(0)
    K = np.array([[IMG, 0, IMG / 2], [0, IMG, IMG / 2], [0, 0, 1]], np.float32)
    w2c = np.tile(np.eye(4, dtype=np.float32), (b, T, 1, 1))
    w2c[..., 0, 3] = np.linspace(0, 1, T)[None]
    w2c[..., 1, 3] = 0.05
    w2c_cond = np.tile(np.eye(4, dtype=np.float32), (b, n_ctx, 1, 1))
    w2c_cond[..., 0, 3] = -0.3
    return {
        "video": jnp.asarray(rng.uniform(-1, 1, (b, T, IMG, IMG, 3)), jnp.float32),
        "caption_tokens": jnp.zeros((b, 77), jnp.int32),
        "frame_stride": jnp.full((b,), 3, jnp.int32),
        "camera_intrinsics": jnp.broadcast_to(jnp.asarray(K), (b, T, 3, 3)),
        "RT": jnp.asarray(w2c),
        "cond_frames": jnp.asarray(rng.uniform(-1, 1, (b, n_ctx, IMG, IMG, 3)), jnp.float32),
        "RT_cond": jnp.asarray(w2c_cond),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--accum", type=int, default=4)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--fp32-frozen", action="store_true",
                    help="keep frozen params fp32 (default bf16, matching the "
                         "reference 16-mixed recipe; fp32 frozen cannot fit one chip)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from camc2v_tpu.models.camcontexti2v import CamContextI2V
    from camc2v_tpu.parallel import mesh as M
    from camc2v_tpu.parallel import trainer as TR
    from camc2v_tpu.presets import camcontexti2v_256

    cfg = camcontexti2v_256()
    model = CamContextI2V(cfg, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(lambda: model.init_params(jax.random.key(0), (256, 256)))

    tr_cfg = TR.TrainConfig(
        trainable_patterns=(r"^adaptor/", r"^image_proj/", r"^zero_conv/"),
        accumulate_grad_batches=args.accum,
        learning_rate=1e-4,
        frozen_param_dtype=None if args.fp32_frozen else "bfloat16",
    )

    # Realized random weights (zeros flatter HBM compression). Frozen leaves
    # are cast to bf16 ON HOST before device transfer: materialising all
    # 2852M params fp32 on the chip first (11.4 GB) and letting
    # init_train_state cast afterwards peaks at ~17 GB and OOMs the 16 GB
    # chip (r3i train_b1 failure — the error surfaced lazily at the next
    # d2h sync as RESOURCE_EXHAUSTED).
    rng = np.random.default_rng(0)
    labels = TR.param_labels(shapes, tr_cfg.trainable_patterns)
    frozen_dt = np.float32 if args.fp32_frozen else jnp.bfloat16

    def realize(lab, l):
        a = rng.standard_normal(l.shape, dtype=np.float32) * np.float32(0.02)
        if np.issubdtype(l.dtype, np.floating):
            dt = l.dtype if lab == "train" else frozen_dt
        else:
            dt = l.dtype
        return jnp.asarray(np.asarray(a, dt))

    params = jax.tree_util.tree_map(realize, labels, shapes)
    mesh = M.make_mesh(jax.devices()[:1])
    state = TR.init_train_state(tr_cfg, params)
    state = TR.shard_train_state(mesh, state)
    del params

    batch = M.shard_batch(mesh, flagship_batch(args.batch))
    step = TR.make_sharded_train_step(model, tr_cfg, mesh, state=state)

    dev = jax.local_devices()[0]
    t0 = time.perf_counter()
    state, metrics = step(state, batch, jax.random.key(1))
    jax.block_until_ready(metrics["loss"])
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s "
          f"loss={float(metrics['loss']):.4f}", flush=True)

    times = []
    for i in range(args.steps):
        t0 = time.perf_counter()
        state, metrics = step(state, batch, jax.random.key(2 + i))
        jax.block_until_ready(metrics["loss"])
        times.append(time.perf_counter() - t0)
    stats = dev.memory_stats() or {}
    peak = stats.get("peak_bytes_in_use", 0)
    out = {
        "metric": "flagship_train_step_ms",
        "batch": args.batch,
        "accum": args.accum,
        "frozen_dtype": "float32" if args.fp32_frozen else "bfloat16",
        "value": round(1e3 * float(np.median(times)), 1),
        "unit": "ms/step (wall, incl. ~40ms remote-tunnel dispatch)",
        "loss": round(float(metrics["loss"]), 4),
        "peak_hbm_gb": round(peak / 1e9, 2),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
