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

    from camc2v_tpu.utils.tpubench import enable_compile_cache, maybe_wait_at_startup, retry_transient

    maybe_wait_at_startup()
    enable_compile_cache()
    try:
        _run(args)
    except Exception as e:  # noqa: BLE001
        retry_transient(e)  # re-execs on transient tunnel failures, else re-raises


def _run(args):
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
    # AOT compile so the static HBM accounting (argument+temp+output) is
    # available even where dev.memory_stats() is not (the axon tunnel returns
    # none — round-3 runs reported peak_hbm_gb: 0.0 placeholders)
    t0 = time.perf_counter()
    compiled = step.lower(state, batch, jax.random.key(1)).compile()
    ma = compiled.memory_analysis()
    hbm = {}
    for name in ("argument_size_in_bytes", "output_size_in_bytes",
                 "temp_size_in_bytes", "alias_size_in_bytes"):
        hbm[name] = getattr(ma, name, None)
    print(f"compiled in {time.perf_counter() - t0:.1f}s; memory_analysis: {hbm}",
          flush=True)
    t0 = time.perf_counter()
    state, metrics = compiled(state, batch, jax.random.key(1))
    first_loss = float(metrics["loss"])  # host read = the only real sync through the tunnel
    print(f"first step: {time.perf_counter() - t0:.1f}s loss={first_loss:.4f}", flush=True)

    times = []
    losses = []
    for i in range(args.steps):
        t0 = time.perf_counter()
        state, metrics = compiled(state, batch, jax.random.key(2 + i))
        losses.append(float(metrics["loss"]))  # fetch-synchronized timing
        times.append(time.perf_counter() - t0)
    # a crashed axon remote execution hands back zero buffers without raising
    # (bench.py grew this guard in r3q; ADVICE r3 flagged its absence here) —
    # a real l2_log loss over random weights/latents cannot be exactly 0
    if losses and all(l == 0.0 for l in losses):
        raise RuntimeError("train loss is exactly 0.0 every step: remote "
                           "execution crashed (zero-filled buffers)")
    if not all(np.isfinite(l) for l in losses):
        raise RuntimeError(f"non-finite train loss: {losses}")
    stats = dev.memory_stats() or {}
    peak = stats.get("peak_bytes_in_use", 0)
    # static accounting fallback: arguments are donated (aliased into
    # outputs), so live HBM ≈ args + temps
    static_gb = None
    if hbm.get("argument_size_in_bytes") and hbm.get("temp_size_in_bytes"):
        static_gb = round((hbm["argument_size_in_bytes"] + hbm["temp_size_in_bytes"]) / 2**30, 2)
    out = {
        "metric": "flagship_train_step_ms",
        "batch": args.batch,
        "accum": args.accum,
        "frozen_dtype": "float32" if args.fp32_frozen else "bfloat16",
        "value": round(1e3 * float(np.median(times)), 1),
        "unit": "ms/step (wall, incl. ~40ms remote-tunnel dispatch)",
        "loss": round(losses[-1], 4),
        "loss_first": round(losses[0], 4),
        "steps": args.steps,
        "peak_hbm_gb": round(peak / 1e9, 2),
        "static_hbm_gb": static_gb,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
