"""xplane trace of one flagship TRAIN step (fwd+bwd+accum) on the chip.

The b=1 fwd is ~83 ms but one fwd+bwd call is ~580 ms (BASELINE.md train
table) — a ~6x backward multiple where 2-3x is typical. Suspects: the UNet
block remat (recomputes every block forward in the bwd), the epipolar
custom-VJP's chunked XLA recompute (materialised masks + f32 einsums), and
the optimizer/EMA update sweep. This trace attributes it.

Usage: python tools/tpu_profile_train.py [--logdir /tmp/train_profile]
Parse: python tools/xplane_groups.py <logdir> --iters 1
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
    ap.add_argument("--logdir", default="/tmp/train_profile")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--accum", type=int, default=4)
    args = ap.parse_args()

    from camc2v_tpu.utils.tpubench import enable_compile_cache, maybe_wait_at_startup

    maybe_wait_at_startup()
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from camc2v_tpu.models.camcontexti2v import CamContextI2V
    from camc2v_tpu.parallel import mesh as M
    from camc2v_tpu.parallel import trainer as TR
    from camc2v_tpu.presets import camcontexti2v_256

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    from bench_trainstep import flagship_batch  # noqa: E402

    cfg = camcontexti2v_256()
    model = CamContextI2V(cfg, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(lambda: model.init_params(jax.random.key(0), (256, 256)))
    tr_cfg = TR.TrainConfig(
        trainable_patterns=(r"^adaptor/", r"^image_proj/", r"^zero_conv/"),
        accumulate_grad_batches=args.accum,
        learning_rate=1e-4,
        frozen_param_dtype="bfloat16",
    )
    rng = np.random.default_rng(0)
    labels = TR.param_labels(shapes, tr_cfg.trainable_patterns)

    def realize(lab, l):
        a = rng.standard_normal(l.shape, dtype=np.float32) * np.float32(0.02)
        dt = (l.dtype if lab == "train" else jnp.bfloat16) if np.issubdtype(l.dtype, np.floating) else l.dtype
        return jnp.asarray(np.asarray(a, dt))

    params = jax.tree_util.tree_map(realize, labels, shapes)
    mesh = M.make_mesh(jax.devices()[:1])
    state = TR.shard_train_state(mesh, TR.init_train_state(tr_cfg, params))
    del params
    batch = M.shard_batch(mesh, flagship_batch(args.batch))
    step = TR.make_sharded_train_step(model, tr_cfg, mesh, state=state)

    t0 = time.perf_counter()
    compiled = step.lower(state, batch, jax.random.key(1)).compile()
    print(f"compiled in {time.perf_counter() - t0:.1f}s", flush=True)
    state, metrics = compiled(state, batch, jax.random.key(1))
    print(f"warm loss={float(metrics['loss']):.4f}", flush=True)

    with jax.profiler.trace(args.logdir):
        state, metrics = compiled(state, batch, jax.random.key(2))
        loss = float(metrics["loss"])  # fetch-sync INSIDE the capture
    print(f"traced one train call: loss={loss:.4f} -> {args.logdir}", flush=True)


if __name__ == "__main__":
    main()
