"""Dump the TPU-optimized HLO of the flagship fused-CFG UNet denoise step.

Compile-only (one remote-compile tunnel round, ~10 min; nothing executes), so
it can run during bench downtime. The text feeds tools/hlo_fusion_audit.py,
which attributes the profile's slow elementwise-fusion pool (the ~44 ms
"other fusions" group of docs/profiles/r3e_unet_top80.txt) to concrete op
chains offline — the evidence the round-3 ceiling analysis (PERF.md) needs to
say which fusions are relayout-bound vs genuinely HBM-floor.

Usage: python tools/dump_hlo.py [--out /tmp/unet_step.hlo.txt]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/unet_step.hlo.txt")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from camc2v_tpu.nn.unet3d import UNetModel
    from camc2v_tpu.presets import camcontexti2v_256
    from __graft_entry__ import _flagship_unet_inputs

    cfg = camcontexti2v_256()
    unet = UNetModel(cfg.unet, dtype=jnp.bfloat16)
    x, t, ctx, fs, camera = _flagship_unet_inputs(batch=2, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(lambda: unet.init(jax.random.key(0), x, t, ctx, fs, camera))
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype),
        shapes,
    )

    fn = jax.jit(lambda p, xc: unet.apply(p, xc, t, ctx, fs, camera))
    compiled = fn.lower(params, x).compile()
    text = compiled.as_text()
    pathlib.Path(args.out).write_text(text)
    print(f"wrote {len(text) / 1e6:.1f} MB of optimized HLO to {args.out}")


if __name__ == "__main__":
    main()
