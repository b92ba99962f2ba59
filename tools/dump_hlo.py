"""Dump the TPU-optimized HLO of the flagship fused-CFG UNet denoise step.

Compile-only (one remote-compile tunnel round, ~10 min; nothing executes), so
it can run during bench downtime. The text feeds tools/hlo_fusion_audit.py,
which attributes the profile's slow elementwise-fusion pool (the ~44 ms
"other fusions" group of docs/profiles/r3e_unet_top80.txt) to concrete op
chains offline — the evidence the round-3 ceiling analysis (PERF.md) needs to
say which fusions are relayout-bound vs genuinely HBM-floor.

Usage: python tools/dump_hlo.py [--out /tmp/unet_step.hlo.txt]
       python tools/dump_hlo.py --what vae_decode --out /tmp/vae_dec.hlo.txt
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def _zeros_like_shapes(shapes):
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype),
        shapes,
    )


def _unet_program():
    import jax
    import jax.numpy as jnp

    from camc2v_tpu.nn.unet3d import UNetModel
    from camc2v_tpu.presets import camcontexti2v_256
    from __graft_entry__ import _flagship_unet_inputs

    cfg = camcontexti2v_256()
    unet = UNetModel(cfg.unet, dtype=jnp.bfloat16)
    x, t, ctx, fs, camera = _flagship_unet_inputs(batch=2, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(lambda: unet.init(jax.random.key(0), x, t, ctx, fs, camera))
    params = _zeros_like_shapes(shapes)
    fn = jax.jit(lambda p, xc: unet.apply(p, xc, t, ctx, fs, camera))
    return fn, (params, x)


def _vae_program(what: str):
    import jax
    import jax.numpy as jnp

    from camc2v_tpu.nn.vae import AutoencoderKL
    from camc2v_tpu.presets import camcontexti2v_256

    cfg = camcontexti2v_256().vae
    vae = AutoencoderKL(cfg, dtype=jnp.bfloat16)
    frames = jnp.zeros((16, 256, 256, 3), jnp.float32)
    shapes = jax.eval_shape(lambda: vae.init(jax.random.key(0), frames[:1]))
    params = _zeros_like_shapes(shapes)["params"]
    if what == "vae_decode":
        z = jnp.zeros((16, 32, 32, cfg.z_channels), jnp.float32)
        fn = jax.jit(lambda p, z_: vae.apply({"params": p}, z_, method=vae.decode))
        return fn, (params, z)
    fn = jax.jit(lambda p, f: vae.apply({"params": p}, f, method=vae.encode))
    return fn, (params, frames)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/unet_step.hlo.txt")
    ap.add_argument("--what", default="unet",
                    choices=["unet", "vae_decode", "vae_encode"])
    args = ap.parse_args()

    fn, fa = _unet_program() if args.what == "unet" else _vae_program(args.what)
    compiled = fn.lower(*fa).compile()
    text = compiled.as_text()
    pathlib.Path(args.out).write_text(text)
    print(f"wrote {len(text) / 1e6:.1f} MB of optimized HLO to {args.out}")


if __name__ == "__main__":
    main()
