"""Compile-only HBM accounting of the flagship programs (no execution).

The r3q epipolar-mode crashes return zero buffers with NO error through the
axon tunnel, so runtime evidence is mute; but XLA's compile-time memory
analysis is available without executing anything (and without risking a
crashed 15-minute slot). For HBM-exhaustion hypotheses (precomp = +~1.1 GB of
penalty arguments) this is definitive: argument + output + temp + generated
code sizes against the 15.75 GB v5e HBM.

Usage:
  [env modes] python tools/unet_mem_analysis.py [--program unet|e2e] [--batch N]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--program", default="unet", choices=["unet", "e2e"])
    ap.add_argument("--batch", type=int, default=None)
    args = ap.parse_args()

    from camc2v_tpu.utils.tpubench import enable_compile_cache, maybe_wait_at_startup

    maybe_wait_at_startup()
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    from camc2v_tpu.presets import camcontexti2v_256

    cfg = camcontexti2v_256()
    t0 = time.perf_counter()
    if args.program == "unet":
        from __graft_entry__ import _flagship_unet_inputs
        from camc2v_tpu.nn.unet3d import UNetModel

        unet = UNetModel(cfg.unet, dtype=jnp.bfloat16)
        b = args.batch or 2
        x, t, ctx, fs, camera = _flagship_unet_inputs(batch=b, dtype=jnp.bfloat16)
        shapes = jax.eval_shape(lambda: unet.init(jax.random.key(0), x, t, ctx, fs, camera))

        def looped_fn(p, x0, t, ctx, fs, camera):
            def body(_, xc):
                out = unet.apply(p, xc, t, ctx, fs, camera)
                return jnp.concatenate([out.astype(xc.dtype), xc[..., 4:]], axis=-1)

            return jax.lax.fori_loop(0, 10, body, x0)

        lowered = jax.jit(looped_fn).lower(shapes, x, t, ctx, fs, camera)
    else:
        from bench import bench_e2e  # noqa: F401  (keeps e2e assembly in one place)
        raise SystemExit("e2e program analysis not wired yet; use --program unet")

    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    fields = {}
    for name in ("argument_size_in_bytes", "output_size_in_bytes",
                 "temp_size_in_bytes", "alias_size_in_bytes",
                 "generated_code_size_in_bytes"):
        fields[name] = getattr(ma, name, None)
    total = sum(v for k, v in fields.items()
                if v and k in ("argument_size_in_bytes", "output_size_in_bytes",
                               "temp_size_in_bytes", "generated_code_size_in_bytes"))
    # jit args alias nothing here; aliased bytes would double-count
    if fields.get("alias_size_in_bytes"):
        total -= fields["alias_size_in_bytes"]
    import os

    print(json.dumps({
        "metric": "unet_memory_analysis",
        "program": args.program,
        "env": {k: v for k, v in os.environ.items() if k.startswith("CAMC2V_EPI")},
        "compile_s": round(time.perf_counter() - t0, 1),
        **{k: v for k, v in fields.items()},
        "total_gb": round(total / 2**30, 2) if total else None,
        "hbm_gb": 15.75,
    }), flush=True)


if __name__ == "__main__":
    main()
