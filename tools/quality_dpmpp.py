"""Sampler-quality evidence: DPM-Solver++(2M) at 13 steps vs DDIM at 25.

The >=20 videos/min/chip path runs dpmpp_2m with ~half the UNet evals of the
25-step DDIM recipe (VERDICT r3 'do this' #3). Real FVD gating needs the
released weights (PARITY.md known gaps); what CAN be measured without them is
solver accuracy: how close each (sampler, steps) trajectory lands to a
fine-grained reference trajectory of the SAME model. We use the tiny oracle
CamContextI2V (randomized weights, deterministic dummy encoders — the same
model the reference-parity gate runs) and a 100-step eta=0 DDIM reference.

Claim to verify: err(dpmpp_2m@13) <= err(ddim@25) — i.e. 13-step dpmpp is at
least as faithful to the model's probability-flow trajectory as the
reference's own 25-step DDIM recipe, so switching samplers is a speedup, not
a quality trade.

Usage: python tools/quality_dpmpp.py [--steps-ref 100]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))
sys.path.insert(0, str(ROOT / "tests" / "oracle"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps-ref", type=int, default=100)
    ap.add_argument("--configs", default="ddim:25,dpmpp_2m:13,dpmpp_2m:10,ddim:13")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import refload

    m = refload.my_model("camcontext")
    refload.patch_my_encoders(m)
    params = m.init_params(jax.random.key(0), (refload.IMG, refload.IMG))
    # randomize so zero-init branches (camera, adaptor) participate
    from util import perturb_zero_kernels

    params = perturb_zero_kernels(params, jax.random.key(7))
    batch = refload.to_jax_batch(refload.make_batch(b=1, n_ctx=2))

    def run(sampler, steps):
        return np.asarray(m.sample(
            params, batch, jax.random.key(1),
            ddim_steps=steps, ddim_eta=0.0, guidance_scale=7.5,
            guidance_rescale=0.7, timestep_spacing="uniform_trailing",
            sampler=sampler, decode=False,
        ))

    ref = run("ddim", args.steps_ref)
    scale = float(np.abs(ref).mean())
    out = {"reference": f"ddim@{args.steps_ref} (eta=0)", "latent_abs_mean": round(scale, 4)}
    for spec in args.configs.split(","):
        sampler, s = spec.split(":")
        x = run(sampler, int(s))
        err = float(np.abs(x - ref).mean()) / scale
        out[f"relerr_{sampler}@{s}"] = round(err, 4)
        print(f"{sampler}@{s}: mean|err|/scale = {err:.4f}", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
