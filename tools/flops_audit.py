"""FLOPs audit of the flagship fused-CFG UNet eval: true MXU work vs XLA's claim.

VERDICT.md (round 2, weak #1) flagged a contradiction: XLA cost analysis
reports ~29 TFLOP for one fused-CFG UNet eval, which at a v5e's ~197 TFLOP/s
bf16 peak would put the 100%-MFU floor at ~147 ms — irreconcilable with the
measured profile (~50% conv MFU + 48 ms of low-utilization fusions) unless
the 29 TFLOP counts non-MXU work.

This tool settles it WITHOUT the TPU: it walks the jaxpr of the flagship
UNet apply and counts FLOPs analytically for the only primitives that run on
the MXU (conv_general_dilated, dot_general), buckets them by operator group,
and analytically accounts the Pallas kernels (epipolar attention, flash
attention, groupnorm) which XLA's cost model cannot see into (custom calls
count as 0) or — for the mask-material path — overcounts.

Usage: python tools/flops_audit.py [--batch 2]
"""

from __future__ import annotations

import argparse
import collections
import math
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def _conv_flops(eqn) -> int:
    """2 * batch * out_spatial * C_out * (C_in/groups) * prod(kernel_spatial)."""
    out = eqn.outvars[0].aval
    rhs = eqn.invars[1].aval
    dn = eqn.params["dimension_numbers"]
    fgc = eqn.params.get("feature_group_count", 1)
    out_spatial = math.prod(out.shape[i] for i in dn.out_spec[2:])
    batch = out.shape[dn.out_spec[0]]
    c_out = out.shape[dn.out_spec[1]]
    k_spatial = math.prod(rhs.shape[i] for i in dn.rhs_spec[2:])
    c_in_per_group = rhs.shape[dn.rhs_spec[1]]
    del fgc  # rhs input-feature dim is already per-group
    return 2 * batch * out_spatial * c_out * c_in_per_group * k_spatial


def _dot_flops(eqn) -> int:
    lhs, rhs = (v.aval for v in eqn.invars[:2])
    ((lc, rc), (lb, rb)) = eqn.params["dimension_numbers"]
    batch = math.prod(lhs.shape[i] for i in lb)
    contract = math.prod(lhs.shape[i] for i in lc)
    m = math.prod(lhs.shape[i] for i in range(lhs.ndim) if i not in set(lc) | set(lb))
    n = math.prod(rhs.shape[i] for i in range(rhs.ndim) if i not in set(rc) | set(rb))
    return 2 * batch * m * n * contract


def walk(jaxpr, scope, acc, pallas_acc):
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "conv_general_dilated":
            rhs = eqn.invars[1].aval
            sig = f"conv k={tuple(rhs.shape)} out={tuple(eqn.outvars[0].aval.shape)}"
            acc[("conv", sig)] += _conv_flops(eqn)
        elif prim == "dot_general":
            lhs, rhs = (v.aval for v in eqn.invars[:2])
            sig = f"dot {tuple(lhs.shape)}x{tuple(rhs.shape)}"
            acc[("dot", sig)] += _dot_flops(eqn)
        elif prim == "pallas_call":
            name = eqn.params.get("name", "?")
            shapes = tuple(tuple(v.aval.shape) for v in eqn.invars)
            pallas_acc.append((name, scope, shapes, tuple(tuple(v.aval.shape) for v in eqn.outvars)))
            continue  # kernel jaxpr is per-grid-step; account analytically below
        # recurse into sub-jaxprs (pjit, custom_vjp, scan, remat, ...)
        for sub in eqn.params.values():
            if isinstance(sub, jax.extend.core.ClosedJaxpr):
                walk(sub.jaxpr, scope, acc, pallas_acc)
            elif hasattr(sub, "eqns"):
                walk(sub, scope, acc, pallas_acc)
            elif isinstance(sub, (list, tuple)):
                for s in sub:
                    if isinstance(s, jax.extend.core.ClosedJaxpr):
                        walk(s.jaxpr, scope, acc, pallas_acc)


def epipolar_kernel_flops(batch, heads, L, d, n_reg, density=1.0):
    """Useful FLOPs of ONE plain-epipolar attention: qk + av matmuls + softmax
    (softmax/VPU work excluded — MXU accounting only)."""
    Lk = L + n_reg
    return 2 * batch * heads * L * Lk * d * 2 * density


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    args = ap.parse_args()

    from camc2v_tpu.nn.unet3d import UNetModel
    from camc2v_tpu.presets import camcontexti2v_256
    from __graft_entry__ import _flagship_unet_inputs

    cfg = camcontexti2v_256()
    unet = UNetModel(cfg.unet, dtype=jnp.bfloat16)
    x, t, ctx, fs, camera = _flagship_unet_inputs(batch=args.batch, dtype=jnp.bfloat16)
    params = jax.eval_shape(lambda: unet.init(jax.random.key(0), x, t, ctx, fs, camera))

    jaxpr = jax.make_jaxpr(lambda p, x, t: unet.apply(p, x, t, ctx, fs, camera))(params, x, t)
    acc = collections.Counter()
    pallas = []
    walk(jaxpr.jaxpr, "unet", acc, pallas)

    conv_f = sum(v for (k, _), v in acc.items() if k == "conv")
    dot_f = sum(v for (k, _), v in acc.items() if k == "dot")

    print(f"== analytic MXU FLOPs, batch={args.batch} fused-CFG UNet eval ==")
    print(f"conv_general_dilated : {conv_f / 1e12:8.3f} TFLOP")
    print(f"dot_general          : {dot_f / 1e12:8.3f} TFLOP")
    print(f"XLA-visible MXU total: {(conv_f + dot_f) / 1e12:8.3f} TFLOP")

    print("\n== pallas_call sites (XLA cost model sees 0 FLOPs for these) ==")
    agg = collections.Counter()
    for name, scope, ins, outs in pallas:
        agg[name] += 1
    for name, n in agg.items():
        print(f"  x{n:<3d} {name}")

    # analytic epipolar accounting at the flagship shape:
    # levels ds8 (h=w=32 -> hw=1024, L=T*hw) etc. per EPIPOLAR_256 config
    from camc2v_tpu.presets import EPIPOLAR_256

    T = 16
    n_reg = EPIPOLAR_256.num_register_tokens
    epi_total = 0
    print("\n== analytic epipolar attention FLOPs (dense; density<1 would scale) ==")
    # per the r3 TPU trace: heads=5 (320/64), d=64, 5 sites per level, register
    # tokens pad Lk to a BLOCK_K multiple (ds8: 16384 -> 17408)
    for ds, sites in ((8, 5), (16, 5), (32, 5)):
        h = 256 // ds
        L = T * h * h
        heads, d = 5, 64
        lk_padded = -(-(L + T * n_reg) // 1024) * 1024
        f = 2 * args.batch * heads * L * lk_padded * d * 2 * sites
        epi_total += f
        print(f"  ds{ds:<3d} L={L:<6d} x{sites}: {f / 1e12:7.3f} TFLOP")
    print(f"  epipolar total     : {epi_total / 1e12:7.3f} TFLOP")

    grand = conv_f + dot_f + epi_total
    peak = 197e12
    print(f"\n== roofline (v5e bf16 peak ~{peak / 1e12:.0f} TFLOP/s) ==")
    print(f"true MXU work        : {grand / 1e12:8.3f} TFLOP")
    print(f"100%-MFU floor       : {grand / peak * 1e3:8.2f} ms")
    for mfu in (0.5, 0.6, 0.7):
        print(f"{int(mfu * 100)}%-MFU step        : {grand / (peak * mfu) * 1e3:8.2f} ms")

    print("\n-- MXU FLOPs by signature (top 30) --")
    for (kind, sig), v in sorted(acc.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {v / 1e12:8.3f} TFLOP  {sig}")


if __name__ == "__main__":
    main()
