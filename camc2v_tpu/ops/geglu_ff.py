"""Fused LayerNorm + GEGLU feed-forward Pallas kernel.

The transformer FF (reference lvdm/modules/attention.py:431-458:
``x + fc2(a * gelu(g)) where [a, g] = proj(LN(x))``) materialises a
(rows, 8C) hidden tensor in HBM on the XLA path — at the flagship ds1 level
that is a 168 MB bf16 intermediate written and re-read every block, plus
separate LN-stat and gelu fusions. This kernel keeps the hidden layer
entirely in VMEM: per 128-row tile it computes the f32 LayerNorm, the GEGLU
projection, the exact-erf gelu gate, the down-projection and the residual
add in one pass — HBM traffic is one read + one write of (rows, C).

Weights (C,2I)+(I,C) ride in VMEM across grid steps; eligibility is bounded
by `_MAX_WEIGHT_BYTES` (the C=320/512 levels fit; C>=640 levels carry ~4x
less row traffic and stay on XLA).

Numerics: LN stats in f32 (matching nn/layers.py::LayerNormF32), matmuls
bf16->f32 accumulation, gelu exact erf in f32 (torch F.gelu parity — see
GEGLU in nn/attention.py), residual added in f32 before the final cast.

Backward: recompute-based custom VJP through the XLA reference
implementation (same pattern as ops/epipolar_flash.py).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_ROWS = 256
# Resident-weight budget: the default admits the C=320 FF sites; C=640 needs
# 9.8 MB and C=1280 39.3 MB — raise via CAMC2V_FF_MAX_WEIGHT_MB to A/B
# routing them through the kernel (the Mosaic vmem limit scales with it).
_DEFAULT_MAX_WEIGHT_MB = 8.0


def _max_weight_bytes() -> int:
    import os

    return int(float(os.environ.get(
        "CAMC2V_FF_MAX_WEIGHT_MB", str(_DEFAULT_MAX_WEIGHT_MB))) * 1024 * 1024)

_USE_FUSED: Optional[bool] = None


def use_fused(enabled: Optional[bool] = True) -> None:
    global _USE_FUSED
    _USE_FUSED = enabled


def fused_enabled() -> bool:
    if _USE_FUSED is not None:
        return _USE_FUSED
    import os

    if os.environ.get("CAMC2V_DISABLE_FUSED_FF"):
        return False
    return jax.default_backend() != "cpu"


def supported(rows: int, c_in: int, inner: int, c_out: int) -> bool:
    """Static eligibility for (rows, C) -> GEGLU(inner) -> (rows, C_out)."""
    if min(c_in, c_out) < 128 or c_in % 8 or c_out % 8:
        return False
    if inner % 128 != 0:  # lane-split boundary of the (rows, 2I) projection
        return False
    if rows % _BLOCK_ROWS != 0 and rows % 128 != 0:
        return False
    if (c_in * 2 * inner + inner * c_out) * 2 > _max_weight_bytes():
        return False
    return True


def _erf_poly(x):
    """erf via Abramowitz–Stegun 7.1.26 (max abs err 1.5e-7 — far below bf16
    resolution). Mosaic has no erf primitive (probed on a v5e: NotImplemented);
    only exp is needed here. Sign handled arithmetically (no i1 selects)."""
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    p = 0.3275911
    ax = jnp.abs(x)
    s = x * jax.lax.rsqrt(x * x + jnp.float32(1e-12))  # smooth sign(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _kernel(x_ref, ls_ref, lb_ref, wp_ref, bp_ref, wf_ref, bf_ref, o_ref, *,
            inner: int, eps: float):
    x = x_ref[...]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * ls_ref[0].astype(jnp.float32) + lb_ref[0].astype(jnp.float32)
    xb = xn.astype(jnp.bfloat16)

    h = jax.lax.dot(xb, wp_ref[...], preferred_element_type=jnp.float32)
    h = h + bp_ref[0].astype(jnp.float32)
    a = h[:, :inner]
    g = h[:, inner:]
    # exact-erf gelu (torch F.gelu default; see GEGLU in nn/attention.py)
    gelu = g * 0.5 * (1.0 + _erf_poly(g * jnp.float32(1.0 / math.sqrt(2.0))))
    hidden = (a * gelu).astype(jnp.bfloat16)

    y = jax.lax.dot(hidden, wf_ref[...], preferred_element_type=jnp.float32)
    y = y + bf_ref[0].astype(jnp.float32) + xf
    o_ref[...] = y.astype(o_ref.dtype)


def _ff_xla(x, ls, lb, wp, bp, wf, bf, *, inner: int, eps: float):
    """Reference XLA implementation for CPU fallback + VJP recompute."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps) * ls + lb
    xb = xn.astype(jnp.bfloat16)
    h = jnp.dot(xb, wp.astype(jnp.bfloat16), preferred_element_type=jnp.float32) + bp
    a, g = h[:, :inner], h[:, inner:]
    gelu = g * 0.5 * (1.0 + jax.lax.erf(g / jnp.float32(math.sqrt(2.0))))
    hidden = (a * gelu).astype(jnp.bfloat16)
    y = jnp.dot(hidden, wf.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    return (y + bf + xf).astype(x.dtype)


def _fwd_impl(x, ls, lb, wp, bp, wf, bf, *, inner, eps):
    rows, c_in = x.shape
    c_out = wf.shape[1]
    br = _BLOCK_ROWS if rows % _BLOCK_ROWS == 0 else 128
    interpret = jax.default_backend() == "cpu"
    kern = functools.partial(_kernel, inner=inner, eps=eps)
    # big-C sites push double-buffered resident weights past Mosaic's 16 MB
    # default — scale the limit with the actual footprint
    weight_bytes = (wp.size + wf.size) * 2
    vmem_limit = 2 * weight_bytes + 12 * 1024 * 1024
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=vmem_limit if vmem_limit > 16 * 1024 * 1024 else None,
    )
    return pl.pallas_call(
        kern,
        grid=(rows // br,),
        in_specs=[
            pl.BlockSpec((br, c_in), lambda i: (i, 0)),
            pl.BlockSpec((1, c_in), lambda i: (0, 0)),
            pl.BlockSpec((1, c_in), lambda i: (0, 0)),
            pl.BlockSpec((c_in, 2 * inner), lambda i: (0, 0)),
            pl.BlockSpec((1, 2 * inner), lambda i: (0, 0)),
            pl.BlockSpec((inner, c_out), lambda i: (0, 0)),
            pl.BlockSpec((1, c_out), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((br, c_out), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, c_out), x.dtype),
        compiler_params=compiler_params,
        interpret=interpret,
    )(x, ls.reshape(1, -1), lb.reshape(1, -1), wp, bp.reshape(1, -1), wf, bf.reshape(1, -1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _fused(x, ls, lb, wp, bp, wf, bf, static):
    return _fwd_impl(x, ls, lb, wp, bp, wf, bf, **dict(static))


def _fused_fwd(x, ls, lb, wp, bp, wf, bf, static):
    return _fused(x, ls, lb, wp, bp, wf, bf, static), (x, ls, lb, wp, bp, wf, bf)


def _fused_bwd(static, res, gout):
    x, ls, lb, wp, bp, wf, bf = res
    f = functools.partial(_ff_xla, **dict(static))
    _, vjp = jax.vjp(f, x, ls, lb, wp, bp, wf, bf)
    return vjp(gout)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_ln_geglu_ff(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    wp: jax.Array,
    bp: jax.Array,
    wf: jax.Array,
    bf: jax.Array,
    *,
    eps: float = 1e-5,
) -> jax.Array:
    """x + fc2(a * gelu_erf(g)) where [a, g] = LN(x) @ wp + bp.

    Args:
      x: (..., L, C) residual-stream input (raw, pre-LayerNorm).
      ln_scale/ln_bias: (C,) LayerNorm affine params.
      wp: (C, 2*inner) GEGLU projection kernel; bp: (2*inner,).
      wf: (inner, C_out) down-projection kernel; bf: (C_out,).
    """
    inner = wf.shape[0]
    orig_shape = x.shape
    c_in = orig_shape[-1]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, c_in)
    static = tuple(sorted(dict(inner=inner, eps=float(eps)).items()))
    out = _fused(x2, ln_scale, ln_bias, wp.astype(jnp.bfloat16), bp,
                 wf.astype(jnp.bfloat16), bf, static)
    return out.reshape(*orig_shape[:-1], wf.shape[1])
