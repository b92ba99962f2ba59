"""Fused short-sequence (temporal) multi-head attention Pallas kernel.

The UNet's temporal transformers attend over T=16 tokens per pixel stream
((B*h*w, T, C) tensors — reference lvdm/modules/attention.py:323-428). The
FLOPs are negligible (<2% of a step) but the XLA lowering materialises
head-split relayout copies (bf16[2048,16,5,64] transposes), tiny (16,16)
softmax fusions and separate projection dispatches — ~14-18 ms of a 180 ms
flagship step.

This kernel runs the whole chain
    q,k,v = x @ Wq|Wk|Wv   (per-head slices of the fused projections)
    attn   = softmax(q k^T / sqrt(d)) v        (per 16-token sequence)
    out    = attn @ Wo + bo
in ONE pass: PACK = 128//T sequences are packed into each 128-row tile, the
per-head (128,128) score matrix is computed on the MXU and masked to
block-diagonal form with an additive penalty (a (128,T) layout would occupy
the same number of vregs — full-width lanes are free), and the per-head
outputs are assembled in a VMEM scratch before the fused out-projection.
Weights ride in VMEM across grid steps ((H, C, D) layout so per-head slices
are leading-dim indexing, never lane slicing).

Numerics match ops/attention.py::_xla_attention exactly: bf16 matmul inputs,
f32 accumulation and softmax, output cast back to the input dtype.

Backward: recompute-based custom VJP through the XLA reference implementation
(same pattern as ops/epipolar_flash.py) — weights receive real gradients.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per packed tile; PACK = _TILE_ROWS // T sequences share one score matrix
_TILE_ROWS = 128
# row-groups processed per grid step (fewer grid steps, same VPU work)
_GROUPS = 2
# VMEM budget for resident weights + working tiles, split by direction
# (round-5 A/Bs, fetch-synced flagship medians):
#   * INFERENCE 14 MB — also admits the C=1280 (ds32/ds64, heads=20) sites,
#     whose ~13.1 MB of resident weights the old 8 MB budget rejected:
#     fused-CFG unet-only step 152.1 vs ~155.5 ms (r5d c2).
#   * TRAINING 8 MB — the same C=1280 sites measured +15.7 ms/step in the
#     train backward (519.2 vs 503.5 same-session; the kernel's custom VJP
#     loses to XLA's backward at that width), so training keeps them on the
#     XLA path.
# A/B via CAMC2V_TEMPORAL_MAX_WEIGHT_MB / _TRAIN (the Mosaic vmem limit
# scales automatically).
_DEFAULT_MAX_WEIGHT_MB = 14.0
_DEFAULT_MAX_WEIGHT_MB_TRAIN = 8.0


def _max_weight_bytes(training: bool = False) -> int:
    import os

    if training:
        v = os.environ.get(
            "CAMC2V_TEMPORAL_MAX_WEIGHT_MB_TRAIN", str(_DEFAULT_MAX_WEIGHT_MB_TRAIN))
    else:
        v = os.environ.get(
            "CAMC2V_TEMPORAL_MAX_WEIGHT_MB", str(_DEFAULT_MAX_WEIGHT_MB))
    return int(float(v) * 1024 * 1024)


_USE_FUSED: Optional[bool] = None


def use_fused(enabled: Optional[bool] = True) -> None:
    """Force (True/False) or restore auto (None) fused-kernel dispatch."""
    global _USE_FUSED
    _USE_FUSED = enabled


def fused_enabled() -> bool:
    if _USE_FUSED is not None:
        return _USE_FUSED
    import os

    if os.environ.get("CAMC2V_DISABLE_FUSED_TEMPORAL"):
        return False
    return jax.default_backend() != "cpu"


def supported(n: int, t: int, c_in: int, c_out: int, heads: int, dim_head: int,
              training: bool = False) -> bool:
    """Static eligibility of the fused kernel for an (N, T, C) problem.

    `training` selects the train-side weight budget (the kernel's custom VJP
    loses to XLA at C=1280, so training keeps a tighter admission)."""
    inner = heads * dim_head
    if t < 2 or t > _TILE_ROWS or _TILE_ROWS % t != 0:
        return False
    if dim_head % 8 != 0 or dim_head > 128:
        return False
    if min(c_in, c_out, inner) < 128 or c_in % 8 or c_out % 8 or inner % 8:
        return False
    pack = _TILE_ROWS // t
    if n % pack != 0:
        return False
    # resident weights: 3x (H, C_in, D) + (C_inner, C_out) in bf16
    if (3 * heads * c_in * dim_head + inner * c_out) * 2 > _max_weight_bytes(training):
        return False
    return True


def _choose_bn(n: int, t: int) -> int:
    """Sequences per grid step: prefer _GROUPS full 128-row tiles."""
    pack = _TILE_ROWS // t
    bn = _GROUPS * pack
    if n % bn == 0:
        return bn
    return pack


def _kernel(x_ref, wqkv_ref, wo_ref, bo_ref, *rest, t: int,
            heads: int, dim_head: int, scale: float, groups: int,
            has_ln: bool, residual: bool, eps: float):
    if has_ln:
        ls_ref, lb_ref, o_ref, acc_ref = rest
    else:
        o_ref, acc_ref = rest
    bn = x_ref.shape[0]
    c = x_ref.shape[2]
    inner = heads * dim_head
    rows = bn * t
    tile = rows // groups  # 128 (or the whole block when n is small)

    x_raw = x_ref[...].reshape(rows, c)  # (rows, C_in)
    xf = None
    if has_ln:
        xf = x_raw.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        xn = (xf - mean) * jax.lax.rsqrt(var + eps)
        xn = xn * ls_ref[0].astype(jnp.float32) + lb_ref[0].astype(jnp.float32)
        x = xn.astype(jnp.bfloat16)
    elif x_raw.dtype != jnp.bfloat16:
        x = x_raw.astype(jnp.bfloat16)
    else:
        x = x_raw

    # additive block-diagonal penalty: row i attends row j iff i//t == j//t
    ri = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
    cross = jnp.minimum(jnp.abs(ri // t - ci // t), 1).astype(jnp.float32)
    penalty = cross * jnp.float32(-1e30)

    d = dim_head
    for g in range(groups):
        xg = x[g * tile:(g + 1) * tile]  # (tile, C)
        # one merged projection dot per row group (per-head dots are MXU
        # latency chains — measured 11.5us/step on a v5e with 30 small dots)
        qkv = jax.lax.dot(xg, wqkv_ref[...], preferred_element_type=jnp.float32)
        qkv = qkv.astype(jnp.bfloat16)  # (tile, 3*inner)
        for h in range(heads):
            q = qkv[:, h * d:(h + 1) * d]
            k = qkv[:, inner + h * d:inner + (h + 1) * d]
            v = qkv[:, 2 * inner + h * d:2 * inner + (h + 1) * d]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )
            s = s * jnp.float32(scale) + penalty
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            l = jnp.sum(e, axis=-1, keepdims=True)
            p = (e / l).astype(jnp.bfloat16)
            o_h = jax.lax.dot(p, v, preferred_element_type=jnp.float32)
            acc_ref[g * tile:(g + 1) * tile, h * d:(h + 1) * d] = (
                o_h.astype(jnp.bfloat16)
            )

    wo = wo_ref[...]
    out = jax.lax.dot(acc_ref[...], wo, preferred_element_type=jnp.float32)
    out = out + bo_ref[0].astype(jnp.float32)
    if residual:
        out = out + (xf if xf is not None else x_raw.astype(jnp.float32))
    o_ref[...] = out.astype(o_ref.dtype).reshape(bn, t, o_ref.shape[2])


def _maybe_ln(x, ls, lb, eps):
    if ls is None:
        return x.astype(jnp.bfloat16) if x.dtype != jnp.bfloat16 else x, None
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps) * ls + lb
    return xn.astype(jnp.bfloat16), xf


def _mha_xla(x, wqkv, wo, bo, ls=None, lb=None, *, heads: int, dim_head: int,
             scale: float, residual: bool = False, eps: float = 1e-5):
    """Reference XLA implementation (same layouts) for CPU fallback + VJP."""
    n, t, _ = x.shape
    inner = heads * dim_head
    xb, xf = _maybe_ln(x, ls, lb, eps)
    qkv = jnp.dot(xb, wqkv).astype(jnp.bfloat16)  # (n, t, 3*inner)
    q, k, v = (a.reshape(n, t, heads, dim_head) for a in jnp.split(qkv, 3, axis=-1))
    s = jnp.einsum("nthd,nshd->nhts", q, k, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
    o = jnp.einsum("nhts,nshd->nthd", p, v, preferred_element_type=jnp.float32)
    o = o.astype(jnp.bfloat16).reshape(n, t, inner)
    out = jnp.dot(o, wo, preferred_element_type=jnp.float32) + bo.astype(jnp.float32)
    if residual:
        out = out + (xf if xf is not None else x.astype(jnp.float32))
    return out.astype(x.dtype)


def _fwd_impl(x, wqkv, wo, bo, ls=None, lb=None, *, heads, dim_head, scale,
              residual=False, eps=1e-5):
    n, t, c_in = x.shape
    inner = heads * dim_head
    c_out = wo.shape[1]
    has_ln = ls is not None
    bn = _choose_bn(n, t)
    groups = (bn * t) // _TILE_ROWS if (bn * t) % _TILE_ROWS == 0 else 1
    grid = (n // bn,)
    kern = functools.partial(
        _kernel, t=t, heads=heads, dim_head=dim_head, scale=scale,
        groups=max(groups, 1), has_ln=has_ln, residual=residual, eps=eps,
    )
    interpret = jax.default_backend() == "cpu"
    in_specs = [
        pl.BlockSpec((bn, t, c_in), lambda i: (i, 0, 0)),
        pl.BlockSpec((c_in, 3 * inner), lambda i: (0, 0)),
        pl.BlockSpec((inner, c_out), lambda i: (0, 0)),
        pl.BlockSpec((1, c_out), lambda i: (0, 0)),
    ]
    operands = [x, wqkv, wo, bo.reshape(1, c_out)]
    if has_ln:
        in_specs += [
            pl.BlockSpec((1, c_in), lambda i: (0, 0)),
            pl.BlockSpec((1, c_in), lambda i: (0, 0)),
        ]
        operands += [ls.reshape(1, c_in), lb.reshape(1, c_in)]
    # weights above ~4 MB push double-buffered VMEM past Mosaic's 16 MB
    # default — scale the limit with the resident-weight footprint
    weight_bytes = (wqkv.size + wo.size) * 2
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=(2 * weight_bytes + 12 * 1024 * 1024
                          if 2 * weight_bytes + 12 * 1024 * 1024 > 16 * 1024 * 1024
                          else None),
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bn, t, c_out), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, t, c_out), x.dtype),
        scratch_shapes=[pltpu.VMEM((bn * t, inner), jnp.bfloat16)],
        compiler_params=compiler_params,
        interpret=interpret,
    )(*operands)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused(x, wqkv, wo, bo, static):
    return _fwd_impl(x, wqkv, wo, bo, **dict(static))


def _fused_fwd(x, wqkv, wo, bo, static):
    return _fused(x, wqkv, wo, bo, static), (x, wqkv, wo, bo)


def _fused_bwd(static, res, gout):
    x, wqkv, wo, bo = res
    f = functools.partial(_mha_xla, **dict(static))
    _, vjp = jax.vjp(f, x, wqkv, wo, bo)
    return vjp(gout)


_fused.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _fused_ln(x, wqkv, wo, bo, ls, lb, static):
    return _fwd_impl(x, wqkv, wo, bo, ls, lb, **dict(static))


def _fused_ln_fwd(x, wqkv, wo, bo, ls, lb, static):
    return _fused_ln(x, wqkv, wo, bo, ls, lb, static), (x, wqkv, wo, bo, ls, lb)


def _fused_ln_bwd(static, res, gout):
    x, wqkv, wo, bo, ls, lb = res
    f = functools.partial(_mha_xla, **dict(static))
    _, vjp = jax.vjp(f, x, wqkv, wo, bo, ls, lb)
    return vjp(gout)


_fused_ln.defvjp(_fused_ln_fwd, _fused_ln_bwd)


def fused_temporal_mha(
    x: jax.Array,
    wq: jax.Array,
    wk: jax.Array,
    wv: jax.Array,
    wo: jax.Array,
    bo: jax.Array,
    *,
    heads: int,
    scale: Optional[float] = None,
    ln_scale: Optional[jax.Array] = None,
    ln_bias: Optional[jax.Array] = None,
    residual: bool = False,
    eps: float = 1e-5,
) -> jax.Array:
    """Fused MHA over (N, T, C) with T small (temporal attention).

    Args:
      x: (N, T, C) input tokens — raw (pre-LayerNorm) when ln_scale/ln_bias
        are given (the kernel fuses the f32 LayerNorm), already-normed
        otherwise.
      wq/wk/wv: (C, H*D) projection kernels (Dense 'kernel' layout).
      wo: (H*D, C_out) out-projection kernel; bo: (C_out,) bias.
      heads: number of heads.
      residual: add the raw x to the output (requires C_out == C).

    Returns (N, T, C_out) in x.dtype.
    """
    n, t, c_in = x.shape
    inner = wq.shape[1]
    dim_head = inner // heads
    if scale is None:
        scale = dim_head ** -0.5
    if residual:
        assert wo.shape[1] == c_in, "residual needs matching channel widths"
    # one merged (C, 3*inner) projection weight: a single MXU dot per row
    # group instead of 3*H latency-chained small dots
    wqkv = jnp.concatenate([wq, wk, wv], axis=1).astype(jnp.bfloat16)
    wo_b = wo.astype(jnp.bfloat16)
    static = tuple(sorted(dict(
        heads=heads, dim_head=dim_head, scale=float(scale),
        residual=bool(residual), eps=float(eps),
    ).items()))
    if ln_scale is not None:
        return _fused_ln(x, wqkv, wo_b, bo, ln_scale, ln_bias, static)
    return _fused(x, wqkv, wo_b, bo, static)
