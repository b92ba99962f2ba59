"""Fused LayerNorm Pallas kernel for TPU.

The spatial-transformer LayerNorms (nn/layers.py::LayerNormF32 — ~60 sites in
the flagship UNet step that the fused LN+MHA / LN+GEGLU kernels do not cover)
compile to a convert+reduce stats fusion plus a separate normalise fusion;
like the GroupNorm case (ops/groupnorm.py) those run far below bandwidth on
TPU due to layout-hostile reduce shapes. LN stats are per-row over the channel
(lane) axis only, so the whole op is an embarrassingly parallel one-pass row
map: each grid step loads a (BL, C) tile, reduces over lanes in f32,
normalises, applies scale/bias, writes back — one HBM round trip.

Matches LayerNormF32 semantics (f32 stats, output cast to input dtype);
reference parity anchor: torch nn.LayerNorm used throughout
lvdm/modules/attention.py (e.g. :331-340 BasicTransformerBlock norms).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_VMEM_BYTES = 6 * 1024 * 1024


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)  # (BL, C)
    mean = jnp.mean(x, axis=1, keepdims=True)
    d = x - mean
    var = jnp.mean(d * d, axis=1, keepdims=True)
    y = d * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def layer_norm_plain(x, scale, bias, *, eps=1e-5):
    """Plain-XLA twin (fallback + VJP recompute): exact two-pass variance."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    d = xf - mean
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    y = d * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(orig_dtype)


@functools.lru_cache(maxsize=None)
def _pick_block_rows(r: int, c: int, itemsize: int) -> int:
    """Largest multiple-of-8 divisor of r whose (BL, C) tile fits VMEM."""
    per_row = c * (itemsize * 2 + 4)  # in + out + f32 working copy
    bl_max = min(r, max(8, _MAX_VMEM_BYTES // max(per_row, 1)))
    best = 0
    for bl in range(8, bl_max + 1, 8):
        if r % bl == 0:
            best = bl
    return best


def _fused_impl(x, scale, bias, eps):
    orig_shape = x.shape
    c = x.shape[-1]
    r = 1
    for s in x.shape[:-1]:
        r *= s
    bl = _pick_block_rows(r, c, x.dtype.itemsize)
    xf = x.reshape(r, c)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((r, c), x.dtype),
        grid=(r // bl,),
        in_specs=[
            pl.BlockSpec((bl, c), lambda i: (i, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((bl, c), lambda i: (i, 0)),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=jax.default_backend() == "cpu",
    )(xf, scale, bias)
    return out.reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _layer_norm(x, scale, bias, eps):
    return _fused_impl(x, scale, bias, eps)


def _ln_fwd(x, scale, bias, eps):
    return _layer_norm(x, scale, bias, eps), (x, scale, bias)


def _ln_bwd(eps, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda x, s, b: layer_norm_plain(x, s, b, eps=eps), x, scale, bias)
    return vjp(g)


_layer_norm.defvjp(_ln_fwd, _ln_bwd)


def layer_norm_fused(x, scale, bias, *, eps=1e-5):
    """LayerNorm over the trailing axis with f32 stats; returns x.dtype.
    Differentiable (backward recomputes through the plain twin)."""
    return _layer_norm(x, scale, bias, eps)


def layer_norm_supported(x: jax.Array) -> bool:
    c = x.shape[-1]
    if c < 128 or c % 8 != 0:
        return False
    r = 1
    for s in x.shape[:-1]:
        r *= s
    if r % 8 != 0:
        return False
    return _pick_block_rows(r, c, x.dtype.itemsize) >= 8
