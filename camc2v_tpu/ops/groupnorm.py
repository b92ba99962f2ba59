"""Fused GroupNorm(+SiLU) Pallas kernel for TPU.

XLA compiles the UNet's ~60 GroupNorms into a convert+reduce fusion (f32
stats) followed by a separate normalise fusion — profiling shows ~25 ms of a
195 ms flagship denoise step spent in `convert_reduce_fusion` ops running at
~20 GB/s effective bandwidth (vs ~100 us rooflines). This kernel does the
whole thing in ONE HBM round trip: each grid step loads one sample's full
(H*W, C) feature map into VMEM (640 KB at the flagship ds8 level), computes
the per-group mean/var in f32 on-chip, normalises, applies scale/bias and the
optional SiLU, and writes back.

Matches GroupNorm32 semantics (reference lvdm/basics.py:78-80: fp32 stats,
output cast back): eps 1e-5, groups along the channel axis, stats over
(spatial, channels-in-group).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# one sample's (H*W, C) map must fit comfortably in VMEM alongside the output
_MAX_VMEM_BYTES = 6 * 1024 * 1024


def _gn_kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups, eps, silu):
    """One sample per grid step; (HW, C) resident in VMEM.

    Mosaic cannot reshape the lane (channel) dim into (groups, cg), so group
    statistics are aggregated with a one-hot (C, G) matmul — per-channel sums
    reduce over sublanes, the tiny matmul rides the MXU, and the transposed
    matmul broadcasts group stats back to channels.
    """
    x = x_ref[0].astype(jnp.float32)  # (HW, C)
    hw, c = x.shape
    cg = c // num_groups
    # A[ch, g] = 1 iff ch belongs to group g
    A = (
        jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0) // cg
        == jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    ).astype(jnp.float32)
    n = float(hw * cg)
    s1 = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
    mean_g = jax.lax.dot(s1, A) / n  # (1, G)
    mean_c = jax.lax.dot(mean_g, A.T)  # (1, C)
    d = x - mean_c
    s2 = jnp.sum(d * d, axis=0, keepdims=True)  # (1, C) — exact two-pass var
    var_g = jax.lax.dot(s2, A) / n
    inv_c = jax.lax.dot(jax.lax.rsqrt(var_g + eps), A.T)  # (1, C)
    y = d * inv_c
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def group_norm_plain(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    num_groups: int = 32,
    eps: float = 1e-5,
    silu: bool = False,
) -> jax.Array:
    """Plain-XLA twin of the kernel (fallback path + VJP recompute).

    Uses the same one-hot group-matmul formulation as the kernel instead of
    reshaping channels into (groups, cg): lane-dim reshapes force XLA into
    ~27 GB/s layout-hostile reduce fusions on TPU (profiled round 2), whereas
    per-channel reductions keep the channel axis minor and fast.
    """
    orig_dtype = x.dtype
    n, c = x.shape[0], x.shape[-1]
    cg = c // num_groups
    xf = x.reshape(n, -1, c).astype(jnp.float32)
    A = (
        jnp.arange(c)[:, None] // cg == jnp.arange(num_groups)[None, :]
    ).astype(jnp.float32)  # (C, G) one-hot group assignment
    s1 = jnp.mean(xf, axis=1)  # (n, C) — channel-minor reduce
    mean_c = ((s1 @ A) / cg) @ A.T  # (n, C): per-channel group mean
    d = xf - mean_c[:, None]
    v = jnp.mean(d * d, axis=1)  # (n, C) — exact two-pass variance
    inv_c = jax.lax.rsqrt(((v @ A) / cg) @ A.T + eps)
    y = d * inv_c[:, None]
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.reshape(x.shape).astype(orig_dtype)


def _fused_impl(x, scale, bias, num_groups, eps, silu):
    orig_shape = x.shape
    n, c = x.shape[0], x.shape[-1]
    hw = 1
    for s in x.shape[1:-1]:
        hw *= s
    xf = x.reshape(n, hw, c)

    out = pl.pallas_call(
        functools.partial(_gn_kernel, num_groups=num_groups, eps=eps, silu=silu),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=jax.default_backend() == "cpu",
    )(xf, scale, bias)
    return out.reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _group_norm(x, scale, bias, num_groups, eps, silu):
    return _fused_impl(x, scale, bias, num_groups, eps, silu)


def _gn_fwd(x, scale, bias, num_groups, eps, silu):
    return _group_norm(x, scale, bias, num_groups, eps, silu), (x, scale, bias)


def _gn_bwd(num_groups, eps, silu, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x, s, b: group_norm_plain(x, s, b, num_groups=num_groups, eps=eps, silu=silu),
        x, scale, bias,
    )
    return vjp(g)


_group_norm.defvjp(_gn_fwd, _gn_bwd)


def group_norm_fused(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    num_groups: int = 32,
    eps: float = 1e-5,
    silu: bool = False,
) -> jax.Array:
    """GroupNorm over (N, ..., C) with f32 stats, optional fused SiLU.

    Stats are per (sample, group) over all spatial positions and the group's
    channels — identical to flax/torch GroupNorm. Returns x.dtype.
    Differentiable (backward recomputes through the plain-XLA twin).
    """
    return _group_norm(x, scale, bias, num_groups, eps, silu)


def _gn_big_kernel(
    x_ref, scale_ref, bias_ref, o_ref, s1_ref, s2_ref, mean_ref, inv_ref,
    *, num_groups, eps, silu, seq, chunk_elems,
):
    """Two-phase GN for samples too big for VMEM (the temporal-transformer
    norms: stats per (B, group) over T*H*W spatial positions).

    Grid (B, 2, T): phase 0 accumulates per-channel sum / sum-of-squares over
    the sequence chunks; phase 1 derives the group stats (one-hot matmuls,
    single-pass variance in f32) and normalises each chunk. Each (b, t) output
    block is visited in both phases and flushed after the final write.
    """
    p = pl.program_id(1)
    ti = pl.program_id(2)
    x = x_ref[0, 0].astype(jnp.float32)  # (HW, C)
    c = x.shape[-1]
    cg = c // num_groups

    @pl.when((p == 0) & (ti == 0))
    def _():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    @pl.when(p == 0)
    def _():
        s1_ref[...] += jnp.sum(x, axis=0, keepdims=True)
        s2_ref[...] += jnp.sum(x * x, axis=0, keepdims=True)

    @pl.when((p == 1) & (ti == 0))
    def _():
        A = (
            jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0) // cg
            == jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
        ).astype(jnp.float32)
        n = float(seq * chunk_elems * cg)
        mean_g = jax.lax.dot(s1_ref[...], A) / n
        ex2_g = jax.lax.dot(s2_ref[...], A) / n
        var_g = jnp.maximum(ex2_g - mean_g * mean_g, 0.0)
        mean_ref[...] = jax.lax.dot(mean_g, A.T)
        inv_ref[...] = jax.lax.dot(jax.lax.rsqrt(var_g + eps), A.T)

    @pl.when(p == 1)
    def _():
        y = (x - mean_ref[...]) * inv_ref[...]
        y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
        if silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0, 0] = y.astype(o_ref.dtype)


def _fused_big_impl(x, scale, bias, num_groups, eps, silu):
    """x viewed as (B, T, HW, C); stats per (B, group) over (T, HW, C/G)."""
    orig_shape = x.shape
    b, t = x.shape[0], x.shape[1]
    c = x.shape[-1]
    hw = 1
    for s in x.shape[2:-1]:
        hw *= s
    xf = x.reshape(b, t, hw, c)

    out = pl.pallas_call(
        functools.partial(
            _gn_big_kernel, num_groups=num_groups, eps=eps, silu=silu,
            seq=t, chunk_elems=hw,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, hw, c), x.dtype),
        grid=(b, 2, t),
        in_specs=[
            pl.BlockSpec((1, 1, hw, c), lambda bi, p, ti: (bi, ti, 0, 0)),
            pl.BlockSpec((c,), lambda bi, p, ti: (0,)),
            pl.BlockSpec((c,), lambda bi, p, ti: (0,)),
        ],
        out_specs=pl.BlockSpec((1, 1, hw, c), lambda bi, p, ti: (bi, ti, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=jax.default_backend() == "cpu",
    )(xf, scale, bias)
    return out.reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _group_norm_big(x, scale, bias, num_groups, eps, silu):
    return _fused_big_impl(x, scale, bias, num_groups, eps, silu)


def _gn_big_fwd(x, scale, bias, num_groups, eps, silu):
    return _group_norm_big(x, scale, bias, num_groups, eps, silu), (x, scale, bias)


_group_norm_big.defvjp(_gn_big_fwd, _gn_bwd)


def group_norm_fused_big(x, scale, bias, *, num_groups=32, eps=1e-5, silu=False):
    """GN for (B, T, ..., C) inputs whose per-sample maps exceed VMEM;
    per-(T-slice) chunks stream through a two-phase kernel."""
    return _group_norm_big(x, scale, bias, num_groups, eps, silu)


def _gn_row_moments_kernel(x_ref, o_ref):
    """Per-(B*T) row raw moments: o[0] = [sum(x), sum(x*x)] over HW, per channel."""
    x = x_ref[0].astype(jnp.float32)  # (HW, C)
    s1 = jnp.sum(x, axis=0, keepdims=True)
    s2 = jnp.sum(x * x, axis=0, keepdims=True)
    o_ref[0] = jnp.concatenate([s1, s2], axis=0)  # (2, C)


def _gn_apply_kernel(x_ref, stats_ref, scale_ref, bias_ref, o_ref, *, silu):
    """Normalise one (HW, C) row with precomputed per-batch channel stats."""
    x = x_ref[0].astype(jnp.float32)
    mean_c = stats_ref[0, 0:1]  # (1, C) f32
    inv_c = stats_ref[0, 1:2]
    y = (x - mean_c) * inv_c
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _fused_temporal_impl(x, scale, bias, num_groups, eps, silu):
    """5-D temporal GN (stats per (B, group) over T*H*W) as TWO row-parallel
    kernels sharing the proven 4-D (B*T, HW, C) block layout.

    The one-call streaming kernel (`_gn_big_kernel`) ran at roofline but XLA
    wrapped every call site in 42 MB layout-normalisation copies (grid over
    (B, 2, T) with revisited output blocks forces a non-default result
    layout). Here both kernels are plain row-parallel maps over the SAME
    (N, HW, C) view the proven `_gn_kernel` uses, so operand/result layouts
    match the surrounding frame-wise graph; the cross-row group reduction
    happens in-graph on a tiny (B, 2, C) array between the two calls.
    """
    orig_shape = x.shape
    b, t = x.shape[0], x.shape[1]
    c = x.shape[-1]
    hw = 1
    for s in x.shape[2:-1]:
        hw *= s
    n = b * t
    cg = c // num_groups
    xf = x.reshape(n, hw, c)
    interp = jax.default_backend() == "cpu"

    mom = pl.pallas_call(
        _gn_row_moments_kernel,
        out_shape=jax.ShapeDtypeStruct((n, 2, c), jnp.float32),
        grid=(n,),
        in_specs=[pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, 2, c), lambda i: (i, 0, 0)),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interp,
    )(xf)

    # tiny in-graph combine: (B,T,2,C) -> per-(B, group) mean / inv-std
    mom_b = mom.reshape(b, t, 2, c).sum(axis=1)  # (B, 2, C)
    A = (
        jnp.arange(c)[:, None] // cg == jnp.arange(num_groups)[None, :]
    ).astype(jnp.float32)  # (C, G)
    n_elems = float(t * hw * cg)
    mean_g = (mom_b[:, 0] @ A) / n_elems  # (B, G)
    ex2_g = (mom_b[:, 1] @ A) / n_elems
    var_g = jnp.maximum(ex2_g - mean_g * mean_g, 0.0)
    mean_c = mean_g @ A.T  # (B, C)
    inv_c = jax.lax.rsqrt(var_g + eps) @ A.T
    stats = jnp.stack([mean_c, inv_c], axis=1)  # (B, 2, C) f32

    out = pl.pallas_call(
        functools.partial(_gn_apply_kernel, silu=silu),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 2, c), lambda i: (i // t, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interp,
    )(xf, stats, scale, bias)
    return out.reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _group_norm_temporal(x, scale, bias, num_groups, eps, silu):
    return _fused_temporal_impl(x, scale, bias, num_groups, eps, silu)


def _gn_temporal_fwd(x, scale, bias, num_groups, eps, silu):
    return _group_norm_temporal(x, scale, bias, num_groups, eps, silu), (x, scale, bias)


_group_norm_temporal.defvjp(_gn_temporal_fwd, _gn_bwd)


def group_norm_fused_temporal(x, scale, bias, *, num_groups=32, eps=1e-5, silu=False):
    """GN for 5-D (B, T, H, W, C) inputs: stats per (B, group) over (T, H, W).

    Raw-moment variance (vs the exact two-pass of the 4-D kernel): the cross-
    row combine cannot re-read x without a third HBM pass; f32 raw moments on
    normalised-scale activations keep ~1e-4 relative accuracy, below bf16
    output rounding. Backward recomputes through the exact plain twin.
    """
    return _group_norm_temporal(x, scale, bias, num_groups, eps, silu)


def group_norm_temporal_supported(x: jax.Array, num_groups: int) -> bool:
    # (B, T, ..., C): stats per (B, group) over everything between. 4-D views
    # (B, chunks, hw, C) from the chunked large-map dispatch qualify too.
    if x.ndim < 4:
        return False
    c = x.shape[-1]
    if c % num_groups != 0 or c < 128 or c % 8 != 0:
        return False
    hw = 1
    for s in x.shape[2:-1]:
        hw *= s
    if hw % 8 != 0:
        return False
    return hw * c * (x.dtype.itemsize * 2 + 4) <= _MAX_VMEM_BYTES


def group_norm_big_supported(x: jax.Array, num_groups: int) -> bool:
    if x.ndim < 4:
        return False
    c = x.shape[-1]
    if c % num_groups != 0 or c < 128 or c % 8 != 0:
        return False
    hw = 1
    for s in x.shape[2:-1]:
        hw *= s
    if hw % 8 != 0:
        return False
    return hw * c * (x.dtype.itemsize * 2 + 4) <= _MAX_VMEM_BYTES


def group_norm_supported(x: jax.Array, num_groups: int) -> bool:
    c = x.shape[-1]
    if c % num_groups != 0:
        return False
    hw = 1
    for s in x.shape[1:-1]:
        hw *= s
    # in+out in VMEM (x, y in input dtype + f32 working copy)
    bytes_needed = hw * c * (x.dtype.itemsize * 2 + 4)
    if bytes_needed > _MAX_VMEM_BYTES:
        return False
    # lane-dim alignment: Mosaic masks partial lane tiles, so any multiple of
    # 8 channels >= 128 works (320 verified on a v5e); spatial to 8 sublanes
    return c >= 128 and c % 8 == 0 and hw % 8 == 0
