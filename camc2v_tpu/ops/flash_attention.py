"""Fused flash-attention Pallas kernel for TPU (forward), with optional
block-loaded boolean masks.

This is the memory fix for the epipolar spatio-temporal attention: the XLA
path materialises (B, H, L, L) float32 logits — 10.7 GB at the flagship ds8
resolution (L = T*h*w = 16384, fused-CFG batch 2) — which OOMs a 16 GB v5e
chip. The kernel streams KV blocks through VMEM with an online softmax, so
HBM holds only inputs + the bool mask (the mask itself is the reference's
design: model/camcontexti2v.py:552 materialises the same (B, L, L) bools).

Kernel layout: the grid is (B*head_groups, q_blocks, k_blocks); each grid step
processes a whole head group (<=8 heads) with batched dot_generals, loading
each boolean mask tile ONCE per (q, k) block instead of once per head. Empty
mask tiles are skipped entirely via a scalar-prefetched bitmap. Block sizes
(256, 1024) were swept on a v5e; the kernel is VPU-softmax bound.

Backward pass: the kernel is forward-only; `flash_attention` wraps it in a
`jax.custom_vjp` whose backward recomputes attention block-wise (flash-style
dq/dk/dv in plain XLA with lax.map over query blocks) — O(L) memory, no
L x L materialisation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 256
BLOCK_K = 1024

import os as _os

_MIN_FLASH_LK = int(_os.environ.get("CAMC2V_MIN_FLASH_LK", str(BLOCK_K // 2)))
NEG_INF = -1e30
MAX_HEADS_FUSED = 32  # VMEM budget guard for the per-step head loop


def flash_supported(q: jax.Array, k: jax.Array, mask: Optional[jax.Array]) -> bool:
    b, lq, h, d = q.shape
    lk = k.shape[1]
    if d not in (64, 128):
        return False
    if h > MAX_HEADS_FUSED:
        return False
    if lq % BLOCK_Q != 0:
        return False
    # the key axis is padded to a BLOCK_K multiple internally (register tokens
    # make Lk = L + num_registers); only reject pathological amounts of padding.
    # Padding is pure MXU headroom (43 GFLOP worst case at ds8 text Lk=77),
    # so the floor is env-tunable for A/B: CAMC2V_MIN_FLASH_LK.
    if lk < _MIN_FLASH_LK:
        return False
    if mask is not None and mask.shape != (b, lq, lk):
        return False
    return True


def _pad_keys(k, v, mask, lq):
    """Pad the key axis to a BLOCK_K multiple with masked-out positions."""
    lk = k.shape[1]
    pad = (-lk) % BLOCK_K
    if pad == 0:
        return k, v, mask
    k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    if mask is None:
        b = k.shape[0]
        mask = jnp.ones((b, lq, lk), bool)
    mask = jnp.pad(mask, ((0, 0), (0, 0), (0, pad)), constant_values=False)
    return k, v, mask


def _head_group(h: int, d: int = 64, block_q: int = BLOCK_Q, block_k: int = BLOCK_K,
                has_mask: bool = False) -> int:
    """Largest divisor of h whose per-step VMEM footprint fits.

    Budget model (double-buffered q/k/v tiles + mask tile + f32 scratch),
    calibrated on a v5e: hb=5 with a mask at BK=1024 fits (~5.3 MB est), hb=8
    OOMs (23.5 MB actual vs 16 MB scoped vmem) — the compiler's effective
    multiplier over this estimate is ~3x, so cap the estimate at 6 MB.
    """
    budget = 6 * 1024 * 1024
    for g in range(min(h, 8), 0, -1):
        if h % g != 0:
            continue
        est = (
            2 * g * (block_q + 2 * block_k) * d * 2  # q + k + v tiles, 2 buffers
            + (2 * block_q * block_k * 4 if has_mask else 0)  # mask tile (i32)
            + g * block_q * (d + 2) * 4  # f32 scratch
        )
        if est <= budget:
            return g
    return 1


# running-max floor: masked logits sit at NEG_INF; flooring m_new here makes
# exp(NEG_INF - m_new) underflow to exactly 0, removing the explicit p-zeroing
# pass over the full tile. Fully-masked rows then have l == 0 (guarded at the
# end). Real logits are |s| << M_FLOOR so numerics are untouched.
M_FLOOR = -1e20


def _fwd_body(q_ref, k_ref, v_ref, mask_ref, o_ref, m_scratch, l_scratch, acc_scratch, *, nk):
    """q_ref: (1, Hb, BQ, D); k/v_ref: (1, Hb, BK, D); mask_ref: (1, BQ, BK) or None;
    o_ref: (1, Hb, BQ, D); scratch: (Hb, BQ, 1) x2 / (Hb, BQ, D).

    All head-group ops are BATCHED dot_generals / vector ops over the Hb axis
    (no python unrolling — keeps Mosaic's scheduler free to pipeline and the
    VMEM stack bounded)."""
    q = q_ref[0]  # (Hb, BQ, D) — scale pre-folded
    kb = k_ref[0]  # (Hb, BK, D)
    vb = v_ref[0]
    # batched QK^T over the head axis: (Hb, BQ, BK) f32
    s = jax.lax.dot_general(
        q, kb, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    if mask_ref is not None:
        s = jnp.where(mask_ref[0][None], s, NEG_INF)  # mask loaded ONCE per tile

    m_prev = m_scratch[:]  # (Hb, BQ, 1)
    m_cur = jnp.max(s, axis=2, keepdims=True)
    m_new = jnp.maximum(jnp.maximum(m_prev, m_cur), M_FLOOR)
    p = jnp.exp(s - m_new)  # masked entries underflow to 0 via the floor
    alpha = jnp.exp(m_prev - m_new)
    l_scratch[:] = alpha * l_scratch[:] + jnp.sum(p, axis=2, keepdims=True)
    acc_scratch[:] = acc_scratch[:] * alpha + jax.lax.dot_general(
        p.astype(vb.dtype), vb, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    m_scratch[:] = m_new


def _finalize(o_ref, m_scratch, l_scratch, acc_scratch, lse_ref=None):
    l = l_scratch[:]
    safe_l = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = (acc_scratch[:] / safe_l).astype(o_ref.dtype)
    if lse_ref is not None:
        m = m_scratch[:, :, 0]
        lv = l[:, :, 0]
        # fully-masked rows (l == 0): +1e30 makes the backward's exp(s - lse)
        # exactly 0, matching the zeroed forward output rows
        lse_ref[0] = jnp.where(lv == 0.0, 1e30, m + jnp.log(jnp.maximum(lv, 1e-30)))


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *rest, nk, with_stats=False):
    if with_stats:
        lse_ref, m_scratch, l_scratch, acc_scratch = rest
    else:
        lse_ref = None
        m_scratch, l_scratch, acc_scratch = rest
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        m_scratch[:] = jnp.full_like(m_scratch, M_FLOOR)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    _fwd_body(q_ref, k_ref, v_ref, mask_ref, o_ref, m_scratch, l_scratch, acc_scratch, nk=nk)

    @pl.when(ki == nk - 1)
    def _():
        _finalize(o_ref, m_scratch, l_scratch, acc_scratch, lse_ref)


def _fwd_kernel_nomask(q_ref, k_ref, v_ref, o_ref, *rest, nk, with_stats=False):
    _fwd_kernel(q_ref, k_ref, v_ref, None, o_ref, *rest, nk=nk, with_stats=with_stats)


def _fwd_kernel_sparse(tile_any_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, *rest,
                       nk, g, with_stats=False):
    """Block-sparse variant: `tile_any_ref` is a scalar-prefetched (B, nQ, nK)
    int32 bitmap of non-empty mask tiles; empty tiles skip ALL compute (the
    kernel is VPU-softmax bound, so skipping compute is the win even though
    the pipelined DMAs still run)."""
    if with_stats:
        lse_ref, m_scratch, l_scratch, acc_scratch = rest
    else:
        lse_ref = None
        m_scratch, l_scratch, acc_scratch = rest
    bg = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        m_scratch[:] = jnp.full_like(m_scratch, M_FLOOR)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    @pl.when(tile_any_ref[bg // g, qi, ki] != 0)
    def _():
        _fwd_body(q_ref, k_ref, v_ref, mask_ref, o_ref, m_scratch, l_scratch, acc_scratch, nk=nk)

    @pl.when(ki == nk - 1)
    def _():
        _finalize(o_ref, m_scratch, l_scratch, acc_scratch, lse_ref)


def _flash_fwd(q, k, v, mask, scale, want_stats=False):
    b, lq, h, d = q.shape
    lk = k.shape[1]
    nq = lq // BLOCK_Q
    nk = lk // BLOCK_K
    hb = _head_group(h, d, BLOCK_Q, BLOCK_K, has_mask=mask is not None)
    g = h // hb  # head groups per batch element

    # fold the scale into q; (B, L, H, D) -> (B*G, Hb, L, D)
    qt = (q * jnp.asarray(scale, q.dtype)).transpose(0, 2, 1, 3).reshape(b * g, hb, lq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * g, hb, lk, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * g, hb, lk, d)

    # index maps take *_ because PrefetchScalarGridSpec appends the scalar ref
    q_spec = pl.BlockSpec((1, hb, BLOCK_Q, d), lambda bg, qi, ki, *_: (bg, 0, qi, 0))
    k_spec = pl.BlockSpec((1, hb, BLOCK_K, d), lambda bg, qi, ki, *_: (bg, 0, ki, 0))
    o_spec = pl.BlockSpec((1, hb, BLOCK_Q, d), lambda bg, qi, ki, *_: (bg, 0, qi, 0))
    scratch = [
        pltpu.VMEM((hb, BLOCK_Q, 1), jnp.float32),
        pltpu.VMEM((hb, BLOCK_Q, 1), jnp.float32),
        pltpu.VMEM((hb, BLOCK_Q, d), jnp.float32),
    ]
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
        # The masked forward at hb=5/BK=1024 sits at ~16.0 MB of scoped VMEM —
        # right at Mosaic's 16 MB default — and the lse output of the
        # want_stats variant (Pallas backward) pushed it to 16.51 MB, failing
        # the flagship TRAIN compile (r5c r2: "scoped allocation 16.51M,
        # limit 16.00M" at the spatial attn sites). The backward kernels
        # below already raise the limit; raise it here too.
        vmem_limit_bytes=32 * 1024 * 1024,
    )
    interpret = jax.default_backend() == "cpu"
    out_shape = jax.ShapeDtypeStruct((b * g, hb, lq, d), q.dtype)
    out_specs = o_spec
    if want_stats:
        # per-row logsumexp for the Pallas backward, heads-major (B*g, Hb, Lq)
        lse_spec = pl.BlockSpec((1, hb, BLOCK_Q), lambda bg, qi, ki, *_: (bg, 0, qi))
        out_shape = (out_shape, jax.ShapeDtypeStruct((b * g, hb, lq), jnp.float32))
        out_specs = (o_spec, lse_spec)

    if mask is not None:
        # block-sparse skip: per-tile non-emptiness bitmap (tiny), scalar-prefetched
        tile_any = (
            mask.reshape(b, nq, BLOCK_Q, nk, BLOCK_K).any(axis=(2, 4)).astype(jnp.int32)
        )
        mask_spec = pl.BlockSpec((1, BLOCK_Q, BLOCK_K), lambda bg, qi, ki, *_: (bg // g, qi, ki))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * g, nq, nk),
            in_specs=[q_spec, k_spec, k_spec, mask_spec],
            out_specs=out_specs,
            scratch_shapes=scratch,
        )
        out = pl.pallas_call(
            functools.partial(_fwd_kernel_sparse, nk=nk, g=g, with_stats=want_stats),
            out_shape=out_shape,
            grid_spec=grid_spec,
            compiler_params=compiler_params,
            interpret=interpret,
        )(tile_any, qt, kt, vt, mask)
    else:
        out = pl.pallas_call(
            functools.partial(_fwd_kernel_nomask, nk=nk, with_stats=want_stats),
            out_shape=out_shape,
            grid=(b * g, nq, nk),
            in_specs=[q_spec, k_spec, k_spec],
            out_specs=out_specs,
            scratch_shapes=scratch,
            compiler_params=compiler_params,
            interpret=interpret,
        )(qt, kt, vt)
    lse = None
    if want_stats:
        out, lse = out
    out = out.reshape(b, h, lq, d).transpose(0, 2, 1, 3)
    if want_stats:
        return out, lse  # lse stays (B*g, Hb, Lq) heads-major for the bwd
    return out


def _chunked_reference(q, k, v, mask, scale, chunk=BLOCK_Q):
    """Block-wise exact attention in plain XLA (used for the VJP): O(L) memory."""
    b, lq, h, d = q.shape

    # jax.checkpoint: vjp-through-lax.map otherwise stacks each chunk's
    # softmax p as a scan residual ([nq, b, h, chunk, L] f32 — ~0.7 GB per
    # flagship ds8 site at b=2, ~10 GB for the epipolar analogue). Remat
    # recomputes s/p per chunk in the backward sweep instead.
    @jax.checkpoint
    def one_chunk(qc_mc):
        qc, mc = qc_mc
        s = jnp.einsum("bqhd,bkhd->bhqk", qc, k, preferred_element_type=jnp.float32) * scale
        if mc is not None:
            s = jnp.where(mc[:, None], s, NEG_INF)
        p = jax.nn.softmax(s, axis=-1)
        # fully-masked rows: softmax of all -inf = uniform; zero them to match kernel
        if mc is not None:
            any_valid = jnp.any(mc, axis=-1)[:, None, :, None]
            p = jnp.where(any_valid, p, 0.0)
        return jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)

    nq = lq // chunk
    qs = q.reshape(b, nq, chunk, h, d).transpose(1, 0, 2, 3, 4)
    if mask is not None:
        ms = mask.reshape(b, nq, chunk, -1).transpose(1, 0, 2, 3)
        out = jax.lax.map(lambda t: one_chunk((t[0], t[1])), (qs, ms))
    else:
        out = jax.lax.map(lambda t: one_chunk((t, None)), qs)
    return out.transpose(1, 0, 2, 3, 4).reshape(b, lq, h, d)


# ------------------------------------------------------------ Pallas backward
# Flash-style dq / dk+dv kernels (round 5). The previous backward — the
# chunked XLA recompute above under jax.vjp — is the `while x27` pool of the
# r5 train profile: 58 ms of lax.map loops plus ~25 ms of dynamic-slice /
# dynamic-update-slice fusions and copy-done halo per flagship train call
# (12 adaptor layers + 15 UNet spatial attn1 sites). These kernels replace it
# with the standard two-sweep flash backward: p = exp(s - lse) from the
# forward's logsumexp output, ds = p * (dp - delta); the bool mask tile is
# streamed exactly as in the forward (loaded once per (q, k) tile, empty
# tiles skipped via the same scalar-prefetched bitmap).
# Kill switch: CAMC2V_FLASH_PALLAS_BWD=0 restores the chunked XLA VJP.


def _bwd_dq_kernel(tile_any_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   *rest, nk, g, has_mask):
    """dq = scale * sum_k ds . k  (grid: bg, qi, ki-arbitrary; q pre-scaled)."""
    if has_mask:
        mask_ref, dq_ref, dq_scratch = rest
    else:
        mask_ref = None
        dq_ref, dq_scratch = rest
    bg = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        dq_scratch[:] = jnp.zeros_like(dq_scratch)

    def body():
        qb = q_ref[0]            # (Hb, BQ, D) — pre-scaled
        kb = k_ref[0]            # (Hb, BK, D)
        vb = v_ref[0]
        dob = do_ref[0]
        lse = lse_ref[0]         # (Hb, BQ)
        delta = delta_ref[0]
        s = jax.lax.dot_general(
            qb, kb, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        if mask_ref is not None:
            s = jnp.where(mask_ref[0][None], s, NEG_INF)
        p = jnp.exp(s - lse[:, :, None])  # masked entries underflow to 0
        dp = jax.lax.dot_general(
            dob, vb, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta[:, :, None])
        dq_scratch[:] = dq_scratch[:] + jax.lax.dot_general(
            ds.astype(kb.dtype), kb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    if has_mask:
        @pl.when(tile_any_ref[bg // g, qi, ki] != 0)
        def _():
            body()
    else:
        body()

    @pl.when(ki == nk - 1)
    def _():
        dq_ref[0] = dq_scratch[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(tile_any_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    *rest, nq, g, has_mask):
    """dk = sum_q ds^T . qs (scale folded via the pre-scaled qs);
    dv = sum_q p^T . dout. Grid (bg, ki, qi-arbitrary)."""
    if has_mask:
        mask_ref, dk_ref, dv_ref, dk_scratch, dv_scratch = rest
    else:
        mask_ref = None
        dk_ref, dv_ref, dk_scratch, dv_scratch = rest
    bg = pl.program_id(0)
    ki = pl.program_id(1)
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    def body():
        qb = q_ref[0]
        kb = k_ref[0]
        vb = v_ref[0]
        dob = do_ref[0]
        lse = lse_ref[0]
        delta = delta_ref[0]
        s = jax.lax.dot_general(
            qb, kb, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        if mask_ref is not None:
            s = jnp.where(mask_ref[0][None], s, NEG_INF)
        p = jnp.exp(s - lse[:, :, None])  # (Hb, BQ, BK)
        dp = jax.lax.dot_general(
            dob, vb, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta[:, :, None])
        dv_scratch[:] = dv_scratch[:] + jax.lax.dot_general(
            p.astype(dob.dtype), dob, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk_scratch[:] = dk_scratch[:] + jax.lax.dot_general(
            ds.astype(qb.dtype), qb, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    if has_mask:
        @pl.when(tile_any_ref[bg // g, qi, ki] != 0)
        def _():
            body()
    else:
        body()

    @pl.when(qi == nq - 1)
    def _():
        dk_ref[0] = dk_scratch[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[:].astype(dv_ref.dtype)


def _flash_bwd_impl(q, k, v, mask, out, lse, dout, scale):
    """(dq, dk, dv) via the two backward kernels. k/v/mask arrive PADDED."""
    b, lq, h, d = q.shape
    lk = k.shape[1]
    nq = lq // BLOCK_Q
    nk = lk // BLOCK_K
    has_mask = mask is not None
    # size the head group off q/do/k/v tiles + the two f32 scratch accumulators
    hb = h
    budget = 48 * 1024 * 1024
    while hb > 1 and (
        h % hb != 0
        or hb * (2 * BLOCK_Q * d * 2 + 2 * BLOCK_K * d * 2 + 2 * BLOCK_K * d * 4) > budget
    ):
        hb -= 1
    while h % hb != 0:
        hb -= 1
    g = h // hb

    qs = (q * jnp.asarray(scale, q.dtype)).transpose(0, 2, 1, 3).reshape(b * g, hb, lq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * g, hb, lk, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * g, hb, lk, d)
    dot = dout.transpose(0, 2, 1, 3).reshape(b * g, hb, lq, d)
    delta = jnp.sum(dout.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = delta.transpose(0, 2, 1).reshape(b * g, hb, lq)
    lse = lse.reshape(b * g, hb, lq)

    if has_mask:
        tile_any = (
            mask.reshape(b, nq, BLOCK_Q, nk, BLOCK_K).any(axis=(2, 4)).astype(jnp.int32)
        )
    else:
        tile_any = jnp.ones((b, 1, 1), jnp.int32)  # scalar-prefetch placeholder

    interp = jax.default_backend() == "cpu"
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
        vmem_limit_bytes=100 * 1024 * 1024,
    )

    # ---- dq: grid (bg, qi, ki) -------------------------------------------
    q_spec = pl.BlockSpec((1, hb, BLOCK_Q, d), lambda bg, qi, ki, *_: (bg, 0, qi, 0))
    k_spec = pl.BlockSpec((1, hb, BLOCK_K, d), lambda bg, qi, ki, *_: (bg, 0, ki, 0))
    lse_spec = pl.BlockSpec((1, hb, BLOCK_Q), lambda bg, qi, ki, *_: (bg, 0, qi))
    in_specs = [q_spec, k_spec, k_spec, q_spec, lse_spec, lse_spec]
    operands = [qs, kt, vt, dot, lse, delta]
    if has_mask:
        in_specs.append(
            pl.BlockSpec((1, BLOCK_Q, BLOCK_K), lambda bg, qi, ki, *_: (bg // g, qi, ki))
        )
        operands.append(mask)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, nk=nk, g=g, has_mask=has_mask),
        out_shape=jax.ShapeDtypeStruct((b * g, hb, lq, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * g, nq, nk),
            in_specs=in_specs,
            out_specs=q_spec,
            scratch_shapes=[pltpu.VMEM((hb, BLOCK_Q, d), jnp.float32)],
        ),
        compiler_params=compiler_params,
        interpret=interp,
    )(tile_any, *operands)
    dq = dq.reshape(b, h, lq, d).transpose(0, 2, 1, 3)
    dq = dq * jnp.asarray(scale, dq.dtype)  # qs = q*scale => dL/dq = scale*dL/dqs

    # ---- dk, dv: grid (bg, ki, qi) ---------------------------------------
    q_spec_k = pl.BlockSpec((1, hb, BLOCK_Q, d), lambda bg, ki, qi, *_: (bg, 0, qi, 0))
    kv_spec = pl.BlockSpec((1, hb, BLOCK_K, d), lambda bg, ki, qi, *_: (bg, 0, ki, 0))
    lse_spec_k = pl.BlockSpec((1, hb, BLOCK_Q), lambda bg, ki, qi, *_: (bg, 0, qi))
    in_specs_k = [q_spec_k, kv_spec, kv_spec, q_spec_k, lse_spec_k, lse_spec_k]
    if has_mask:
        in_specs_k.append(
            pl.BlockSpec((1, BLOCK_Q, BLOCK_K), lambda bg, ki, qi, *_: (bg // g, qi, ki))
        )
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, nq=nq, g=g, has_mask=has_mask),
        out_shape=(
            jax.ShapeDtypeStruct((b * g, hb, lk, d), k.dtype),
            jax.ShapeDtypeStruct((b * g, hb, lk, d), v.dtype),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * g, nk, nq),
            in_specs=in_specs_k,
            out_specs=(kv_spec, kv_spec),
            scratch_shapes=[pltpu.VMEM((hb, BLOCK_K, d), jnp.float32),
                            pltpu.VMEM((hb, BLOCK_K, d), jnp.float32)],
        ),
        compiler_params=compiler_params,
        interpret=interp,
    )(tile_any, *operands)
    dk = dk.reshape(b, h, lk, d).transpose(0, 2, 1, 3)
    dv = dv.reshape(b, h, lk, d).transpose(0, 2, 1, 3)
    return dq, dk, dv


def flash_pallas_bwd_enabled() -> bool:
    """Kill switch: CAMC2V_FLASH_PALLAS_BWD=0 restores the chunked XLA VJP."""
    return _os.environ.get("CAMC2V_FLASH_PALLAS_BWD", "1") == "1"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash(q, k, v, has_mask, scale, mask):
    k, v, mask = _pad_keys(k, v, mask if has_mask else None, q.shape[1])
    return _flash_fwd(q, k, v, mask, scale)


def _flash_fwd_rule(q, k, v, has_mask, scale, mask):
    if flash_pallas_bwd_enabled():
        lk = k.shape[1]
        kp, vp, mp = _pad_keys(k, v, mask if has_mask else None, q.shape[1])
        out, lse = _flash_fwd(q, kp, vp, mp, scale, want_stats=True)
        return out, (q, kp, vp, mp, out, lse, lk)
    out = _flash(q, k, v, has_mask, scale, mask)
    return out, (q, k, v, mask, None, None, None)


def _flash_bwd_rule(has_mask, scale, res, g):
    q, k, v, mask, fwd_out, lse, lk = res

    if fwd_out is not None:
        # Pallas backward: k/v/mask in residuals are PADDED; un-pad dk/dv
        dq, dk, dv = _flash_bwd_impl(q, k, v, mask, fwd_out, lse, g, scale)
        dk = dk[:, :lk]
        dv = dv[:, :lk]
        if has_mask:
            import numpy as np

            # the PRIMAL mask (pre-padding) cotangent: bool => float0
            dmask = np.zeros((q.shape[0], q.shape[1], lk), dtype=jax.dtypes.float0)
        else:
            dmask = None
        return dq, dk, dv, dmask

    # chunked XLA fallback: recompute attention chunk-wise and differentiate
    # through the chunked reference — O(L * chunk) memory, exact gradients
    def f(q, k, v, mask):
        return _chunked_reference(q, k, v, mask if has_mask else None, scale)

    _, vjp = jax.vjp(f, q, k, v, mask)
    dq, dk, dv, _ = vjp(g)
    if mask is None:
        dmask = None
    else:
        import numpy as np

        dmask = np.zeros(mask.shape, dtype=jax.dtypes.float0)  # bool primal => float0 tangent
    return dq, dk, dv, dmask


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Fused attention over (B, L, H, D). mask: (B, Lq, Lk) bool, True=attend."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash(q, k, v, mask is not None, scale, mask)
