"""Epipolar flash attention v2: mask computed IN-KERNEL from epipolar lines.

The reference (and round-1 kernel) materialise the epipolar mask as
(B, L, L) bools in HBM — 570 MB per ds8 mask at the flagship config — then
stream it through the attention kernel (reference builds the same bools:
model/camcontexti2v.py:200-271). Profiling (round 2) shows the mask pipeline
costs ~10 ms/step in XLA mask-build fusions + layout copies on top of the
DMA traffic inside the kernel.

v2 exploits the mask's rank-3 structure:  dist(i, j) = |l_i . p_j|  where
l_i = normalize(F[t1, t2] @ p_i) is the epipolar line of query pixel i in key
frame t2 and p_j the key pixel coordinate. Inside the kernel each (q, k) tile
recomputes its mask tile with one tiny (BQ, 3) x (3, BK) matmul — no L x L
array ever exists.

Tile skipping is EXACTLY safe: for a key tile, the pixel-center hull is an
axis-aligned rectangle; |l . p| is linear in p, so min over the hull is 0 if
the corner values change sign, else min |corner value|. hull-min >= thresh
implies every discrete pixel is >= thresh, i.e. the tile is genuinely empty
(the converse may process a tile whose mask then kills everything — correct,
just not skipped). Empty tiles skip ALL compute via a scalar-prefetched
bitmap, which is where the real win over the round-1 kernel comes from: the
kernel is VPU-softmax bound, and typical epipolar masks light up only ~25-50%
of 256-wide key tiles.

Key layout contract: register tokens (always-visible learned context) sit at
the END of the key axis, padded to a full BLOCK_K tile (attention is
permutation-invariant in keys, so moving them from the reference's front
position is numerically identical).

Applicability: plain epipolar masks only (the flagship CamContextI2V /
configs/models/camcontexti2v_256.yaml path: no hybrid-attention fallbacks, no
only_self_pixel / current_frame_as_register variants). Those variants keep
the materialised-mask kernel (ops/flash_attention.py).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from camc2v_tpu.ops.flash_attention import M_FLOOR, NEG_INF, _head_group

BLOCK_Q = 256
# Swept on a v5e (round 2): BK=1024 matches the materialised-mask kernel's
# device time (10.9 vs 10.6 ms at flagship ds8) while deleting the whole mask
# pipeline (~10 ms/step of XLA mask-build fusions + relayout copies + 570 MB
# of HBM bools). Smaller tiles DO skip geometrically-empty tiles (34% at
# BK=256) but the per-grid-step overhead outweighs the saved VPU work:
# measured 14.5-14.9 ms at BK=256. Revisit with an in-kernel subtile loop.
BLOCK_K = 1024


def pix2coord(x, downsample):
    """Pixel index -> continuous image coordinate (reference epipolar.py:32-35)."""
    return x * downsample + downsample / 2.0 - 0.5


def epipolar_lines(F: jax.Array, h: int, w: int, downsample: int) -> jax.Array:
    """Normalised epipolar lines of every query pixel in every key frame.

    F: (B, T1, T2, 3, 3) fundamental matrices (f32).
    Returns lines (B, T1*h*w, T2, 3) f32 with ||l[:2]|| == 1 (NaN for F == 0,
    which the in-kernel `dist < thresh` comparison maps to all-False — the
    same semantics as the reference mask build).
    """
    F = F.astype(jnp.float32)
    b, t1, t2 = F.shape[:3]
    y = pix2coord(jnp.arange(h, dtype=jnp.float32), downsample)
    x = pix2coord(jnp.arange(w, dtype=jnp.float32), downsample)
    gy, gx = jnp.meshgrid(y, x, indexing="ij")
    grid = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1).reshape(h * w, 3)  # (hw, 3)
    # l[b, s, q, t, :] = F[b, s, t] @ p_q. HIGHEST: TPU einsum defaults to
    # bf16 passes, which perturbs borderline mask bits relative to the
    # kernel's exact f32 VPU distance math (r4a bisect: identical kernels
    # "failed" a default-precision XLA reference at ds16 only on real TPUs)
    lines = jnp.einsum("bstij,qj->bsqti", F, grid, precision=jax.lax.Precision.HIGHEST)
    norm = jnp.linalg.norm(lines[..., :2], axis=-1, keepdims=True)
    lines = lines / norm
    return lines.reshape(b, t1 * h * w, t2, 3)


def _tile_rect_corners(h: int, w: int, downsample: int, block_k: int):
    """(tiles_per_frame, 4, 3) pixel-center hull corners of each key tile.

    block_k consecutive raster pixels = block_k//w full image rows (block
    sizes are chosen so w | block_k).
    """
    rows_per_tile = block_k // w
    tpf = (h * w) // block_k
    x0 = pix2coord(0.0, downsample)
    x1 = pix2coord(float(w - 1), downsample)
    corners = []
    for s in range(tpf):
        y0 = pix2coord(float(s * rows_per_tile), downsample)
        y1 = pix2coord(float((s + 1) * rows_per_tile - 1), downsample)
        corners.append([[x0, y0, 1.0], [x1, y0, 1.0], [x0, y1, 1.0], [x1, y1, 1.0]])
    import numpy as np

    return np.asarray(corners, dtype=np.float32)


SUBTILE = 256  # skip granularity within a k-tile (swept: 26% kernel win at ds8)


def choose_block_k(hw: int) -> int:
    """The canonical k-tile size for a level: BLOCK_K when it tiles the frame
    layout (divides hw or spans whole frames), else one frame per tile.
    Single source of truth for the sampler prep, the penalty materialiser and
    the module dispatch — tile maps built for a different tiling would make
    the kernel's scalar-prefetch reads silently wrong."""
    return BLOCK_K if (hw % BLOCK_K == 0 or BLOCK_K % hw == 0) else hw


def kernel_tiling_ok(t: int, hw: int, block_k: int) -> bool:
    """Shape-eligibility of the Pallas kernel at this level (head-dim checks
    are the caller's concern)."""
    return min(block_k, hw) >= 256 and (t * hw) % block_k == 0 and (t * hw) % BLOCK_Q == 0


def epipolar_tile_map(
    lines: jax.Array, t: int, h: int, w: int, downsample: int,
    block_q: int = BLOCK_Q, block_k: int = BLOCK_K,
) -> jax.Array:
    """(B, nQ, (nK+1)*NSUB) int32 bitmap of SUBTILE-granular key-range
    visibility per q-tile, flattened for SMEM (4-D scalar operands tile-pad
    catastrophically).

    Exactly-safe: a subtile is marked empty only when the continuous hull
    distance of every query line is >= thresh, which lower-bounds the discrete
    pixel distance. The hull min/max of the affine a*x + b*y + c over an
    axis-aligned rectangle separates per axis (min_corners = min(a*x0, a*x1)
    + min(b*y0, b*y1) + c), so no 4-corner enumeration is materialised — the
    naive (B, Lq, T, tiles, 4) corner einsum cost ~7 ms/step and STALLED the
    kernel through its scalar-prefetch dependency.

    The register tile contributes one active subtile (the learned tokens live
    in its first SUBTILE positions).
    """
    b, lq, t2, _ = lines.shape
    hw = h * w
    sub = min(SUBTILE, block_k, hw)
    nsub = block_k // sub
    rows_per_sub = sub // w
    n_subs_frame = hw // sub
    thresh = downsample * math.sqrt(2.0) / 2.0

    a = lines[..., 0]  # (B, Lq, T2)
    bb = lines[..., 1]
    c = lines[..., 2]
    x0 = pix2coord(0.0, downsample)
    x1 = pix2coord(float(w - 1), downsample)
    y0s = pix2coord(
        jnp.arange(n_subs_frame, dtype=jnp.float32) * rows_per_sub, downsample
    )  # (n_subs_frame,)
    y1s = pix2coord(
        (jnp.arange(n_subs_frame, dtype=jnp.float32) + 1) * rows_per_sub - 1, downsample
    )
    ax_min = jnp.minimum(a * x0, a * x1)  # (B, Lq, T2)
    ax_max = jnp.maximum(a * x0, a * x1)
    by0 = bb[..., None] * y0s  # (B, Lq, T2, S)
    by1 = bb[..., None] * y1s
    by_min = jnp.minimum(by0, by1)
    by_max = jnp.maximum(by0, by1)
    vmin = ax_min[..., None] + by_min + c[..., None]  # (B, Lq, T2, S)
    vmax = ax_max[..., None] + by_max + c[..., None]
    sign_change = (vmin < 0) & (vmax > 0)
    # all corners same sign: min |v| over the hull is vmin (all > 0) or -vmax
    min_abs = jnp.where(sign_change, 0.0, jnp.where(vmin > 0, vmin, -vmax))
    hit = min_abs < thresh  # NaN-lines -> False
    nq = lq // block_q
    hit = hit.reshape(b, nq, block_q, t2 * n_subs_frame).any(axis=2)
    reg = jnp.zeros((b, nq, nsub), bool).at[..., 0].set(True)
    return jnp.concatenate([hit, reg], axis=-1).astype(jnp.int32)


def _sub_pen_factory(
    lines_ref, ki, reg_flag, kidx0,
    *, block_k, hw, w, downsample, thresh, num_registers, sub,
):
    """Shared penalty-tile builder of the forward and backward kernels.

    Returns sub_pen(j) -> (BQ, sub) additive penalty of key sub-range j
    (epipolar mask band / register blend). Pixel coordinates are COMPILE-TIME
    constants whenever the sub-range's frame offset is static (every flagship
    layout: tile == frame or tile spans whole frames) — traced integer div/mod
    on the VPU doubled the kernel when coords were derived from the grid index.
    """

    def sub_pen(j):
        flat = j * sub  # static position of the sub-range within the tile
        tpf = max(1, hw // block_k)
        if block_k <= hw:
            line_row = 0
            if tpf == 1:
                off = flat  # tile == frame: fully static
            else:
                off = (ki % tpf) * block_k + flat  # traced (no flagship case)
        else:
            off = flat % hw  # whole frames per tile: static
            line_row = flat // hw
        # `off` is a python int on every flagship layout, so kfree depends only
        # on the iota — loop-invariant and hoistable (pallas_call rejects
        # captured constant arrays, so it cannot be a precomputed table)
        kfree = off + kidx0
        px = pix2coord((kfree % w).astype(jnp.float32), downsample)  # (1, sub)
        py = pix2coord((kfree // w).astype(jnp.float32), downsample)
        lines = lines_ref[0, line_row]  # (BQ, 3)
        dist = jnp.abs(lines[:, 0:1] * px + lines[:, 1:2] * py + lines[:, 2:3])
        # Mosaic mis-lowers selects mixing broadcast scalar predicates with
        # i1 vectors — blend the two penalties arithmetically
        pen_mask = jnp.where(dist < thresh, 0.0, NEG_INF)  # (BQ, sub)
        pen_reg = jnp.where(j * sub + kidx0 < num_registers, 0.0, NEG_INF)
        return pen_mask * (1.0 - reg_flag) + jnp.broadcast_to(pen_reg, pen_mask.shape) * reg_flag

    return sub_pen


def _v2_kernel(
    sub_any_ref, q_ref, k_ref, v_ref, lines_ref, o_ref, *rest,
    nk, g, block_k, w, hw, downsample, thresh, num_registers, sub,
    token_major, kv_resident=False, with_stats=False,
):
    """Online-softmax attention over one (q-tile, k-tile) pair with the mask
    computed in-kernel and SUBTILE-granular skipping.

    The inner static loop visits block_k//sub key sub-ranges; each runs its
    QK dot, line-distance mask, and softmax-state update only when the
    scalar-prefetched hull-bound bitmap says the sub-range can be visible.
    Skipping at sub-range granularity inside one grid step avoids the
    per-grid-step overhead that made a BK=256 grid slower despite 34% skips
    (swept on a v5e: 7.4 ms vs 10.0 ms per ds8 flagship layer).

    With `with_stats` an extra (1, Hb, BQ) output receives the per-row
    logsumexp (masked rows get +1e30 so the backward's exp(s - lse) is 0),
    consumed by the Pallas backward kernels.
    """
    if with_stats:
        lse_ref, m_scratch, l_scratch, acc_scratch = rest
    else:
        m_scratch, l_scratch, acc_scratch = rest
    bg = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nsub = block_k // sub

    @pl.when(ki == 0)
    def _():
        m_scratch[:] = jnp.full_like(m_scratch, M_FLOOR)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    qb = q_ref[0]  # (Hb, BQ, D) — scale pre-folded
    is_register_tile = ki == nk - 1
    reg_flag = is_register_tile.astype(jnp.float32)  # traced scalar 0/1
    kidx0 = jax.lax.broadcasted_iota(jnp.int32, (1, sub), 1)
    sub_pen = _sub_pen_factory(
        lines_ref, ki, reg_flag, kidx0, block_k=block_k, hw=hw, w=w,
        downsample=downsample, thresh=thresh, num_registers=num_registers, sub=sub,
    )

    def update(s, vb):
        m_prev = m_scratch[:]
        m_new = jnp.maximum(jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True)), M_FLOOR)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_scratch[:] = alpha * l_scratch[:] + jnp.sum(p, axis=2, keepdims=True)
        acc_scratch[:] = acc_scratch[:] * alpha + jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        m_scratch[:] = m_new

    # kv_resident: k_ref/v_ref hold the WHOLE key axis (their block index map
    # is constant, so Mosaic DMAs them once per bg instead of re-streaming
    # every (qi, ki) step — ~2.8 GB -> 44 MB per ds8 site); tiles are sliced
    # out at a ki-dependent (256-aligned) offset.
    kbase = ki * block_k if kv_resident else 0

    if block_k <= hw or hw > sub:
        # sub-ranges finer than a frame: skip each independently (26% ds8 win —
        # softmax-state updates are cheap relative to the skipped dot+mask+exp
        # work). Covers both one-frame tiles (block_k <= hw) and multi-frame
        # tiles at high-res levels (hw > SUBTILE), where sub_pen's line_row /
        # pixel offsets stay compile-time static.
        for j in range(nsub):
            @pl.when(sub_any_ref[bg // g, qi, ki * nsub + j] != 0)
            def _(j=j):
                kb = k_ref[0, :, pl.ds(kbase + j * sub, sub), :]
                vb = v_ref[0, :, pl.ds(kbase + j * sub, sub), :]
                s = jax.lax.dot_general(
                    qb, kb, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
                ) + sub_pen(j)[None]
                update(s, vb)
    else:
        # tile spans several whole frames AND subtiles == frames
        # (low-resolution levels, where frame-pair visibility is ~always 1):
        # splitting the update per frame measured SLOWER (2.8 vs 1.7 ms at
        # ds16) — run one batched dot + ONE softmax update with concatenated
        # penalties, skipping only when the whole tile is invisible
        any_sub = sub_any_ref[bg // g, qi, ki * nsub]
        for j in range(1, nsub):
            any_sub = any_sub | sub_any_ref[bg // g, qi, ki * nsub + j]

        @pl.when(any_sub != 0)
        def _():
            kb = k_ref[0, :, pl.ds(kbase, block_k), :] if kv_resident else k_ref[0]
            vb = v_ref[0, :, pl.ds(kbase, block_k), :] if kv_resident else v_ref[0]
            s = jax.lax.dot_general(
                qb, kb, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )
            pen = jnp.concatenate([sub_pen(j) for j in range(nsub)], axis=1)
            update(s + pen[None], vb)

    @pl.when(ki == nk - 1)
    def _():
        l = l_scratch[:]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        out = acc_scratch[:] / safe_l  # (Hb, BQ, D)
        if token_major:
            # token-major write: letting XLA fold the (B,H,L,D)->(B,L,H,D)
            # transpose into the custom-call result layout made every STORE
            # strided and doubled the kernel time (14.75 vs 7.2 ms at ds8);
            # the VMEM-local swap here is free by comparison
            o_ref[0] = jnp.swapaxes(out, 0, 1).astype(o_ref.dtype)
        else:
            o_ref[0] = out.astype(o_ref.dtype)
        if with_stats:
            m = m_scratch[:, :, 0]  # (Hb, BQ)
            lv = l_scratch[:, :, 0]
            # masked rows (l == 0) get +1e30 so the backward's exp(s - lse)
            # is exactly 0 — matching the forward's zeroed output rows
            lse_ref[0] = jnp.where(
                lv == 0.0, 1e30, m + jnp.log(jnp.maximum(lv, 1e-30))
            )


def materialize_penalties(
    lines: jax.Array, t: int, h: int, w: int, downsample: int,
    num_registers: int, block_k: int, dtype=jnp.bfloat16,
) -> jax.Array:
    """(B, Lq, Lk) additive attention penalties (0 visible / NEG_INF hidden).

    The kernel-ready form of the epipolar mask: frame tokens use the
    `dist < thresh` band, the trailing block_k tile holds `num_registers`
    always-visible register tokens + hidden padding. bf16 holds -1e30 exactly
    (8-bit exponent), so the precomputed tiles halve mask bandwidth vs i32.

    Geometry-only — samplers build this ONCE per generation and reuse it for
    all 25 denoise steps, trading ~0.5 GB of HBM (flagship ds8, fused-CFG b=2)
    for the per-step in-kernel `|l . p|` distance math (the dominant VPU cost
    of the v2 kernel next to the softmax chain).
    """
    b, lq = lines.shape[:2]
    mask = materialize_mask(lines, t, h, w, downsample)
    reg = jnp.arange(block_k) < num_registers
    full = jnp.concatenate(
        [mask, jnp.broadcast_to(reg[None, None], (b, lq, block_k))], axis=-1
    )
    return jnp.where(full, 0.0, NEG_INF).astype(dtype)


def _v2p_kernel(
    sub_any_ref, q_ref, k_ref, v_ref, pen_ref, o_ref,
    m_scratch, l_scratch, acc_scratch,
    *, nk, g, block_k, hw, sub, token_major, kv_resident=False,
):
    """Precomputed-penalty variant of `_v2_kernel`: the mask arrives as bf16
    additive penalty tiles streamed from HBM instead of being recomputed from
    epipolar lines every step. Same online softmax, same SUBTILE skipping off
    the scalar-prefetched hull bitmap; register/pad columns are encoded in the
    penalties, so the register-tile special case disappears.
    """
    bg = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nsub = block_k // sub

    @pl.when(ki == 0)
    def _():
        m_scratch[:] = jnp.full_like(m_scratch, M_FLOOR)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    qb = q_ref[0]  # (Hb, BQ, D) — scale pre-folded

    def update(s, vb):
        m_prev = m_scratch[:]
        m_new = jnp.maximum(jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True)), M_FLOOR)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_scratch[:] = alpha * l_scratch[:] + jnp.sum(p, axis=2, keepdims=True)
        acc_scratch[:] = acc_scratch[:] * alpha + jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        m_scratch[:] = m_new

    # kv_resident composition: k_ref/v_ref hold the whole key axis (constant
    # block index map); penalty tiles still stream per grid step (one bf16
    # (BQ, BK) tile is ~0.5 MB — resident penalties would blow VMEM)
    kbase = ki * block_k if kv_resident else 0

    if block_k <= hw or hw > sub:
        for j in range(nsub):
            @pl.when(sub_any_ref[bg // g, qi, ki * nsub + j] != 0)
            def _(j=j):
                kb = k_ref[0, :, pl.ds(kbase + j * sub, sub), :]
                vb = v_ref[0, :, pl.ds(kbase + j * sub, sub), :]
                pen = pen_ref[0, :, j * sub:(j + 1) * sub].astype(jnp.float32)
                s = jax.lax.dot_general(
                    qb, kb, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
                ) + pen[None]
                update(s, vb)
    else:
        any_sub = sub_any_ref[bg // g, qi, ki * nsub]
        for j in range(1, nsub):
            any_sub = any_sub | sub_any_ref[bg // g, qi, ki * nsub + j]

        @pl.when(any_sub != 0)
        def _():
            kb = k_ref[0, :, pl.ds(kbase, block_k), :] if kv_resident else k_ref[0]
            vb = v_ref[0, :, pl.ds(kbase, block_k), :] if kv_resident else v_ref[0]
            s = jax.lax.dot_general(
                qb, kb, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
            ) + pen_ref[0].astype(jnp.float32)[None]
            update(s, vb)

    @pl.when(ki == nk - 1)
    def _():
        l = l_scratch[:]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        out = acc_scratch[:] / safe_l
        if token_major:
            o_ref[0] = jnp.swapaxes(out, 0, 1).astype(o_ref.dtype)
        else:
            o_ref[0] = out.astype(o_ref.dtype)


def _epipolar_flash_fwd_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    lines: jax.Array,
    tile_any: jax.Array,
    penalties: Optional[jax.Array] = None,
    *,
    t: int,
    h: int,
    w: int,
    downsample: int,
    num_registers: int,
    scale: float,
    block_q: int = BLOCK_Q,
    block_k: int = BLOCK_K,
    want_stats: bool = False,
) -> jax.Array:
    """Forward epipolar attention with in-kernel masks.

    q: (B, Lq=t*h*w, H, D).
    k, v: (B, Lk, H, D) with Lk = t*h*w + pad; the LAST pad block holds the
      register tokens (first `num_registers` of it), zero-padded to a full
      block_k tile by the caller.
    lines: (B, Lq, t, 3) from `epipolar_lines`.
    tile_any: (B, nQ, nK*NSUB) int32 from `epipolar_tile_map` — precomputable
      (it depends only on camera geometry, so samplers hoist it out of the
      denoise scan; a slow producer of this scalar-prefetch operand STALLS
      the custom-call).
    """
    b, lq, heads, d = q.shape
    lk = k.shape[1]
    hw = h * w
    # Lq is decoupled from the key layout: square (self) attention has
    # lq == t*h*w; the conditional-adaptor path attends t_q*h*w learned
    # queries over t = 1+n_ctx key frames (lines carry one row per query).
    assert lines.shape == (b, lq, t, 3), (lines.shape, (b, lq, t, 3))
    assert lk == t * h * w + block_k, (lq, lk, t, h, w, block_k)
    assert (hw % block_k == 0) or (block_k % hw == 0 and (t * hw) % block_k == 0)
    assert lq % block_q == 0
    nq = lq // block_q
    nk = lk // block_k
    tiles_per_frame = max(1, hw // block_k)
    frames_per_tile = max(1, block_k // hw)
    sub = min(SUBTILE, block_k, hw)
    thresh = downsample * math.sqrt(2.0) / 2.0
    # a tile map built for a DIFFERENT (block_q, block_k, SUBTILE) tiling would
    # make the scalar-prefetch reads silently wrong (skipped/included subtiles
    # with no error outside interpret mode) — reject it loudly instead
    assert tile_any.shape == (b, nq, nk * (block_k // sub)), (
        tile_any.shape, (b, nq, nk * (block_k // sub)))

    # kv-resident mode: hold the WHOLE key axis in VMEM with a constant block
    # index, so Mosaic DMAs k/v once per (batch, head-group) instead of
    # re-streaming them for every q-tile (the measured 6.4 ms fixed cost of
    # the BQ sweep, PERF.md). v5e VMEM is 128 MB; budget resident k+v
    # (conservatively assume Mosaic double-buffers them) at 48 MB and pick the
    # LARGEST head group that fits — at flagship ds8 (heads=5, Lk=17408,
    # d=64) the double-buffered full-heads footprint is 2*2*5*17408*64*2 =
    # 44.6 MB <= 48 MB, so EVERY flagship level already runs full-heads
    # residency (g=1, token-major output). (An earlier comment claimed 89 MB
    # and per-head ds8 residency — an arithmetic slip caught by the r4
    # advisor; the r5a "raise the budget to 90 MB" queue premised on it was
    # a no-op A/B and was dropped. CAMC2V_EPI_LOG_DISPATCH=1 prints the
    # selected (g, hb, token_major) per site at trace time to check.)
    # DEFAULT ON since round 4: verified correct at every flagship shape
    # (tools/bench_epi_bisect.py ladders, full value checks) and measured
    # 163.5 -> 155.5 ms/step on the flagship UNet A/B (fetch-synchronized
    # timing; the r3q "crash" was a tunnel timing artifact). Kill switch:
    # CAMC2V_EPI_KV_RESIDENT=0.
    kv_resident = False
    hb = 0
    if os.environ.get("CAMC2V_EPI_KV_RESIDENT", "1") == "1":
        budget = int(float(os.environ.get("CAMC2V_EPI_RESIDENT_VMEM_MB", "48")) * 1024 * 1024)
        for cand in range(heads, 0, -1):
            if heads % cand == 0 and 2 * 2 * cand * lk * d * 2 <= budget:
                kv_resident, hb = True, cand
                break
    if not kv_resident:
        # the precomputed-penalty variant streams a (BQ, BK) bf16 tile per
        # grid step — account it like a mask tile when sizing the head group
        # (has_mask models an i32 tile, a safe overestimate for bf16)
        hb = _head_group(heads, d, block_q, block_k, has_mask=penalties is not None)
    g = heads // hb
    if os.environ.get("CAMC2V_EPI_LOG_DISPATCH") == "1":
        print(
            f"[epi dispatch] t={t} hw={hw} lk={lk} heads={heads} "
            f"kv_resident={kv_resident} hb={hb} g={g} token_major={g == 1}",
            flush=True,
        )
    qt = (q * jnp.asarray(scale, q.dtype)).transpose(0, 2, 1, 3).reshape(b * g, hb, lq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * g, hb, lk, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * g, hb, lk, d)

    q_spec = pl.BlockSpec((1, hb, block_q, d), lambda bg, qi, ki, *_: (bg, 0, qi, 0))
    if kv_resident:
        k_spec = pl.BlockSpec((1, hb, lk, d), lambda bg, qi, ki, *_: (bg, 0, 0, 0))
    else:
        k_spec = pl.BlockSpec((1, hb, block_k, d), lambda bg, qi, ki, *_: (bg, 0, ki, 0))
    # Single head group: write (B, Lq, H, D) token-major straight from the
    # kernel. With g > 1 the head-block dim hb < heads violates Mosaic's
    # block constraints, so those levels keep the heads-major output + an XLA
    # transpose (cheap at the small low-resolution shapes where g > 1).
    token_major = g == 1
    if token_major:
        o_spec = pl.BlockSpec((1, block_q, hb, d), lambda bg, qi, ki, *_: (bg, qi, 0, 0))
    else:
        o_spec = pl.BlockSpec((1, hb, block_q, d), lambda bg, qi, ki, *_: (bg, 0, qi, 0))
    # lines arrive (B, Lq, T, 3); transpose to (B, T, Lq, 3) so the sliced
    # block's last two dims (BQ, 3) satisfy Mosaic's (8, 128)-or-full rule.
    # Block = the lines of this q-tile in the key frame of tile ki (clamped
    # into range for the register tile, where the kernel ignores it).
    lines_t = jnp.swapaxes(lines.astype(jnp.float32), 1, 2)
    if frames_per_tile == 1:
        lines_spec = pl.BlockSpec(
            (1, 1, block_q, 3),
            lambda bg, qi, ki, *_, _tpf=tiles_per_frame, _t=t: (
                bg // g, jnp.minimum(ki // _tpf, _t - 1), qi, 0
            ),
        )
    else:
        # tile spans frames [ki*fpt, (ki+1)*fpt); block index is in fpt units
        lines_spec = pl.BlockSpec(
            (1, frames_per_tile, block_q, 3),
            lambda bg, qi, ki, *_, _fpt=frames_per_tile, _t=t: (
                bg // g, jnp.minimum(ki, _t // _fpt - 1), qi, 0
            ),
        )
    scratch = [
        pltpu.VMEM((hb, block_q, 1), jnp.float32),
        pltpu.VMEM((hb, block_q, 1), jnp.float32),
        pltpu.VMEM((hb, block_q, d), jnp.float32),
    ]
    if penalties is not None:
        # batch-shared penalties: a (pb, Lq, Lk) array with pb | b is indexed
        # modulo pb, so the fused-CFG stack (cond, uc in one batch-2B launch,
        # identical camera geometry) streams ONE copy instead of a duplicated
        # ~1 GB concat
        pb = penalties.shape[0]
        assert b % pb == 0 and penalties.shape[1:] == (lq, lk), (
            penalties.shape, (b, lq, lk))
        pen_spec = pl.BlockSpec(
            (1, block_q, block_k), lambda bg, qi, ki, *_, _pb=pb: ((bg // g) % _pb, qi, ki)
        )
        kernel = functools.partial(
            _v2p_kernel, nk=nk, g=g, block_k=block_k, hw=hw, sub=sub,
            token_major=token_major, kv_resident=kv_resident,
        )
        last_in = (penalties, pen_spec)
    else:
        kernel = functools.partial(
            _v2_kernel, nk=nk, g=g, block_k=block_k, w=w, hw=hw, downsample=downsample,
            thresh=thresh, num_registers=num_registers, sub=sub, token_major=token_major,
            kv_resident=kv_resident, with_stats=want_stats,
        )
        last_in = (lines_t, lines_spec)
    assert not (want_stats and penalties is not None), "stats only on the in-kernel-mask path"
    out_shapes = jax.ShapeDtypeStruct(
        (b, lq, heads, d) if token_major else (b * g, hb, lq, d), q.dtype
    )
    out_specs = o_spec
    if want_stats:
        # per-row logsumexp for the Pallas backward; heads-major (B*g, Hb, Lq)
        lse_spec = pl.BlockSpec((1, hb, block_q), lambda bg, qi, ki, *_: (bg, 0, qi))
        out_shapes = (out_shapes, jax.ShapeDtypeStruct((b * g, hb, lq), jnp.float32))
        out_specs = (o_spec, lse_spec)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * g, nq, nk),
        in_specs=[q_spec, k_spec, k_spec, last_in[1]],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # BQ=512 needs 16.25 MB scoped vmem (256 KB over the 16 MB Mosaic
            # default); v5e physical VMEM is far larger — scale the limit with
            # the tile sizes so bigger tiles (fewer grid steps) can compile.
            # kv-resident mode holds whole (double-buffered) k/v in VMEM: size
            # the limit off the ACTUAL residency (which tracks the env budget,
            # CAMC2V_EPI_RESIDENT_VMEM_MB) plus q/penalty/scratch headroom, so
            # raising the budget past the old fixed 100 MB still compiles.
            vmem_limit_bytes=(
                max(100 * 1024 * 1024,
                    2 * 2 * hb * lk * d * 2 + 32 * 1024 * 1024) if kv_resident
                else max(1, block_q // 256, block_k // 1024) * 24 * 1024 * 1024
            ),
        ),
        interpret=jax.default_backend() == "cpu",
    )(tile_any, qt, kt, vt, last_in[0])
    lse = None
    if want_stats:
        out, lse = out
    if not token_major:
        out = out.reshape(b, heads, lq, d).transpose(0, 2, 1, 3)
    if want_stats:
        return out, lse
    return out




# --------------------------------------------------------------- Pallas VJP
# Flash-style backward with the epipolar mask recomputed in-kernel (round 4).
# The previous backward — an XLA chunked recompute with MATERIALISED per-chunk
# masks under jax.checkpoint — is ~200-250 ms of the 580 ms flagship train
# call (docs/profiles r4 train trace: the lax.map whiles + pred[256, Lk] mask
# copies + f32 logits einsums). These kernels replace it with the standard
# dq / dk+dv sweeps: p = exp(s - lse) from the forward's logsumexp output,
# ds = p * (dp - delta), penalties re-derived from epipolar lines exactly as
# the forward kernel does (shared _sub_pen_factory — bit-identical mask bits).
# Gated by CAMC2V_EPI_PALLAS_BWD until the TPU A/B lands; the in-kernel-mask
# path only (training never passes precomputed penalties).


def _v2_bwd_dq_kernel(
    sub_any_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, lines_ref,
    dq_ref, dq_scratch,
    *, nk, g, block_k, w, hw, downsample, thresh, num_registers, sub,
    token_major,
):
    """dq = scale * sum_k ds . k  over k-tiles (grid: bg, qi, ki-arbitrary).

    q arrives pre-scaled (qs = q * scale, as in the forward), so s = qs.k^T
    and the chain rule gives dq = scale * (ds @ k). Sub-range skipping reuses
    the forward's exactly-safe hull bitmap: a geometrically invisible
    sub-range has p == 0 => ds == 0, so skipping is exact in the backward too.
    """
    bg = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nsub = block_k // sub

    @pl.when(ki == 0)
    def _():
        dq_scratch[:] = jnp.zeros_like(dq_scratch)

    qb = q_ref[0]            # (Hb, BQ, D) — pre-scaled
    dob = do_ref[0]          # (Hb, BQ, D)
    lse = lse_ref[0]         # (Hb, BQ)
    delta = delta_ref[0]     # (Hb, BQ)
    is_register_tile = ki == nk - 1
    reg_flag = is_register_tile.astype(jnp.float32)
    kidx0 = jax.lax.broadcasted_iota(jnp.int32, (1, sub), 1)
    sub_pen = _sub_pen_factory(
        lines_ref, ki, reg_flag, kidx0, block_k=block_k, hw=hw, w=w,
        downsample=downsample, thresh=thresh, num_registers=num_registers, sub=sub,
    )

    for j in range(nsub):
        @pl.when(sub_any_ref[bg // g, qi, ki * nsub + j] != 0)
        def _(j=j):
            kb = k_ref[0, :, j * sub:(j + 1) * sub, :]
            vb = v_ref[0, :, j * sub:(j + 1) * sub, :]
            s = jax.lax.dot_general(
                qb, kb, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
            ) + sub_pen(j)[None]
            p = jnp.exp(s - lse[:, :, None])
            dp = jax.lax.dot_general(
                dob, vb, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )
            ds = p * (dp - delta[:, :, None])
            dq_scratch[:] = dq_scratch[:] + jax.lax.dot_general(
                ds.astype(kb.dtype), kb, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )

    @pl.when(ki == nk - 1)
    def _():
        out = dq_scratch[:]
        if token_major:
            dq_ref[0] = jnp.swapaxes(out, 0, 1).astype(dq_ref.dtype)
        else:
            dq_ref[0] = out.astype(dq_ref.dtype)


def _v2_bwd_dkv_kernel(
    sub_any_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, lines_ref,
    dk_ref, dv_ref, dk_scratch, dv_scratch,
    *, nk, nq, g, block_k, w, hw, downsample, thresh, num_registers, sub,
    token_major,
):
    """dk = scale-folded sum_q ds^T . qs;  dv = sum_q p^T . dout.

    Grid (bg, ki, qi-arbitrary): one k-tile per (bg, ki), accumulated over all
    q-tiles; k/v block indices ignore qi so Mosaic DMAs them once per tile.
    Using the PRE-SCALED qs for dk folds the scale automatically
    (s = qs.k^T  =>  ds/dk = qs).
    """
    bg = pl.program_id(0)
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    nsub = block_k // sub

    @pl.when(qi == 0)
    def _():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    qb = q_ref[0]            # (Hb, BQ, D) — pre-scaled
    dob = do_ref[0]
    lse = lse_ref[0]
    delta = delta_ref[0]
    is_register_tile = ki == nk - 1
    reg_flag = is_register_tile.astype(jnp.float32)
    kidx0 = jax.lax.broadcasted_iota(jnp.int32, (1, sub), 1)
    sub_pen = _sub_pen_factory(
        lines_ref, ki, reg_flag, kidx0, block_k=block_k, hw=hw, w=w,
        downsample=downsample, thresh=thresh, num_registers=num_registers, sub=sub,
    )

    for j in range(nsub):
        @pl.when(sub_any_ref[bg // g, qi, ki * nsub + j] != 0)
        def _(j=j):
            kb = k_ref[0, :, j * sub:(j + 1) * sub, :]
            vb = v_ref[0, :, j * sub:(j + 1) * sub, :]
            s = jax.lax.dot_general(
                qb, kb, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
            ) + sub_pen(j)[None]
            p = jnp.exp(s - lse[:, :, None])  # (Hb, BQ, sub)
            dp = jax.lax.dot_general(
                dob, vb, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )
            ds = p * (dp - delta[:, :, None])
            # contract the BQ axis: p^T @ dout and ds^T @ qs, batched over Hb
            dv_scratch[:, j * sub:(j + 1) * sub, :] = dv_scratch[
                :, j * sub:(j + 1) * sub, :
            ] + jax.lax.dot_general(
                p.astype(dob.dtype), dob, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            dk_scratch[:, j * sub:(j + 1) * sub, :] = dk_scratch[
                :, j * sub:(j + 1) * sub, :
            ] + jax.lax.dot_general(
                ds.astype(qb.dtype), qb, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )

    @pl.when(qi == nq - 1)
    def _():
        if token_major:
            dk_ref[0] = jnp.swapaxes(dk_scratch[:], 0, 1).astype(dk_ref.dtype)
            dv_ref[0] = jnp.swapaxes(dv_scratch[:], 0, 1).astype(dv_ref.dtype)
        else:
            dk_ref[0] = dk_scratch[:].astype(dk_ref.dtype)
            dv_ref[0] = dv_scratch[:].astype(dv_ref.dtype)


def _epipolar_flash_bwd_impl(
    q, k, v, lines, tile_any, out, lse, dout,
    *, t, h, w, downsample, num_registers, scale,
    block_q=BLOCK_Q, block_k=BLOCK_K,
):
    """(dq, dk, dv) via the two backward kernels (in-kernel-mask path only)."""
    b, lq, heads, d = q.shape
    lk = k.shape[1]
    hw = h * w
    nq = lq // block_q
    nk = lk // block_k
    frames_per_tile = max(1, block_k // hw)
    tiles_per_frame = max(1, hw // block_k)
    sub = min(SUBTILE, block_k, hw)
    thresh = downsample * math.sqrt(2.0) / 2.0

    # head grouping: size off q/do/k/v tiles + both scratch accumulators
    hb = heads
    budget = 64 * 1024 * 1024
    while hb > 1 and (
        hb * (2 * block_q * d * 2 + 2 * block_k * d * 2 + 2 * block_k * d * 4) > budget
        or heads % hb != 0
    ):
        hb -= 1
    while heads % hb != 0:
        hb -= 1
    g = heads // hb
    token_major = g == 1

    qs = (q * jnp.asarray(scale, q.dtype)).transpose(0, 2, 1, 3).reshape(b * g, hb, lq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * g, hb, lk, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * g, hb, lk, d)
    dot = dout.transpose(0, 2, 1, 3).reshape(b * g, hb, lq, d)
    # delta = rowsum(dout * out) per (head, query) — tiny XLA reduce
    delta = jnp.sum(dout.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = delta.transpose(0, 2, 1).reshape(b * g, hb, lq)
    lse = lse.reshape(b * g, hb, lq)

    q_spec = pl.BlockSpec((1, hb, block_q, d), lambda bg, i, j, *_: (bg, 0, i, 0))
    lse_spec = pl.BlockSpec((1, hb, block_q), lambda bg, i, j, *_: (bg, 0, i))
    lines_t = jnp.swapaxes(lines.astype(jnp.float32), 1, 2)
    common = dict(
        g=g, block_k=block_k, w=w, hw=hw, downsample=downsample, thresh=thresh,
        num_registers=num_registers, sub=sub, token_major=token_major,
    )
    interp = jax.default_backend() == "cpu"
    vmem = max(128 * 1024 * 1024, 1)

    # ---- dq: grid (bg, qi, ki) -------------------------------------------
    k_spec_q = pl.BlockSpec((1, hb, block_k, d), lambda bg, qi, ki, *_: (bg, 0, ki, 0))
    if frames_per_tile == 1:
        lines_spec_q = pl.BlockSpec(
            (1, 1, block_q, 3),
            lambda bg, qi, ki, *_, _tpf=tiles_per_frame, _t=t: (
                bg // g, jnp.minimum(ki // _tpf, _t - 1), qi, 0),
        )
    else:
        lines_spec_q = pl.BlockSpec(
            (1, frames_per_tile, block_q, 3),
            lambda bg, qi, ki, *_, _fpt=frames_per_tile, _t=t: (
                bg // g, jnp.minimum(ki, _t // _fpt - 1), qi, 0),
        )
    dq_spec = (pl.BlockSpec((1, block_q, hb, d), lambda bg, qi, ki, *_: (bg, qi, 0, 0))
               if token_major else
               pl.BlockSpec((1, hb, block_q, d), lambda bg, qi, ki, *_: (bg, 0, qi, 0)))
    dq = pl.pallas_call(
        functools.partial(_v2_bwd_dq_kernel, nk=nk, **common),
        out_shape=jax.ShapeDtypeStruct(
            (b, lq, heads, d) if token_major else (b * g, hb, lq, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * g, nq, nk),
            in_specs=[q_spec, k_spec_q, k_spec_q, q_spec, lse_spec, lse_spec, lines_spec_q],
            out_specs=dq_spec,
            scratch_shapes=[pltpu.VMEM((hb, block_q, d), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vmem,
        ),
        interpret=interp,
    )(tile_any, qs, kt, vt, dot, lse, delta, lines_t)
    if not token_major:
        dq = dq.reshape(b, heads, lq, d).transpose(0, 2, 1, 3)
    dq = dq * jnp.asarray(scale, dq.dtype)  # qs = q*scale => dL/dq = scale*dL/dqs

    # ---- dk, dv: grid (bg, ki, qi) ---------------------------------------
    q_spec_k = pl.BlockSpec((1, hb, block_q, d), lambda bg, ki, qi, *_: (bg, 0, qi, 0))
    lse_spec_k = pl.BlockSpec((1, hb, block_q), lambda bg, ki, qi, *_: (bg, 0, qi))
    kv_spec = pl.BlockSpec((1, hb, block_k, d), lambda bg, ki, qi, *_: (bg, 0, ki, 0))
    if frames_per_tile == 1:
        lines_spec_k = pl.BlockSpec(
            (1, 1, block_q, 3),
            lambda bg, ki, qi, *_, _tpf=tiles_per_frame, _t=t: (
                bg // g, jnp.minimum(ki // _tpf, _t - 1), qi, 0),
        )
    else:
        lines_spec_k = pl.BlockSpec(
            (1, frames_per_tile, block_q, 3),
            lambda bg, ki, qi, *_, _fpt=frames_per_tile, _t=t: (
                bg // g, jnp.minimum(ki, _t // _fpt - 1), qi, 0),
        )
    dkv_spec = (pl.BlockSpec((1, block_k, hb, d), lambda bg, ki, qi, *_: (bg, ki, 0, 0))
                if token_major else
                pl.BlockSpec((1, hb, block_k, d), lambda bg, ki, qi, *_: (bg, 0, ki, 0)))
    dk, dv = pl.pallas_call(
        functools.partial(_v2_bwd_dkv_kernel, nk=nk, nq=nq, **common),
        out_shape=(
            jax.ShapeDtypeStruct(
                (b, lk, heads, d) if token_major else (b * g, hb, lk, d), k.dtype),
            jax.ShapeDtypeStruct(
                (b, lk, heads, d) if token_major else (b * g, hb, lk, d), v.dtype),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * g, nk, nq),
            in_specs=[q_spec_k, kv_spec, kv_spec, q_spec_k, lse_spec_k, lse_spec_k,
                      lines_spec_k],
            out_specs=(dkv_spec, dkv_spec),
            scratch_shapes=[pltpu.VMEM((hb, block_k, d), jnp.float32),
                            pltpu.VMEM((hb, block_k, d), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vmem,
        ),
        interpret=interp,
    )(tile_any, qs, kt, vt, dot, lse, delta, lines_t)
    if not token_major:
        dk = dk.reshape(b, heads, lk, d).transpose(0, 2, 1, 3)
        dv = dv.reshape(b, heads, lk, d).transpose(0, 2, 1, 3)
    return dq, dk, dv


def pallas_bwd_enabled() -> bool:
    """DEFAULT ON since round 4: flagship fwd+bwd 579 -> 487.8 ms/call with
    identical loss values; grads match the XLA chunked recompute at bf16
    tolerance on CPU (1e-6) and chip (~1% of scale, dtype-order effects).
    Kill switch: CAMC2V_EPI_PALLAS_BWD=0 restores the XLA recompute VJP."""
    return os.environ.get("CAMC2V_EPI_PALLAS_BWD", "1") == "1"


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _epipolar_flash(q, k, v, lines, tile_any, penalties, static):
    return _epipolar_flash_fwd_impl(q, k, v, lines, tile_any, penalties, **dict(static))


def _epi_fwd_rule(q, k, v, lines, tile_any, penalties, static):
    # penalties are an inference-path option (samplers hoist them out of the
    # denoise scan); training calls pass None so no 0.5 GB residual is kept
    if penalties is None and pallas_bwd_enabled():
        out, lse = _epipolar_flash_fwd_impl(
            q, k, v, lines, tile_any, None, want_stats=True, **dict(static)
        )
        return out, (q, k, v, lines, tile_any, penalties, out, lse)
    return (
        _epipolar_flash(q, k, v, lines, tile_any, penalties, static),
        (q, k, v, lines, tile_any, penalties, None, None),
    )


def _epi_bwd_rule(static, res, gout):
    q, k, v, lines, tile_any, penalties, fwd_out, lse = res
    cfg = dict(static)
    t, h, w, ds = cfg["t"], cfg["h"], cfg["w"], cfg["downsample"]
    num_registers, scale = cfg["num_registers"], cfg["scale"]
    block_k = cfg.get("block_k", BLOCK_K)
    lk = k.shape[1]

    if fwd_out is not None:
        # Pallas backward (CAMC2V_EPI_PALLAS_BWD): flash-style dq / dk+dv
        # kernels with the mask recomputed in-kernel from the epipolar lines
        dq, dk, dv = _epipolar_flash_bwd_impl(
            q, k, v, lines, tile_any, fwd_out, lse, gout,
            t=t, h=h, w=w, downsample=ds, num_registers=num_registers,
            scale=scale, block_q=cfg.get("block_q", BLOCK_Q), block_k=block_k,
        )
        import numpy as onp

        ct_tile = onp.zeros(tile_any.shape, jax.dtypes.float0)
        return dq, dk, dv, jnp.zeros_like(lines), ct_tile, None

    def f(q, k, v):
        # chunked exact recompute with the mask materialised per q-chunk —
        # O(L * chunk) memory, exact gradients (mirrors flash_attention's VJP)
        b, lq, heads, d = q.shape
        chunk = BLOCK_Q
        nq = lq // chunk
        reg = jnp.arange(lk - (t * h * w)) < num_registers

        # jax.checkpoint: without it, vjp-through-lax.map stacks each chunk's
        # softmax residuals over all nq iterations — f32/bf16/pred
        # [nq, b, h, chunk, L] tensors (~10.6 GB at flagship ds8) that OOMed
        # the 16 GB chip on the first real train-step compile. Remat keeps
        # only (qc, lc) per chunk and recomputes s/p in the backward sweep.
        @jax.checkpoint
        def one_chunk(args):
            qc, lc = args  # (b, chunk, h, d), (b, chunk, t, 3)
            mc = materialize_mask(lc, t, h, w, ds)  # (b, chunk, t*h*w)
            mc = jnp.concatenate(
                [mc, jnp.broadcast_to(reg[None, None], (b, chunk, reg.shape[0]))], axis=-1
            )
            s = jnp.einsum("bqhd,bkhd->bhqk", qc, k, preferred_element_type=jnp.float32) * scale
            s = jnp.where(mc[:, None], s, NEG_INF)
            p = jax.nn.softmax(s, axis=-1)
            any_valid = jnp.any(mc, axis=-1)[:, None, :, None]
            p = jnp.where(any_valid, p, 0.0)
            return jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)

        qs = q.reshape(b, nq, chunk, heads, d).transpose(1, 0, 2, 3, 4)
        ls = lines.reshape(b, nq, chunk, t, 3).transpose(1, 0, 2, 3, 4)
        out = jax.lax.map(one_chunk, (qs, ls))
        return out.transpose(1, 0, 2, 3, 4).reshape(b, lq, heads, d)

    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(gout)
    import numpy as onp

    ct_tile = onp.zeros(tile_any.shape, jax.dtypes.float0)  # int primal
    ct_pen = None if penalties is None else jnp.zeros_like(penalties)
    return dq, dk, dv, jnp.zeros_like(lines), ct_tile, ct_pen


_epipolar_flash.defvjp(_epi_fwd_rule, _epi_bwd_rule)


def epipolar_flash_attention(
    q, k, v, lines, *, t, h, w, downsample, num_registers,
    scale: Optional[float] = None, block_q: int = BLOCK_Q, block_k: int = BLOCK_K,
    tile_any: Optional[jax.Array] = None, penalties: Optional[jax.Array] = None,
):
    """Differentiable entry point (see _epipolar_flash_fwd_impl for shapes).

    `tile_any` precomputed via `epipolar_tile_map` skips the in-graph hull
    prepass; `penalties` precomputed via `materialize_penalties` replaces the
    in-kernel line-distance math with streamed bf16 penalty tiles (hoist both
    out of sampling scans — they depend only on geometry).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if tile_any is None:
        tile_any = epipolar_tile_map(lines, t, h, w, downsample, block_q, block_k)
    static = tuple(
        sorted(
            dict(
                t=t, h=h, w=w, downsample=downsample, num_registers=num_registers,
                scale=float(scale), block_q=block_q, block_k=block_k,
            ).items()
        )
    )
    if penalties is not None:
        penalties = jax.lax.stop_gradient(penalties)
    return _epipolar_flash(
        q, k, v, jax.lax.stop_gradient(lines), tile_any, penalties, static
    )


def materialize_mask(lines: jax.Array, t: int, h: int, w: int, downsample: int) -> jax.Array:
    """(B, Lq, t*h*w) bool mask from lines — the v2 semantics in plain XLA.

    Used by tests and by the O(L*chunk) backward recompute.
    """
    b, lq = lines.shape[:2]
    y = pix2coord(jnp.arange(h, dtype=jnp.float32), downsample)
    x = pix2coord(jnp.arange(w, dtype=jnp.float32), downsample)
    gy, gx = jnp.meshgrid(y, x, indexing="ij")
    grid = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1).reshape(h * w, 3)
    # HIGHEST: the backward recompute and the precomputed penalties must
    # reproduce the forward kernel's exact-f32 mask bits on TPU (default
    # einsum precision is bf16 there and flips borderline bits)
    dist = jnp.abs(jnp.einsum("bqtc,kc->bqtk", lines, grid,
                              precision=jax.lax.Precision.HIGHEST))
    thresh = downsample * math.sqrt(2.0) / 2.0
    return (dist < thresh).reshape(b, lq, t * h * w)
