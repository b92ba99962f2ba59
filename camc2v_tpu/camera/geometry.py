"""Camera geometry as pure float32 functions (no modules, no state).

TPU-native rebuild of the reference's pose math, which lives as autocast-off
methods on the model classes:
  * Plücker/ray embedding      — reference: model/base.py:112-174 (ray_condition)
  * relative poses             — reference: model/base.py:176-217
  * pairwise relative pose     — reference: model/camcontexti2v.py:172-184
  * fundamental matrix         — reference: model/camcontexti2v.py:186-198
  * epipolar masks             — reference: model/camcontexti2v.py:200-271
  * conditional epipolar mask  — reference: model/camcontexti2v.py:493-521

All functions force float32 internally (the reference wraps these in
`torch.autocast(enabled=False)`); callers may pass bf16 — outputs are f32.
Poses are w2c or c2w 4x4 row-major matrices; intrinsics are 3x3 in PIXELS of
the (H, W) video resolution.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from camc2v_tpu.nn.epipolar import EpipolarConfig


def _f32(x: jax.Array) -> jax.Array:
    return jnp.asarray(x, jnp.float32)


def plucker_embedding(
    K: jax.Array, c2w: jax.Array, H: int, W: int, *, return_plucker: bool = True
) -> jax.Array:
    """Per-pixel Plücker coordinates (or raw rays) of the camera rays.

    Args:
      K: (B, V, 3, 3) intrinsics; c2w: (B, V, 4, 4) camera-to-world.
    Returns: (B, V, H, W, 6) — [d×o | d] if plucker else [o | d].
    reference: model/base.py:114-174.
    """
    K, c2w = _f32(K), _f32(c2w)
    b, v = K.shape[:2]
    jj, ii = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij")
    i = (ii.reshape(-1) + 0.5)[None, None]  # (1, 1, HW) pixel centres
    j = (jj.reshape(-1) + 0.5)[None, None]

    fx = K[..., 0, 0][..., None]
    fy = K[..., 1, 1][..., None]
    cx = K[..., 0, 2][..., None]
    cy = K[..., 1, 2][..., None]

    xs = (i - cx) / fx
    ys = (j - cy) / fy
    zs = jnp.ones_like(jnp.broadcast_to(ys, (b, v, H * W)))
    directions = jnp.stack([jnp.broadcast_to(xs, zs.shape), jnp.broadcast_to(ys, zs.shape), zs], axis=-1)
    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)

    rays_d = jnp.einsum("bvnk,bvlk->bvnl", directions, c2w[..., :3, :3])  # dirs @ R^T
    rays_o = jnp.broadcast_to(c2w[..., None, :3, 3], rays_d.shape)
    if not return_plucker:
        enc = jnp.concatenate([rays_o, rays_d], axis=-1)
        return enc.reshape(b, v, H, W, 6)
    rays_dxo = jnp.cross(rays_o, rays_d)
    plucker = jnp.concatenate([rays_dxo, rays_d], axis=-1)
    return plucker.reshape(b, v, H, W, 6)


def relative_pose(
    RT_4x4: jax.Array,
    cond_frame_index: jax.Array,
    mode: str = "left",
    normalize_T0: bool = False,
) -> jax.Array:
    """Poses relative to the conditioning frame. reference: model/base.py:176-198.

    RT_4x4: (B, T, 4, 4); cond_frame_index: (B,) -> (B, T, 4, 4).
    """
    RT = _f32(RT_4x4)
    b = RT.shape[0]
    first = jnp.take_along_axis(RT, cond_frame_index.reshape(b, 1, 1, 1), axis=1)  # (B,1,4,4)
    if normalize_T0:
        scale = jnp.linalg.norm(first.reshape(b, -1), axis=-1).reshape(b, 1, 1, 1)
        first = first / scale
        RT = RT / scale
    inv_first = jnp.linalg.inv(first)
    if mode == "left":
        return inv_first @ RT
    return RT @ inv_first


def pairwise_relative_pose(RT1: jax.Array, RT2: jax.Array, mode: str = "left") -> jax.Array:
    """All-pairs relative transform (B, T1, T2, 4, 4).

    reference: model/base.py:200-217 — result[b, i, j] = inv(RT1[b,i]) @ RT2[b,j].
    """
    RT1, RT2 = _f32(RT1), _f32(RT2)
    a = RT1[:, :, None]  # (B, T1, 1, 4, 4)
    b_ = RT2[:, None, :]  # (B, 1, T2, 4, 4)
    if mode == "left":
        return jnp.linalg.inv(a) @ b_
    return a @ jnp.linalg.inv(b_)


def relative_c2w_pairs(RT: jax.Array) -> jax.Array:
    """Frame-to-frame transforms: out[b, t1, t2] = inv(RT[t2]) @ RT[t1].

    reference: model/camcontexti2v.py:172-184.
    """
    RT = _f32(RT)
    RT_inv = jnp.linalg.inv(RT)[:, None, :]  # (B, 1, T2, 4, 4)
    return RT_inv @ RT[:, :, None]  # (B, T1, T2, 4, 4)


def fundamental_matrix(K: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """F = K^-T [t]x R K^-1 with E computed as cross(t, R) column-wise.

    reference: model/camcontexti2v.py:186-198 (torch.cross(t, R, dim=-2):
    E[:, :, j] = t x R[:, :, j]).
    K, R: (..., 3, 3); t: (..., 3, 1).
    """
    K, R, t = _f32(K), _f32(R), _f32(t)
    E = jnp.cross(jnp.broadcast_to(t, R.shape), R, axis=-2)
    K_inv = jnp.linalg.inv(K)
    return jnp.swapaxes(K_inv, -1, -2) @ E @ K_inv


def add_small_perturbation(t: jax.Array, rng: jax.Array, epsilon: float = 1e-6) -> jax.Array:
    """Replace near-zero translations with epsilon noise (degenerate-F guard).

    reference: model/camcontexti2v.py:273-278.
    """
    zero_mask = jnp.all(jnp.abs(t) < epsilon, axis=-2, keepdims=True)
    perturbation = jax.random.normal(rng, t.shape, t.dtype) * epsilon
    return jnp.where(zero_mask, perturbation, t)


def pix2coord(x: jax.Array, downsample: int) -> jax.Array:
    """Feature-map pixel index -> original-image coordinate (cell centre).

    reference: model/modules/epipolar.py:32-35.
    """
    return x * downsample + downsample / 2.0 - 0.5


def epipolar_mask(
    F: jax.Array,
    T: int,
    H: int,
    W: int,
    downsample: int,
    config: EpipolarConfig = EpipolarConfig(),
    *,
    flatten: bool = True,
) -> jax.Array:
    """Boolean attention mask from point-to-epipolar-line distances.

    Args:
      F: (B, T1, T2, 3, 3) fundamental matrices (original-image pixel units).
      H, W: feature-map resolution; downsample: original/feature scale.
    Returns:
      (B, T1*H*W, T2*H*W) bool if flatten else (B, T1, T2, H*W, H*W);
      mask[b, q, k] = True where key-pixel k lies within downsample*sqrt(2)/2
      of the epipolar line of query-pixel q.
    reference: model/camcontexti2v.py:200-271 (incl. hybrid fallbacks and
    same-frame variants).
    """
    F = _f32(F)
    b, t1, t2 = F.shape[:3]

    y = pix2coord(jnp.arange(H, dtype=jnp.float32), downsample)
    x = pix2coord(jnp.arange(W, dtype=jnp.float32), downsample)
    grid_y, grid_x = jnp.meshgrid(y, x, indexing="ij")
    grid = jnp.stack([grid_x, grid_y, jnp.ones_like(grid_x)], axis=-1).reshape(-1, 3)  # (HW, 3)

    lines = F @ grid.T  # (B, T1, T2, 3, HW) epipolar line of each query pixel
    norm = jnp.linalg.norm(lines[..., :2, :], axis=-2, keepdims=True)
    lines = lines / norm
    # dist[b, t1, t2, q, k] = |line_q . point_k|
    dist = jnp.abs(jnp.swapaxes(lines, -1, -2) @ grid.T)
    mask = dist < (downsample * math.sqrt(2) / 2)

    if config.apply_epipolar_soft_mask:
        raise NotImplementedError("soft epipolar masks are not used by any shipped config")

    if config.epipolar_hybrid_attention:
        # rows with no visible epipolar line fall back to full attention
        mask = jnp.where(jnp.any(mask, axis=-1, keepdims=True), mask, jnp.ones_like(mask))

    if config.epipolar_hybrid_attention_v2:
        any_tk = jnp.any(mask, axis=(2, 4), keepdims=True)  # (B, T1, 1, HW, 1)
        mask = jnp.where(jnp.broadcast_to(any_tk, mask.shape), mask, jnp.ones_like(mask))

    if config.only_self_pixel_on_current_frame:
        same_frame = jnp.eye(T, dtype=bool)[None, :, :, None, None]
        mask = mask & ~same_frame
        same_pixel = jnp.eye(H * W, dtype=bool)[None, None, None]
        mask = mask | (same_frame & same_pixel)

    if config.current_frame_as_register_token:
        same_frame = jnp.broadcast_to(jnp.eye(T, dtype=bool)[None, :, :, None, None], mask.shape)
        mask = jnp.where(same_frame, same_frame, mask)

    if flatten:
        # (B, T1, T2, HW, HW) -> (B, T1*HW, T2*HW)
        mask = mask.transpose(0, 1, 3, 2, 4).reshape(b, t1 * H * W, t2 * H * W)
    return mask


def build_epipolar_masks(
    F: jax.Array,
    T: int,
    latent_hw: tuple[int, int],
    config: EpipolarConfig,
) -> dict[int, jax.Array]:
    """Per-resolution mask dict {total_downsample: (B, T*hw, T*hw)}.

    The UNet's epipolar modules select by `origin_h // feature_h`; latent ds=1
    corresponds to 8x image downsample (VAE), so keys are 8*ds for ds in
    attention_resolution. reference: model/camcontexti2v.py:552.
    """
    h, w = latent_hw
    masks = {}
    for ds in config.attention_resolution:
        d = 8 * ds
        masks[d] = epipolar_mask(F, T, h // ds, w // ds, d, config)
    return masks


def conditional_epipolar_mask(
    camera_intrinsics: jax.Array,
    w2c_RT: jax.Array,
    w2c_RT_cond: jax.Array,
    cond_frame_index: Optional[jax.Array],
    H: int,
    W: int,
    downsample: int = 8,
    config: EpipolarConfig = EpipolarConfig(),
) -> jax.Array:
    """Mask between target-frame tokens and [cond ‖ context]-frame tokens.

    Args:
      camera_intrinsics: (B, T, 3, 3); w2c_RT: (B, T, 4, 4) target frames;
      w2c_RT_cond: (B, C, 4, 4) context frames; cond_frame_index: (B,) —
      when given, the conditioning frame's pose is prepended to the context.
    Returns: (B, T*hw, (C[+1])*hw) bool.
    reference: model/camcontexti2v.py:493-521.
    """
    F = conditional_fundamental(camera_intrinsics, w2c_RT, w2c_RT_cond, cond_frame_index)
    T = F.shape[1]
    return epipolar_mask(F, T, H // downsample, W // downsample, downsample, config)


def conditional_fundamental(
    camera_intrinsics: jax.Array,
    w2c_RT: jax.Array,
    w2c_RT_cond: jax.Array,
    cond_frame_index: Optional[jax.Array],
) -> jax.Array:
    """Fundamental matrices between target frames and [cond ‖ context] frames.

    (B, T, C[+1], 3, 3) — queries are target frames, keys the context frames
    (cond-frame pose prepended when `cond_frame_index` is given). Shared by
    the materialised `conditional_epipolar_mask` and the in-kernel-mask
    adaptor path (ops/epipolar_flash.py epipolar_lines consumes this F)."""
    K = _f32(camera_intrinsics)
    c2w = jnp.linalg.inv(_f32(w2c_RT))
    c2w_cond = jnp.linalg.inv(_f32(w2c_RT_cond))
    if cond_frame_index is not None:
        b = c2w.shape[0]
        sel = jnp.take_along_axis(c2w, cond_frame_index.reshape(b, 1, 1, 1), axis=1)
        c2w_cond = jnp.concatenate([sel, c2w_cond], axis=1)

    rel = pairwise_relative_pose(c2w_cond, c2w)  # (B, C, T, 4, 4)
    rel = jnp.swapaxes(rel, 1, 2)  # (B, T, C, 4, 4): queries=target, keys=context
    R = rel[..., :3, :3]
    t = rel[..., :3, 3:4]
    C = R.shape[2]
    T = R.shape[1]
    K_pairs = jnp.broadcast_to(K[:, :, None], (K.shape[0], T, C, 3, 3))
    return fundamental_matrix(K_pairs, R, t)
