"""Epipolar-masked spatio-temporal attention.

reference: CamContextI2V/model/modules/epipolar.py. The boolean masks
(per-resolution, built from fundamental matrices by camera/geometry.py) arrive
as a dict {downsample_factor: (B, T*h*w, T*h*w)}; this module selects the one
matching its feature resolution. Register tokens are learned context tokens
prepended with an always-True mask column.

Round-1 implementation materialises the mask and runs masked XLA attention;
the Pallas block-sparse kernel (ops/epipolar_attention.py) computes the mask
on the fly from F-matrices and replaces the dense path at full resolution.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from camc2v_tpu.nn.layers import Dense, Dtype
from camc2v_tpu.ops.attention import dot_product_attention


def plain_epipolar(cfg: "EpipolarConfig") -> bool:
    """True when the mask is the pure `dist < thresh` band (no fallbacks).

    Only then can the mask be computed in-kernel from fundamental matrices
    (ops/epipolar_flash.py); every shipped flagship config
    (configs/models/camcontexti2v_256.yaml epipolar_config) is plain.
    """
    return not (
        cfg.is_3d_full_attn
        or cfg.apply_epipolar_soft_mask
        or cfg.epipolar_hybrid_attention
        or cfg.epipolar_hybrid_attention_v2
        or cfg.only_self_pixel_on_current_frame
        or cfg.current_frame_as_register_token
        or cfg.only_on_cond_frame
    )


def prepare_plain_epipolar(F, cfg: "EpipolarConfig") -> dict[int, dict]:
    """Per-level epipolar prep {pixel_ds: {"lines", "tile_any"}} from the
    fundamental matrices — purely geometric, so samplers compute it ONCE and
    hoist it out of the denoise scan (25 recomputes otherwise, and a slow
    producer of the scalar-prefetch tile map STALLS the Pallas kernel).

    Keys match the Epipolar module's `origin_h // feature_h` lookup (latent
    ds=1 is 8x image downsample): pixel_ds = 8 * ar for ar in
    cfg.attention_resolution — same keying as camera/geometry.py's
    build_epipolar_masks (reference model/camcontexti2v.py:552).
    """
    from camc2v_tpu.ops import epipolar_flash as ef

    assert plain_epipolar(cfg)
    t = F.shape[1]
    prep: dict[int, dict] = {}
    for ar in cfg.attention_resolution:
        ds = 8 * ar
        h = cfg.origin_h // ds
        w = cfg.origin_w // ds
        if h < 1 or w < 1:
            continue
        lines = ef.epipolar_lines(F, h, w, ds)
        entry = {"lines": lines}
        hw = h * w
        block_k = ef.choose_block_k(hw)
        if ef.kernel_tiling_ok(t, hw, block_k):
            entry["tile_any"] = ef.epipolar_tile_map(lines, t, h, w, ds, ef.BLOCK_Q, block_k)
        prep[ds] = entry
    return prep


def add_precomputed_penalties(
    prep: dict[int, dict], cfg: "EpipolarConfig", t: int,
    max_level_bytes: Optional[int] = None,
) -> dict[int, dict]:
    """Augment sampler-hoisted epipolar prep with materialised bf16 penalty
    tiles (ops/epipolar_flash.py::materialize_penalties).

    Sampling reuses one camera geometry for all 25 DDIM steps, so the mask can
    be built once and streamed by the kernel instead of being recomputed from
    epipolar lines every step (the line-distance math is the dominant VPU cost
    next to the softmax chain). Training paths must NOT call this — geometry
    changes every step there, making the build a wash.

    Gated by CAMC2V_EPI_PRECOMP (default OFF until the TPU A/B lands); levels
    whose penalty array would exceed `max_level_bytes` (default 1.25 GB — the
    fused CFG stack doubles it) keep the in-kernel path.
    """
    import os

    from camc2v_tpu.ops import epipolar_flash as ef

    if os.environ.get("CAMC2V_EPI_PRECOMP", "0") == "0":
        return prep
    if max_level_bytes is None:
        max_level_bytes = int(1.25e9)
    out = {}
    for ds, entry in prep.items():
        entry = dict(entry)
        lines = entry.get("lines")
        if lines is not None and "tile_any" in entry and "penalties" not in entry:
            h = cfg.origin_h // ds
            w = cfg.origin_w // ds
            hw = h * w
            block_k = ef.choose_block_k(hw)
            b, lq = lines.shape[:2]
            if b * lq * (lq + block_k) * 2 <= max_level_bytes:
                entry["penalties"] = ef.materialize_penalties(
                    lines, t, h, w, ds, cfg.num_register_tokens, block_k
                )
        out[ds] = entry
    return out


@dataclasses.dataclass(frozen=True)
class EpipolarConfig:
    """Static configuration of the epipolar attention modules (hashable)."""

    origin_h: int = 256
    origin_w: int = 256
    is_3d_full_attn: bool = False
    num_register_tokens: int = 0
    compression_factor: int = 1
    only_on_cond_frame: bool = False
    attention_resolution: tuple[int, ...] = (8, 4, 2, 1)
    # mask-construction behaviour (consumed by camera/geometry.py)
    apply_epipolar_soft_mask: bool = False
    soft_mask_temperature: float = 1.0
    epipolar_hybrid_attention: bool = False
    epipolar_hybrid_attention_v2: bool = False
    only_self_pixel_on_current_frame: bool = False
    current_frame_as_register_token: bool = False
    add_small_perturbation_on_zero_T: bool = False
    pluker_add_type: str = "add_to_pre_x_only"


class EpipolarCrossAttention(nn.Module):
    """Masked cross-attention with optional learned register tokens.

    reference: model/modules/epipolar.py:43-102. `zero_init_out` gives the
    zero-initialised output projection used when wrapped by `Epipolar`.
    """

    query_dim: int
    context_dim: Optional[int] = None
    out_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    num_register_tokens: int = 0
    zero_init_out: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: jax.Array,
        attn_mask: Optional[jax.Array] = None,
        *,
        lines: Optional[jax.Array] = None,
        geom: Optional[tuple[int, int, int, int]] = None,
        tile_any: Optional[jax.Array] = None,
        penalties: Optional[jax.Array] = None,
    ) -> jax.Array:
        """x: (B, L1, C); context: (B, L2, C); attn_mask: (B, L1, L2) bool (True=attend).

        When `lines` (B, L1, T, 3) + `geom` (t, h, w, downsample) are given the
        mask is computed in-kernel (ops/epipolar_flash.py) — attn_mask must be
        None and the register tokens ride at the END of the key axis (an
        attention-invariant reordering of the reference's front position).
        """
        inner = self.heads * self.dim_head
        b = x.shape[0]

        q = Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)

        if lines is not None:
            from camc2v_tpu.ops import epipolar_flash as ef

            assert attn_mask is None and geom is not None
            t, hh, ww, ds, block_k = geom
            ctx_dim = context.shape[-1]
            parts = [context]
            if self.num_register_tokens > 0:
                reg = self.param(
                    "register_tokens",
                    nn.initializers.normal(1.0),
                    (1, self.num_register_tokens, ctx_dim),
                    jnp.float32,
                )
                parts.append(
                    jnp.broadcast_to(reg, (b, self.num_register_tokens, ctx_dim)).astype(context.dtype)
                )
            pad = block_k - self.num_register_tokens
            parts.append(jnp.zeros((b, pad, ctx_dim), context.dtype))
            context_ext = jnp.concatenate(parts, axis=1)
            k = Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context_ext)
            v = Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context_ext)
            split = lambda z: z.reshape(z.shape[0], z.shape[1], self.heads, self.dim_head)
            # shard the kernel over the data mesh axis when a trace mesh is
            # active — SPMD replicates custom calls otherwise, all-gathering
            # the global batch around every site (parallel/kernel_shard.py).
            # Batch-shared penalties (pb == 1, the fused-CFG shared tile) ride
            # replicated; a pb == b penalty stack shards with the batch.
            from camc2v_tpu.parallel.kernel_shard import data_shard

            kernel_args = [split(q), split(k), split(v), lines, tile_any]
            batch_dims = [0, 0, 0, 0, 0]
            if penalties is not None:
                kernel_args.append(penalties)
                batch_dims.append(0 if penalties.shape[0] == q.shape[0] else None)

                def call(q_, k_, v_, l_, ta_, pen_):
                    return ef.epipolar_flash_attention(
                        q_, k_, v_, l_,
                        t=t, h=hh, w=ww, downsample=ds, block_k=block_k,
                        num_registers=self.num_register_tokens, tile_any=ta_,
                        penalties=pen_,
                    )
            else:

                def call(q_, k_, v_, l_, ta_):
                    return ef.epipolar_flash_attention(
                        q_, k_, v_, l_,
                        t=t, h=hh, w=ww, downsample=ds, block_k=block_k,
                        num_registers=self.num_register_tokens, tile_any=ta_,
                        penalties=None,
                    )

            out = data_shard(call, kernel_args, batch_dims, 0)
            out = out.reshape(b, -1, inner)
            out_dim = self.out_dim if self.out_dim is not None else self.query_dim
            return Dense(out_dim, zero_init=self.zero_init_out, dtype=self.dtype, name="to_out")(out)

        if self.num_register_tokens > 0:
            ctx_dim = context.shape[-1]
            reg = self.param(
                "register_tokens",
                nn.initializers.normal(1.0),
                (1, self.num_register_tokens, ctx_dim),
                jnp.float32,
            )
            reg = jnp.broadcast_to(reg, (b, self.num_register_tokens, ctx_dim)).astype(context.dtype)
            context = jnp.concatenate([reg, context], axis=1)
            if attn_mask is not None:
                pad = jnp.ones((b, attn_mask.shape[1], self.num_register_tokens), dtype=bool)
                attn_mask = jnp.concatenate([pad, attn_mask], axis=-1)

        k = Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)

        split = lambda t: t.reshape(t.shape[0], t.shape[1], self.heads, self.dim_head)
        out = dot_product_attention(
            split(q), split(k), split(v),
            mask=None if attn_mask is None else attn_mask[:, None, :, :],
        )
        out = out.reshape(b, -1, inner)
        out_dim = self.out_dim if self.out_dim is not None else self.query_dim
        return Dense(out_dim, zero_init=self.zero_init_out, dtype=self.dtype, name="to_out")(out)


class Epipolar(nn.Module):
    """Spatio-temporal attention over T*h*w tokens, masked by epipolar geometry.

    reference: model/modules/epipolar.py:105-157. Input features
    (B, T, h, w, C); returns (B*h*w, T, C) tokens matching the temporal stream.
    """

    config: EpipolarConfig
    query_dim: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        features: jax.Array,
        masks: Optional[dict[int, jax.Array]] = None,
        cond_frame_index: Optional[jax.Array] = None,
        F: Optional[jax.Array] = None,
        prep: Optional[dict[int, dict]] = None,
    ) -> jax.Array:
        b, t, hh, ww, c = features.shape
        cfg = self.config

        attn_mask = None
        lines = None
        geom = None
        tile_any = None
        penalties = None
        if F is not None and masks is None and not cfg.is_3d_full_attn:
            # mask-free path: epipolar lines from the fundamental matrices;
            # in-kernel mask when the geometry tiles cleanly, else a
            # materialised plain mask (identical semantics, see plain_epipolar)
            from camc2v_tpu.ops import epipolar_flash as ef

            assert plain_epipolar(cfg), "F-payload requires a plain epipolar config"
            ds = cfg.origin_h // hh
            level_prep = (prep or {}).get(ds, {})
            lines = level_prep.get("lines")
            if lines is None:
                lines = ef.epipolar_lines(F, hh, ww, ds)
            tile_any = level_prep.get("tile_any")
            dim_head = int(self.query_dim // self.heads // cfg.compression_factor)
            # k-tiles either subdivide a frame (hw >= 1024) or span several
            # whole frames (hw < 1024) — BK=1024 minimises grid-step overhead
            hw = hh * ww
            block_k = ef.choose_block_k(hw)
            kernel_ok = ef.kernel_tiling_ok(t, hw, block_k) and (
                dim_head in (64, 128) or jax.default_backend() == "cpu"
            )
            if kernel_ok:
                geom = (t, hh, ww, ds, block_k)
                penalties = level_prep.get("penalties")
            else:
                attn_mask = ef.materialize_mask(lines, t, hh, ww, ds)
                lines = None
                tile_any = None
        elif masks is not None and not cfg.is_3d_full_attn:
            attn_mask = masks.get(cfg.origin_h // hh)

        x = features.reshape(b, t * hh * ww, c)
        if not cfg.only_on_cond_frame:
            context = x
        else:
            assert cond_frame_index is not None
            # select the cond frame of each batch element: (B, h*w, C)
            sel = jnp.take_along_axis(features, cond_frame_index[:, None, None, None, None], axis=1)
            context = sel.reshape(b, hh * ww, c)
            if attn_mask is not None:
                m = attn_mask.reshape(b, t * hh * ww, t, hh * ww)
                attn_mask = jnp.take_along_axis(
                    m, cond_frame_index[:, None, None, None], axis=2
                ).reshape(b, t * hh * ww, hh * ww)

        out = EpipolarCrossAttention(
            query_dim=self.query_dim,
            context_dim=self.query_dim,
            heads=self.heads,
            dim_head=int(self.query_dim // self.heads // cfg.compression_factor),
            num_register_tokens=cfg.num_register_tokens,
            zero_init_out=True,
            dtype=self.dtype,
            name="epipolar_attn",
        )(x, context, attn_mask, lines=lines, geom=geom, tile_any=tile_any,
          penalties=penalties)

        # (B, T*h*w, C) -> (B*h*w, T, C)
        return out.reshape(b, t, hh * ww, -1).transpose(0, 2, 1, 3).reshape(b * hh * ww, t, -1)
