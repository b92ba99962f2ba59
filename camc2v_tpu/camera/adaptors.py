"""Context-frame latent adaptors for CamContextI2V's latent concat branch.

reference: CamContextI2V/model/modules/adaptors.py (MultiLatentEpipolarAdaptor,
MultiLatentAdaptor, TransposedConvolution) and model/modules/utils.py:5-43
(CrossNormalization). The flagship config (configs/models/camcontexti2v_256.yaml:
141-152) uses MultiLatentEpipolarAdaptor with 1024 queries/frame x 16 frames,
query_dim 512, depth 12, embedding_dim=output_dim=4, sinusoidal_embedded
per-frame timestep embedding, epipolar masking, no Plücker input.
"""

from __future__ import annotations

from typing import Any, Literal, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from camc2v_tpu.core.schedules import timestep_embedding
from camc2v_tpu.nn.epipolar import EpipolarCrossAttention
from camc2v_tpu.nn.layers import Conv, Dense, Dtype, LayerNormF32
from camc2v_tpu.nn.resampler import PerceiverAttention, ResamplerFeedForward


def cross_normalization(
    x: jax.Array, x_ref: jax.Array, axes: tuple[int, ...], eps: float = 1e-5
) -> jax.Array:
    """AdaIN-style statistic matching: x re-normalised to x_ref's mean/std.

    reference: model/modules/utils.py:5-43 (note torch.std => ddof=1).
    """
    mean_ref = jnp.mean(x_ref, axis=axes, keepdims=True)
    std_ref = jnp.std(x_ref, axis=axes, keepdims=True, ddof=1)
    mean_x = jnp.mean(x, axis=axes, keepdims=True)
    std_x = jnp.std(x, axis=axes, keepdims=True, ddof=1)
    return (x - mean_x) * (std_ref / (std_x + eps)) + mean_ref


class TransposedConvolution(nn.Module):
    """Bilinear-upsample + conv (checkerboard-free upscaling).

    reference: adaptors.py:14-34.
    """

    out_channels: int
    kernel_size: int = 3
    scale: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        x = jax.image.resize(x, (n, h * self.scale, w * self.scale, c), "bilinear")
        return Conv(self.out_channels, (self.kernel_size, self.kernel_size), dtype=self.dtype, name="conv")(x)


class MultiLatentEpipolarAdaptor(nn.Module):
    """Learned queries cross-attend over [cond ‖ context] VAE latents.

    Input x: (B, L_ctx, embedding_dim) flattened context latents;
    mask: (B, T*num_queries, L_ctx) bool; output: (B, T*num_queries, output_dim).
    reference: adaptors.py:36-182.
    """

    query_dim: int = 512
    depth: int = 8
    dim_head: int = 64
    heads: int = 8
    num_queries: int = 1024
    output_queries: Optional[int] = None
    embedding_dim: int = 768
    output_dim: int = 1024
    ff_mult: int = 4
    num_register_tokens: int = 2
    use_mask: bool = True
    video_length: Optional[int] = None
    use_plucker_embedding: bool = False
    plucker_embedding_dim: int = 320
    plucker_input_strategy: Literal["concat", "add"] = "add"
    context_positional_encoding: bool = False
    timestep_embedding_type: Literal["none", "sinusoidal", "sinusoidal_embedded"] = "none"
    timestep_embedding_dim: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        plucker_embedding_features: Optional[jax.Array] = None,
        *,
        use_mask: Optional[bool] = None,
        lines: Optional[jax.Array] = None,
        geom: Optional[tuple[int, int, int, int, int]] = None,
        tile_any: Optional[jax.Array] = None,
    ) -> jax.Array:
        video_length = self.video_length if self.video_length is not None else 16
        total_queries = self.num_queries * (video_length if self.video_length is not None else 1)
        b = x.shape[0]

        latents = self.param(
            "latents",
            nn.initializers.normal(self.query_dim**-0.5),
            (1, total_queries, self.query_dim),
            jnp.float32,
        )
        latents = jnp.broadcast_to(latents, (b, total_queries, self.query_dim)).astype(self.dtype)

        if self.context_positional_encoding:
            n = x.shape[1] // self.num_queries
            pos = timestep_embedding(jnp.arange(n), self.num_queries)  # (n, num_queries)
            pos = jnp.repeat(pos.reshape(1, -1, 1), x.shape[-1], axis=-1)
            x = jnp.concatenate([x, jnp.broadcast_to(pos, (b, pos.shape[1], x.shape[-1]))], axis=-1)
        x = Dense(self.query_dim, dtype=self.dtype, name="proj_in")(x)

        pl = None
        if plucker_embedding_features is not None:
            pl = Dense(self.query_dim, dtype=self.dtype, name="plucker_in")(plucker_embedding_features)

        masking = self.use_mask if use_mask is None else use_mask
        effective_mask = mask if masking else None
        # in-kernel mask mode (generation fast path): epipolar lines of every
        # query vs the 1+N key frames; the flash kernel recomputes the mask
        # per tile and skips invisible SUBTILE key ranges — no (B, Lq, Lk)
        # bools, ~mask-density of the VPU softmax work skipped
        kernel_geom = geom if (masking and lines is not None) else None

        for i in range(self.depth):
            if pl is not None:
                if self.plucker_input_strategy == "concat":
                    inp = jnp.concatenate([latents, pl], axis=-1)
                else:
                    inp = latents + pl
            else:
                inp = latents
            latents = EpipolarCrossAttention(
                query_dim=2 * self.query_dim if (pl is not None and self.plucker_input_strategy == "concat") else self.query_dim,
                context_dim=self.query_dim,
                out_dim=self.query_dim,
                heads=self.heads,
                dim_head=self.dim_head,
                num_register_tokens=self.num_register_tokens,
                dtype=self.dtype,
                name=f"attn_{i}",
            )(
                inp, x,
                None if kernel_geom is not None else effective_mask,
                lines=lines if kernel_geom is not None else None,
                geom=kernel_geom,
                tile_any=tile_any if kernel_geom is not None else None,
            ) + latents
            latents = ResamplerFeedForward(self.query_dim, self.ff_mult, dtype=self.dtype, name=f"ff_{i}")(latents) + latents

        if self.timestep_embedding_type != "none":
            t_emb = timestep_embedding(jnp.arange(video_length), self.timestep_embedding_dim).astype(latents.dtype)
            if self.timestep_embedding_type == "sinusoidal_embedded":
                t_emb = Dense(self.query_dim, dtype=self.dtype, name="temb_fc1")(t_emb)
                t_emb = nn.silu(t_emb)
                t_emb = Dense(self.query_dim, dtype=self.dtype, name="temb_fc2")(t_emb)
            per_frame = latents.shape[1] // video_length
            latents = latents + jnp.repeat(t_emb, per_frame, axis=0)[None]

        out_queries = self.output_queries or self.num_queries
        if out_queries != self.num_queries:
            assert out_queries % self.num_queries == 0
            upscale_factor = out_queries // self.num_queries
            side = int(self.num_queries**0.5)
            h = latents.reshape(b * video_length, side, side, self.query_dim)
            for u in range(upscale_factor - 1):
                h = TransposedConvolution(self.query_dim, dtype=self.dtype, name=f"upscale_{u}")(h)
            latents = h.reshape(b, -1, self.query_dim)

        latents = Dense(self.output_dim, dtype=self.dtype, name="proj_out")(latents)
        return LayerNormF32(name="norm_out")(latents)


class MultiLatentAdaptor(nn.Module):
    """PerceiverAttention variant (no mask). reference: adaptors.py:185-238."""

    dim: int = 1024
    depth: int = 8
    dim_head: int = 64
    heads: int = 16
    num_queries: int = 8
    embedding_dim: int = 768
    output_dim: int = 1024
    ff_mult: int = 4
    video_length: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        total_queries = self.num_queries * (self.video_length or 1)
        b = x.shape[0]
        latents = self.param(
            "latents", nn.initializers.normal(self.dim**-0.5), (1, total_queries, self.dim), jnp.float32
        )
        latents = jnp.broadcast_to(latents, (b, total_queries, self.dim)).astype(self.dtype)
        x = Dense(self.dim, dtype=self.dtype, name="proj_in")(x)
        for i in range(self.depth):
            latents = PerceiverAttention(self.dim, self.dim_head, self.heads, dtype=self.dtype, name=f"attn_{i}")(x, latents) + latents
            latents = ResamplerFeedForward(self.dim, self.ff_mult, dtype=self.dtype, name=f"ff_{i}")(latents) + latents
        latents = Dense(self.output_dim, dtype=self.dtype, name="proj_out")(latents)
        return LayerNormF32(name="norm_out")(latents)
