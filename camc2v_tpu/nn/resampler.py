"""Perceiver-style image-token resampler and linear projection model.

reference: CamContextI2V/lvdm/modules/encoders/resampler.py:13-165. The
flagship config uses 16 queries/frame x 16 frames (num_queries=16,
video_length=16) with a per-frame timestep embedding added before the output
projection (`use_timestep_emb: true`).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from camc2v_tpu.core.schedules import timestep_embedding
from camc2v_tpu.nn.layers import Dense, Dtype, LayerNormF32


class ImageProjModel(nn.Module):
    """Linear projection of a pooled CLIP embedding into N context tokens.

    reference: resampler.py:13-27.
    """

    cross_attention_dim: int = 1024
    clip_extra_context_tokens: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeds: jax.Array) -> jax.Array:
        out = Dense(
            self.clip_extra_context_tokens * self.cross_attention_dim, dtype=self.dtype, name="proj"
        )(image_embeds)
        out = out.reshape(-1, self.clip_extra_context_tokens, self.cross_attention_dim)
        return LayerNormF32(name="norm")(out)


class PerceiverAttention(nn.Module):
    """Latent queries attend over [context ‖ latents].

    reference: resampler.py:52-97 — note the stability trick of scaling both
    q and k by d^-1/4 before the product.
    """

    dim: int
    dim_head: int = 64
    heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, latents: jax.Array) -> jax.Array:
        inner = self.dim_head * self.heads
        x = LayerNormF32(name="norm1")(x)
        latents = LayerNormF32(name="norm2")(latents)
        b, l, _ = latents.shape

        q = Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(latents)
        kv_input = jnp.concatenate([x, latents], axis=-2)
        kv = Dense(inner * 2, use_bias=False, dtype=self.dtype, name="to_kv")(kv_input)
        k, v = jnp.split(kv, 2, axis=-1)

        split = lambda t: t.reshape(b, t.shape[1], self.heads, self.dim_head).transpose(0, 2, 1, 3)
        qh, kh, vh = split(q), split(k), split(v)
        scale = 1.0 / math.sqrt(math.sqrt(self.dim_head))
        weight = jnp.einsum(
            "bhqd,bhkd->bhqk", qh * scale, kh * scale, preferred_element_type=jnp.float32
        )
        probs = jax.nn.softmax(weight, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, inner)
        return Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_out")(out)


class ResamplerFeedForward(nn.Module):
    """LN -> Linear -> GELU -> Linear (bias-free). reference: resampler.py:31-38."""

    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = LayerNormF32(name="norm")(x)
        h = Dense(int(self.dim * self.mult), use_bias=False, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        return Dense(self.dim, use_bias=False, dtype=self.dtype, name="fc2")(h)


class Resampler(nn.Module):
    """reference: resampler.py:100-165."""

    dim: int = 1024
    depth: int = 8
    dim_head: int = 64
    heads: int = 16
    num_queries: int = 8
    embedding_dim: int = 768
    output_dim: int = 1024
    ff_mult: int = 4
    video_length: Optional[int] = None
    use_timestep_emb: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, L_in, embedding_dim) -> (B, num_queries[*video_length], output_dim)."""
        total_queries = self.num_queries * (self.video_length or 1)
        latents = self.param(
            "latents",
            nn.initializers.normal(self.dim**-0.5),
            (1, total_queries, self.dim),
            jnp.float32,
        )
        latents = jnp.broadcast_to(latents, (x.shape[0], total_queries, self.dim)).astype(self.dtype)
        x = Dense(self.dim, dtype=self.dtype, name="proj_in")(x)

        for i in range(self.depth):
            latents = PerceiverAttention(
                self.dim, self.dim_head, self.heads, dtype=self.dtype, name=f"attn_{i}"
            )(x, latents) + latents
            latents = ResamplerFeedForward(self.dim, self.ff_mult, dtype=self.dtype, name=f"ff_{i}")(
                latents
            ) + latents

        if self.use_timestep_emb:
            assert self.video_length is not None
            t_emb = timestep_embedding(jnp.arange(self.video_length), self.dim).astype(latents.dtype)
            t_emb = Dense(self.dim, dtype=self.dtype, name="temb_fc1")(t_emb)
            t_emb = nn.silu(t_emb)
            t_emb = Dense(self.dim, dtype=self.dtype, name="temb_fc2")(t_emb)
            # (T, C) -> (1, T*L, C): each frame's L queries share its embedding
            per_frame = latents.shape[1] // self.video_length
            t_emb = jnp.repeat(t_emb, per_frame, axis=0)[None]
            latents = latents + t_emb

        latents = Dense(self.output_dim, dtype=self.dtype, name="proj_out")(latents)
        return LayerNormF32(name="norm_out")(latents)
