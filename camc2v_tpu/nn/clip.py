"""OpenCLIP ViT-H/14 text and image towers (flax.linen, XLA-compiled).

TPU-native rebuild of the frozen conditioning encoders
(reference: CamContextI2V/lvdm/modules/encoders/condition.py:174-372):

  * `CLIPTextTower` — text transformer, causal mask, *penultimate*-layer output
    followed by ln_final (layer="penultimate" semantics: the last resblock is
    skipped) -> (B, 77, 1024).
  * `CLIPVisionTower` — ViT-H/14 visual tower returning the FULL token sequence
    after the transformer, with NO ln_post and NO projection (the reference's
    FrozenOpenCLIPImageEmbedderV2 contract) -> (B, 257, 1280).
  * `clip_preprocess` — [-1,1] video frames -> 224x224 bicubic + CLIP
    normalisation (reference uses kornia bicubic/align_corners; jax.image
    bicubic differs at the pixel-phase level — tolerance documented in tests).

Weights load from the reference checkpoints via utils/torch_import.py.
"""

from __future__ import annotations

import dataclasses


import flax.linen as nn
import jax
import jax.numpy as jnp

from camc2v_tpu.nn.layers import Dense, Dtype, LayerNormF32
from camc2v_tpu.ops.attention import dot_product_attention

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 1024
    heads: int = 16
    layers: int = 24
    output_layer: str = "penultimate"  # or "last"


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1280
    heads: int = 16
    layers: int = 32


class CLIPMLP(nn.Module):
    width: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = Dense(self.width * 4, dtype=self.dtype, name="c_fc")(x)
        h = nn.gelu(h, approximate=False)
        return Dense(self.width, dtype=self.dtype, name="c_proj")(h)


class CLIPAttention(nn.Module):
    width: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal: bool = False):
        b, l, _ = x.shape
        d = self.width // self.heads
        qkv = Dense(3 * self.width, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda t: t.reshape(b, l, self.heads, d)
        mask = None
        if causal:
            mask = jnp.tril(jnp.ones((l, l), dtype=bool))[None, None]
        out = dot_product_attention(split(q), split(k), split(v), mask=mask)
        return Dense(self.width, dtype=self.dtype, name="out_proj")(out.reshape(b, l, self.width))


class CLIPResBlock(nn.Module):
    width: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal: bool = False):
        x = x + CLIPAttention(self.width, self.heads, dtype=self.dtype, name="attn")(
            LayerNormF32(name="ln_1")(x), causal=causal
        )
        x = x + CLIPMLP(self.width, dtype=self.dtype, name="mlp")(LayerNormF32(name="ln_2")(x))
        return x


class CLIPTextTower(nn.Module):
    """Text encoder. Input: (B, 77) int32 token ids. Output: (B, 77, width)."""

    config: CLIPTextConfig = CLIPTextConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        cfg = self.config
        tok_emb = self.param(
            "token_embedding", nn.initializers.normal(0.02), (cfg.vocab_size, cfg.width), jnp.float32
        )
        pos_emb = self.param(
            "positional_embedding", nn.initializers.normal(0.01), (cfg.context_length, cfg.width), jnp.float32
        )
        x = tok_emb[tokens].astype(self.dtype) + pos_emb[None].astype(self.dtype)
        # penultimate semantics: the final resblock is skipped entirely (its
        # weights are dead in the reference too — the importer drops them)
        n_run = cfg.layers - (1 if cfg.output_layer == "penultimate" else 0)
        for i in range(n_run):
            x = CLIPResBlock(cfg.width, cfg.heads, dtype=self.dtype, name=f"resblock_{i}")(x, causal=True)
        return LayerNormF32(name="ln_final")(x)


class CLIPVisionTower(nn.Module):
    """Vision encoder. Input: (B, 224, 224, 3) preprocessed. Output: (B, 257, width)."""

    config: CLIPVisionConfig = CLIPVisionConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        cfg = self.config
        b = images.shape[0]
        grid = cfg.image_size // cfg.patch_size
        x = nn.Conv(
            cfg.width,
            (cfg.patch_size, cfg.patch_size),
            strides=cfg.patch_size,
            use_bias=False,
            padding="VALID",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv1",
        )(images.astype(self.dtype))
        x = x.reshape(b, grid * grid, cfg.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (cfg.width,), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.width)), x], axis=1)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01), (grid * grid + 1, cfg.width), jnp.float32
        )
        x = x + pos[None].astype(self.dtype)
        x = LayerNormF32(name="ln_pre")(x)
        for i in range(cfg.layers):
            x = CLIPResBlock(cfg.width, cfg.heads, dtype=self.dtype, name=f"resblock_{i}")(x)
        # NOTE: no ln_post / projection — full token sequence (reference V2 contract)
        return x


def clip_preprocess(frames: jax.Array) -> jax.Array:
    """[-1,1] (N, H, W, 3) frames -> CLIP-normalised (N, 224, 224, 3).

    reference: condition.py:333-341 (kornia bicubic resize + normalize).
    """
    n, h, w, c = frames.shape
    x = jax.image.resize(frames, (n, 224, 224, c), method="bicubic")
    x = (x + 1.0) / 2.0
    mean = jnp.asarray(CLIP_MEAN, dtype=x.dtype)
    std = jnp.asarray(CLIP_STD, dtype=x.dtype)
    return (x - mean) / std
