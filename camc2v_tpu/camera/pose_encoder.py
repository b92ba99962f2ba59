"""Camera pose encoder: Plücker maps -> per-level feature pyramid.

TPU-native rebuild of the CamI2V/CameraCtrl-style encoder
(reference: CamContextI2V/model/modules/camera_pose_encoder.py:295-376):
PixelUnshuffle(8) on (B, T, H, W, 6) Plücker maps, conv-in, then 4 levels of
[ResnetBlock -> temporal self-attention block] x nums_rb with stride-2
downsampling between levels. Returns one (B, T, h_l, w_l, C_l) feature map per
level, matching the UNet's ds {1, 2, 4, 8} latent pyramid.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from camc2v_tpu.core.schedules import sinusoidal_positional_encoding
from camc2v_tpu.nn.layers import Conv, Dense, Dtype, LayerNormF32
from camc2v_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class PoseEncoderConfig:
    """Mirrors the reference ctor (configs/models/camcontexti2v_256.yaml:125-139)."""

    downscale_factor: int = 8
    channels: tuple[int, ...] = (320, 640, 1280, 1280)
    nums_rb: int = 2
    cin: int = 384  # 6 plucker channels * 8 * 8
    ksize: int = 1
    sk: bool = True
    use_conv: bool = False
    compression_factor: int = 1
    temporal_attention_nhead: int = 8
    temporal_position_encoding: bool = True
    temporal_position_encoding_max_len: int = 16


def pixel_unshuffle(x: jax.Array, r: int) -> jax.Array:
    """(N, H*r, W*r, C) -> (N, H, W, C*r*r) with torch channel order (c, i, j)."""
    n, hr, wr, c = x.shape
    h, w = hr // r, wr // r
    x = x.reshape(n, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # n h w c i j
    return x.reshape(n, h, w, c * r * r)


class PoseResnetBlock(nn.Module):
    """reference: camera_pose_encoder.py:257-291 (ksize=1, sk=True, avg-pool down)."""

    out_channels: int
    down: bool
    ksize: int = 1
    sk: bool = True
    use_conv: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.down:
            if self.use_conv:
                x = Conv(x.shape[-1], (3, 3), strides=2, dtype=self.dtype, name="down_conv")(x)
            else:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        in_c = x.shape[-1]
        if in_c != self.out_channels or not self.sk:
            x = Conv(self.out_channels, (self.ksize, self.ksize), dtype=self.dtype, name="in_conv")(x)
        h = Conv(self.out_channels, (3, 3), dtype=self.dtype, name="block1")(x)
        h = nn.relu(h)
        h = Conv(self.out_channels, (self.ksize, self.ksize), dtype=self.dtype, name="block2")(h)
        if not self.sk:
            x = Conv(self.out_channels, (self.ksize, self.ksize), dtype=self.dtype, name="skep")(x)
        return h + x


class PoseTemporalAttention(nn.Module):
    """LayerNorm -> (pos-enc) -> MHA over the frame axis -> FF(GEGLU), residual.

    reference: camera_pose_encoder.py:15-158 (TemporalTransformerBlock with a
    single 'Temporal_Self' attention; diffusers Attention = bias-free qkv,
    biased out-proj; FeedForward geglu).
    Input tokens: (N, T, C).
    """

    heads: int
    max_len: int = 16
    use_pos_encoding: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, t, c = x.shape
        d = c // self.heads

        h = LayerNormF32(name="norm")(x)
        if self.use_pos_encoding:
            pe = jnp.asarray(sinusoidal_positional_encoding(self.max_len, c))[:t]
            h = h + pe[None].astype(h.dtype)
        q = Dense(c, use_bias=False, dtype=self.dtype, name="to_q")(h)
        k = Dense(c, use_bias=False, dtype=self.dtype, name="to_k")(h)
        v = Dense(c, use_bias=False, dtype=self.dtype, name="to_v")(h)
        split = lambda a: a.reshape(n, t, self.heads, d)
        out = dot_product_attention(split(q), split(k), split(v)).reshape(n, t, c)
        x = Dense(c, dtype=self.dtype, name="to_out")(out) + x

        # GEGLU feed-forward
        hf = LayerNormF32(name="ff_norm")(x)
        proj = Dense(c * 8, dtype=self.dtype, name="ff_proj")(hf)
        a, gate = jnp.split(proj, 2, axis=-1)
        hf = a * nn.gelu(gate, approximate=False)  # diffusers GEGLU uses exact gelu
        x = Dense(c, dtype=self.dtype, name="ff_out")(hf) + x
        return x


class CameraPoseEncoder(nn.Module):
    """(B, T, H, W, 6) Plücker maps -> tuple of (B, T, h_l, w_l, C_l) features."""

    config: PoseEncoderConfig = PoseEncoderConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, plucker: jax.Array) -> tuple[jax.Array, ...]:
        cfg = self.config
        b, t, H, W, c = plucker.shape
        x = plucker.reshape(b * t, H, W, c).astype(self.dtype)
        x = pixel_unshuffle(x, cfg.downscale_factor)
        x = Conv(cfg.channels[0], (3, 3), dtype=self.dtype, name="conv_in")(x)

        features = []
        for i, ch in enumerate(cfg.channels):
            for j in range(cfg.nums_rb):
                # exact reference branch order (camera_pose_encoder.py:320-336):
                # j==0 always outputs ch/cf (downsampling when i!=0); the LAST
                # block (j==nums_rb-1, j>0) restores full ch
                down = j == 0 and i != 0
                if j == 0 or j != cfg.nums_rb - 1:
                    out_dim = int(ch / cfg.compression_factor)
                else:
                    out_dim = ch
                x = PoseResnetBlock(
                    out_channels=out_dim, down=down, ksize=cfg.ksize, sk=cfg.sk,
                    use_conv=cfg.use_conv, dtype=self.dtype, name=f"level{i}_res{j}",
                )(x)
                n, hh, ww, cc = x.shape
                tokens = x.reshape(b, t, hh, ww, cc).transpose(0, 2, 3, 1, 4).reshape(b * hh * ww, t, cc)
                tokens = PoseTemporalAttention(
                    heads=cfg.temporal_attention_nhead,
                    max_len=cfg.temporal_position_encoding_max_len,
                    use_pos_encoding=cfg.temporal_position_encoding,
                    dtype=self.dtype,
                    name=f"level{i}_attn{j}",
                )(tokens)
                x = tokens.reshape(b, hh, ww, t, cc).transpose(0, 3, 1, 2, 4).reshape(n, hh, ww, cc)
            features.append(x.reshape(b, t, hh, ww, cc))
        return tuple(features)
