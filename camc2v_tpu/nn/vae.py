"""AutoencoderKL first stage (flax.linen, channels-last).

TPU-native rebuild of the reference VAE
(reference: CamContextI2V/lvdm/models/autoencoder.py:13-199 and
lvdm/modules/networks/ae_modules.py:364-585): 2D conv encoder/decoder with
ch_mult (1,2,4,4), mid-block attention, z_channels=4, double_z moments output.
Video batches are handled frame-wise by the caller (models/first_stage.py
helpers) — the VAE itself only ever sees (N, H, W, C) images.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from camc2v_tpu.nn.layers import Conv, Dtype, GroupNorm32
from camc2v_tpu.ops.attention import attention_merged_heads


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """Mirrors the reference `ddconfig` (configs/models/camcontexti2v_256.yaml:78-93)."""

    double_z: bool = True
    z_channels: int = 4
    resolution: int = 256
    in_channels: int = 3
    out_ch: int = 3
    ch: int = 128
    ch_mult: tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: tuple[int, ...] = ()
    dropout: float = 0.0
    embed_dim: int = 4


class AEResnetBlock(nn.Module):
    """GN-SiLU-conv x2 residual block. reference: ae_modules.py (ResnetBlock)."""

    out_channels: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        in_ch = x.shape[-1]
        h = GroupNorm32(epsilon=1e-6, name="norm1")(x, silu=True)
        h = Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv1")(h)
        h = GroupNorm32(epsilon=1e-6, name="norm2")(h, silu=True)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = Conv(self.out_channels, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AEAttnBlock(nn.Module):
    """Single-head spatial self-attention. reference: ae_modules.py (AttnBlock)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        hn = GroupNorm32(epsilon=1e-6, name="norm")(x).reshape(n, h * w, c)
        q = Conv(c, (1, 1), dtype=self.dtype, name="q")(hn.reshape(n, h, w, c)).reshape(n, h * w, c)
        k = Conv(c, (1, 1), dtype=self.dtype, name="k")(hn.reshape(n, h, w, c)).reshape(n, h * w, c)
        v = Conv(c, (1, 1), dtype=self.dtype, name="v")(hn.reshape(n, h, w, c)).reshape(n, h * w, c)
        out = attention_merged_heads(q, k, v, num_heads=1)
        out = Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out.reshape(n, h, w, c))
        return x + out


class Encoder(nn.Module):
    """reference: ae_modules.py:364-469."""

    config: VAEConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        cfg = self.config
        h = Conv(cfg.ch, (3, 3), dtype=self.dtype, name="conv_in")(x)
        curr_res = cfg.resolution
        for i, mult in enumerate(cfg.ch_mult):
            for j in range(cfg.num_res_blocks):
                h = AEResnetBlock(cfg.ch * mult, cfg.dropout, dtype=self.dtype, name=f"down_{i}_block_{j}")(
                    h, deterministic=deterministic
                )
                if curr_res in cfg.attn_resolutions:
                    h = AEAttnBlock(dtype=self.dtype, name=f"down_{i}_attn_{j}")(h)
            if i != len(cfg.ch_mult) - 1:
                # asymmetric pad (0,1) then stride-2 conv — matches reference Downsample
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(
                    h.shape[-1], (3, 3), strides=2, padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32, name=f"down_{i}_downsample",
                )(h)
                curr_res //= 2
        h = AEResnetBlock(h.shape[-1], cfg.dropout, dtype=self.dtype, name="mid_block_1")(h, deterministic=deterministic)
        h = AEAttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = AEResnetBlock(h.shape[-1], cfg.dropout, dtype=self.dtype, name="mid_block_2")(h, deterministic=deterministic)
        h = GroupNorm32(epsilon=1e-6, name="norm_out")(h, silu=True)
        z_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return Conv(z_ch, (3, 3), dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    """reference: ae_modules.py:471-585."""

    config: VAEConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array, *, deterministic: bool = True) -> jax.Array:
        cfg = self.config
        block_in = cfg.ch * cfg.ch_mult[-1]
        h = Conv(block_in, (3, 3), dtype=self.dtype, name="conv_in")(z)
        h = AEResnetBlock(block_in, cfg.dropout, dtype=self.dtype, name="mid_block_1")(h, deterministic=deterministic)
        h = AEAttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = AEResnetBlock(block_in, cfg.dropout, dtype=self.dtype, name="mid_block_2")(h, deterministic=deterministic)
        for i, mult in reversed(list(enumerate(cfg.ch_mult))):
            for j in range(cfg.num_res_blocks + 1):
                h = AEResnetBlock(cfg.ch * mult, cfg.dropout, dtype=self.dtype, name=f"up_{i}_block_{j}")(
                    h, deterministic=deterministic
                )
            if i != 0:
                n, hh, ww, c = h.shape
                h = jax.image.resize(h, (n, hh * 2, ww * 2, c), "nearest")
                h = Conv(c, (3, 3), dtype=self.dtype, name=f"up_{i}_upsample")(h)
        h = GroupNorm32(epsilon=1e-6, name="norm_out")(h, silu=True)
        return Conv(cfg.out_ch, (3, 3), dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """KL autoencoder with quant/post-quant 1x1 convs.

    reference: lvdm/models/autoencoder.py:13-103. `encode` returns moments
    (mean‖logvar) — sampling/mode selection happens via core.distributions.
    """

    config: VAEConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype, name="encoder")
        self.decoder = Decoder(self.config, dtype=self.dtype, name="decoder")
        z_ch = 2 * self.config.z_channels if self.config.double_z else self.config.z_channels
        self.quant_conv = Conv(2 * self.config.embed_dim, (1, 1), dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = Conv(self.config.z_channels, (1, 1), dtype=self.dtype, name="post_quant_conv")

    def encode(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        moments = self.encoder(x, deterministic=deterministic)
        return self.quant_conv(moments)

    def decode(self, z: jax.Array, *, deterministic: bool = True) -> jax.Array:
        z = self.post_quant_conv(z)
        return self.decoder(z, deterministic=deterministic)

    def __call__(self, x: jax.Array, rng: Optional[jax.Array] = None, *, sample_posterior: bool = False):
        from camc2v_tpu.core import distributions as D

        moments = self.encode(x)
        z = D.sample(moments, rng) if sample_posterior else D.mode(moments)
        return self.decode(z), moments
