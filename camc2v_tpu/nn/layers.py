"""Primitive NN layers shared across the framework (flax.linen, channels-last).

TPU-native equivalents of the reference's lvdm/basics.py building blocks:
GroupNorm with float32 statistics (reference GroupNorm32, lvdm/basics.py:78-80),
zero-initialised projections (`zero_module`), and the ResBlock/TemporalConvBlock
pair of the 3D UNet (reference: lvdm/modules/networks/openaimodel3d.py:109-279).

All video tensors are channels-last: spatial convs see (N, H, W, C); temporal
convs see (B, T, H, W, C) and convolve the T axis only — this is the layout XLA
tiles best onto the MXU without transposes.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

zeros_init = nn.initializers.zeros_init()


class DenseParams(nn.Module):
    """Kernel/bias container named+initialised like nn.Dense so param paths
    (and the torch-checkpoint importer's `to_q/kernel` mapping) stay unchanged
    when a fused kernel consumes the weights directly instead of calling the
    Dense module."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features), jnp.float32
        )
        bias = None
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


class _LNScaleBias(nn.Module):
    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return scale, bias


class LayerNormParams(nn.Module):
    """Param container mirroring LayerNormF32's tree (`<name>/LayerNorm_0/
    {scale,bias}`) for kernels that fuse the LayerNorm themselves."""

    features: int

    @nn.compact
    def __call__(self):
        return _LNScaleBias(self.features, name="LayerNorm_0")()


class _GNParams(nn.Module):
    """Scale/bias container named like nn.GroupNorm so param paths (and the
    torch-checkpoint importer's `GroupNorm_0/scale` mapping) stay unchanged."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return scale, bias


class GroupNorm32(nn.Module):
    """GroupNorm computing statistics in float32 regardless of input dtype.

    On TPU, eligible shapes run the fused one-HBM-pass Pallas kernel
    (ops/groupnorm.py) with an optional fused SiLU; other shapes / CPU use the
    numerically identical plain-XLA path.
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, silu: bool = False) -> jax.Array:
        c = x.shape[-1]
        groups = self.num_groups
        if c % groups != 0:  # tiny test configs; production channel counts divide 32
            import math as _math

            groups = _math.gcd(c, groups)
        scale, bias = _GNParams(c, name="GroupNorm_0")()

        from camc2v_tpu.ops import groupnorm as gnops

        if jax.default_backend() != "cpu":
            if gnops.group_norm_supported(x, groups):
                from camc2v_tpu.parallel.kernel_shard import data_shard

                return data_shard(
                    lambda x_, s_, b_: gnops.group_norm_fused(
                        x_, s_, b_, num_groups=groups, eps=self.epsilon, silu=silu
                    ),
                    (x, scale, bias), (0, None, None), 0,
                )
            # 5-D temporal norms (stats per (B, group) over T*H*W): two
            # row-parallel kernels sharing the proven 4-D block layout. The
            # earlier one-call streaming kernel (group_norm_fused_big) was NET
            # NEGATIVE (194.2 vs 186.9 ms/step): roofline kernel, but its
            # (B, 2, T) revisited-output grid forced 42 MB layout copies at
            # every call site — the split form avoids that by construction.
            import os as _os

            if x.ndim >= 5 and gnops.group_norm_temporal_supported(x, groups) and _os.environ.get(
                "CAMC2V_GN_TEMPORAL", "0"
            ) == "1":
                return gnops.group_norm_fused_temporal(
                    x, scale, bias, num_groups=groups, eps=self.epsilon, silu=silu
                )
            # Large 4-D maps (the VAE's 256^2 norms, ~34 MB/sample) reuse the
            # same two-phase kernels by viewing (N, H, W, C) as (N, s, H/s*W, C):
            # stats per sample over all of H,W either way. Own gate: the
            # CAMC2V_GN_TEMPORAL negative A/B (r3c) measured the UNet's many
            # SMALL 5-D temporal sites — the VAE's few huge maps are a
            # different regime (the e2e per-call fixed cost, not the step).
            if x.ndim == 4 and _os.environ.get("CAMC2V_GN_BIG4D", "0") == "1":
                n_, h_, w_, c_ = x.shape
                for s_ in range(2, h_ + 1):
                    if h_ % s_ != 0:
                        continue
                    xv = x.reshape(n_, s_, (h_ // s_) * w_, c_)
                    if gnops.group_norm_temporal_supported(xv, groups):
                        return gnops.group_norm_fused_temporal(
                            xv, scale, bias, num_groups=groups, eps=self.epsilon, silu=silu
                        ).reshape(x.shape)
        return gnops.group_norm_plain(
            x, scale, bias, num_groups=groups, eps=self.epsilon, silu=silu
        )


class LayerNormF32(nn.Module):
    """LayerNorm with float32 statistics; output cast back to input dtype."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from camc2v_tpu.ops import layernorm as lnops

        import os as _os

        if (
            jax.default_backend() != "cpu"
            and lnops.layer_norm_supported(x)
            and _os.environ.get("CAMC2V_LN_FUSED", "0") == "1"
        ):
            # same param tree as the nn.LayerNorm path (LayerNorm_0/{scale,bias})
            scale, bias = _LNScaleBias(x.shape[-1], name="LayerNorm_0")()
            return lnops.layer_norm_fused(x, scale, bias, eps=self.epsilon)
        orig_dtype = x.dtype
        out = nn.LayerNorm(epsilon=self.epsilon, dtype=jnp.float32, param_dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        return out.astype(orig_dtype)


def Dense(features: int, *, use_bias: bool = True, zero_init: bool = False, dtype=jnp.float32, name=None):
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=zeros_init if zero_init else nn.initializers.lecun_normal(),
        bias_init=zeros_init,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def Conv(features: int, kernel_size, *, strides=1, zero_init: bool = False, dtype=jnp.float32, name=None):
    # Explicit symmetric torch-style padding ((k-1)//2 per side), NOT "SAME":
    # they agree at stride 1, but for the stride-2 Downsample conv on even
    # dims SAME pads (0,1) while torch's padding=1 pads (1,1) — a real
    # numerical divergence caught by tests/test_reference_parity.py.
    padding = tuple(((k - 1) // 2, (k - 1) // 2) for k in kernel_size)
    return nn.Conv(
        features,
        kernel_size=kernel_size,
        strides=strides,
        padding=padding,
        kernel_init=zeros_init if zero_init else nn.initializers.lecun_normal(),
        bias_init=zeros_init,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class TimestepEmbedMLP(nn.Module):
    """Linear -> SiLU -> Linear over a sinusoidal embedding.

    reference: UNetModel.time_embed / fps_embedding (openaimodel3d.py:370-382);
    fps variant zero-inits the final layer.
    """

    features: int
    zero_init_final: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, emb: jax.Array) -> jax.Array:
        h = Dense(self.features, dtype=self.dtype, name="fc1")(emb)
        h = nn.silu(h)
        h = Dense(self.features, zero_init=self.zero_init_final, dtype=self.dtype, name="fc2")(h)
        return h


class Upsample(nn.Module):
    """2x nearest-neighbour upsample + optional 3x3 conv (spatial dims only).

    reference: openaimodel3d.py:80-106.
    """

    out_channels: int
    use_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (N, H, W, C)
        n, h, w, c = x.shape
        x = jax.image.resize(x, (n, h * 2, w * 2, c), method="nearest")
        if self.use_conv:
            x = Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv")(x)
        return x


class Downsample(nn.Module):
    """Stride-2 3x3 conv (or avg-pool) downsample. reference: openaimodel3d.py:51-77."""

    out_channels: int
    use_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.use_conv:
            return Conv(self.out_channels, (3, 3), strides=2, dtype=self.dtype, name="op")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class TemporalConvBlock(nn.Module):
    """Temporal residual conv block with zero-init last conv (identity at init).

    Four (GN, SiLU, Conv3d) stages convolving only the frame axis
    (kernel (3,1,1)); reference: openaimodel3d.py:239-279.
    Input: (B, T, H, W, C).
    """

    channels: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        identity = x

        def stage(h, name, zero_init=False, use_dropout=False):
            h = GroupNorm32(name=f"{name}_norm")(h, silu=True)
            if use_dropout and self.dropout > 0:
                h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = nn.Conv(
                self.channels,
                kernel_size=(3, 1, 1),
                padding=((1, 1), (0, 0), (0, 0)),
                kernel_init=zeros_init if zero_init else nn.initializers.lecun_normal(),
                bias_init=zeros_init,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"{name}_conv",
            )(h)
            return h

        x = stage(x, "conv1")
        x = stage(x, "conv2", use_dropout=True)
        x = stage(x, "conv3", use_dropout=True)
        x = stage(x, "conv4", zero_init=True, use_dropout=True)
        return identity + x


class ResBlock(nn.Module):
    """UNet residual block with timestep-embedding injection.

    reference: openaimodel3d.py:109-236. Operates frame-wise on (B*T, H, W, C);
    when `use_temporal_conv`, a TemporalConvBlock runs on the (B, T, ...) view.
    """

    out_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    use_temporal_conv: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        emb: jax.Array,
        *,
        batch_size: Optional[int] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        in_ch = x.shape[-1]

        h = GroupNorm32(name="in_norm")(x, silu=True)
        if self.up:
            h = jax.image.resize(h, (h.shape[0], h.shape[1] * 2, h.shape[2] * 2, h.shape[3]), "nearest")
            x = jax.image.resize(x, (x.shape[0], x.shape[1] * 2, x.shape[2] * 2, x.shape[3]), "nearest")
        elif self.down:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        h = Conv(self.out_channels, (3, 3), dtype=self.dtype, name="in_conv")(h)

        emb_out = Dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            dtype=self.dtype,
            name="emb_proj",
        )(nn.silu(emb))
        emb_out = emb_out[:, None, None, :]  # (N,1,1,C)

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(name="out_norm")(h) * (1 + scale) + shift
        else:
            h = h + emb_out
            h = GroupNorm32(name="out_norm")(h, silu=True)
        if self.use_scale_shift_norm:
            h = nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = Conv(self.out_channels, (3, 3), zero_init=True, dtype=self.dtype, name="out_conv")(h)

        if in_ch != self.out_channels:
            x = Conv(self.out_channels, (1, 1), dtype=self.dtype, name="skip")(x)
        h = x + h

        if self.use_temporal_conv and batch_size is not None:
            n, hh, ww, c = h.shape
            t = n // batch_size
            h5 = h.reshape(batch_size, t, hh, ww, c)
            h5 = TemporalConvBlock(self.out_channels, dropout=0.1, dtype=self.dtype, name="temporal_conv")(
                h5, deterministic=deterministic
            )
            h = h5.reshape(n, hh, ww, c)
        return h
