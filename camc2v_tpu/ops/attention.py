"""Functional attention core.

One entry point — `dot_product_attention(q, k, v, ...)` over (B, L, H, D) —
that every attention module in the framework calls. This is the single swap
point for the fused Pallas flash-attention kernel (ops/flash_attention.py):
modules never spell out einsums themselves.

Replaces the reference's xformers `memory_efficient_attention` +
`torch.nn.functional.scaled_dot_product_attention` call sites
(reference: CamContextI2V/lvdm/modules/attention.py:148-211,
model/modules/epipolar.py:99).

Numerics: QK^T and PV products run in the input dtype (bf16 on TPU → MXU),
softmax accumulates in float32 — matching both xformers and SDPA semantics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# Pallas flash kernel is used automatically on TPU for large sequence lengths;
# override with use_pallas_flash(True/False) to force either path.
_USE_PALLAS_FLASH: Optional[bool] = None
# Min query length for the flash path. 512 keeps short-seq attention on XLA;
# override (e.g. 256) via env to route the ds16 cross-attn sites to flash.
import os as _os

_MIN_FLASH_LEN = int(_os.environ.get("CAMC2V_MIN_FLASH_LEN", "512"))


def use_pallas_flash(enabled: Optional[bool] = True) -> None:
    """Force (True/False) or restore auto (None) flash-kernel dispatch."""
    global _USE_PALLAS_FLASH
    _USE_PALLAS_FLASH = enabled


def _flash_enabled() -> bool:
    if _USE_PALLAS_FLASH is not None:
        return _USE_PALLAS_FLASH
    import jax as _jax

    # TPU backends may be registered under plugin names (e.g. 'axon'); the
    # Mosaic kernel path applies to any non-CPU backend in this image
    return _jax.default_backend() != "cpu"


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    bias: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Multi-head scaled dot-product attention.

    Args:
      q: (B, Lq, H, D)
      k: (B, Lk, H, D)
      v: (B, Lk, H, D)
      bias: optional additive logits bias, broadcastable to (B, H, Lq, Lk)
      mask: optional boolean mask, True = attend, broadcastable to (B, H, Lq, Lk)
      scale: logit scale; default D**-0.5

    Returns: (B, Lq, H, D) in q.dtype.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5

    if bias is None and q.shape[1] >= _MIN_FLASH_LEN and _flash_enabled():
        from camc2v_tpu.ops import flash_attention as fa

        # flash takes a (B, Lq, Lk) mask shared across heads
        fmask = mask
        if fmask is not None and fmask.ndim == 4:
            if fmask.shape[1] == 1:
                fmask = fmask[:, 0]
            else:
                fmask = None  # per-head masks stay on the XLA path
        if fmask is None and mask is not None:
            pass  # unsupported mask layout -> XLA
        elif fa.flash_supported(q, k, fmask):
            # under a mesh trace, shard_map the kernel over `data`: SPMD
            # cannot partition custom calls and would otherwise all-gather
            # the GLOBAL batch around every site (parallel/kernel_shard.py)
            from camc2v_tpu.parallel.kernel_shard import data_shard

            if fmask is None:
                return data_shard(
                    lambda q_, k_, v_: fa.flash_attention(q_, k_, v_, scale=scale),
                    (q, k, v), (0, 0, 0), 0,
                )
            return data_shard(
                lambda q_, k_, v_, m_: fa.flash_attention(q_, k_, v_, mask=m_, scale=scale),
                (q, k, v, fmask), (0, 0, 0, 0), 0,
            )

    return _xla_attention(q, k, v, bias=bias, mask=mask, scale=scale)


def _xla_attention(q, k, v, *, bias, mask, scale):
    dtype = q.dtype
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        big_neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(mask, logits, big_neg)
    probs = jax.nn.softmax(logits, axis=-1)
    # fully-masked query rows produce uniform probs over masked keys after the
    # where() above only when at least one key survives; guard the all-masked
    # case (reference relies on hybrid-attention fallbacks instead — keep the
    # raw softmax semantics here to match SDPA).
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dtype), v, preferred_element_type=jnp.float32)
    return out.astype(dtype)


def attention_merged_heads(
    q: jax.Array, k: jax.Array, v: jax.Array, num_heads: int, **kwargs
) -> jax.Array:
    """Attention over (B, L, H*D) inputs, splitting/merging heads internally."""
    b, lq, inner = q.shape
    d = inner // num_heads
    split = lambda x: x.reshape(x.shape[0], x.shape[1], num_heads, d)
    out = dot_product_attention(split(q), split(k), split(v), **kwargs)
    return out.reshape(b, lq, inner)
