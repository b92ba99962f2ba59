"""Deterministic stand-ins for the frozen CLIP towers, importable by the
reference's `instantiate_from_config` (target: "oracle_dummies.X").

These are NOT CLIP re-implementations — CLIP parity is covered by the repo's
layer-level torch-parity tests. They exist so the *composition* around the
encoders (get_batch_input orchestration, resampler, adaptor, CFG masks) can be
compared exactly: each dummy is a fixed deterministic function of its input,
with an identical JAX twin in this module.

No torch parameters/buffers are registered, so they contribute nothing to the
state_dict.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn

TEXT_LEN = 77
TEXT_DIM = 16
VIS_TOKENS = 5  # 1 global + 2x2 pooled patches
VIS_DIM = 12

_rng = np.random.default_rng(1234)
TEXT_EMB = _rng.normal(size=(TEXT_LEN, TEXT_DIM)).astype(np.float32)
VIS_PROJ = _rng.normal(size=(3, VIS_DIM)).astype(np.float32)


class DummyTextEncoder(nn.Module):
    """Returns the fixed TEXT_EMB table for every prompt."""

    def __init__(self, **kwargs):
        super().__init__()

    def forward(self, text):
        b = len(text) if isinstance(text, (list, tuple)) else text.shape[0]
        emb = torch.from_numpy(TEXT_EMB)
        return emb.unsqueeze(0).repeat(b, 1, 1)


class DummyVisionEncoder(nn.Module):
    """(B, 3, H, W) image in [-1,1] -> (B, VIS_TOKENS, VIS_DIM) tokens.

    Global mean + 2x2 average-pooled patches, projected by a fixed matrix.
    """

    def __init__(self, **kwargs):
        super().__init__()

    def forward(self, img):
        pooled = torch.nn.functional.adaptive_avg_pool2d(img, (2, 2))  # b,3,2,2
        patches = pooled.flatten(2).transpose(1, 2)  # b,4,3  (index h*2+w)
        glob = img.mean(dim=(2, 3)).unsqueeze(1)  # b,1,3
        tok = torch.cat([glob, patches], dim=1)  # b,5,3
        return tok @ torch.from_numpy(VIS_PROJ)


# ------------------------------------------------------------ JAX twins
def jax_dummy_text(batch_size: int):
    import jax.numpy as jnp

    return jnp.broadcast_to(jnp.asarray(TEXT_EMB), (batch_size, TEXT_LEN, TEXT_DIM))


def jax_dummy_vision(frames):
    """(B, H, W, 3) -> (B, VIS_TOKENS, VIS_DIM); numerically == DummyVisionEncoder."""
    import jax.numpy as jnp

    b, h, w, c = frames.shape
    pooled = frames.reshape(b, 2, h // 2, 2, w // 2, c).mean(axis=(2, 4))  # b,2,2,3
    patches = pooled.reshape(b, 4, c)
    glob = frames.mean(axis=(1, 2))[:, None]  # b,1,3
    tok = jnp.concatenate([glob, patches], axis=1)
    return tok @ jnp.asarray(VIS_PROJ)
