"""Selective-remat policies for the UNet block checkpoint (r5 train attack).

The "pallas"/"dots_pallas" policies mark `pallas_call` outputs saveable so the
kernels' custom_vjp residuals (out, lse) are STORED rather than recomputed in
the backward — verified here via jax.ad_checkpoint.saved_residuals on the real
flash kernel (the r5 train profile attributed ~58 ms/step to kernel fwd
re-runs under the blanket remat). Reference analogue of the blanket mode:
CamContextI2V lvdm/common.py:81-94 (checkpoint everywhere, save nothing).
"""

import os

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
import pytest

from camc2v_tpu.nn.unet3d import _remat_policy
from camc2v_tpu.ops.flash_attention import flash_attention


def test_policy_resolution():
    assert _remat_policy(None) is None
    assert _remat_policy("none") is None
    for name in ("dots", "dots_batch", "pallas", "dots_pallas"):
        assert callable(_remat_policy(name)), name
    with pytest.raises(ValueError):
        _remat_policy("nope")


def test_env_override(monkeypatch):
    monkeypatch.setenv("CAMC2V_REMAT_POLICY", "pallas")
    assert callable(_remat_policy(None))
    monkeypatch.setenv("CAMC2V_REMAT_POLICY", "none")
    assert _remat_policy("dots") is None  # env wins over the config value


def _saved_descriptions(policy):
    B, L, H, D = 1, 256, 2, 64
    q = jnp.ones((B, L, H, D), jnp.bfloat16)
    w = jnp.ones((H * D, H * D), jnp.bfloat16)

    def body(x, k, v):
        qp = (x.reshape(B * L, H * D) @ w).reshape(B, L, H, D)
        return flash_attention(qp, k, v).astype(jnp.float32) ** 2

    f = jax.checkpoint(body, policy=policy)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        jax.ad_checkpoint.print_saved_residuals(f, q, q, q)
    return buf.getvalue().splitlines()


def test_dots_pallas_saves_kernel_residuals():
    saved = _saved_descriptions(_remat_policy("dots_pallas"))
    assert any("pallas_call" in d for d in saved), saved  # the lse residual


def test_blanket_remat_saves_no_kernel_residuals():
    saved = _saved_descriptions(None)
    assert not any("pallas_call" in d for d in saved), saved
