"""Flash-attention kernel parity vs the XLA reference path (CPU interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from camc2v_tpu.ops.attention import _xla_attention
from camc2v_tpu.ops.flash_attention import BLOCK_K, BLOCK_Q, flash_attention, flash_supported

B, H, D = 2, 2, 64
LQ = 2 * BLOCK_Q
LK = 2 * BLOCK_K


def _qkv(lq=LQ, lk=LK, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, lq, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, lk, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, lk, H, D)), jnp.float32)
    return q, k, v


def test_flash_matches_xla_no_mask():
    q, k, v = _qkv()
    out = flash_attention(q, k, v)
    ref = _xla_attention(q, k, v, bias=None, mask=None, scale=D**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_matches_xla_with_mask():
    q, k, v = _qkv()
    rng = np.random.default_rng(1)
    mask = jnp.asarray(rng.uniform(size=(B, LQ, LK)) > 0.5)
    out = flash_attention(q, k, v, mask=mask)
    ref = _xla_attention(q, k, v, bias=None, mask=mask[:, None], scale=D**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_fully_masked_rows_are_zero():
    q, k, v = _qkv()
    mask = jnp.ones((B, LQ, LK), bool).at[:, :BLOCK_Q].set(False)
    out = flash_attention(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(out[:, :BLOCK_Q]), 0.0, atol=1e-6)
    assert np.isfinite(np.asarray(out)).all()


def test_flash_block_sparse_tiles_skipped_correctly():
    # structured mask with entire (BLOCK_Q, BLOCK_K) tiles empty — exercises
    # the scalar-prefetch skip path; result must still match dense attention
    q, k, v = _qkv()
    mask = np.zeros((B, LQ, LK), bool)
    mask[:, :BLOCK_Q, :BLOCK_K] = True          # only tile (0, 0) active
    mask[:, BLOCK_Q:, BLOCK_K:] = np.random.default_rng(3).uniform(
        size=(B, LQ - BLOCK_Q, LK - BLOCK_K)
    ) > 0.5                                      # tiles (1, 1) partially active
    mask = jnp.asarray(mask)
    out = flash_attention(q, k, v, mask=mask)
    ref = _xla_attention(q, k, v, bias=None, mask=mask[:, None], scale=D**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_supported_guard():
    q, k, v = _qkv()
    assert flash_supported(q, k, None)
    q_bad = jnp.zeros((B, 100, H, D))
    assert not flash_supported(q_bad, k, None)
    q32 = jnp.zeros((B, LQ, H, 32))
    assert not flash_supported(q32, jnp.zeros((B, LK, H, 32)), None)


def test_flash_gradients_match_xla():
    q, k, v = _qkv(lq=BLOCK_Q, lk=BLOCK_K)
    rng = np.random.default_rng(2)
    mask = jnp.asarray(rng.uniform(size=(B, BLOCK_Q, BLOCK_K)) > 0.3)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask=mask) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, bias=None, mask=mask[:, None], scale=D**-0.5) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_flash_short_keys_padded():
    """Lk far below BLOCK_K (the text-context 77-token case) pads internally
    with masked-out keys and matches XLA exactly."""
    for lq, lk in ((BLOCK_Q, 77), (BLOCK_Q, 256), (2 * BLOCK_Q, 77)):
        q, k, v = _qkv(lq=lq, lk=lk, seed=7)
        out = flash_attention(q, k, v)
        ref = _xla_attention(q, k, v, bias=None, mask=None, scale=D**-0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


# --------------------------------------------------------- Pallas backward


def _grads(loss, *args):
    return jax.grad(loss, argnums=tuple(range(len(args))))(*args)


def test_flash_pallas_bwd_matches_chunked_xla(monkeypatch):
    """The round-5 Pallas backward (dq/dk+dv kernels, lse from the forward)
    must match the chunked-XLA recompute VJP it replaces — masked and
    unmasked, including multi-tile grids."""
    q, k, v = _qkv(lq=2 * BLOCK_Q, lk=2 * BLOCK_K, seed=11)
    rng = np.random.default_rng(4)
    mask = jnp.asarray(rng.uniform(size=(B, 2 * BLOCK_Q, 2 * BLOCK_K)) > 0.4)

    for m in (mask, None):
        def loss(q, k, v, _m=m):
            return jnp.sum(flash_attention(q, k, v, mask=_m) ** 2)

        monkeypatch.delenv("CAMC2V_FLASH_PALLAS_BWD", raising=False)
        gp = _grads(loss, q, k, v)
        monkeypatch.setenv("CAMC2V_FLASH_PALLAS_BWD", "0")
        gx = _grads(loss, q, k, v)
        monkeypatch.delenv("CAMC2V_FLASH_PALLAS_BWD")
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_flash_pallas_bwd_padded_and_fully_masked(monkeypatch):
    """Padding columns and fully-masked query rows must produce exact-zero
    contributions in the Pallas backward (lse = +1e30 rows -> p == 0), and
    match the chunked-XLA VJP (which zeroes those rows explicitly — the plain
    XLA softmax reference NaNs there, so it is not a usable oracle)."""
    q, k, v = _qkv(lq=BLOCK_Q, lk=700, seed=5)
    mask = jnp.ones((B, BLOCK_Q, 700), bool).at[:, :17].set(False)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask=mask) ** 2)

    monkeypatch.delenv("CAMC2V_FLASH_PALLAS_BWD", raising=False)
    gq, gk, gv = _grads(loss, q, k, v)
    assert gk.shape == k.shape and gv.shape == v.shape
    # fully-masked rows contribute no gradient anywhere
    np.testing.assert_allclose(np.asarray(gq[:, :17]), 0.0, atol=1e-7)

    monkeypatch.setenv("CAMC2V_FLASH_PALLAS_BWD", "0")
    gx = _grads(loss, q, k, v)
    monkeypatch.delenv("CAMC2V_FLASH_PALLAS_BWD")
    for a, b in zip((gq, gk, gv), gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
