"""Pad-to-max context frames: one compiled program for every N in [1, max],
numerically identical to the unpadded path (VERDICT round-1 item 6).

reference being replaced: dynamic context counts retrace per N
(custom_collate_fn, data/realestate10k.py:355-369).
"""

import pathlib
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.append(str(pathlib.Path(__file__).parent / "oracle"))

import refload
from refload import IMG, T

NMAX = 4


@pytest.fixture(scope="module")
def model_and_params():
    m = refload.my_model("camcontext")
    refload.patch_my_encoders(m)
    params = m.init_params(jax.random.key(0), (IMG, IMG))
    return m, params


def _pad_batch(batch, nmax=NMAX):
    out = dict(batch)
    cf = np.asarray(batch["cond_frames"])
    rt = np.asarray(batch["RT_cond"])
    b, n = cf.shape[:2]
    pad = nmax - n
    if pad > 0:
        out["cond_frames"] = jnp.asarray(
            np.concatenate([cf, np.zeros((b, pad, *cf.shape[2:]), cf.dtype)], axis=1)
        )
        out["RT_cond"] = jnp.asarray(
            np.concatenate([rt, np.tile(np.eye(4, dtype=rt.dtype), (b, pad, 1, 1))], axis=1)
        )
    out["cond_frames_valid"] = jnp.asarray(np.arange(nmax)[None] < n).repeat(b, axis=0)
    return out


@pytest.mark.parametrize("n_ctx", [1, 2, 3])
def test_padded_prepare_batch_matches_unpadded(model_and_params, n_ctx):
    m, params = model_and_params
    batch = refload.to_jax_batch(refload.make_batch(b=2, n_ctx=n_ctx))
    z_u, cond_u = m.prepare_batch(params, batch, random_uncond=False)
    z_p, cond_p = m.prepare_batch(params, _pad_batch(batch), random_uncond=False)

    np.testing.assert_allclose(np.asarray(z_p), np.asarray(z_u), atol=1e-5)
    # the latent concat branch must be numerically identical
    np.testing.assert_allclose(
        np.asarray(cond_p["c_concat"]), np.asarray(cond_u["c_concat"]), atol=2e-5
    )
    # the crossattn tokens: shared prefix identical, padded tail masked out
    lu = cond_u["c_crossattn"].shape[1]
    np.testing.assert_allclose(
        np.asarray(cond_p["c_crossattn"])[:, :lu], np.asarray(cond_u["c_crossattn"]), atol=2e-5
    )
    mask = np.asarray(cond_p["c_crossattn_mask"])
    assert mask[:, :lu].all() and not mask[:, lu:].any()


@pytest.mark.parametrize("n_ctx", [1, 3])
def test_padded_apply_model_matches_unpadded(model_and_params, n_ctx):
    """The denoiser output must be exactly the unpadded result — padding plus
    masks is a pure re-layout, not an approximation."""
    m, params = model_and_params
    batch = refload.to_jax_batch(refload.make_batch(b=1, n_ctx=n_ctx))
    z_u, cond_u = m.prepare_batch(params, batch, random_uncond=False)
    z_p, cond_p = m.prepare_batch(params, _pad_batch(batch), random_uncond=False)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=z_u.shape), jnp.float32)
    t = jnp.array([321], jnp.int32)
    fs = jnp.array([3], jnp.int32)
    eps_u = np.asarray(m.apply_model(params, x, t, cond_u, fs))
    eps_p = np.asarray(m.apply_model(params, x, t, cond_p, fs))
    np.testing.assert_allclose(eps_p, eps_u, atol=5e-5)


def test_single_trace_across_context_counts(model_and_params):
    """All padded batches share one shape signature => one XLA program."""
    m, params = model_and_params

    traces = []

    @jax.jit
    def loss_fn(params, batch, key):
        traces.append(1)
        loss, _ = m.training_loss(params, batch, key, rand_cond_frame=False)
        return loss

    for n_ctx in (1, 2, 3, 4):
        batch = _pad_batch(refload.to_jax_batch(refload.make_batch(b=1, n_ctx=n_ctx)))
        loss = loss_fn(params, batch, jax.random.key(n_ctx))
        assert np.isfinite(float(loss))
    assert len(traces) == 1, f"retraced {len(traces)} times across context counts"


def test_collate_pads_and_flags(tmp_path):
    from camc2v_tpu.data.realestate10k import RealEstate10K

    ds = RealEstate10K.__new__(RealEstate10K)
    ds.additional_cond_frames = "random_full"
    ds.num_additional_cond_frames = [1, 2]
    ds.pad_context_frames_to = NMAX
    import random as _random

    ds._rng = _random.Random(0)
    samples = [
        {
            "video": np.zeros((4, 8, 8, 3), np.float32),
            "cond_frames": np.ones((2, 8, 8, 3), np.float32),
            "RT_cond": np.tile(np.eye(4, dtype=np.float32), (2, 1, 1)),
        }
        for _ in range(2)
    ]
    out = ds.collate(samples)
    assert out["cond_frames"].shape[1] == NMAX
    assert out["RT_cond"].shape[1] == NMAX
    n = int(out["cond_frames_valid"][0].sum())
    assert 1 <= n <= 2
    assert (out["cond_frames"][:, n:] == 0).all()


def test_pose_agent_enc_rejected_loudly():
    """The reference's pose_agent_enc strategy is a non-functional stub
    (PARITY.md 'intentionally not rebuilt'); selecting it must fail fast."""
    import dataclasses

    import pytest as _pytest

    from camc2v_tpu.models.camcontexti2v import CamContextI2V

    sys.path.append(str(pathlib.Path(__file__).parent / "oracle"))
    import refload

    cfg = dataclasses.replace(
        refload.my_model("camcontext").config, multi_cond_strategy="pose_agent_enc"
    )
    with _pytest.raises(NotImplementedError, match="pose_agent_enc"):
        CamContextI2V(cfg)
