"""need_full_z=False generation fast path: prepare_batch encodes only the
conditioning + context frames (the VAE encoder is frame-wise) and must produce
conditioning numerically identical to the full-encode path, with
origin_z0=None. sample() keeps the full path whenever paste/overlap latent
surgery needs the clean latents."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_camera_models import BASE, EPI, IMG, POSE_ENC, T, _batch, unet

from camc2v_tpu.models.camcontexti2v import (
    AdaptorConfig,
    CamContextI2V,
    CamContextI2VConfig,
)
from camc2v_tpu.models.dynamicrafter import DynamiCrafter, DynamiCrafterConfig


@pytest.fixture(scope="module")
def camcontext():
    cfg = CamContextI2VConfig(
        unet=unet(use_camera=True, epipolar=EPI, add_type="add_to_main_branch"),
        pose_encoder=POSE_ENC, epipolar=EPI,
        adaptor=AdaptorConfig(
            query_dim=16, num_queries=16, video_length=T, embedding_dim=4, output_dim=4,
            depth=1, dim_head=8, heads=2, num_register_tokens=2,
            timestep_embedding_type="sinusoidal_embedded",
        ),
        **BASE,
    )
    m = CamContextI2V(cfg, dtype=jnp.float32)
    p = m.init_params(jax.random.key(0), (IMG, IMG))
    return m, p


def _assert_cond_equal(cond_full, cond_trim):
    assert cond_trim["origin_z0"] is None
    assert cond_full["origin_z0"] is not None
    for k in cond_full:
        if k in ("origin_z0", "camera"):
            continue
        np.testing.assert_allclose(
            np.asarray(cond_full[k], np.float32), np.asarray(cond_trim[k], np.float32),
            atol=1e-5, err_msg=k,
        )


@pytest.mark.parametrize("n_ctx", [0, 2])
def test_camcontext_trimmed_matches_full(camcontext, n_ctx):
    m, p = camcontext
    batch = _batch(n_ctx=n_ctx)
    z_f, cond_full = m.prepare_batch(p, batch, random_uncond=False)
    z_t, cond_trim = m.prepare_batch(p, batch, random_uncond=False, need_full_z=False)
    assert z_t.shape == z_f.shape
    _assert_cond_equal(cond_full, cond_trim)
    # placeholder z broadcasts the cond-frame latent (index 0 by default)
    np.testing.assert_allclose(
        np.asarray(z_t), np.broadcast_to(np.asarray(z_f)[:, :1], z_f.shape), atol=1e-5
    )


def test_camcontext_trimmed_dynamic_cond_index(camcontext):
    m, p = camcontext
    batch = _batch(n_ctx=2)
    idx = jnp.full((1,), 2, jnp.int32)
    _, cond_full = m.prepare_batch(p, batch, random_uncond=False, cond_frame_index=idx)
    _, cond_trim = m.prepare_batch(
        p, batch, random_uncond=False, cond_frame_index=idx, need_full_z=False
    )
    _assert_cond_equal(cond_full, cond_trim)


def test_base_model_trimmed_matches_full():
    cfg = DynamiCrafterConfig(unet=unet(), **BASE)
    m = DynamiCrafter(cfg, dtype=jnp.float32)
    p = m.init_params(jax.random.key(0), (IMG, IMG))
    batch = _batch()
    _, cond_full = m.prepare_batch(p, batch, random_uncond=False)
    _, cond_trim = m.prepare_batch(p, batch, random_uncond=False, need_full_z=False)
    _assert_cond_equal(cond_full, cond_trim)


def test_sample_default_recipe_uses_trimmed_path(camcontext):
    """The production sample() recipe (no surgery) must produce the same video
    with the trimmed encode as a surgery recipe's full encode produces — and
    paste_cond_frame must still work (origin_z0 available internally)."""
    m, p = camcontext
    batch = _batch(n_ctx=2)
    out = m.sample(p, batch, jax.random.key(2), ddim_steps=2, guidance_scale=7.5,
                   decode=False)
    assert np.isfinite(np.asarray(out)).all()
    out_paste = m.sample(p, batch, jax.random.key(2), ddim_steps=2, guidance_scale=7.5,
                         decode=False, paste_cond_frame=True)
    assert np.isfinite(np.asarray(out_paste)).all()
    # pasted output carries the clean cond-frame latent at the cond index
    z, cond = m.prepare_batch(p, batch, random_uncond=False)
    np.testing.assert_allclose(
        np.asarray(out_paste[:, 0]), np.asarray(z[:, 0]), atol=1e-4
    )


def test_interp_mode_forces_full_encode():
    cfg = DynamiCrafterConfig(unet=unet(), interp_mode=True, **BASE)
    m = DynamiCrafter(cfg, dtype=jnp.float32)
    p = m.init_params(jax.random.key(0), (IMG, IMG))
    batch = _batch()
    _, cond = m.prepare_batch(p, batch, random_uncond=False, need_full_z=False)
    assert cond["origin_z0"] is not None  # interp concat needs every latent


@pytest.mark.parametrize("n_ctx", [0, 2])
def test_prefetch_uncond_matches_separate_towers(camcontext, n_ctx):
    """prefetch_uncond batches the zero-image/empty-prompt CLIP rows into the
    cond dispatches; build_uncond must produce the same uc either way."""
    m, p = camcontext
    batch = _batch(n_ctx=n_ctx)
    hw = (IMG, IMG)
    _, cond_a = m.prepare_batch(p, batch, random_uncond=False)
    uc_a = m.build_uncond(p, cond_a, 1, hw)
    _, cond_b = m.prepare_batch(p, batch, random_uncond=False, prefetch_uncond=True)
    assert "_uncond" in cond_b
    uc_b = m.build_uncond(p, cond_b, 1, hw)
    assert "_uncond" not in uc_b
    for k in uc_a:
        if k == "origin_z0" or uc_a[k] is None:
            continue
        if k == "camera":
            continue
        np.testing.assert_allclose(
            np.asarray(uc_a[k], np.float32), np.asarray(uc_b[k], np.float32),
            atol=2e-4, err_msg=k,
        )
    # cond itself is unchanged by the prefetch (modulo the _uncond stash)
    np.testing.assert_allclose(
        np.asarray(cond_a["c_crossattn"]), np.asarray(cond_b["c_crossattn"]), atol=2e-4
    )


def test_prefetch_uncond_base_model():
    cfg = DynamiCrafterConfig(unet=unet(), **BASE)
    m = DynamiCrafter(cfg, dtype=jnp.float32)
    p = m.init_params(jax.random.key(0), (IMG, IMG))
    batch = _batch()
    _, cond_a = m.prepare_batch(p, batch, random_uncond=False)
    uc_a = m.build_uncond(p, cond_a, 1, (IMG, IMG))
    _, cond_b = m.prepare_batch(p, batch, random_uncond=False, prefetch_uncond=True)
    uc_b = m.build_uncond(p, cond_b, 1, (IMG, IMG))
    np.testing.assert_allclose(
        np.asarray(uc_a["c_crossattn"]), np.asarray(uc_b["c_crossattn"]), atol=2e-4
    )
