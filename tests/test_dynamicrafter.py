"""End-to-end tiny-config DynamiCrafter: training loss + DDIM sampling on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from camc2v_tpu.models.dynamicrafter import (
    DynamiCrafter,
    DynamiCrafterConfig,
    ResamplerConfig,
)
from camc2v_tpu.nn.clip import CLIPTextConfig, CLIPVisionConfig
from camc2v_tpu.nn.unet3d import UNetConfig
from camc2v_tpu.nn.vae import VAEConfig

T = 4
IMG = 32  # video resolution; latent 4x4


def tiny_config(**overrides):
    base = dict(
        unet=UNetConfig(
            in_channels=8, out_channels=4, model_channels=32, num_res_blocks=1,
            attention_resolutions=(1,), channel_mult=(1, 2), num_head_channels=8,
            context_dim=16, temporal_length=T, addition_attention=True,
            image_cross_attention=True, image_cross_attention_scale_learnable=True,
            fs_condition=True, text_context_len=7, img_tokens_per_frame=2,
        ),
        vae=VAEConfig(resolution=IMG, ch=16, ch_mult=(1, 2, 4), num_res_blocks=1, z_channels=4, embed_dim=4),
        clip_text=CLIPTextConfig(vocab_size=64, context_length=7, width=16, heads=2, layers=2),
        clip_vision=CLIPVisionConfig(image_size=224, patch_size=112, width=16, heads=2, layers=1),
        resampler=ResamplerConfig(
            dim=16, depth=1, dim_head=8, heads=2, num_queries=2, embedding_dim=16,
            output_dim=16, video_length=T, use_timestep_emb=True,
        ),
        loss_type="l2_log",
        timesteps=100,
    )
    base.update(overrides)
    return DynamiCrafterConfig(**base)


@pytest.fixture(scope="module")
def model_and_params():
    from util import perturb_zero_kernels

    model = DynamiCrafter(tiny_config(), dtype=jnp.float32)
    params = model.init_params(jax.random.key(0), image_hw=(IMG, IMG))
    # Perturb ALL zero-init kernels (out_conv, transformer proj_out, ...), not
    # just out_conv: zero proj_out makes every attention branch — and with it
    # the CONTEXT — dead at init, so cond/uncond evals were bit-identical and
    # any test of CFG-path behaviour (e.g. cfg_interval gating) was vacuous.
    # (Before the temporal-cross-attention parity fix the context leaked
    # through a non-zero temporal path, which masked this.) Trained weights
    # are never zero; see tests/util.py::perturb_zero_kernels.
    return model, perturb_zero_kernels(params)


def _batch(b=1):
    rng = np.random.default_rng(0)
    return {
        "video": jnp.asarray(rng.uniform(-1, 1, (b, T, IMG, IMG, 3)), jnp.float32),
        "caption_tokens": jnp.zeros((b, 7), jnp.int32),
        "frame_stride": jnp.full((b,), 3, jnp.int32),
    }


def test_training_loss_finite(model_and_params):
    model, params = model_and_params
    loss, metrics = model.training_loss(params, _batch(), jax.random.key(1))
    assert np.isfinite(float(loss))
    assert "loss_simple" in metrics


def test_l2_log_weights_later_frames_more(model_and_params):
    model, params = model_and_params
    pred = jnp.zeros((1, T, 4, 4, 4))
    target = jnp.ones((1, T, 4, 4, 4))
    loss = model.get_loss(pred, target)
    per_frame = np.asarray(loss).mean(axis=(0, 2, 3, 4))
    assert np.all(np.diff(per_frame) > 0)  # log10(2..T+1) increasing
    np.testing.assert_allclose(per_frame.sum(), 1.0, rtol=1e-5)


def test_cfg_dropout_masks(model_and_params):
    model, params = model_and_params
    # inference mode: rng None -> no dropout
    pm, im = model.cfg_dropout_masks(None, 4)
    assert not np.asarray(pm).any()
    np.testing.assert_allclose(np.asarray(im), 1.0)
    # training: statistics over many draws
    pm, im = model.cfg_dropout_masks(jax.random.key(0), 4000)
    assert 0.05 < np.asarray(pm).mean() < 0.15  # ~2*uncond_prob
    assert 0.05 < (1 - np.asarray(im)).mean() < 0.15


def test_ddim_sample_end_to_end(model_and_params):
    model, params = model_and_params
    out = model.sample(
        params, _batch(), jax.random.key(2),
        ddim_steps=2, guidance_scale=7.5, guidance_rescale=0.7,
        timestep_spacing="uniform_trailing",
    )
    assert out.shape == (1, T, IMG, IMG, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_ddim_sample_no_cfg(model_and_params):
    model, params = model_and_params
    out = model.sample(params, _batch(), jax.random.key(2), ddim_steps=2, guidance_scale=1.0, decode=False)
    assert out.shape == (1, T, 8, 8, 4)


def test_sample_jits(model_and_params):
    model, params = model_and_params
    batch = _batch()

    @jax.jit
    def run(p, b, key):
        return model.sample(p, b, key, ddim_steps=2, guidance_scale=7.5, decode=False)

    out = run(params, batch, jax.random.key(3))
    assert out.shape == (1, T, 8, 8, 4)
    out2 = run(params, batch, jax.random.key(4))
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_dpmpp_sample_end_to_end(model_and_params):
    model, params = model_and_params
    out = model.sample(
        params, _batch(), jax.random.key(2),
        ddim_steps=4, guidance_scale=7.5, sampler="dpmpp_2m", decode=False,
    )
    assert out.shape == (1, T, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()
    # deterministic solver: the same noise draw (same key) reproduces exactly
    out2 = model.sample(
        params, _batch(), jax.random.key(2),
        ddim_steps=4, guidance_scale=7.5, sampler="dpmpp_2m", decode=False,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_ddpm_ancestral_sample_end_to_end(model_and_params):
    """sampler='ddpm' runs the ancestral p_sample_loop over the FULL DDPM
    table (reference sample_log(..., ddim=False) -> p_sample_loop,
    ddpm3d.py:974-986) through the same guided-CFG closure."""
    model, params = model_and_params
    out = model.sample(
        params, _batch(), jax.random.key(11),
        guidance_scale=7.5, sampler="ddpm", decode=False,
    )
    assert out.shape == (1, T, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()
    # ancestral: the trajectory is stochastic per key but reproducible
    out2 = model.sample(
        params, _batch(), jax.random.key(11),
        guidance_scale=7.5, sampler="ddpm", decode=False,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    try:
        model.sample(params, _batch(), jax.random.key(11), sampler="ddpm",
                     paste_cond_frame=True, decode=False)
    except ValueError:
        pass
    else:
        raise AssertionError("ddpm + paste surgery must raise")


def test_cfg_interval_full_matches_plain_cfg(model_and_params):
    """cfg_interval spanning every timestep is the identity on the CFG path.

    Not bit-exact: the lax.cond wrapper moves XLA fusion boundaries around the
    denoiser, so identical math compiles to slightly different op orders
    (~1e-6 noise over 3 steps).
    """
    model, params = model_and_params
    kw = dict(ddim_steps=3, guidance_scale=7.5, guidance_rescale=0.7, decode=False)
    ref = model.sample(params, _batch(), jax.random.key(5), **kw)
    gated = model.sample(params, _batch(), jax.random.key(5), cfg_interval=(0.0, 999.0), **kw)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(gated), atol=1e-5, rtol=1e-4)


def test_cfg_interval_empty_matches_cond_only(model_and_params):
    """An interval excluding every timestep degenerates to the cond-only eval
    (identical latents to guidance_scale=1.0 given the same noise draws)."""
    model, params = model_and_params
    kw = dict(ddim_steps=3, ddim_eta=0.0, decode=False)
    ref = model.sample(params, _batch(), jax.random.key(6), guidance_scale=1.0, **kw)
    gated = model.sample(
        params, _batch(), jax.random.key(6),
        guidance_scale=7.5, cfg_interval=(-2.0, -1.0), **kw,
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(gated), atol=1e-5)


def test_cfg_interval_partial_differs_and_jits(model_and_params):
    model, params = model_and_params
    kw = dict(ddim_steps=4, guidance_scale=7.5, decode=False)

    @jax.jit
    def run(p, b, key):
        return model.sample(p, b, key, cfg_interval=(300.0, 999.0), **kw)

    gated = run(params, _batch(), jax.random.key(7))
    full = model.sample(params, _batch(), jax.random.key(7), **kw)
    assert np.isfinite(np.asarray(gated)).all()
    assert not np.allclose(np.asarray(gated), np.asarray(full))


def test_perframe_ae_matches_batched():
    """perframe_ae chunks the VAE one frame at a time (reference
    ddpm3d.py:622-669) with numerics identical to the batched path."""
    import dataclasses

    from camc2v_tpu.models.dynamicrafter import DynamiCrafter

    cfg = tiny_config()
    model = DynamiCrafter(cfg, dtype=jnp.float32)
    params = model.init_params(jax.random.key(0), image_hw=(32, 32))
    model_pf = DynamiCrafter(dataclasses.replace(cfg, perframe_ae=True), dtype=jnp.float32)

    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.uniform(-1, 1, (1, 4, 32, 32, 3)), jnp.float32)
    z = model.encode_first_stage(params, video)
    z_pf = model_pf.encode_first_stage(params, video)
    np.testing.assert_allclose(np.asarray(z_pf), np.asarray(z), rtol=1e-5, atol=1e-5)

    x = model.decode_first_stage(params, z)
    x_pf = model_pf.decode_first_stage(params, z)
    np.testing.assert_allclose(np.asarray(x_pf), np.asarray(x), rtol=1e-5, atol=1e-5)
