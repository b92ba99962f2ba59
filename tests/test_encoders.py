"""Shape/behaviour tests for VAE, CLIP towers, and the Resampler (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np

from camc2v_tpu.core import distributions as D
from camc2v_tpu.nn.vae import AutoencoderKL, VAEConfig
from camc2v_tpu.nn.clip import (
    CLIPTextConfig,
    CLIPTextTower,
    CLIPVisionConfig,
    CLIPVisionTower,
    clip_preprocess,
)
from camc2v_tpu.nn.resampler import ImageProjModel, Resampler

TINY_VAE = VAEConfig(resolution=32, ch=16, ch_mult=(1, 2), num_res_blocks=1, z_channels=4, embed_dim=4)


def test_vae_roundtrip_shapes():
    vae = AutoencoderKL(TINY_VAE)
    x = jnp.zeros((2, 32, 32, 3))
    params = vae.init(jax.random.key(0), x)
    moments = vae.apply(params, x, method=vae.encode)
    # 32 -> 16 latent (one downsample), 2*embed_dim moments
    assert moments.shape == (2, 16, 16, 8)
    z = D.mode(moments)
    rec = vae.apply(params, z, method=vae.decode)
    assert rec.shape == (2, 32, 32, 3)


def test_vae_posterior_sampling_differs_from_mode():
    vae = AutoencoderKL(TINY_VAE)
    x = jnp.ones((1, 32, 32, 3)) * 0.5
    params = vae.init(jax.random.key(0), x)
    moments = vae.apply(params, x, method=vae.encode)
    s1 = D.sample(moments, jax.random.key(1))
    s2 = D.sample(moments, jax.random.key(2))
    assert not np.allclose(np.asarray(s1), np.asarray(s2))


def test_clip_text_tower_penultimate():
    cfg = CLIPTextConfig(vocab_size=100, context_length=8, width=32, heads=4, layers=3)
    tower = CLIPTextTower(cfg)
    tokens = jnp.zeros((2, 8), jnp.int32)
    params = tower.init(jax.random.key(0), tokens)
    out = tower.apply(params, tokens)
    assert out.shape == (2, 8, 32)
    # penultimate: only layers-1 resblocks own params
    names = set(params["params"].keys())
    assert "resblock_0" in names and "resblock_1" in names and "resblock_2" not in names


def test_clip_vision_tower_token_sequence():
    cfg = CLIPVisionConfig(image_size=28, patch_size=14, width=32, heads=4, layers=2)
    tower = CLIPVisionTower(cfg)
    imgs = jnp.zeros((2, 28, 28, 3))
    params = tower.init(jax.random.key(0), imgs)
    out = tower.apply(params, imgs)
    assert out.shape == (2, 1 + 4, 32)  # cls + 2x2 patches, full sequence


def test_clip_preprocess_range():
    frames = jnp.zeros((1, 16, 16, 3))  # mid-grey in [-1,1]
    out = clip_preprocess(frames)
    assert out.shape == (1, 224, 224, 3)
    expected = (0.5 - np.array([0.48145466, 0.4578275, 0.40821073])) / np.array(
        [0.26862954, 0.26130258, 0.27577711]
    )
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), expected, rtol=1e-5)


def test_resampler_per_frame_queries():
    rs = Resampler(
        dim=32, depth=2, dim_head=8, heads=4, num_queries=4, embedding_dim=16,
        output_dim=24, video_length=3, use_timestep_emb=True,
    )
    x = jnp.zeros((2, 10, 16))
    params = rs.init(jax.random.key(0), x)
    out = rs.apply(params, x)
    assert out.shape == (2, 4 * 3, 24)


def test_image_proj_model():
    m = ImageProjModel(cross_attention_dim=16, clip_extra_context_tokens=4)
    emb = jnp.zeros((2, 8))
    params = m.init(jax.random.key(0), emb)
    out = m.apply(params, emb)
    assert out.shape == (2, 4, 16)
