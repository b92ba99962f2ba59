"""Tiny-config tests for the camera model family: MotionCtrl, CameraCtrl,
CamI2V, CamContextI2V — loss finiteness + sampling shapes + injection wiring."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from camc2v_tpu.camera.pose_encoder import PoseEncoderConfig
from camc2v_tpu.models.camera_base import (
    CamI2V,
    CamI2VConfig,
    CameraControlConfig,
    CameraCtrl,
    MotionCtrl,
    MotionCtrlConfig,
)
from camc2v_tpu.models.camcontexti2v import AdaptorConfig, CamContextI2V, CamContextI2VConfig
from camc2v_tpu.models.dynamicrafter import ResamplerConfig
from camc2v_tpu.nn.clip import CLIPTextConfig, CLIPVisionConfig
from camc2v_tpu.nn.epipolar import EpipolarConfig
from camc2v_tpu.nn.unet3d import UNetConfig
from camc2v_tpu.nn.vae import VAEConfig

T, IMG = 4, 32  # latent 4x4 (VAE /8)

BASE = dict(
    vae=VAEConfig(resolution=IMG, ch=16, ch_mult=(1, 2, 4, 4), num_res_blocks=1),
    clip_text=CLIPTextConfig(vocab_size=64, context_length=7, width=16, heads=2, layers=2),
    clip_vision=CLIPVisionConfig(image_size=224, patch_size=112, width=16, heads=2, layers=1),
    resampler=ResamplerConfig(dim=16, depth=1, dim_head=8, heads=2, num_queries=2,
                              embedding_dim=16, output_dim=16, video_length=T, use_timestep_emb=True),
    timesteps=50,
    loss_type="l2_log",
)

POSE_ENC = PoseEncoderConfig(
    downscale_factor=8, channels=(32, 64), nums_rb=1, cin=384,
    temporal_attention_nhead=2, temporal_position_encoding_max_len=T,
)


def unet(**kw):
    base = dict(
        in_channels=8, out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=(2, 1), channel_mult=(1, 2), num_head_channels=8,
        context_dim=16, temporal_length=T, text_context_len=7, img_tokens_per_frame=2,
        image_cross_attention=True,
    )
    base.update(kw)
    return UNetConfig(**base)


def _batch(b=1, n_ctx=0):
    rng = np.random.default_rng(0)
    K = np.array([[IMG, 0, IMG / 2], [0, IMG, IMG / 2], [0, 0, 1]], dtype=np.float32)
    w2c = np.tile(np.eye(4, dtype=np.float32), (b, T, 1, 1))
    w2c[..., 0, 3] = np.linspace(0, 1, T)[None]  # camera translating in x
    batch = {
        "video": jnp.asarray(rng.uniform(-1, 1, (b, T, IMG, IMG, 3)), jnp.float32),
        "caption_tokens": jnp.zeros((b, 7), jnp.int32),
        "frame_stride": jnp.full((b,), 3, jnp.int32),
        "camera_intrinsics": jnp.broadcast_to(jnp.asarray(K), (b, T, 3, 3)),
        "RT": jnp.asarray(w2c),
    }
    if n_ctx:
        batch["cond_frames"] = jnp.asarray(rng.uniform(-1, 1, (b, n_ctx, IMG, IMG, 3)), jnp.float32)
        w2c_cond = np.tile(np.eye(4, dtype=np.float32), (b, n_ctx, 1, 1))
        w2c_cond[..., 1, 3] = 0.5
        batch["RT_cond"] = jnp.asarray(w2c_cond)
    return batch


EPI = EpipolarConfig(
    origin_h=IMG, origin_w=IMG, attention_resolution=(2, 1), num_register_tokens=2,
    add_small_perturbation_on_zero_T=True, epipolar_hybrid_attention=True,
)


def test_motionctrl_loss_and_params():
    cfg = MotionCtrlConfig(unet=unet(camera_mode="motionctrl"), **BASE)
    m = MotionCtrl(cfg, dtype=jnp.float32)
    p = m.init_params(jax.random.key(0), (IMG, IMG))
    names = jax.tree_util.tree_flatten_with_path(p["unet"])[0]
    flat = {"/".join(str(k.key) for k in path) for path, _ in names}
    assert any("cc_projection" in n for n in flat)
    loss, _ = m.training_loss(p, _batch(), jax.random.key(1))
    assert np.isfinite(float(loss))


def test_motionctrl_identity_at_init():
    # zero+identity-init cc_projection => camera payload is a no-op at init
    cfg = MotionCtrlConfig(unet=unet(camera_mode="motionctrl"), **BASE)
    m = MotionCtrl(cfg, dtype=jnp.float32)
    p = m.init_params(jax.random.key(0), (IMG, IMG))
    batch = _batch()
    z, cond = m.prepare_batch(p, batch)
    t = jnp.zeros((1,), jnp.int32)
    eps_cam = m.apply_model(p, z, t, cond, m.get_fs(batch))
    cond_nc = {k: v for k, v in cond.items() if k != "camera"}
    eps_nc = m.apply_model(p, z, t, cond_nc, m.get_fs(batch))
    np.testing.assert_allclose(np.asarray(eps_cam), np.asarray(eps_nc), atol=1e-5)


def test_cameractrl_loss():
    cfg = CameraControlConfig(
        unet=unet(camera_mode="cameractrl"), pose_encoder=POSE_ENC, **BASE
    )
    m = CameraCtrl(cfg, dtype=jnp.float32)
    p = m.init_params(jax.random.key(0), (IMG, IMG))
    assert "pose_encoder" in p
    loss, _ = m.training_loss(p, _batch(), jax.random.key(1))
    assert np.isfinite(float(loss))


def test_cameractrl_ray_embedding_mode():
    cfg = CameraControlConfig(
        unet=unet(camera_mode="cameractrl"), pose_encoder=POSE_ENC,
        camera_embedding="ray", **BASE
    )
    m = CameraCtrl(cfg, dtype=jnp.float32)
    p = m.init_params(jax.random.key(0), (IMG, IMG))
    cam = m.camera_condition(p, _batch(), jnp.zeros((1,), jnp.int32), 1.0)
    assert cam["plucker"][0].shape == (1, T, 4, 4, 32)


def test_cami2v_camera_condition_masks():
    cfg = CamI2VConfig(
        unet=unet(use_camera=True, epipolar=EPI, add_type="add_into_temporal_attn"),
        pose_encoder=POSE_ENC, epipolar=EPI, **BASE
    )
    m = CamI2V(cfg, dtype=jnp.float32)
    p = m.init_params(jax.random.key(0), (IMG, IMG))
    cam = m.camera_condition(p, _batch(), jnp.zeros((1,), jnp.int32), 1.0)
    assert set(cam["masks"].keys()) == {8, 16}
    assert cam["masks"][8].shape == (1, T * 16, T * 16)
    assert cam["plucker"][0].shape == (1, T, 4, 4, 32)
    loss, _ = m.training_loss(p, _batch(), jax.random.key(1))
    assert np.isfinite(float(loss))


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


def test_camcontext_prepare_batch_shapes(camcontext):
    m, p = camcontext
    batch = _batch(n_ctx=2)
    z, cond = m.prepare_batch(p, batch)
    assert z.shape == (1, T, 4, 4, 4)
    assert cond["c_concat"].shape == (1, T, 4, 4, 4)
    # semantic branch: 7 text + (1+2)*  (2*T=8) image tokens
    assert cond["c_crossattn"].shape[1] == 7 + 3 * (2 * T)
    assert "camera" in cond


def test_camcontext_zero_conv_residual_at_init(camcontext):
    # zero-conv latent input => c_concat equals repeated cond-frame latent at init
    m, p = camcontext
    batch = _batch(n_ctx=2)
    z, cond = m.prepare_batch(p, batch)
    z_cond = z[:, 0]
    np.testing.assert_allclose(
        np.asarray(cond["c_concat"]),
        np.broadcast_to(np.asarray(z_cond)[:, None], cond["c_concat"].shape),
        atol=1e-5,
    )


def test_camcontext_loss_and_sample(camcontext):
    m, p = camcontext
    batch = _batch(n_ctx=2)
    loss, _ = m.training_loss(p, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
    out = m.sample(p, batch, jax.random.key(2), ddim_steps=2, guidance_scale=7.5, decode=False)
    assert out.shape == (1, T, 4, 4, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_camcontext_no_context_fallback(camcontext):
    m, p = camcontext
    batch = _batch(n_ctx=0)
    z, cond = m.prepare_batch(p, batch)
    assert cond["c_concat"].shape == (1, T, 4, 4, 4)
    assert cond["c_crossattn"].shape[1] == 7 + 2 * T


def test_fused_cfg_keeps_batch_shared_penalties(camcontext, monkeypatch):
    """build_guided_fn must NOT duplicate precomputed epipolar penalties into
    the fused cond+uncond batch: the kernel indexes them modulo their batch
    (ops/epipolar_flash.py pen_spec), and uc shares cond's camera geometry."""
    m, p = camcontext
    monkeypatch.setenv("CAMC2V_FUSED_CFG", "1")  # pad the uncond so CFG fuses
    batch = _batch(n_ctx=2)
    z, cond = m.prepare_batch(p, batch)
    assert "camera" in cond
    # inject a sampler-style precomputed-penalty entry
    cond["camera"]["epi_prep"] = {
        8: {"penalties": jnp.zeros((1, 32, 64), jnp.bfloat16),
            "tile_any": jnp.ones((1, 1, 1), jnp.int32),
            "lines": jnp.zeros((1, 32, T, 3), jnp.float32)},
    }
    uc = m.build_uncond(p, cond, 1, (IMG, IMG))
    seen = {}
    orig = m.apply_model

    def record(params, x, t, c, fs=None, **kw):
        seen["cond"] = c
        return jnp.zeros_like(x[..., :4])

    monkeypatch.setattr(m, "apply_model", record)
    fn = m.build_guided_fn(p, cond, uc, None, guidance_scale=7.5)
    x = jnp.zeros((1, T, 4, 4, 4))
    t = jnp.zeros((1,), jnp.int32)
    fn(x, t)
    stacked = seen["cond"]
    prep = stacked["camera"]["epi_prep"][8]
    assert prep["penalties"].shape[0] == 1          # shared, not duplicated
    assert prep["lines"].shape[0] == 2              # everything else fused
    assert stacked["c_concat"].shape[0] == 2
    monkeypatch.setattr(m, "apply_model", orig)


def test_fused_cfg_padding_exact(camcontext, monkeypatch):
    """CAMC2V_FUSED_CFG=1 (uncond padded to cond's context length, per-frame
    routing as a (B,T,L) mask, one batch-2B launch) must equal the unfused
    two-launch CFG exactly."""
    import os

    m, p = camcontext
    batch = _batch(n_ctx=2)
    z, cond = m.prepare_batch(p, batch)
    uc = m.build_uncond(p, cond, 1, (IMG, IMG))
    assert uc["c_crossattn"].shape != cond["c_crossattn"].shape  # unfusable today

    x = jax.random.normal(jax.random.key(3), z.shape)
    t = jnp.full((1,), 500, jnp.int32)

    monkeypatch.delenv("CAMC2V_FUSED_CFG", raising=False)
    out_unfused = m.build_guided_fn(p, dict(cond), dict(uc), None, guidance_scale=7.5)(x, t)

    monkeypatch.setenv("CAMC2V_FUSED_CFG", "1")
    padded = m._pad_uncond_for_fusion(dict(cond), dict(uc))
    assert padded is not None  # the fused path actually engages
    out_fused = m.build_guided_fn(p, dict(cond), dict(uc), None, guidance_scale=7.5)(x, t)

    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_unfused), atol=3e-5)
