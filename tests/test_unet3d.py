"""Shape/structure tests for the 3D UNet on a tiny CPU-runnable config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from camc2v_tpu.nn.unet3d import UNetConfig, UNetModel
from camc2v_tpu.nn.epipolar import EpipolarConfig

TINY = UNetConfig(
    in_channels=8,
    out_channels=4,
    model_channels=32,
    num_res_blocks=1,
    attention_resolutions=(2, 1),
    channel_mult=(1, 2),
    num_head_channels=8,
    context_dim=16,
    temporal_length=4,
    addition_attention=True,
    image_cross_attention=True,
    image_cross_attention_scale_learnable=True,
    fs_condition=True,
    text_context_len=5,
    img_tokens_per_frame=2,
)

B, T, H, W = 1, 4, 8, 8


def _inputs(cfg=TINY, dual_context=True):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, H, W, cfg.in_channels)), jnp.float32)
    ts = jnp.array([500] * B)
    l = cfg.text_context_len + (T * cfg.img_tokens_per_frame if dual_context else 0)
    ctx = jnp.asarray(rng.normal(size=(B, l, cfg.context_dim)), jnp.float32)
    fs = jnp.array([3] * B)
    return x, ts, ctx, fs


def test_unet_forward_shape_and_finite():
    model = UNetModel(TINY, dtype=jnp.float32)
    x, ts, ctx, fs = _inputs()
    params = model.init(jax.random.key(0), x, ts, ctx, fs)
    out = model.apply(params, x, ts, ctx, fs)
    assert out.shape == (B, T, H, W, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_zero_init_out_gives_zero_output_path():
    # out_conv is zero-init => output should be exactly zero at init
    model = UNetModel(TINY, dtype=jnp.float32)
    x, ts, ctx, fs = _inputs()
    params = model.init(jax.random.key(1), x, ts, ctx, fs)
    out = model.apply(params, x, ts, ctx, fs)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_unet_text_only_context():
    model = UNetModel(TINY, dtype=jnp.float32)
    x, ts, ctx, fs = _inputs(dual_context=False)
    params = model.init(jax.random.key(0), x, ts, ctx, fs)
    out = model.apply(params, x, ts, ctx, fs)
    assert out.shape == (B, T, H, W, 4)


def test_unet_camera_composition():
    cfg = UNetConfig(
        **{**TINY.__dict__, "use_camera": True,
           "epipolar": EpipolarConfig(origin_h=H * 8, origin_w=W * 8, num_register_tokens=2),
           "add_type": "add_to_main_branch"}
    )
    model = UNetModel(cfg, dtype=jnp.float32)
    x, ts, ctx, fs = _inputs(cfg)
    # plucker pyramid: levels ds=1 (ch 32 @8x8), ds=2 (ch 64 @4x4), middle uses last
    plucker = (
        jnp.zeros((B, T, 8, 8, 32)),
        jnp.zeros((B, T, 4, 4, 64)),
    )
    masks = {
        8: jnp.ones((B, T * 64, T * 64), bool),
        16: jnp.ones((B, T * 16, T * 16), bool),
    }
    camera = {"plucker": plucker, "masks": masks, "cond_frame_index": jnp.zeros((B,), jnp.int32)}
    params = model.init(jax.random.key(0), x, ts, ctx, fs, camera)
    out = model.apply(params, x, ts, ctx, fs, camera)
    assert out.shape == (B, T, H, W, 4)
    # camera params exist on temporal blocks
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = {"/".join(str(k.key) for k in path if hasattr(k, "key")) for path, _ in flat}
    assert any("pluker_projection" in n for n in names)
    assert any("epipolar" in n for n in names)
    # init_attn must NOT have camera modules (reference excludes it)
    assert not any("init_attn" in n and "epipolar" in n for n in names)


def test_unet_jit_compiles_once():
    model = UNetModel(TINY, dtype=jnp.float32)
    x, ts, ctx, fs = _inputs()
    params = model.init(jax.random.key(0), x, ts, ctx, fs)
    fwd = jax.jit(lambda p, *a: model.apply(p, *a))
    out1 = fwd(params, x, ts, ctx, fs)
    out2 = fwd(params, x * 2, ts, ctx, fs)
    assert out1.shape == out2.shape


def test_unet_temporal_cross_attention_mode():
    """temporal_selfatt_only=False threads the cross-attn context into every
    temporal transformer (reference openaimodel3d.py:36-48 + attention.py:405-419);
    the context must actually influence the output."""
    cfg = UNetConfig(**{**TINY.__dict__, "temporal_selfatt_only": False})
    model = UNetModel(cfg, dtype=jnp.float32)
    x, ts, ctx, fs = _inputs(cfg)
    params = model.init(jax.random.key(0), x, ts, ctx, fs)
    # randomize: zero-init projections would make the context path inert
    from util import perturb_zero_kernels

    params = perturb_zero_kernels(params, jax.random.key(1))
    out1 = model.apply(params, x, ts, ctx, fs)
    out2 = model.apply(params, x, ts, ctx * 1.5, fs)
    assert out1.shape == (B, T, H, W, 4)
    assert np.isfinite(np.asarray(out1)).all()
    assert not np.allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)
    # temporal attn2 must carry context-sized kernels (not degrade to self-attn)
    blk = params["params"]["init_attn"]["block_0"]["attn2"]
    assert blk["to_k"]["kernel"].shape[0] == cfg.context_dim
