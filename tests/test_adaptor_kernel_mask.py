"""In-kernel epipolar mask for the MultiLatentEpipolarAdaptor (generation
fast path): the adaptor's cross-attention over [cond ‖ context] latents with
the mask computed in-kernel from epipolar lines must match the materialised
(B, Lq, Lk)-bool path exactly (same geometry, same register semantics with
registers moved from the key front to the kernel's trailing tile)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from camc2v_tpu.camera import geometry as G
from camc2v_tpu.camera.adaptors import MultiLatentEpipolarAdaptor
from camc2v_tpu.nn.epipolar import EpipolarConfig
from camc2v_tpu.ops import epipolar_flash as ef

# eligible geometry: latent 16x16 (hw=256 == one kernel k-tile), T=4 target
# frames, 2 context frames (t_k = 3), one query per latent pixel
T, N_CTX, HL = 4, 2, 16
HW = HL * HL
IMG = HL * 8


def _poses(b=1):
    rng = np.random.default_rng(3)
    K = np.array([[IMG, 0, IMG / 2], [0, IMG, IMG / 2], [0, 0, 1]], np.float32)
    w2c = np.tile(np.eye(4, dtype=np.float32), (b, T, 1, 1))
    w2c[..., 0, 3] = np.linspace(0.0, 0.8, T)[None]
    w2c[..., 1, 3] = 0.1
    w2c_cond = np.tile(np.eye(4, dtype=np.float32), (b, N_CTX, 1, 1))
    w2c_cond[..., 0, 3] = np.array([-0.4, 0.5])[None]
    w2c_cond[..., 2, 3] = 0.15
    return (
        jnp.broadcast_to(jnp.asarray(K), (b, T, 3, 3)),
        jnp.asarray(w2c),
        jnp.asarray(w2c_cond),
    )


@pytest.fixture(scope="module")
def adaptor():
    m = MultiLatentEpipolarAdaptor(
        query_dim=32, depth=2, dim_head=16, heads=2, num_queries=HW,
        embedding_dim=4, output_dim=4, num_register_tokens=2, use_mask=True,
        video_length=T, timestep_embedding_type="sinusoidal_embedded",
        dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, (1 + N_CTX) * HW, 4)), jnp.float32)
    params = m.init(jax.random.key(0), x)["params"]
    return m, params, x


def test_kernel_mask_matches_materialized(adaptor):
    m, params, x = adaptor
    K, RT, RTc = _poses()
    idx = jnp.zeros((1,), jnp.int32)

    mask = G.conditional_epipolar_mask(
        K, RT, RTc, idx, IMG, IMG, downsample=8, config=EpipolarConfig()
    )
    assert mask.shape == (1, T * HW, (1 + N_CTX) * HW)
    dens = float(jnp.mean(mask))
    assert 0.0 < dens < 0.9  # a real band mask, not all-on/all-off

    out_mat = m.apply({"params": params}, x, mask, use_mask=True)

    F = G.conditional_fundamental(K, RT, RTc, idx)
    lines = ef.epipolar_lines(F, HL, HL, 8)
    blk = ef.BLOCK_K if HW % ef.BLOCK_K == 0 else HW
    tiles = ef.epipolar_tile_map(lines, 1 + N_CTX, HL, HL, 8,
                                 block_q=ef.BLOCK_Q, block_k=blk)
    out_ker = m.apply(
        {"params": params}, x, None, use_mask=True,
        lines=lines, geom=(1 + N_CTX, HL, HL, 8, blk), tile_any=tiles,
    )
    np.testing.assert_allclose(
        np.asarray(out_ker), np.asarray(out_mat), atol=2e-4, rtol=1e-4
    )


def test_kernel_mask_same_frame_pair_all_hidden(adaptor):
    """query frame == cond frame gives F == 0 -> NaN lines; both paths must
    hide that whole key frame (the cond-frame keys) for those queries."""
    K, RT, RTc = _poses()
    idx = jnp.zeros((1,), jnp.int32)
    mask = G.conditional_epipolar_mask(
        K, RT, RTc, idx, IMG, IMG, downsample=8, config=EpipolarConfig()
    )
    # frame-0 queries vs the prepended cond frame (same pose): all hidden
    assert not bool(jnp.any(mask[:, :HW, :HW]))
    F = G.conditional_fundamental(K, RT, RTc, idx)
    lines = ef.epipolar_lines(F, HL, HL, 8)
    km = ef.materialize_mask(lines, 1 + N_CTX, HL, HL, 8)
    np.testing.assert_array_equal(np.asarray(km), np.asarray(mask))


def test_prepare_batch_dispatches_kernel_mask(monkeypatch):
    """CamContextI2V.prepare_batch must route the adaptor through the lines
    path at an eligible size — in BOTH generation and training since r5 (the
    kernel's Pallas VJP covers the backward) — and match the materialised
    path, which stays reachable via CAMC2V_ADAPTOR_KERNEL=0."""
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_camera_models import BASE, POSE_ENC, unet  # tiny towers

    from camc2v_tpu.models.camcontexti2v import (
        AdaptorConfig, CamContextI2V, CamContextI2VConfig,
    )
    from camc2v_tpu.nn.vae import VAEConfig
    from camc2v_tpu.nn.clip import CLIPTextConfig, CLIPVisionConfig
    from camc2v_tpu.models.dynamicrafter import ResamplerConfig
    from camc2v_tpu.camera.pose_encoder import PoseEncoderConfig

    epi = EpipolarConfig(origin_h=IMG, origin_w=IMG, attention_resolution=(2, 1),
                         num_register_tokens=2)
    base = dict(BASE)
    base["vae"] = VAEConfig(resolution=IMG, ch=16, ch_mult=(1, 2, 4, 4), num_res_blocks=1)
    pose_enc = PoseEncoderConfig(
        downscale_factor=8, channels=(32, 64), nums_rb=1, cin=384,
        temporal_attention_nhead=2, temporal_position_encoding_max_len=T,
    )
    cfg = CamContextI2VConfig(
        unet=unet(use_camera=True, epipolar=epi, add_type="add_to_main_branch"),
        pose_encoder=pose_enc, epipolar=epi,
        adaptor=AdaptorConfig(
            query_dim=32, num_queries=HW, video_length=T, embedding_dim=4,
            output_dim=4, depth=1, dim_head=16, heads=2, num_register_tokens=2,
            timestep_embedding_type="sinusoidal_embedded",
        ),
        **base,
    )
    m = CamContextI2V(cfg, dtype=jnp.float32)
    p = m.init_params(jax.random.key(0), (IMG, IMG))

    rng = np.random.default_rng(0)
    K, RT, RTc = _poses()
    batch = {
        "video": jnp.asarray(rng.uniform(-1, 1, (1, T, IMG, IMG, 3)), jnp.float32),
        "caption_tokens": jnp.zeros((1, 7), jnp.int32),
        "frame_stride": jnp.full((1,), 3, jnp.int32),
        "camera_intrinsics": K,
        "RT": RT,
        "cond_frames": jnp.asarray(rng.uniform(-1, 1, (1, N_CTX, IMG, IMG, 3)), jnp.float32),
        "RT_cond": RTc,
    }

    mask_calls = []
    orig_mask = G.conditional_epipolar_mask

    def spy(*a, **k):
        mask_calls.append(1)
        return orig_mask(*a, **k)

    monkeypatch.setattr(G, "conditional_epipolar_mask", spy)
    _, cond_inf = m.prepare_batch(p, batch, random_uncond=False, inference=True)
    assert not mask_calls  # inference: in-kernel lines, no materialised mask
    _, cond_train = m.prepare_batch(p, batch, random_uncond=False)
    assert not mask_calls  # r5: training routes through the lines kernel too
    monkeypatch.setenv("CAMC2V_ADAPTOR_KERNEL", "0")
    _, cond_dense = m.prepare_batch(p, batch, random_uncond=False)
    assert mask_calls  # kill switch restores the materialised-mask path
    monkeypatch.delenv("CAMC2V_ADAPTOR_KERNEL")
    np.testing.assert_allclose(
        np.asarray(cond_inf["c_concat"]), np.asarray(cond_train["c_concat"]),
        atol=2e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(cond_dense["c_concat"]), np.asarray(cond_train["c_concat"]),
        atol=2e-4, rtol=1e-4,
    )


def test_kernel_mask_padded_context_matches_validity_columns(adaptor):
    """ctx_valid support (train batches pad context to max count): NaN-ing the
    padded frame's epipolar lines must equal the dense path's token-validity
    columns exactly."""
    m, params, x = adaptor
    K, RT, RTc = _poses()
    idx = jnp.zeros((1,), jnp.int32)
    valid = jnp.asarray([[True, False]])  # second context frame is padding

    mask = G.conditional_epipolar_mask(
        K, RT, RTc, idx, IMG, IMG, downsample=8, config=EpipolarConfig()
    )
    token_valid = jnp.repeat(
        jnp.concatenate([jnp.ones((1, 1), bool), valid], axis=1), HW, axis=1
    )
    out_mat = m.apply(
        {"params": params}, x, mask & token_valid[:, None, :], use_mask=True
    )

    F = G.conditional_fundamental(K, RT, RTc, idx)
    lines = ef.epipolar_lines(F, HL, HL, 8)
    fv = jnp.concatenate([jnp.ones((1, 1), bool), valid], axis=1)
    lines = jnp.where(fv[:, None, :, None], lines, jnp.nan)
    blk = ef.BLOCK_K if HW % ef.BLOCK_K == 0 else HW
    tiles = ef.epipolar_tile_map(lines, 1 + N_CTX, HL, HL, 8,
                                 block_q=ef.BLOCK_Q, block_k=blk)
    out_ker = m.apply(
        {"params": params}, x, None, use_mask=True,
        lines=lines, geom=(1 + N_CTX, HL, HL, 8, blk), tile_any=tiles,
    )
    np.testing.assert_allclose(
        np.asarray(out_ker), np.asarray(out_mat), atol=2e-4, rtol=1e-4
    )


def test_kernel_mask_grads_match_dense(adaptor):
    """Training-path contract: adaptor grads through the kernel (Pallas VJP
    with in-kernel mask recompute) match the dense-masked softmax VJP."""
    m, params, x = adaptor
    K, RT, RTc = _poses()
    idx = jnp.zeros((1,), jnp.int32)
    mask = G.conditional_epipolar_mask(
        K, RT, RTc, idx, IMG, IMG, downsample=8, config=EpipolarConfig()
    )
    F = G.conditional_fundamental(K, RT, RTc, idx)
    lines = ef.epipolar_lines(F, HL, HL, 8)
    blk = ef.BLOCK_K if HW % ef.BLOCK_K == 0 else HW
    tiles = ef.epipolar_tile_map(lines, 1 + N_CTX, HL, HL, 8,
                                 block_q=ef.BLOCK_Q, block_k=blk)

    def loss_dense(p, xx):
        out = m.apply({"params": p}, xx, mask, use_mask=True)
        return jnp.sum(out**2)

    def loss_kernel(p, xx):
        out = m.apply(
            {"params": p}, xx, None, use_mask=True,
            lines=lines, geom=(1 + N_CTX, HL, HL, 8, blk), tile_any=tiles,
        )
        return jnp.sum(out**2)

    gd_p, gd_x = jax.grad(loss_dense, argnums=(0, 1))(params, x)
    gk_p, gk_x = jax.grad(loss_kernel, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gk_x), np.asarray(gd_x), atol=5e-3, rtol=5e-3)
    flat_d = jax.tree_util.tree_flatten_with_path(gd_p)[0]
    flat_k = dict(jax.tree_util.tree_flatten_with_path(gk_p)[0])
    checked = 0
    for path, gd in flat_d:
        gk = flat_k[path]
        scale = max(float(np.abs(np.asarray(gd)).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(gk) / scale, np.asarray(gd) / scale, atol=5e-3,
            err_msg=str(path),
        )
        checked += 1
    assert checked > 10  # covered the depth-2 stack's params
