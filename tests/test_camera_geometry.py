"""Geometry golden tests: Plücker rays, relative poses, F-matrices, epipolar masks."""

import jax
import jax.numpy as jnp
import numpy as np

from camc2v_tpu.camera import geometry as G
from camc2v_tpu.camera.pose_encoder import CameraPoseEncoder, PoseEncoderConfig, pixel_unshuffle
from camc2v_tpu.nn.epipolar import EpipolarConfig


def _intrinsics(f, cx, cy):
    return np.array([[f, 0, cx], [0, f, cy], [0, 0, 1]], dtype=np.float64)


def test_plucker_identity_pose():
    H = W = 4
    K = jnp.asarray(_intrinsics(2.0, W / 2, H / 2))[None, None]
    c2w = jnp.eye(4)[None, None]
    pl = G.plucker_embedding(K, c2w, H, W)
    assert pl.shape == (1, 1, H, W, 6)
    # origin at 0 => moment d x o = 0
    np.testing.assert_allclose(np.asarray(pl[..., :3]), 0.0, atol=1e-6)
    d = np.asarray(pl[0, 0, :, :, 3:])
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, rtol=1e-6)
    # pixel (1,1): centre (1.5, 1.5), offset (-0.5,-0.5)/f=2 -> (-0.25,-0.25,1)/|.|
    np.testing.assert_allclose(d[1, 1], np.array([-0.25, -0.25, 1.0]) / np.sqrt(1.125), atol=1e-5)


def test_plucker_translation_moment():
    H = W = 2
    K = jnp.asarray(_intrinsics(1.0, 1.0, 1.0))[None, None]
    c2w = jnp.eye(4).at[0, 3].set(1.0)[None, None]  # camera at x=1
    pl = G.plucker_embedding(K, c2w, H, W)
    o = np.array([1.0, 0, 0])
    d = np.asarray(pl[0, 0, 0, 0, 3:])
    np.testing.assert_allclose(np.asarray(pl[0, 0, 0, 0, :3]), np.cross(o, d), atol=1e-6)


def test_relative_pose_cond_frame_is_identity():
    rng = np.random.default_rng(0)
    # random rigid transforms
    RT = np.tile(np.eye(4), (2, 4, 1, 1))
    for b in range(2):
        for t in range(4):
            th = rng.uniform(0, 1)
            R = np.array(
                [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
            )
            RT[b, t, :3, :3] = R
            RT[b, t, :3, 3] = rng.normal(size=3)
    idx = jnp.array([0, 2])
    rel = G.relative_pose(jnp.asarray(RT), idx, mode="left")
    np.testing.assert_allclose(np.asarray(rel[0, 0]), np.eye(4), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rel[1, 2]), np.eye(4), atol=1e-5)


def test_pairwise_relative_pose():
    RT1 = jnp.eye(4)[None, None].at[0, 0, 0, 3].set(1.0)  # (1,1,4,4)
    RT2 = jnp.eye(4)[None, None].at[0, 0, 1, 3].set(2.0)
    rel = G.pairwise_relative_pose(RT1, RT2)
    expected = np.eye(4)
    expected[0, 3] = -1.0
    expected[1, 3] = 2.0
    np.testing.assert_allclose(np.asarray(rel[0, 0, 0]), expected, atol=1e-6)


def test_relative_c2w_pairs_diag_identity():
    rng = np.random.default_rng(1)
    RT = np.tile(np.eye(4), (1, 3, 1, 1))
    RT[..., :3, 3] = rng.normal(size=(1, 3, 3))
    pairs = G.relative_c2w_pairs(jnp.asarray(RT))
    assert pairs.shape == (1, 3, 3, 4, 4)
    for t in range(3):
        np.testing.assert_allclose(np.asarray(pairs[0, t, t]), np.eye(4), atol=1e-6)


def test_fundamental_matrix_epipolar_constraint():
    # two cameras: identity and translated+rotated; a 3D point projected into
    # both must satisfy the epipolar constraint through F built like the
    # reference (E = cross(t, R) column-wise)
    f, c = 50.0, 16.0
    K = _intrinsics(f, c, c)
    th = 0.1
    R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]])
    t = np.array([0.5, 0.2, 0.1])
    # cam1 at origin; cam2 pose (R, t) as cam2->cam1 (c2w relative)
    P = np.array([0.3, -0.2, 3.0])  # 3D point in cam1 coords
    p1 = K @ P
    p1 = p1 / p1[2]
    P2 = R.T @ (P - t)  # point in cam2 coords (inverse transform)
    p2 = K @ P2
    p2 = p2 / p2[2]
    F = np.asarray(
        G.fundamental_matrix(jnp.asarray(K)[None], jnp.asarray(R)[None], jnp.asarray(t)[None, :, None])
    )[0]
    # with E = [t]x R and x1 = R x2 + t, the constraint is p1^T F p2 = 0
    val = p1 @ F @ p2
    assert abs(val) < 1e-4


def test_epipolar_mask_horizontal_translation():
    # pure x-translation => horizontal epipolar lines => keys share the query row
    H = W = 8
    ds = 8
    K = _intrinsics(32.0, 32.0, 32.0)
    R = np.eye(3)
    t = np.array([1.0, 0.0, 0.0])
    F = G.fundamental_matrix(
        jnp.asarray(K)[None, None, None], jnp.asarray(R)[None, None, None],
        jnp.asarray(t)[None, None, None, :, None],
    )
    mask = G.epipolar_mask(F, T=1, H=H, W=W, downsample=ds, flatten=False)
    m = np.asarray(mask[0, 0, 0]).reshape(H, W, H, W)
    for qy in range(H):
        # all allowed keys lie in the same row as the query
        ky = np.where(m[qy, 0].any(axis=1))[0]
        assert set(ky) == {qy}


def test_epipolar_mask_zero_translation_needs_perturbation():
    K = _intrinsics(32.0, 32.0, 32.0)
    t0 = jnp.zeros((1, 1, 1, 3, 1))
    t_fixed = G.add_small_perturbation(t0, jax.random.key(0))
    assert not np.allclose(np.asarray(t_fixed), 0.0)
    F = G.fundamental_matrix(
        jnp.asarray(K)[None, None, None], jnp.eye(3)[None, None, None], t_fixed
    )
    mask = G.epipolar_mask(F, 1, 4, 4, 8)
    assert np.asarray(mask).dtype == bool  # finite path, no NaNs crash


def test_epipolar_hybrid_fallback():
    # a mask with an all-False row falls back to full attention on that row
    cfg = EpipolarConfig(epipolar_hybrid_attention=True)
    # F whose epipolar lines are y + 1000 = 0 — far outside every grid cell
    F = jnp.asarray(np.array([[0.0, 0, 0], [0, 0, 1.0], [0, 0, 1e3]]))[None, None, None]
    mask = G.epipolar_mask(F, 1, 4, 4, 8, cfg, flatten=False)
    assert bool(np.asarray(mask).all())


def test_build_epipolar_masks_keys():
    K = jnp.asarray(_intrinsics(32.0, 32.0, 32.0))[None, None, None]
    R = jnp.eye(3)[None, None, None]
    t = jnp.asarray([1.0, 0, 0])[None, None, None, :, None]
    F = G.fundamental_matrix(
        jnp.broadcast_to(K, (1, 2, 2, 3, 3)),
        jnp.broadcast_to(R, (1, 2, 2, 3, 3)),
        jnp.broadcast_to(t, (1, 2, 2, 3, 1)),
    )
    cfg = EpipolarConfig(attention_resolution=(2, 1))
    masks = G.build_epipolar_masks(F, 2, (8, 8), cfg)
    assert set(masks.keys()) == {8, 16}
    assert masks[8].shape == (1, 2 * 64, 2 * 64)
    assert masks[16].shape == (1, 2 * 16, 2 * 16)


def test_conditional_epipolar_mask_shape():
    b, t, c = 1, 3, 2
    K = jnp.broadcast_to(jnp.asarray(_intrinsics(32.0, 16.0, 16.0)), (b, t, 3, 3))
    w2c = jnp.broadcast_to(jnp.eye(4).at[0, 3].set(0.5), (b, t, 4, 4))
    w2c_cond = jnp.broadcast_to(jnp.eye(4).at[1, 3].set(0.3), (b, c, 4, 4))
    mask = G.conditional_epipolar_mask(
        K, w2c, w2c_cond, jnp.zeros((b,), jnp.int32), H=32, W=32, downsample=8
    )
    hw = 16
    assert mask.shape == (b, t * hw, (c + 1) * hw)


def test_pixel_unshuffle_matches_torch_order():
    import torch

    x = np.random.default_rng(0).normal(size=(1, 4, 4, 3)).astype(np.float32)
    ours = np.asarray(pixel_unshuffle(jnp.asarray(x), 2))  # (1, 2, 2, 12)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
    theirs = torch.nn.functional.pixel_unshuffle(xt, 2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_pose_encoder_pyramid():
    cfg = PoseEncoderConfig(
        downscale_factor=2, channels=(8, 16), nums_rb=2, cin=24,
        temporal_attention_nhead=2, temporal_position_encoding_max_len=4,
    )
    enc = CameraPoseEncoder(cfg)
    plucker = jnp.zeros((1, 4, 16, 16, 6))
    params = enc.init(jax.random.key(0), plucker)
    feats = enc.apply(params, plucker)
    assert len(feats) == 2
    assert feats[0].shape == (1, 4, 8, 8, 8)
    assert feats[1].shape == (1, 4, 4, 4, 16)
