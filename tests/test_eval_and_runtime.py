"""Tests for eval metrics, trajectory tools, media contract, and harness pieces."""

import json
import os

import numpy as np
import pytest

from camc2v_tpu.camera import trajectory as TJ
from camc2v_tpu.eval import camera_metrics as CM
from camc2v_tpu.eval.video_metrics import mse, psnr, ssim, video_pair_metrics
from camc2v_tpu.eval.fvd import frechet_distance, gaussian_stats
from camc2v_tpu.utils.save_video import log_evaluation, save_grid, to_uint8


def _rotmat(axis_angle):
    th = np.linalg.norm(axis_angle)
    if th < 1e-9:
        return np.eye(3)
    k = axis_angle / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K


# ------------------------------- camera metrics -------------------------------

def test_roterr_known_angle():
    r1 = np.eye(3)[None]
    r2 = _rotmat(np.array([0, 0, 0.3]))[None]
    err = CM.calc_roterr(r1, r2)
    np.testing.assert_allclose(err, [0.3], atol=1e-6)


def test_camera_metric_identical_is_zero():
    poses = np.tile(np.eye(4), (5, 1, 1))
    poses[:, 0, 3] = np.arange(5)
    rot, trans, cammc = CM.camera_metric(poses, poses)
    assert rot == pytest.approx(0, abs=1e-6)
    assert trans == pytest.approx(0, abs=1e-6)
    assert cammc == pytest.approx(0, abs=1e-6)


def test_normalize_t_scale_invariance():
    poses = np.tile(np.eye(4), (4, 1, 1))
    poses[:, 0, 3] = [0, 1, 2, 3]
    scaled = poses.copy()
    scaled[:, :3, 3] *= 10  # same trajectory, different scale
    _, trans, cammc = CM.camera_metric(poses, scaled)
    assert trans == pytest.approx(0, abs=1e-6)
    assert cammc == pytest.approx(0, abs=1e-6)


def test_relative_pose_first_frame_identity():
    poses = np.tile(np.eye(4), (3, 1, 1))
    poses[:, 1, 3] = [5, 6, 7]
    rel = CM.relative_pose(poses)
    np.testing.assert_allclose(rel[0], np.eye(4))
    np.testing.assert_allclose(rel[1, 1, 3], 1.0)


# ------------------------------- video metrics --------------------------------

def test_mse_psnr_ssim_identical():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    assert mse(a, a) == 0
    assert psnr(a, a) > 100
    assert ssim(a, a) == pytest.approx(1.0, abs=1e-6)


def test_video_pair_metrics_degrade_with_noise():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (3, 32, 32, 3)).astype(np.uint8)
    b = np.clip(a.astype(int) + rng.integers(-40, 40, a.shape), 0, 255).astype(np.uint8)
    m_same = video_pair_metrics(a, a, with_lpips=False)
    m_noisy = video_pair_metrics(a, b, with_lpips=False)
    assert m_noisy["mse"] > m_same["mse"]
    assert m_noisy["ssim"] < m_same["ssim"]
    assert len(m_noisy["mse_per_timestep"]) == 3


def test_frechet_distance_properties():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(500, 16))
    y = rng.normal(size=(500, 16)) + 2.0
    mu1, s1 = gaussian_stats(x)
    mu2, s2 = gaussian_stats(y)
    assert frechet_distance(mu1, s1, mu1, s1) == pytest.approx(0, abs=1e-6)
    d = frechet_distance(mu1, s1, mu2, s2)
    assert d > 16 * 3  # ~ |2|^2 per dim


def test_fvd_scorer_requires_weights():
    from camc2v_tpu.eval.fvd import FVDScorer

    scorer = FVDScorer(weights_path=None)
    with pytest.raises(FileNotFoundError):
        scorer.extract_features(np.zeros((1, 9, 64, 64, 3)))


# -------------------------------- trajectory ----------------------------------

def test_camera_pose_lerp_endpoints():
    c2w = np.stack([np.eye(4), np.diag([1.0, 1, 1, 1]) + 0])
    c2w[1, 0, 3] = 1.0
    out = TJ.camera_pose_lerp(c2w, 5)
    assert out.shape == (5, 4, 4)
    np.testing.assert_allclose(out[0], c2w[0])
    np.testing.assert_allclose(out[-1], c2w[1])
    np.testing.assert_allclose(out[2, 0, 3], 0.5)


def test_bezier_lerp_monotone():
    c2w = np.tile(np.eye(4), (4, 1, 1))
    c2w[:, 0, 3] = np.arange(4)
    out = TJ.camera_pose_lerp_bezier(c2w, 8, 0.3, 0.7)
    xs = out[:, 0, 3]
    assert xs[0] == pytest.approx(0, abs=1e-6)
    assert xs[-1] == pytest.approx(3, abs=1e-6)
    assert np.all(np.diff(xs) >= -1e-9)


def test_slerp_resample_rotation():
    p0 = np.eye(4)
    p1 = np.eye(4)
    p1[:3, :3] = _rotmat(np.array([0, 0, np.pi / 2]))
    out = TJ.resample_poses_slerp(np.stack([p0, p1]), 3)
    mid = out[1, :3, :3]
    expected = _rotmat(np.array([0, 0, np.pi / 4]))
    np.testing.assert_allclose(mid, expected, atol=1e-6)


def test_quaternion_roundtrip():
    R = _rotmat(np.array([0.2, -0.4, 0.8]))
    q = TJ.matrix_to_quaternion(R)
    np.testing.assert_allclose(TJ.quaternion_to_matrix(q), R, atol=1e-6)


def test_extend_trajectory_autoregressive():
    c2w = np.tile(np.eye(4), (3, 1, 1))
    c2w[:, 0, 3] = [0, 1, 2]
    out = TJ.extend_trajectory_autoregressive(c2w, 2)
    assert out.shape == (6, 4, 4)
    np.testing.assert_allclose(out[3:, 0, 3], [2, 3, 4])  # continues the motion


# ------------------------------ media contract --------------------------------

def test_log_evaluation_contract(tmp_path):
    rng = np.random.default_rng(0)
    gen = rng.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32)
    gt = rng.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32)
    cam = rng.normal(size=(4, 19)).astype(np.float32)
    ctx = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    vdir = log_evaluation(str(tmp_path), "vid0", gen, gt, cam, "a caption", ctx, fps=8)
    assert os.path.exists(os.path.join(vdir, "generated.mp4"))
    assert os.path.exists(os.path.join(vdir, "ground_truth.mp4"))
    assert os.path.exists(os.path.join(vdir, "camera_data.npy"))
    assert open(os.path.join(vdir, "captions.txt")).read().strip() == "a caption"
    assert os.path.exists(os.path.join(vdir, "context_0.png"))
    assert os.path.exists(os.path.join(vdir, "context_1.png"))


def test_save_grid(tmp_path):
    videos = np.zeros((3, 2, 16, 16, 3), np.float32)
    save_grid(str(tmp_path / "grid.npz"), videos, n_cols=2)
    assert os.path.exists(tmp_path / "grid.npz")


def test_to_uint8_range():
    x = np.array([[-1.0, 0.0, 1.0]])[..., None].repeat(3, -1)
    out = to_uint8(x[None])
    np.testing.assert_array_equal(out.ravel()[:3], [0, 0, 0])
    assert out.max() == 255


# ------------------------------ single image ----------------------------------

def test_single_image_batch():
    from camc2v_tpu.data.single_image import SingleImageForInference

    si = SingleImageForInference(video_length=4, resolution=(32, 32), tokenizer=lambda s: np.zeros((1, 7)))
    img = np.random.default_rng(0).integers(0, 255, (48, 64, 3)).astype(np.uint8)
    batch = si.get_batch_input(img, "hello")
    assert batch["video"].shape == (1, 4, 32, 32, 3)
    assert batch["RT"].shape == (1, 4, 4, 4)
    assert batch["camera_intrinsics"].shape == (1, 4, 3, 3)
    assert batch["caption_tokens"].shape == (1, 7)


def test_trajectory_txt_loader(tmp_path):
    from camc2v_tpu.main.runtime import load_trajectory_txt

    rows = []
    for i in range(3):
        rt = np.hstack([np.eye(3), [[i], [0], [0]]]).reshape(-1)
        rows.append(" ".join(f"{v:.6f}" for v in rt))
    p = tmp_path / "traj.txt"
    p.write_text("\n".join(rows))
    w2c = load_trajectory_txt(str(p))
    assert w2c.shape == (3, 4, 4)
    np.testing.assert_allclose(w2c[2, 0, 3], 2.0)
