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


class TestColmapBinaryModel:
    """Native .bin model readers (reference vendors the same format readers,
    utils/evaluation.py:118-473)."""

    @staticmethod
    def _write_model(d, n=3):
        import struct

        rng = np.random.default_rng(0)
        # synthetic camera ring
        qvecs, tvecs = [], []
        for i in range(n):
            a = 0.1 * i
            qvecs.append(np.array([np.cos(a / 2), 0.0, np.sin(a / 2), 0.0]))
            tvecs.append(np.array([0.3 * i, 0.0, 1.0]))
        with open(os.path.join(d, "images.bin"), "wb") as f:
            f.write(struct.pack("<Q", n))
            for i in range(n):
                f.write(struct.pack("<idddddddi", i + 1, *qvecs[i], *tvecs[i], 1))
                f.write(f"{i:05d}.png".encode() + b"\x00")
                f.write(struct.pack("<Q", 2))  # 2 dummy 2D points
                f.write(struct.pack("<ddq", 1.0, 2.0, -1) * 2)
        with open(os.path.join(d, "cameras.bin"), "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<iiQQ", 1, 0, 64, 48))  # SIMPLE_PINHOLE
            f.write(struct.pack("<3d", 60.0, 32.0, 24.0))
        pts = rng.normal(size=(10, 3)) + np.array([0, 0, 5.0])
        with open(os.path.join(d, "points3D.bin"), "wb") as f:
            f.write(struct.pack("<Q", len(pts)))
            for j, p in enumerate(pts):
                f.write(struct.pack("<QdddBBBd", j + 1, *p, 10, 20, 30, 0.5))
                f.write(struct.pack("<Q", 1))
                f.write(struct.pack("<ii", 1, 0))
        return qvecs, tvecs, pts

    def test_bin_reader_roundtrip(self, tmp_path):
        from camc2v_tpu.eval import colmap as C

        qvecs, tvecs, _ = self._write_model(str(tmp_path))
        poses = C.read_images_bin(str(tmp_path / "images.bin"))
        assert len(poses) == 3
        rt = poses["00001.png"]
        np.testing.assert_allclose(rt[:3, :3], C.qvec2rotmat(qvecs[1]), atol=1e-12)
        np.testing.assert_allclose(rt[:3, 3], tvecs[1], atol=1e-12)
        cams = C.read_cameras_bin(str(tmp_path / "cameras.bin"))
        assert cams[1]["width"] == 64 and cams[1]["params"][0] == 60.0
        xyz, rgb = C.read_points3d_bin(str(tmp_path / "points3D.bin"))
        assert xyz.shape == (10, 3) and (rgb[0] == [10, 20, 30]).all()

    def test_trajectory_prefers_bin(self, tmp_path):
        from camc2v_tpu.eval import colmap as C

        self._write_model(str(tmp_path))
        traj = C.recovered_trajectory(str(tmp_path))
        assert traj.shape == (3, 4, 4)
        # first frame pose is identity-rotation-ish at a=0
        np.testing.assert_allclose(traj[0][:3, :3], np.eye(3), atol=1e-12)

    def test_export_poses_and_depth(self, tmp_path):
        from camc2v_tpu.eval import colmap as C

        self._write_model(str(tmp_path))
        out = str(tmp_path / "export")
        rel = C.export_poses(str(tmp_path), out)
        assert rel.shape == (3, 4, 4)
        np.testing.assert_allclose(rel[0], np.eye(4), atol=1e-12)
        assert os.path.exists(os.path.join(out, "pose_2.npy"))
        n = C.export_depth_maps(str(tmp_path), out)
        assert n == 3
        depth = np.load(os.path.join(out, "depth_00000.npy"))
        assert depth.shape == (48, 64) and (depth >= 0).all() and depth.max() > 0


def test_camera_metrics_golden_vs_reference_source():
    """Execute the reference's metric functions (extracted via ast from the
    read-only source) on random trajectories and compare against
    eval/camera_metrics — a true oracle, not a transcription."""
    import ast

    import torch

    ns = {"torch": torch, "Tensor": torch.Tensor}
    wanted = {"calc_roterr", "calc_transerr", "calc_cammc", "metric",
              "normalize_t", "rt34_to_44", "relative_pose"}
    for path in ("/root/reference/CamContextI2V/03_evaluation.py",
                 "/root/reference/CamContextI2V/utils/evaluation.py"):
        tree = ast.parse(open(path).read())
        for node in tree.body:
            if isinstance(node, ast.FunctionDef) and node.name in wanted:
                code = ast.Module(body=[node], type_ignores=[])
                # strip annotations the namespace can't resolve
                for sub in ast.walk(node):
                    if isinstance(sub, ast.arg):
                        sub.annotation = None
                node.returns = None
                exec(compile(code, path, "exec"), ns)

    from camc2v_tpu.eval import camera_metrics as M

    rng = np.random.default_rng(3)
    def traj(seed):
        r = np.random.default_rng(seed)
        out = []
        for i in range(6):
            a, b, c = r.normal(size=3) * 0.3
            Rz = np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])
            Ry = np.array([[np.cos(b), 0, np.sin(b)], [0, 1, 0], [-np.sin(b), 0, np.cos(b)]])
            rt = np.eye(4)
            rt[:3, :3] = Rz @ Ry
            rt[:3, 3] = r.normal(size=3)
            out.append(rt)
        return np.stack(out)

    c1, c2 = traj(1), traj(2)
    ref_rot, ref_trans, ref_cammc = ns["metric"](
        torch.from_numpy(c1), torch.from_numpy(c2)
    )
    rot, trans, cammc = M.camera_metric(c1, c2)
    np.testing.assert_allclose(rot, ref_rot, rtol=1e-6)
    np.testing.assert_allclose(trans, ref_trans, rtol=1e-6)
    np.testing.assert_allclose(cammc, ref_cammc, rtol=1e-6)

    # relative_pose golden too (utils/evaluation.py:638-643)
    rel_ref = ns["relative_pose"](torch.from_numpy(c1), mode="left").numpy()
    np.testing.assert_allclose(M.relative_pose(c1, "left"), rel_ref, atol=1e-10)


def test_03_evaluation_cli_smoke(tmp_path, monkeypatch, capsys):
    """Drive the 03_evaluation.py CLI end-to-end on synthetic video dirs.

    reference: CamContextI2V/03_evaluation.py:550-615 (main) — consumes the
    per-video tree from 02_generate_videos.py and appends evaluation.csv.
    """
    import csv
    import runpy
    import sys

    rng = np.random.default_rng(0)
    gen_root = tmp_path / "generation"
    for i in range(2):
        gen = rng.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32)
        gt = np.clip(gen + rng.normal(scale=0.05, size=gen.shape), -1, 1).astype(np.float32)
        cam = rng.normal(size=(4, 19)).astype(np.float32)
        log_evaluation(str(gen_root), f"vid{i}", gen, gt, cam, f"cap {i}", None, fps=8)

    out_dir = tmp_path / "results"
    monkeypatch.setattr(
        sys, "argv",
        ["03_evaluation.py", "--path", str(gen_root), "--output", str(out_dir),
         "--extended", "--no-lpips"],
    )
    runpy.run_path(os.path.join(os.path.dirname(__file__), "..", "03_evaluation.py"),
                   run_name="__main__")

    rows = list(csv.DictReader(open(out_dir / "evaluation.csv")))
    assert len(rows) == 1 and rows[0]["n_videos"] == "2"
    # mp4 round-trip is lossy but close: metrics (uint8 units) must be sane
    assert 0.0 <= float(rows[0]["mse"]) < 500.0
    assert float(rows[0]["psnr"]) > 15.0
    assert 0.0 < float(rows[0]["ssim"]) <= 1.0

    # appending a second row keeps the header intact
    runpy.run_path(os.path.join(os.path.dirname(__file__), "..", "03_evaluation.py"),
                   run_name="__main__")
    rows = list(csv.DictReader(open(out_dir / "evaluation.csv")))
    assert len(rows) == 2
