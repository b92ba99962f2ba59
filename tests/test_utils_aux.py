"""Tests for aux utilities: camera trace export, profiling, seeding."""

import os

import numpy as np

from camc2v_tpu.utils.camera_trace import export_camera_trace_obj, frustum_points, trajectory_points
from camc2v_tpu.utils.profiling import seed_everything, timed


def _traj(n=4):
    c2w = np.tile(np.eye(4), (n, 1, 1))
    c2w[:, 0, 3] = np.arange(n)
    return c2w


def test_trajectory_points_flip_convention():
    pts = trajectory_points(_traj(), points_per_segment=2)
    # world flip negates x: centres 0..3 -> 0..-3
    assert pts[:, 0].min() == -3.0
    assert (pts[:, 1] == 0).all()


def test_frustum_points_shape():
    pts = frustum_points(_traj(2))
    assert pts.shape[1] == 3
    assert len(pts) == 2 * 8 * 10  # 2 cams x 8 edges x 10 pts


def test_export_obj(tmp_path):
    path = export_camera_trace_obj(str(tmp_path / "trace.obj"), _traj())
    lines = open(path).read().splitlines()
    assert lines[0].startswith("#")
    assert all(l.startswith("v ") for l in lines[1:])
    assert len(lines) > 100


def test_seed_everything_deterministic():
    seed_everything(123, rank=1)
    a = np.random.rand(3)
    seed_everything(123, rank=1)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
    seed_everything(123, rank=2)
    c = np.random.rand(3)
    assert not np.allclose(a, c)


def test_timed_sink():
    sink = {}
    with timed("block", sink):
        sum(range(1000))
    assert sink["block"] > 0
