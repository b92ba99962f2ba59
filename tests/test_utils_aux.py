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


class TestLoggingSinks:
    """camc2v_tpu/main/loggers.py — CSV/TensorBoard sinks + config parsing."""

    def test_csv_sink(self, tmp_path):
        from camc2v_tpu.main.loggers import CSVSink

        sink = CSVSink(str(tmp_path))
        sink.log_scalars(10, {"loss": 0.5, "grad_norm": 1.25})
        sink.log_scalars(20, {"loss": 0.25, "grad_norm": 0.75})
        lines = open(tmp_path / "metrics.csv").read().strip().splitlines()
        assert lines[0] == "step,grad_norm,loss"
        assert lines[1].startswith("10,1.25,0.5")

    def test_tensorboard_sink(self, tmp_path):
        import numpy as np
        import pytest

        pytest.importorskip("torch.utils.tensorboard")
        from camc2v_tpu.main.loggers import TensorBoardSink

        sink = TensorBoardSink(str(tmp_path))
        sink.log_scalars(1, {"loss": 0.1})
        sink.log_video(1, "samples/x", np.zeros((4, 8, 8, 3), np.float32))
        sink.close()
        import glob

        assert glob.glob(str(tmp_path / "tensorboard" / "events.*"))

    def test_build_sinks_reference_style_config(self, tmp_path):
        from camc2v_tpu.main.loggers import CSVSink, TensorBoardSink, build_sinks

        # reference target-style node (utils_train.py:111-150)
        sinks = build_sinks(
            [{"target": "pytorch_lightning.loggers.TensorBoardLogger"}, "csv"],
            str(tmp_path),
        )
        kinds = {type(s) for s in sinks}
        assert TensorBoardSink in kinds and CSVSink in kinds
        # wandb unavailable in this image -> degrades to a warning, not a crash
        sinks = build_sinks({"target": "pytorch_lightning.loggers.WandbLogger"}, str(tmp_path))
        assert sinks == [] or sinks

    def test_metrics_logger_callback_with_sinks(self, tmp_path):
        from camc2v_tpu.main.callbacks import MetricsLogger
        from camc2v_tpu.main.loggers import CSVSink

        ml = MetricsLogger(str(tmp_path), interval=2, sinks=[CSVSink(str(tmp_path))])
        ml.on_train_batch_end(1, None, {"loss": 1.0})  # skipped (interval)
        ml.on_train_batch_end(2, None, {"loss": 0.5})
        ml.on_train_batch_end(4, None, {})  # empty metrics (non-log step) skipped
        lines = open(tmp_path / "metrics.csv").read().strip().splitlines()
        assert len(lines) == 2  # header + one row


class TestMachineRegistry:
    """utils/meta.py — the reference's per-machine registry analogue
    (reference utils/meta.py + 02_generate_videos.py:255-275)."""

    def test_apply_machine_config_substitutes_data_roots(self, monkeypatch):
        from camc2v_tpu.utils import meta

        monkeypatch.setitem(
            meta.DATA_DIRECTORIES, "podX",
            {"train": {"data_dir": "/mnt/train", "meta_path": "/mnt/meta"},
             "test": {"data_dir": "/mnt/test"}},
        )
        cfg = {"data": {"params": {"train": {"params": {"data_dir": "old", "video_length": 16}}}}}
        out = meta.apply_machine_config(cfg, "podX")
        tr = out["data"]["params"]["train"]["params"]
        assert tr["data_dir"] == "/mnt/train" and tr["meta_path"] == "/mnt/meta"
        assert tr["video_length"] == 16  # non-path params untouched
        assert out["data"]["params"]["test"]["params"]["data_dir"] == "/mnt/test"
        # unknown machine is a no-op
        assert meta.apply_machine_config({"a": 1}, "nope") == {"a": 1}

    def test_launcher_script_multihost(self, monkeypatch):
        from camc2v_tpu.utils import meta

        monkeypatch.setitem(
            meta.TPU_SETUPS, "podX",
            {"v5e-16": {"num_hosts": 4, "chips_per_host": 4, "batch_size": 2}},
        )
        txt = meta.launcher_script("podX", "v5e-16", "02_generate_videos.py",
                                   ["--config", "c.yaml", "--out", "o"])
        assert "JAX_NUM_PROCESSES=4" in txt
        assert "JAX_COORDINATOR_ADDRESS" in txt
        assert "02_generate_videos.py --config c.yaml --out o" in txt
        # single-host machines emit a plain invocation
        txt1 = meta.launcher_script("local", "default", "01_train.py", ["--config", "c.yaml"])
        assert "JAX_NUM_PROCESSES" not in txt1 and "01_train.py --config c.yaml" in txt1

    def test_emit_launcher_cli(self, tmp_path, monkeypatch):
        import runpy
        import sys

        out = tmp_path / "launch.sh"
        monkeypatch.setattr(sys, "argv", [
            "02_generate_videos.py", "--config", "x.yaml",
            "--emit-launcher", str(out),
        ])
        runpy.run_path(os.path.join(os.path.dirname(__file__), "..", "02_generate_videos.py"),
                       run_name="__main__")
        body = out.read_text()
        assert body.startswith("#!/bin/bash") and "02_generate_videos.py" in body
        assert "--emit-launcher" not in body
