"""COLMAP/GLOMAP camera-pose recovery wrapper (evaluation-only subprocesses).

reference: CamContextI2V/03_evaluation.py:153-232 — feature extraction,
sequential matching, glomap mapping over frames dumped from a generated video,
then conversion of the recovered w2c trajectory to relative c2w for
RotErr/TransErr/CamMC. The binaries stay external (as in the reference);
their absence raises a clear error at call time.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import Optional

import numpy as np


def have_colmap() -> bool:
    return shutil.which("colmap") is not None and shutil.which("glomap") is not None


def dump_frames(video_path: str, out_dir: str) -> int:
    """Write per-frame PNGs (the reference uses moviepy; cv2 here)."""
    import cv2

    from camc2v_tpu.data.video_io import VideoReader

    os.makedirs(out_dir, exist_ok=True)
    reader = VideoReader(video_path)
    frames = reader.read_all()
    for i, f in enumerate(frames):
        cv2.imwrite(os.path.join(out_dir, f"{i:05d}.png"), cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    reader.close()
    return len(frames)


def _run(*cmd: str, verbose: bool = False) -> None:
    out = None if verbose else subprocess.DEVNULL
    subprocess.run(list(cmd), check=True, stdout=out, stderr=out)


def compute_camera_poses(frames_dir: str, workspace: str, verbose: bool = False) -> str:
    """COLMAP features + sequential matching, GLOMAP mapping.

    reference: 03_evaluation.py:219-223. Returns the sparse-model directory.
    """
    if not have_colmap():
        raise RuntimeError("colmap/glomap binaries not found on PATH — camera-pose "
                           "evaluation needs them installed (evaluation-only dependency)")
    os.makedirs(workspace, exist_ok=True)
    db = os.path.join(workspace, "database.db")
    sparse = os.path.join(workspace, "sparse")
    os.makedirs(sparse, exist_ok=True)
    _run("colmap", "feature_extractor", "--database_path", db, "--image_path", frames_dir,
         "--ImageReader.camera_model", "SIMPLE_PINHOLE", "--ImageReader.single_camera", "1",
         verbose=verbose)
    _run("colmap", "sequential_matcher", "--database_path", db, verbose=verbose)
    _run("glomap", "mapper", "--database_path", db, "--image_path", frames_dir,
         "--output_path", sparse, verbose=verbose)
    return os.path.join(sparse, "0")


def qvec2rotmat(qvec: np.ndarray) -> np.ndarray:
    """COLMAP quaternion (w, x, y, z) -> rotation matrix.

    reference: utils/evaluation.py:475-489.
    """
    w, x, y, z = qvec
    return np.array([
        [1 - 2 * y**2 - 2 * z**2, 2 * x * y - 2 * w * z, 2 * x * z + 2 * w * y],
        [2 * x * y + 2 * w * z, 1 - 2 * x**2 - 2 * z**2, 2 * y * z - 2 * w * x],
        [2 * x * z - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x**2 - 2 * y**2],
    ])


def read_images_txt(path: str) -> dict[str, np.ndarray]:
    """COLMAP images.txt -> {image_name: w2c 4x4} (vendored-reader equivalent,
    reference: utils/evaluation.py:118-473)."""
    poses = {}
    with open(path) as f:
        lines = [l.strip() for l in f if l.strip() and not l.startswith("#")]
    for i in range(0, len(lines), 2):  # every image has a 2nd line of points
        parts = lines[i].split()
        qvec = np.array([float(x) for x in parts[1:5]])
        tvec = np.array([float(x) for x in parts[5:8]])
        name = parts[9]
        rt = np.eye(4)
        rt[:3, :3] = qvec2rotmat(qvec)
        rt[:3, 3] = tvec
        poses[name] = rt
    return poses


def recovered_trajectory(sparse_dir: str) -> Optional[np.ndarray]:
    """Sorted (N, 4, 4) w2c trajectory from a sparse model (txt export)."""
    images_txt = os.path.join(sparse_dir, "images.txt")
    if not os.path.exists(images_txt):
        # convert binary model to txt first
        if not have_colmap():
            return None
        _run("colmap", "model_converter", "--input_path", sparse_dir,
             "--output_path", sparse_dir, "--output_type", "TXT")
    poses = read_images_txt(images_txt)
    if not poses:
        return None
    names = sorted(poses)
    return np.stack([poses[n] for n in names])
