"""Generate the demo camera-pose library (configs/demo/camera_pose_files/).

The reference demo selects trajectories by name from
configs/demo/camera_poses.json -> demo/camera_pose_files/*.txt
(reference: configs/demo/camera_poses.json, 04_visualize.py via
main/runtime.py pose pipeline). The txt files themselves are absent from the
reference snapshot (not in the git tree), so this script SYNTHESIZES the 16
standard trajectories with the conventional semantics of their names: w2c
3x4 rows (12 columns, the format main/runtime.py::load_trajectory_txt reads),
16 frames each, RealEstate10K-ish magnitudes.

Usage: python tools/make_demo_poses.py [--out configs/demo/camera_pose_files] [--frames 16]
"""

from __future__ import annotations

import argparse
import pathlib

import numpy as np


def _w2c_from_c2w(c2w: np.ndarray) -> np.ndarray:
    w2c = np.linalg.inv(c2w)
    return w2c[:3].reshape(-1)


def _rot(axis: str, angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    if axis == "x":
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    if axis == "y":
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def trajectory(name: str, frames: int) -> np.ndarray:
    """(frames, 12) w2c rows. Camera convention: +z forward, +y down (COLMAP /
    RealEstate10K), pose magnitudes chosen to look like a typical clip."""
    ts = np.linspace(0.0, 1.0, frames)
    rows = []
    for u in ts:
        c2w = np.eye(4)
        if name == "zoom in":
            c2w[:3, 3] = [0, 0, 0.6 * u]          # move forward
        elif name == "zoom out":
            c2w[:3, 3] = [0, 0, -0.6 * u]
        elif name == "pan up":
            c2w[:3, 3] = [0, -0.4 * u, 0]          # +y is down
        elif name == "pan down":
            c2w[:3, 3] = [0, 0.4 * u, 0]
        elif name == "pan left":
            c2w[:3, 3] = [-0.4 * u, 0, 0]
        elif name == "pan right":
            c2w[:3, 3] = [0.4 * u, 0, 0]
        elif name == "look up":
            c2w[:3, :3] = _rot("x", -0.35 * u)
        elif name == "look down":
            c2w[:3, :3] = _rot("x", 0.35 * u)
        elif name == "look left":
            c2w[:3, :3] = _rot("y", -0.35 * u)
        elif name == "look right":
            c2w[:3, :3] = _rot("y", 0.35 * u)
        elif name in ("orbit up", "orbit left", "orbit right"):
            # orbit a target 2 units ahead while keeping it centered
            r = 2.0
            ang = 0.3 * u * {"orbit up": -1, "orbit left": -1, "orbit right": 1}[name]
            axis = "x" if name == "orbit up" else "y"
            R = _rot(axis, ang)
            target = np.array([0, 0, r])
            pos = target - R @ np.array([0, 0, r])
            c2w[:3, :3] = R
            c2w[:3, 3] = pos
        elif name == "rotate clockwise":
            c2w[:3, :3] = _rot("z", -0.5 * u)
        elif name == "rotate anti-clockwise":
            c2w[:3, :3] = _rot("z", 0.5 * u)
        elif name == "stationary":
            pass
        else:
            raise ValueError(name)
        rows.append(_w2c_from_c2w(c2w))
    return np.asarray(rows)


NAMES = [
    "zoom in", "zoom out", "pan up", "pan down", "pan left", "pan right",
    "look up", "look down", "look left", "look right",
    "orbit up", "orbit left", "orbit right",
    "rotate clockwise", "rotate anti-clockwise", "stationary",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(pathlib.Path(__file__).resolve().parents[1]
                                         / "configs" / "demo" / "camera_pose_files"))
    ap.add_argument("--frames", type=int, default=16)
    args = ap.parse_args()
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    for name in NAMES:
        rows = trajectory(name, args.frames)
        np.savetxt(out / f"{name}.txt", rows, fmt="%.8f")
        print(f"wrote {out / (name + '.txt')}")


if __name__ == "__main__":
    main()
