#!/usr/bin/env python
"""Metrics over generated per-video directories — reference CLI semantics.

reference: CamContextI2V/03_evaluation.py (fvd :79-147, camera_pose_evaluation
:301-420, compute_extended_metrics :422-516, main :550-615): consumes the
directory tree written by 02_generate_videos.py and appends a row to
results/evaluation.csv.

Usage:
  python 03_evaluation.py --path results/generation --output results \
      [--fvd] [--camera] [--extended] [--max-videos N] [--trials 5]
"""

from __future__ import annotations

import argparse
import csv
import os
import tempfile
from glob import glob

import numpy as np


def video_dirs(path: str) -> list[str]:
    return sorted(
        d for d in glob(os.path.join(path, "*")) if os.path.exists(os.path.join(d, "generated.mp4"))
    )


def load_video(path: str) -> np.ndarray:
    from camc2v_tpu.data.video_io import VideoReader

    r = VideoReader(path)
    frames = r.read_all()
    r.close()
    return frames


def run_extended(dirs: list[str], with_lpips: bool = True) -> dict:
    from camc2v_tpu.eval.video_metrics import video_pair_metrics

    agg: dict[str, list] = {}
    for d in dirs:
        gt = load_video(os.path.join(d, "ground_truth.mp4"))
        gen = load_video(os.path.join(d, "generated.mp4"))
        m = video_pair_metrics(gt, gen, with_lpips=with_lpips)
        for k, v in m.items():
            if np.isscalar(v):
                agg.setdefault(k, []).append(v)
    return {k: float(np.mean(v)) for k, v in agg.items()}


def run_fvd(dirs: list[str], variant: str, weights: str | None) -> float:
    from camc2v_tpu.eval.fvd import FVDScorer

    scorer = FVDScorer(weights, variant)
    real, gen = [], []
    for d in dirs:
        real.append(load_video(os.path.join(d, "ground_truth.mp4")).astype(np.float32) / 127.5 - 1)
        gen.append(load_video(os.path.join(d, "generated.mp4")).astype(np.float32) / 127.5 - 1)
    t = min(min(len(v) for v in real), min(len(v) for v in gen))
    real = np.stack([v[:t] for v in real])
    gen = np.stack([v[:t] for v in gen])
    return scorer(real, gen)


def run_camera(dirs: list[str], trials: int = 5, verbose: bool = False) -> dict:
    """COLMAP/GLOMAP pose recovery -> RotErr/TransErr/CamMC vs camera_data.npy.

    reference: 03_evaluation.py:301-420 (5 trials/video, best-effort on
    reconstruction failures).
    """
    from camc2v_tpu.eval import camera_metrics as CM
    from camc2v_tpu.eval.colmap import compute_camera_poses, dump_frames, have_colmap, recovered_trajectory

    if not have_colmap():
        raise RuntimeError("colmap/glomap not on PATH")
    rot_list, trans_list, cammc_list = [], [], []
    for d in dirs:
        cam_file = os.path.join(d, "camera_data.npy")
        if not os.path.exists(cam_file):
            continue
        camera_data = np.load(cam_file)
        gt_w2c = CM.rt34_to_44(camera_data[:, 7:].reshape(-1, 3, 4))
        gt_c2w_rel = CM.relative_pose(np.linalg.inv(gt_w2c), mode="left")
        best = None
        for trial in range(trials):
            with tempfile.TemporaryDirectory() as tmp:
                frames = os.path.join(tmp, "frames")
                n = dump_frames(os.path.join(d, "generated.mp4"), frames)
                try:
                    sparse = compute_camera_poses(frames, os.path.join(tmp, "ws"), verbose)
                    traj = recovered_trajectory(sparse)
                except Exception:
                    traj = None
                if traj is None or len(traj) != n:
                    continue
                rec_c2w_rel = CM.relative_pose(np.linalg.inv(traj), mode="left")
                t = min(len(gt_c2w_rel), len(rec_c2w_rel))
                errs = CM.camera_metric(gt_c2w_rel[:t], rec_c2w_rel[:t])
                if best is None or errs[2] < best[2]:
                    best = errs
        if best is not None:
            rot_list.append(best[0])
            trans_list.append(best[1])
            cammc_list.append(best[2])
    return {
        "RotErr": float(np.mean(rot_list)) if rot_list else float("nan"),
        "TransErr": float(np.mean(trans_list)) if trans_list else float("nan"),
        "CamMC": float(np.mean(cammc_list)) if cammc_list else float("nan"),
        "n_videos": len(rot_list),
    }


def main():
    if os.environ.get("CAMC2V_FORCE_CPU") == "1":
        import jax  # single-claim axon backend: opt out before first use

        jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", required=True, help="generation output directory")
    ap.add_argument("--output", default="results")
    ap.add_argument("--fvd", action="store_true")
    ap.add_argument("--camera", action="store_true")
    ap.add_argument("--extended", action="store_true")
    ap.add_argument("--no-lpips", action="store_true")
    ap.add_argument("--i3d-weights", default=None)
    ap.add_argument("--max-videos", type=int, default=None)
    ap.add_argument("--trials", type=int, default=5)
    args = ap.parse_args()

    dirs = video_dirs(args.path)
    if args.max_videos:
        dirs = dirs[: args.max_videos]
    print(f"evaluating {len(dirs)} videos from {args.path}")
    row: dict = {"path": args.path, "n_videos": len(dirs)}

    if args.extended or not (args.fvd or args.camera):
        row.update(run_extended(dirs, with_lpips=not args.no_lpips))
        print({k: v for k, v in row.items() if k not in ("path",)})
    if args.fvd:
        for variant in ("videogpt", "stylegan"):
            try:
                row[f"fvd_{variant}"] = run_fvd(dirs, variant, args.i3d_weights)
            except FileNotFoundError as e:
                print(f"fvd_{variant} skipped: {e}")
    if args.camera:
        row.update(run_camera(dirs, trials=args.trials))

    os.makedirs(args.output, exist_ok=True)
    csv_path = os.path.join(args.output, "evaluation.csv")
    exists = os.path.exists(csv_path)
    with open(csv_path, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=sorted(row))
        if not exists:
            w.writeheader()
        w.writerow(row)
    print(f"appended results to {csv_path}")


if __name__ == "__main__":
    main()
