"""Data-path throughput benchmark (VERDICT r2 #6).

Synthesises RealEstate10K-format mp4 clips, then measures DataLoader
batches/s at the flagship recipe (T=16, 256x256, batch 2, context frames)
across a num_workers sweep — with the C++ DecodePool when built and with the
pure-Python decode fallback — and reports the overlap margin against the
measured flagship train-step budget.

Usage: python tools/bench_loader.py [--clips 16] [--frames 64] [--batches 24]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

TRAIN_STEP_BUDGET_MS = 180.0  # flagship UNet fused-CFG step (PERF.md)


def make_workspace(root: pathlib.Path, n_clips: int, n_frames: int, hw=(360, 640)):
    import json as _json

    from camc2v_tpu.data.video_io import write_video

    (root / "clips").mkdir()
    (root / "meta").mkdir()
    rng = np.random.default_rng(0)
    names = [f"clip{i:03d}" for i in range(n_clips)]

    def pose_line(i):
        pose = np.hstack([np.eye(3), np.array([[i * 0.1], [0], [0]])]).reshape(-1)
        vals = [i * 1000, 0.9, 1.6, 0.5, 0.5, 0.0, 0.0] + pose.tolist()
        return " ".join(f"{v:.6f}" for v in vals)

    for name in names:
        frames = rng.integers(0, 255, (n_frames, hw[0], hw[1], 3), dtype=np.uint8)
        write_video(str(root / "clips" / f"{name}.mp4"), frames, fps=24.0)
        with open(root / "meta" / f"{name}.txt", "w") as f:
            f.write("url\n" + "\n".join(pose_line(i) for i in range(n_frames)) + "\n")
    (root / "list.txt").write_text("\n".join(names) + "\n")
    with open(root / "captions.json", "w") as f:
        _json.dump({f"{n}.mp4": [f"scene {n}"] for n in names}, f)
    return names


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=16)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--batches", type=int, default=24)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--workers", default="0,2,4,8")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from camc2v_tpu.data import realestate10k as R

    with tempfile.TemporaryDirectory() as td:
        root = pathlib.Path(td)
        make_workspace(root, args.clips, args.frames)
        ds = R.RealEstate10K(
            meta_path=str(root / "meta"),
            meta_list=str(root / "list.txt"),
            data_dir=str(root / "clips"),
            caption_file=str(root / "captions.json"),
            video_length=16,
            resolution=[256, 256],
            frame_stride=[1, 3],
            additional_cond_frames="random_full",
            num_additional_cond_frames=[1, 2],
        )
        try:
            import camc2v_tpu.data._native_decode  # noqa: F401

            print("DecodePool available: True", flush=True)
        except ImportError:
            print("DecodePool available: False (python decode fallback)", flush=True)

        results = {}
        for nw in [int(x) for x in args.workers.split(",")]:
            dl = R.DataLoader(
                ds, batch_size=args.batch_size, shuffle=True, drop_last=True,
                num_workers=nw, prefetch_batches=4,
            )
            # time FULL epochs from iterator creation — prefetch cannot hide
            # work across the epoch boundary, so this is steady-state
            # throughput, not queue drain. First epoch warms file caches.
            epoch_rates = []
            for ep in range(3):
                count = 0
                t0 = time.perf_counter()
                for _ in dl:
                    count += 1
                dt = time.perf_counter() - t0
                if ep > 0:
                    epoch_rates.append(count / dt)
            bps = float(np.median(epoch_rates))
            vps = bps * args.batch_size
            results[nw] = vps
            margin = (1.0 / bps) / (TRAIN_STEP_BUDGET_MS / 1e3)
            print(
                f"num_workers={nw}: {bps:.2f} batches/s, {vps:.2f} videos/s "
                f"({1e3 / bps:.0f} ms/batch = {margin:.2f}x the {TRAIN_STEP_BUDGET_MS:.0f} ms step)",
                flush=True,
            )
        best = max(results, key=results.get)
        print(json.dumps({
            "metric": "loader_videos_per_s",
            "value": round(results[best], 2),
            "unit": "videos/s",
            "best_num_workers": best,
            "batch_size": args.batch_size,
            "keeps_up_with_step": results[best] / args.batch_size
            > 1e3 / TRAIN_STEP_BUDGET_MS,
        }))


if __name__ == "__main__":
    main()
