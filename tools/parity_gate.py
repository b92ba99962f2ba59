#!/usr/bin/env python
"""One-command pretrained-weight quality-parity gate (FVD north star).

The quality-parity contract: import the reference's released checkpoint
(reference: /root/reference/README.md:18-27 — FVD-VideoGPT 53.90,
FVD-StyleGAN 45.36 for CamContextI2V at 256x256x16f, 25-step DDIM cfg 7.5),
generate N eval-split videos through the 02_generate_videos.py semantics,
score them with 03_evaluation.py, and pass iff every gated metric lands
within --tolerance (default 1%, per BASELINE.json's north star) of the
reference number.

The released `.pt` weights are an absent data dependency in this environment
(zero egress) — this script makes the run ZERO-FRICTION the day they appear:

  python tools/parity_gate.py --weights 256_camcontexti2v.pt \
      --data-root /data/realestate10k --num-videos 128

Every stage is resumable (generation skips existing sample dirs) and each
missing dependency fails with an actionable message. A CPU-tiny dry run of
the full pipeline (synthetic dataset, tiny config, no weights) is covered by
tests/test_parity_gate.py, so the gate itself is known-green before weights
exist.

Gated metrics (names = evaluation.csv columns):
  fvd_videogpt / fvd_stylegan   require --fvd (I3D weights via
                                tools/convert_i3d_weights.py)
  mse                           extended metrics (always on)
  RotErr / TransErr / CamMC     require --camera (colmap/glomap binaries)
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# reference README.md:22-27 (CamContextI2V row; 50K steps, DDIM-25, cfg 7.5)
REFERENCE_TARGETS = {
    "fvd_videogpt": 53.90,
    "fvd_stylegan": 45.36,
    "mse": 2579.96,
    "TransErr": 1.53,
    "RotErr": 1.09,
    "CamMC": 2.29,
}


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True, help="reference .pt / DeepSpeed dir / orbax dir")
    ap.add_argument("--config", default=os.path.join(REPO, "configs/models/camcontexti2v_256.yaml"))
    ap.add_argument("--out", default="results/parity_gate")
    ap.add_argument("--num-videos", type=int, default=128)
    ap.add_argument("--tolerance", type=float, default=0.01,
                    help="relative tolerance vs the reference number (0.01 = 1%%)")
    ap.add_argument("--metrics", default="fvd_videogpt,fvd_stylegan",
                    help="comma list of gated metrics (default: the FVD north star)")
    ap.add_argument("--fvd", action="store_true", default=True)
    ap.add_argument("--no-fvd", dest="fvd", action="store_false")
    ap.add_argument("--camera", action="store_true", help="also run COLMAP pose metrics")
    ap.add_argument("--i3d-weights", default=None)
    ap.add_argument("--cfg-scale", type=float, default=7.5)
    ap.add_argument("--ddim-steps", type=int, default=25,
                    help="25 is the reference recipe; override only for dry runs")
    ap.add_argument("--sampling-strategy", default="random_back",
                    help="eval context strategy (reference eval recipe)")
    ap.add_argument("--bpe-path", default=None)
    ap.add_argument("--skip-generate", action="store_true",
                    help="score an existing <out>/generation tree only")
    ap.add_argument("--python", default=sys.executable)
    ap.add_argument("overrides", nargs="*", help="config dotlist overrides "
                    "(e.g. data.params.test.params.data_dir=/data/clips)")
    return ap.parse_args(argv)


def _check(path: str | None, what: str, hint: str):
    if path and not os.path.exists(path):
        sys.exit(f"MISSING DEPENDENCY: {what} not found at {path!r}.\n  -> {hint}")


def run_gate(args) -> dict:
    _check(args.weights, "checkpoint", "download the released reference checkpoint "
           "(reference README 'Model Zoo') and pass it via --weights")
    _check(args.config, "model config", "configs/models/camcontexti2v_256.yaml ships in-repo")

    gen_dir = os.path.join(args.out, "generation")
    if not args.skip_generate:
        cmd = [
            args.python, os.path.join(REPO, "02_generate_videos.py"),
            "--config", args.config, "--ckpt", args.weights, "--out", gen_dir,
            "--cfg-scale", str(args.cfg_scale), "--ddim-steps", str(args.ddim_steps),
            "--timestep-spacing", "uniform_trailing", "--ddim-eta", "1.0",
            "--guidance-rescale", "0.7",
            "--sampling-strategy", args.sampling_strategy,
            "--num-videos", str(args.num_videos), "--continue",
        ]
        if args.bpe_path:
            cmd += ["--bpe_path", args.bpe_path]
        cmd += list(args.overrides)
        print("[parity_gate] generate:", " ".join(cmd), flush=True)
        subprocess.run(cmd, check=True)

    eval_cmd = [
        args.python, os.path.join(REPO, "03_evaluation.py"),
        "--path", gen_dir, "--output", args.out, "--extended", "--no-lpips",
        "--max-videos", str(args.num_videos),
    ]
    if args.fvd:
        eval_cmd.append("--fvd")
        if args.i3d_weights:
            eval_cmd += ["--i3d-weights", args.i3d_weights]
    if args.camera:
        eval_cmd.append("--camera")
    print("[parity_gate] evaluate:", " ".join(eval_cmd), flush=True)
    subprocess.run(eval_cmd, check=True)

    csv_path = os.path.join(args.out, "evaluation.csv")
    with open(csv_path, newline="") as f:
        rows = list(csv.DictReader(f))
    if not rows:
        sys.exit(f"no rows in {csv_path}")
    return rows[-1]


def verdict(row: dict, metrics: list[str], tolerance: float) -> dict:
    """Pass iff every requested metric is within tolerance of (or better than)
    the reference — lower is better for every gated metric."""
    results = {}
    ok = True
    for m in metrics:
        target = REFERENCE_TARGETS.get(m)
        if target is None:
            sys.exit(f"unknown gated metric {m!r} (choices: {sorted(REFERENCE_TARGETS)})")
        raw = row.get(m, "")
        if raw in ("", None):
            results[m] = {"status": "MISSING", "target": target}
            ok = False
            continue
        value = float(raw)
        bound = target * (1.0 + tolerance)
        passed = value <= bound
        results[m] = {
            "value": round(value, 4), "target": target,
            "bound": round(bound, 4), "status": "PASS" if passed else "FAIL",
        }
        ok = ok and passed
    return {"metric": "parity_gate", "pass": ok, "tolerance": tolerance,
            "n_videos": row.get("n_videos"), "results": results}


def main(argv=None) -> int:
    args = parse_args(argv)
    row = run_gate(args)
    out = verdict(row, [m.strip() for m in args.metrics.split(",") if m.strip()],
                  args.tolerance)
    print(json.dumps(out), flush=True)
    return 0 if out["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
