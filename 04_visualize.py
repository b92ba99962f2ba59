#!/usr/bin/env python
"""Interactive demo — reference CLI semantics (gradio UI when available,
headless CLI generation otherwise).

reference: CamContextI2V/04_visualize.py:33-315 — two-model comparison UI over
test videos with reference/context frame selection and camera-pose trace
controls, backed by the Image2Video engine (main/runtime.py).

Usage (headless):
  python 04_visualize.py --models camcontext=configs/models/camcontexti2v_256.yaml \
      --image path/to/img.png --prompt "a room" --trajectory poses.txt \
      [--chunks 2] [--loop] [--bezier-a 0.3 --bezier-b 0.7]
Usage (UI): add --gradio (requires the gradio package).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+", default=None, help="name=config.yaml pairs")
    ap.add_argument("--image", default=None)
    ap.add_argument("--prompt", default="")
    ap.add_argument("--trajectory", default=None, help="pose txt (w2c rows)")
    ap.add_argument("--trajectory-name", default=None,
                    help="named pose from --poses-json (e.g. 'zoom in', 'orbit left')")
    ap.add_argument("--poses-json", default="configs/demo/camera_poses.json",
                    help="name -> pose txt registry (reference configs/demo/camera_poses.json)")
    ap.add_argument("--models-json", default=None,
                    help="load model name=config pairs from a models.json "
                         "(reference configs/demo/models.json) instead of --models")
    ap.add_argument("--model", default=None, help="model name to run (default: first)")
    ap.add_argument("--chunks", type=int, default=1, help="auto-regressive 16-frame chunks")
    ap.add_argument("--loop", action="store_true")
    ap.add_argument("--bezier-a", type=float, default=None)
    ap.add_argument("--bezier-b", type=float, default=None)
    ap.add_argument("--trace-extract-ratio", type=float, default=1.0)
    ap.add_argument("--trace-scale-factor", type=float, default=1.0)
    ap.add_argument("--cfg-scale", type=float, default=7.5)
    ap.add_argument("--camera-cfg", type=float, default=1.0)
    ap.add_argument("--ddim-steps", type=int, default=25)
    ap.add_argument("--out", default="results/demo")
    ap.add_argument("--video-length", type=int, default=16)
    ap.add_argument("--resolution", type=int, nargs=2, default=(256, 256), metavar=("H", "W"))
    ap.add_argument("--dtype", choices=("bfloat16", "float32"), default="bfloat16",
                    help="compute dtype (float32 for CPU debugging: bf16 is emulated there)")
    ap.add_argument("--gradio", action="store_true")
    return ap.parse_args()


def build_engine(args):
    from camc2v_tpu.main.harness import setup_logger
    from camc2v_tpu.main.runtime import Image2Video

    import jax.numpy as jnp

    setup_logger(None)
    if args.models_json:
        import json

        with open(args.models_json) as f:
            configs = {name: spec["config_file"] for name, spec in json.load(f).items()}
    else:
        assert args.models, "--models or --models-json required"
        configs = dict(m.split("=", 1) for m in args.models)
    engine = Image2Video(
        configs,
        result_dir=args.out,
        video_length=args.video_length,
        resolution=tuple(args.resolution),
        dtype=jnp.dtype(args.dtype),
    )
    return engine, configs


def resolve_trajectory(args):
    """--trajectory wins; --trajectory-name resolves through the
    camera_poses.json registry (reference demo contract)."""
    if args.trajectory:
        return args.trajectory
    if not args.trajectory_name:
        return None
    import json
    import pathlib

    with open(args.poses_json) as f:
        registry = json.load(f)
    rel = registry[args.trajectory_name]
    p = pathlib.Path(rel)
    if not p.is_absolute() and not p.exists():
        p = pathlib.Path(args.poses_json).parent.parent.parent / rel
    return str(p)


def run_headless(args):
    import cv2

    from camc2v_tpu.main.runtime import load_trajectory_txt

    engine, configs = build_engine(args)
    assert args.image, "--image required in headless mode"
    img = cv2.cvtColor(cv2.imread(args.image), cv2.COLOR_BGR2RGB)
    traj_path = resolve_trajectory(args)
    traj = load_trajectory_txt(traj_path) if traj_path else None
    name = args.model or next(iter(configs))
    path = engine.get_image(
        name,
        img,
        args.prompt,
        trajectory=traj,
        num_chunks=args.chunks,
        loop=args.loop,
        bezier_coef_a=args.bezier_a,
        bezier_coef_b=args.bezier_b,
        trace_extract_ratio=args.trace_extract_ratio,
        trace_scale_factor=args.trace_scale_factor,
        ddim_steps=args.ddim_steps,
        guidance_scale=args.cfg_scale,
        camera_cfg=args.camera_cfg,
    )
    print(path)


def run_gradio(args):
    import gradio as gr

    from camc2v_tpu.main.runtime import load_trajectory_txt

    engine, configs = build_engine(args)

    import json

    pose_names = ["(none)"]
    pose_registry = {}
    try:
        with open(args.poses_json) as f:
            pose_registry = json.load(f)
        pose_names += list(pose_registry)
    except OSError:
        pass

    def generate(model_name, image, prompt, pose_name, traj_file, chunks, loop, cfg_scale, camera_cfg):
        if traj_file:
            traj = load_trajectory_txt(traj_file.name)
        elif pose_name and pose_name != "(none)":
            traj = load_trajectory_txt(pose_registry[pose_name])
        else:
            traj = None
        return engine.get_image(
            model_name, np.asarray(image), prompt, trajectory=traj,
            num_chunks=int(chunks), loop=bool(loop),
            guidance_scale=float(cfg_scale), camera_cfg=float(camera_cfg),
        )

    with gr.Blocks(title="CamC2V-TPU") as demo:
        gr.Markdown("# CamContextI2V (TPU) — camera-controlled image-to-video")
        with gr.Row():
            model_name = gr.Dropdown(list(configs), value=next(iter(configs)), label="model")
            chunks = gr.Slider(1, 8, 1, step=1, label="auto-regressive chunks")
            loop = gr.Checkbox(label="loop trajectory")
        with gr.Row():
            image = gr.Image(label="reference frame")
            with gr.Column():
                prompt = gr.Textbox(label="prompt")
                pose_name = gr.Dropdown(pose_names, value="(none)", label="camera pose")
                traj_file = gr.File(label="camera pose txt (overrides)")
                cfg_scale = gr.Slider(1.0, 15.0, 7.5, label="CFG scale")
                camera_cfg = gr.Slider(1.0, 3.0, 1.0, label="camera CFG")
                btn = gr.Button("Generate")
        out = gr.Video(label="generated")
        btn.click(generate, [model_name, image, prompt, pose_name, traj_file, chunks, loop, cfg_scale, camera_cfg], out)
    demo.launch()


def main():
    args = parse_args()
    if args.gradio:
        try:
            run_gradio(args)
            return
        except ImportError:
            print("gradio not installed — falling back to headless mode")
    run_headless(args)


if __name__ == "__main__":
    main()
