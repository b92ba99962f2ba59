#!/usr/bin/env python
"""Evaluation-set video generation — reference CLI semantics.

reference: CamContextI2V/02_generate_videos.py (args :32-112, config rewrite
:197-355, main :461-621): runs the model over the test split and writes one
directory per video ({generated.mp4, ground_truth.mp4, camera_data.npy,
captions.txt, context_j.png}) consumed by 03_evaluation.py. `--continue`
resumes by skipping already-generated sample dirs.

Usage:
  python 02_generate_videos.py --config <yaml> --ckpt <dir-or-.pt> \
      --out results/generation [--cfg-scale 7.5] [--camera-cfg 1.0] \
      [--sampling-strategy random_back] [--num-videos N] [--continue]
"""

from __future__ import annotations

import argparse
import os


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default=None, help="orbax checkpoint dir or reference .pt")
    ap.add_argument("--out", default="results/generation")
    ap.add_argument("--cfg-scale", type=float, default=7.5)
    ap.add_argument("--camera-cfg", type=float, default=1.0)
    ap.add_argument("--camera-cfg-scheduler", default="constant")
    ap.add_argument("--guidance-rescale", type=float, default=0.7)
    ap.add_argument("--ddim-steps", type=int, default=25)
    ap.add_argument("--timestep-spacing", default="uniform_trailing")
    ap.add_argument("--ddim-eta", type=float, default=1.0)
    ap.add_argument("--sampler", default="ddim", choices=["ddim", "dpmpp_2m"],
                    help="dpmpp_2m: deterministic 2nd-order solver, ~2x fewer steps than ddim")
    ap.add_argument("--sampling-strategy", default=None, help="context strategy override (e.g. random_back)")
    ap.add_argument("--num-videos", type=int, default=None)
    ap.add_argument("--continue", dest="resume", action="store_true")
    ap.add_argument("--seed", type=int, default=20240101)
    ap.add_argument("--shard-data", action="store_true",
                    help="run each batch as ONE data-parallel SPMD program over all "
                         "local chips (batch_size must divide the device count)")
    ap.add_argument("--bpe_path", default=None)
    ap.add_argument("--machine", default=None,
                    help="machine-registry entry (camc2v_tpu/utils/meta.py): substitutes "
                         "that machine's data roots into the config")
    ap.add_argument("--setup", default="default", help="TPU slice preset within --machine")
    ap.add_argument("--emit-launcher", default=None,
                    help="write a multi-host launcher script (the torchrun analogue) and exit")
    ap.add_argument("overrides", nargs="*")
    return ap.parse_args()


def main():
    args = parse_args()

    if args.emit_launcher:
        import sys

        from camc2v_tpu.utils.meta import launcher_script

        fwd = [a for a in sys.argv[1:] if not a.startswith("--emit-launcher")]
        if args.emit_launcher in fwd:
            fwd.remove(args.emit_launcher)
        text = launcher_script(args.machine or "local", args.setup, "02_generate_videos.py", fwd)
        with open(args.emit_launcher, "w") as f:
            f.write(text)
        os.chmod(args.emit_launcher, 0o755)
        print(f"launcher written to {args.emit_launcher}")
        return

    import jax

    if os.environ.get("CAMC2V_FORCE_CPU") == "1":
        # host-only mode (parity-gate dry runs, CI): the axon backend is
        # single-claim, so opting out must happen before first device use —
        # and the env var alone is overridden by the backend registration
        jax.config.update("jax_platforms", "cpu")

    # multi-host generation (reference: trainer.test over DDP ranks,
    # 02_generate_videos.py:461-621 + main/trainer.py:192-194): each process
    # takes a rank-strided shard of the dataset and runs the single-device
    # generation path over it, writing disjoint per-video directories
    from camc2v_tpu.utils.meta import distributed_init_from_env

    distributed_init_from_env()

    from camc2v_tpu.config_yaml import apply_dotlist, build_model_from_config, load_yaml
    from camc2v_tpu.data.realestate10k import DataLoader, RealEstate10K
    from camc2v_tpu.data.tokenizer import default_tokenizer
    from camc2v_tpu.main.harness import generate_videos, setup_logger

    cfg = apply_dotlist(load_yaml(args.config), args.overrides)
    if args.machine:
        from camc2v_tpu.utils.meta import apply_machine_config

        cfg = apply_machine_config(cfg, args.machine)
    log = setup_logger(None)
    model, pretrained = build_model_from_config(cfg)
    params = model.init_params(jax.random.key(args.seed))

    ckpt = args.ckpt or pretrained
    if ckpt and os.path.exists(ckpt):
        if os.path.isdir(ckpt):
            from camc2v_tpu.utils.checkpoint import restore_checkpoint

            restored = restore_checkpoint(ckpt, {"params": params})
            params = restored["params"] if "params" in restored else restored
        else:
            from camc2v_tpu.utils.torch_import import import_state_dict, load_torch_checkpoint

            sd = load_torch_checkpoint(ckpt)
            params, report = import_state_dict(sd, params, model.config.unet)
            log.info(f"imported {len(report['mapped'])} tensors from {ckpt}")

    tokenizer = default_tokenizer(args.bpe_path, model.config.clip_text.context_length)
    data_cfg = cfg.get("data", {}).get("params", {})
    split = data_cfg.get("test", data_cfg.get("validation", {}))
    ds_params = dict(split.get("params", {}))
    if args.sampling_strategy:
        ds_params["additional_cond_frames"] = args.sampling_strategy
    ds = RealEstate10K(tokenizer=tokenizer, **ds_params)
    dl = DataLoader(ds, batch_size=data_cfg.get("batch_size", 1), shuffle=False, drop_last=False,
                    num_workers=data_cfg.get("num_workers", 2),
                    num_shards=jax.process_count(), shard_index=jax.process_index())

    sample_kwargs = dict(
        ddim_steps=args.ddim_steps,
        ddim_eta=args.ddim_eta,
        sampler=args.sampler,
        guidance_scale=args.cfg_scale,
        guidance_rescale=args.guidance_rescale,
        timestep_spacing=args.timestep_spacing,
        camera_cfg=args.camera_cfg,
        camera_cfg_scheduler=args.camera_cfg_scheduler,
    )
    mesh = None
    if args.shard_data and len(jax.devices()) > 1 and jax.process_count() == 1:
        from camc2v_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        log.info(f"sharded generation over {mesh.size} devices")
    elif jax.process_count() > 1:
        log.info(
            f"multi-host generation: process {jax.process_index()}/{jax.process_count()} "
            f"over a rank-strided data shard"
        )
    written = generate_videos(
        model,
        params,
        dl,
        args.out,
        tokenizer=tokenizer,
        sample_kwargs=sample_kwargs,
        max_batches=args.num_videos,
        skip_existing=args.resume,
        seed=args.seed,
        mesh=mesh,
    )
    log.info(f"wrote {len(written)} videos to {args.out}")


if __name__ == "__main__":
    main()
