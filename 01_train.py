#!/usr/bin/env python
"""Training launcher — reference CLI semantics on the TPU-native stack.

reference: CamContextI2V/01_train.py (arguments :27-116, main :375-501) +
main/trainer.py. Single-process SPMD replaces torchrun: one `data` mesh over
all local devices (multi-host via jax.distributed when JAX_COORDINATOR is set).

Usage:
  python 01_train.py --config configs/models/camcontexti2v_256.yaml \
      --name my_run --logdir ./results [--continue] [--debug] [--seed 42] \
      [key.path=value ...]
"""

from __future__ import annotations

import argparse
import os
import sys


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, help="three-section YAML (model/data/lightning)")
    ap.add_argument("--name", default=None, help="experiment name (default: config stem)")
    ap.add_argument("--logdir", default="./results")
    ap.add_argument("--seed", type=int, default=20240101)
    ap.add_argument("--train", action="store_true", default=True)
    ap.add_argument("--continue", dest="resume", action="store_true", help="resume from last checkpoint")
    ap.add_argument("--debug", action="store_true", help="numeric watcher + profiler, tiny logging intervals")
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--bpe_path", default=None, help="CLIP BPE merges file")
    ap.add_argument("--pretrained", default=None, help="reference .pt checkpoint to import")
    ap.add_argument("--machine", default=None,
                    help="machine-registry entry (camc2v_tpu/utils/meta.py): substitutes "
                         "that machine's data roots into the config")
    ap.add_argument("overrides", nargs="*", help="dotlist config overrides a.b.c=value")
    return ap.parse_args()


def main():
    args = parse_args()
    import jax

    # multi-host SPMD (the torchrun/slurm analogue): any of the standard
    # coordinator env vars triggers jax.distributed; chips of all hosts join
    # one global `data` mesh (ICI within slice, DCN across hosts)
    from camc2v_tpu.utils.meta import distributed_init_from_env

    distributed_init_from_env()

    import numpy as np

    from camc2v_tpu.config_yaml import apply_dotlist, build_model_from_config, build_train_config, load_yaml
    from camc2v_tpu.data.realestate10k import DataLoader, RealEstate10K
    from camc2v_tpu.data.tokenizer import default_tokenizer
    from camc2v_tpu.main import callbacks as CB
    from camc2v_tpu.main.harness import Trainer, init_workspace, setup_logger
    from camc2v_tpu.parallel import mesh as M
    from camc2v_tpu.parallel import trainer as TR

    cfg = apply_dotlist(load_yaml(args.config), args.overrides)
    if args.machine:
        from camc2v_tpu.utils.meta import apply_machine_config

        cfg = apply_machine_config(cfg, args.machine)
    name = args.name or os.path.splitext(os.path.basename(args.config))[0]
    dirs = init_workspace(name, args.logdir, cfg)
    log = setup_logger(dirs["workdir"], rank=jax.process_index())
    np.random.seed(args.seed + jax.process_index())

    model, pretrained = build_model_from_config(cfg)
    params = model.init_params(jax.random.key(args.seed))
    log.info(f"model: {type(model).__name__}, params: "
             f"{sum(x.size for x in jax.tree_util.tree_leaves(params)):,}")

    ckpt_path = args.pretrained or pretrained
    if ckpt_path and os.path.exists(ckpt_path):
        from camc2v_tpu.utils.torch_import import import_state_dict, load_torch_checkpoint

        sd = load_torch_checkpoint(ckpt_path)
        params, report = import_state_dict(sd, params, model.config.unet)
        log.info(
            f"imported {len(report['mapped'])} tensors from {ckpt_path} "
            f"({len(report['unmatched_ckpt'])} unmatched, {len(report['missing_params'])} ours missing)"
        )

    tokenizer = default_tokenizer(args.bpe_path, model.config.clip_text.context_length)
    data_cfg = cfg.get("data", {}).get("params", {})
    bs = data_cfg.get("batch_size", 1)
    train_ds = RealEstate10K(tokenizer=tokenizer, **data_cfg.get("train", {}).get("params", {}))
    train_dl = DataLoader(
        train_ds, batch_size=bs, shuffle=True, seed=args.seed,
        num_shards=jax.process_count(), shard_index=jax.process_index(),
        num_workers=data_cfg.get("num_workers", 2),
    )
    val_dl = None
    if "validation" in data_cfg:
        val_ds = RealEstate10K(
            tokenizer=tokenizer,
            max_samples=data_cfg.get("validation_max_n_samples"),
            **data_cfg["validation"].get("params", {}),
        )
        val_dl = DataLoader(val_ds, batch_size=bs, shuffle=False)

    mesh = M.make_mesh()
    n_dev = jax.device_count()
    tr_cfg = build_train_config(cfg, n_dev)
    if args.max_steps:
        tr_cfg = TR.TrainConfig(**{**tr_cfg.__dict__, "max_steps": args.max_steps})
    state = TR.init_train_state(tr_cfg, params, world_batch_scale=n_dev * bs)

    lightning = cfg.get("lightning", {})
    from camc2v_tpu.main.loggers import build_sinks

    # reference: logger section -> wandb/tensorboard/CSV (utils_train.py:111-150);
    # zero-egress default is CSV + tensorboard, wandb honoured in offline mode
    sinks = build_sinks(lightning.get("logger"), dirs["loginfo"], run_name=name)
    cbs = [
        CB.ProgressPrinter(interval=5 if args.debug else 20, max_steps=tr_cfg.max_steps),
        CB.MetricsLogger(dirs["loginfo"], interval=1 if args.debug else 50, sinks=sinks),
        CB.DeviceMonitor(interval=10 if args.debug else 100),
    ]
    watcher = None
    if args.debug:
        # reference --debug parity (01_train.py:292-299 + ModelWatcherCallback):
        # numeric sanitizer + per-layer capture probe on alert, reports dumped
        # under loginfo/watcher (probe_fn wired after the trainer exists)
        watcher = CB.ModelWatcher(
            raise_on_error=False,
            log_dir=os.path.join(dirs["loginfo"], "watcher"),
            probe_every=0,
        )
        cbs += [CB.LiveProfiler(interval=5), watcher]

    # periodic sample logging (reference ImageLogger, every 2500 opt steps)
    batch_logger_cfg = lightning.get("callbacks", {}).get("batch_logger", {}).get("params", {})
    if val_dl is not None and batch_logger_cfg:
        from camc2v_tpu.main.harness import make_sample_logger

        li_kwargs = batch_logger_cfg.get("log_images_kwargs", {})
        state_box = {"state": None}
        sample_fn = make_sample_logger(
            model,
            lambda: state_box["state"].params if state_box["state"] is not None else params,
            val_dl,
            os.path.join(dirs["workdir"], "images"),
            tokenizer=tokenizer,
            sample_kwargs=dict(
                ddim_steps=li_kwargs.get("ddim_steps", 25),
                ddim_eta=li_kwargs.get("ddim_eta", 1.0),
                guidance_scale=li_kwargs.get("unconditional_guidance_scale", 7.5),
                timestep_spacing=li_kwargs.get("timestep_spacing", "uniform"),
                guidance_rescale=li_kwargs.get("guidance_rescale", 0.0),
                enable_camera_condition=li_kwargs.get("enable_camera_condition", True),
            ),
            num_batches=batch_logger_cfg.get("num_batches", 1),
            sinks=sinks,
        )

        class _StateTap(CB.Callback):
            def on_train_batch_end(self, step, state, metrics):
                state_box["state"] = state

        cbs.append(_StateTap())
        cbs.append(
            CB.ImageLogger(
                every_n_steps=batch_logger_cfg.get("train_batch_frequency", 2500),
                sample_fn=sample_fn,
                log_first_iteration=batch_logger_cfg.get("log_first_iteration", False),
            )
        )

    # epipolar-mask freeze schedule (reference: camcontexti2v.py:771-776)
    flag_schedule = None
    freeze_steps = getattr(model.config, "epipolar_mask_freeze_steps", None)
    if freeze_steps:
        flag_schedule = [(0, {"adaptor_use_mask": False}), (freeze_steps, {"adaptor_use_mask": True})]

    trainer = Trainer(
        model,
        tr_cfg,
        train_dl,
        val_dataloader=val_dl,
        callbacks=cbs,
        flag_schedule=flag_schedule,
        ckpt_dir=dirs["ckptdir"],
        ckpt_every_n_steps=lightning.get("callbacks", {})
        .get("metrics_over_trainsteps_checkpoint", {})
        .get("params", {})
        .get("every_n_train_steps", 5000),
        val_every_n_steps=lightning.get("trainer", {}).get("val_check_interval"),
        tokenizer=tokenizer,
        mesh=mesh,
        seed=args.seed,
    )
    if watcher is not None:
        def _probe():
            probe_state = trainer.last_state
            p = probe_state.params if probe_state is not None else params
            return model.debug_probe(p, trainer.last_batch, jax.random.key(args.seed))

        watcher.probe_fn = _probe

    trainer.fit(state, resume=args.resume)
    log.info("training finished")


if __name__ == "__main__":
    main()
