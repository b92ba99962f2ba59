"""Export trained JAX params back to a reference-format PyTorch checkpoint.

The inverse of the import path: a user who initialised from a reference `.pt`
(e.g. ckpts/256_cami2v.pt — configs/models/camcontexti2v_256.yaml:2), trained
here, and wants to run the reference's own eval/demo stack gets a
Lightning-compatible `{'state_dict': ...}` file that the reference loader
accepts verbatim (reference: main/utils_train.py:165-214; the DeepSpeed->fp32
conversion analogue is 01_train.py:350-373).

The template checkpoint supplies key names/shapes/dtypes; keys the importer
skips (schedule buffers, EMA copies, dead CLIP blocks) pass through from the
template. EMA params are exported when the checkpoint carries them and
--ema is given.

Usage:
  python tools/export_torch_checkpoint.py \
      --ckpt-dir runs/exp1/checkpoints [--step N] [--ema] \
      --template ckpts/256_cami2v.pt --config configs/camcontexti2v_256.yaml \
      --out exported.pt
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", required=True, help="orbax checkpoint dir")
    ap.add_argument("--step", type=int, default=None, help="default: latest")
    ap.add_argument("--ema", action="store_true", help="export EMA params")
    ap.add_argument("--template", required=True, help="reference .pt for key names")
    ap.add_argument("--config", required=True, help="model YAML (reference format ok)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # host-only work

    from camc2v_tpu.config_yaml import build_model_from_config, load_yaml
    from camc2v_tpu.utils.checkpoint import restore_checkpoint
    from camc2v_tpu.utils.torch_import import (
        export_state_dict,
        load_torch_checkpoint,
        save_torch_checkpoint,
    )

    model = build_model_from_config(load_yaml(args.config))
    params = model.init_params(jax.random.key(0), (256, 256))
    # same partial-tree restore the generation CLI uses (02_generate_videos.py)
    key = "ema_params" if args.ema else "params"
    restored = restore_checkpoint(args.ckpt_dir, {key: params}, step=args.step)
    params = restored[key] if key in restored else restored

    template = load_torch_checkpoint(args.template)
    sd, report = export_state_dict(params, template, model.config.unet, strict=False)
    print(f"exported {len(report['exported'])} tensors, "
          f"{len(report['template_passthrough'])} passthrough, "
          f"{len(report['missing_params'])} missing, "
          f"{len(report['shape_mismatch'])} shape mismatches")
    if report["shape_mismatch"]:
        raise SystemExit(f"shape mismatches: {report['shape_mismatch'][:5]}")
    save_torch_checkpoint(args.out, sd)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
