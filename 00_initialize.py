#!/usr/bin/env python
"""Experiment initialisation — reference CLI semantics.

reference: CamContextI2V/00_initialize.py:19-55 — creates the run directory,
snapshots the config, and records the run in the per-machine `.exp_meta.yaml`
registry (reference: utils/meta.py + 01_train.py:303-348).

Usage: python 00_initialize.py --config <yaml> --name <run> [--logdir results]
"""

from __future__ import annotations

import argparse
import datetime
import os
import shutil
import socket

import yaml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--name", required=True)
    ap.add_argument("--logdir", default="./results")
    args = ap.parse_args()

    workdir = os.path.join(args.logdir, args.name)
    os.makedirs(os.path.join(workdir, "configs"), exist_ok=True)
    os.makedirs(os.path.join(workdir, "checkpoints"), exist_ok=True)
    os.makedirs(os.path.join(workdir, "logs"), exist_ok=True)
    shutil.copy(args.config, os.path.join(workdir, "configs", os.path.basename(args.config)))

    meta_path = os.path.join(args.logdir, ".exp_meta.yaml")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = yaml.safe_load(f) or {}
    host = socket.gethostname()
    meta.setdefault(host, {})[args.name] = {
        "config": os.path.abspath(args.config),
        "workdir": os.path.abspath(workdir),
        "created": datetime.datetime.now().isoformat(timespec="seconds"),
    }
    with open(meta_path, "w") as f:
        yaml.safe_dump(meta, f)
    print(f"initialized experiment '{args.name}' at {workdir}")


if __name__ == "__main__":
    main()
