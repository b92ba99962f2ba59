"""Per-machine registry: data roots, TPU topology presets, env setup.

TPU-native analogue of the reference's machine registry
(reference: CamContextI2V/utils/meta.py — DEFAULT_MACHINE, DATA_DIRECTORIES,
PARTITION_SETUPS, ENVIRONMENT_SETUP, SOURCE_PATH — consumed by
02_generate_videos.py:22-28,85-86,169-181,255-265 for per-host config
rewriting and torchrun/slurm launcher generation).

Instead of slurm partitions + torchrun, entries here describe TPU slices:
hosts x chips with per-host batch sizing, and the launcher emits one command
per host wiring `jax.distributed` coordinator env vars (the torchrun
analogue for multi-host SPMD).

Edit the dicts below for your fleet; entries are examples, like the
reference's. `DEFAULT_MACHINE = "local"` always exists and means "this
host, all local chips, no substitution of data paths unless listed".
"""

from __future__ import annotations

import textwrap
from typing import Optional

DEFAULT_MACHINE = "local"
DEFAULT_META_FILE = ".exp_meta.yaml"

# ---- per-machine data roots (substituted into the config's data params) ----
DATA_DIRECTORIES: dict[str, dict[str, dict[str, str]]] = {
    # "my-v5e-pod": {
    #     "train": {
    #         "data_dir": "/mnt/data/realestate10k/train/clips",
    #         "meta_path": "/mnt/data/realestate10k/train/meta",
    #         "meta_list": "/mnt/data/realestate10k/train/list.txt",
    #         "caption_file": "/mnt/data/realestate10k/train/captions.json",
    #     },
    #     "val": {...}, "test": {...},
    # },
}

# ---- TPU slice presets (the PARTITION_SETUPS analogue) ----
TPU_SETUPS: dict[str, dict[str, dict]] = {
    "local": {
        "default": {
            "num_hosts": 1,
            "chips_per_host": None,  # None = all local devices
            "batch_size": 2,
            "accumulate_grad_batches": 4,
            "run_time": None,
        }
    },
    # "my-v5e-pod": {
    #     "v5e-16": {"num_hosts": 4, "chips_per_host": 4, "batch_size": 2,
    #                "accumulate_grad_batches": 4, "run_time": "71:59:59"},
    # },
}

# ---- per-machine environment setup commands (prefix of the launcher) ----
ENVIRONMENT_SETUP: dict[str, str] = {
    "local": "",
    # "my-v5e-pod": textwrap.dedent("""\
    #     source /opt/venv/bin/activate
    # """),
}

# ---- per-machine repo checkout paths ----
SOURCE_PATH: dict[str, str] = {
    "local": ".",
}


def setups_for(machine: str) -> dict[str, dict]:
    return TPU_SETUPS.get(machine, TPU_SETUPS[DEFAULT_MACHINE])


def apply_machine_config(cfg: dict, machine: Optional[str]) -> dict:
    """Substitute the machine's data roots into a loaded config dict
    (reference 02_generate_videos.py:255-275 rewrites train/val/test
    data_dir/meta_path/meta_list/caption_file per machine)."""
    if not machine or machine not in DATA_DIRECTORIES:
        return cfg
    dirs = DATA_DIRECTORIES[machine]
    data = cfg.setdefault("data", {}).setdefault("params", {})
    for split, paths in dirs.items():
        node = data.setdefault(split, {}).setdefault("params", {})
        node.update(paths)
    return cfg


def launcher_script(
    machine: str,
    setup: str,
    script: str,
    script_args: list[str],
    coordinator_port: int = 8476,
) -> str:
    """A bash launcher running `script` on every host of the slice with
    jax.distributed coordinator env wired — the torchrun-analogue
    (reference 02_generate_videos.py:165-195 emits torchrun/sbatch lines)."""
    cfg = setups_for(machine).get(setup) or next(iter(setups_for(machine).values()))
    n_hosts = int(cfg.get("num_hosts", 1))
    env = ENVIRONMENT_SETUP.get(machine, "")
    src = SOURCE_PATH.get(machine, ".")
    args = " ".join(script_args)
    if n_hosts <= 1:
        body = f"python {src}/{script} {args}\n"
    else:
        body = textwrap.dedent(f"""\
            # run this block on EVERY host of the slice (process_id = host index);
            # on GCE TPU pods, `gcloud compute tpus tpu-vm ssh --worker=all` fans it out
            export JAX_COORDINATOR_ADDRESS="${{COORDINATOR_HOST:?set to host 0 address}}:{coordinator_port}"
            export JAX_NUM_PROCESSES={n_hosts}
            export JAX_PROCESS_ID="${{HOST_INDEX:?set to this host's index}}"
            python {src}/{script} {args}
        """)
    return f"#!/bin/bash\nset -euo pipefail\n{env}\n{body}"


def distributed_init_from_env() -> bool:
    """jax.distributed.initialize from the launcher's env contract.

    The emitted launcher (launcher_script above) exports
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, but
    jax.distributed.initialize() only auto-reads the coordinator address —
    process count/id must be passed explicitly (jax 0.9 State.initialize reads
    only JAX_COORDINATOR_ADDRESS / JAX_LOCAL_DEVICE_IDS from env). On real TPU
    pod slices both may be omitted and cluster auto-detection fills them in.

    Returns True iff initialize() was called.
    """
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS")
    if not addr:
        return False
    import jax

    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=None if nproc is None else int(nproc),
        process_id=None if pid is None else int(pid),
    )
    return True
