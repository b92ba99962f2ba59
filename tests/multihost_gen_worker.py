"""Subprocess worker for the 2-process multi-host GENERATION test.

Drives the real 02_generate_videos.py CLI under jax.distributed: each process
gets a rank-strided shard of the dataset (loader num_shards/shard_index wired
from jax.process_count/index — reference analogue: trainer.test over DDP
ranks, CamContextI2V/02_generate_videos.py:461-621) and writes its videos to
its own out dir so the parent test can assert the shards are disjoint and
jointly complete.

Usage: python multihost_gen_worker.py <coordinator> <num_procs> <proc_id> <cfg> <out_dir>
"""

import os
import sys

coordinator, num_procs, proc_id, cfg_path, out_dir = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], sys.argv[5]
)

os.environ["JAX_PLATFORMS"] = "cpu"
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import jax

jax.config.update("jax_platforms", "cpu")
# exercise the emitted-launcher env contract (utils/meta.py launcher_script):
# the CLI itself must pick these up via distributed_init_from_env — plain
# jax.distributed.initialize() ignores JAX_NUM_PROCESSES / JAX_PROCESS_ID
os.environ["JAX_COORDINATOR_ADDRESS"] = coordinator
os.environ["JAX_NUM_PROCESSES"] = str(num_procs)
os.environ["JAX_PROCESS_ID"] = str(proc_id)

import runpy

sys.argv = [
    "02_generate_videos.py", "--config", cfg_path, "--out", out_dir,
    "--ddim-steps", "2", "--cfg-scale", "1.0",
]
runpy.run_path(os.path.join(repo, "02_generate_videos.py"), run_name="__main__")
assert jax.process_count() == num_procs  # the CLI's env-contract init ran
names = sorted(
    d for d in os.listdir(out_dir)
    if os.path.exists(os.path.join(out_dir, d, "generated.mp4"))
)
print(f"proc {proc_id}: wrote {','.join(names)} OK", flush=True)
