"""Subprocess worker for the 2-process jax.distributed test.

Each process owns 4 virtual CPU devices (8 global). Builds a tiny
CamContextI2V, runs one ZeRO-1-sharded train step over the global mesh, saves
an orbax checkpoint from BOTH processes (multi-host coordinated), and prints
the loss. Launched by tests/test_multihost.py.

Usage: python multihost_worker.py <coordinator> <num_procs> <proc_id> <ckpt_dir>
"""

import os
import sys

coordinator, num_procs, proc_id, ckpt_dir = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator, num_processes=num_procs, process_id=proc_id)

import jax.numpy as jnp
import numpy as np

from camc2v_tpu.parallel import mesh as M
from camc2v_tpu.parallel import trainer as TR
from camc2v_tpu.utils import checkpoint as CK
from __graft_entry__ import _tiny_camcontext_config

assert jax.process_count() == num_procs, jax.process_count()
assert jax.device_count() == 4 * num_procs, jax.device_count()

from camc2v_tpu.models.camcontexti2v import CamContextI2V

T, IMG = 4, 32
cfg = _tiny_camcontext_config()
model = CamContextI2V(cfg, dtype=jnp.float32)
params = model.init_params(jax.random.key(0), (IMG, IMG))

mesh = M.make_mesh()  # global devices
tr_cfg = TR.TrainConfig(
    trainable_patterns=("^adaptor/", "^image_proj/", "^zero_conv/"),
    accumulate_grad_batches=1,
)
state = TR.init_train_state(tr_cfg, params)
state = TR.shard_train_state(mesh, state)

# per-host local batch: the GLOBAL batch is 8 (one sample per device)
local_b = 4
rng = np.random.default_rng(proc_id)
K = np.array([[IMG, 0, IMG / 2], [0, IMG, IMG / 2], [0, 0, 1]], np.float32)
w2c = np.tile(np.eye(4, dtype=np.float32), (local_b, T, 1, 1))
w2c[..., 0, 3] = np.linspace(0, 1, T)[None]
batch = {
    "video": jnp.asarray(rng.uniform(-1, 1, (local_b, T, IMG, IMG, 3)), jnp.float32),
    "caption_tokens": jnp.zeros((local_b, 7), jnp.int32),
    "frame_stride": jnp.full((local_b,), 3, jnp.int32),
    "camera_intrinsics": jnp.broadcast_to(jnp.asarray(K), (local_b, T, 3, 3)),
    "RT": jnp.asarray(w2c),
    "cond_frames": jnp.asarray(rng.uniform(-1, 1, (local_b, 2, IMG, IMG, 3)), jnp.float32),
    "RT_cond": jnp.tile(np.eye(4, dtype=np.float32), (local_b, 2, 1, 1)),
}
batch = M.shard_batch(mesh, batch)

step = TR.make_sharded_train_step(model, tr_cfg, mesh, state=state)
new_state, metrics = step(state, batch, jax.random.key(1))
loss = float(metrics["loss"])
assert np.isfinite(loss), loss

# multi-host coordinated orbax save — every process calls it
CK.save_checkpoint(ckpt_dir, new_state, int(new_state.step))
print(f"proc {proc_id}: loss={loss:.5f} step={int(new_state.step)} OK", flush=True)
jax.distributed.shutdown()
