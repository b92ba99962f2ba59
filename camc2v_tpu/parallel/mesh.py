"""Device mesh + sharding rules (the NCCL/DDP/ZeRO replacement).

TPU-native equivalent of the reference's distributed layer (torchrun +
Lightning DDP / DeepSpeed ZeRO-1 over NCCL — reference: 01_train.py:178,
configs/models/camcontexti2v_256.yaml:208, lvdm/common.py:8-14):

  * one global 1-D `data` mesh over all chips (ICI within a slice, DCN across
    slices when `jax.distributed` is initialised);
  * batches sharded on axis 0 over `data`; params replicated;
  * optimizer state sharded over `data` on each leaf's largest divisible axis
    — the ZeRO-1 analogue (optimizer-state memory / N) with XLA inserting the
    all-gathers;
  * gradient all-reduce happens inside XLA via the sharded-batch jit.

FSDP-style parameter sharding is `shard_params=True` on the trainer factories
(trainer.py::make_sharded_train_step / shard_train_state; TrainConfig
`shard_params`, mapped from a `deepspeed_stage_2`/`stage_3`/`fsdp` strategy in
reference YAMLs): params/EMA shard like optimizer state, 1/N per chip.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def path_str(path) -> str:
    """Render a tree_*_with_path key path as 'unet/in_0_res/out_conv/kernel'.

    The single source of truth for param-path strings — the trainable-pattern
    regexes (trainer.param_labels), the TP sharding rules (tp.py) and their
    tests all match against this rendering."""
    return "/".join(str(getattr(k, "key", k)) for k in path)


def make_mesh(devices: Optional[list] = None, axis_name: str = DATA_AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _largest_divisible_axis(shape: tuple[int, ...], n: int) -> Optional[int]:
    best, best_size = None, 0
    for i, s in enumerate(shape):
        if s % n == 0 and s > best_size:
            best, best_size = i, s
    return best


def zero1_sharding(mesh: Mesh, tree: Any) -> Any:
    """Per-leaf sharding that splits the largest divisible axis over `data`.

    Used for optimizer-state leaves (ZeRO-1). Leaves with no divisible axis
    stay replicated.
    """
    n = mesh.shape[DATA_AXIS]

    def leaf_sharding(x):
        if not hasattr(x, "shape") or x.ndim == 0:
            return replicated(mesh)
        ax = _largest_divisible_axis(x.shape, n)
        if ax is None:
            return replicated(mesh)
        spec = [None] * x.ndim
        spec[ax] = DATA_AXIS
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(leaf_sharding, tree)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a HOST-LOCAL batch onto the mesh, sharded on the batch axis.

    Single-process: a plain device_put. Multi-process (jax.distributed): each
    host holds only its local slice of the global batch, so the global array
    is assembled from per-process shards — device_put with a global sharding
    would demand the full global array on every host and fail on the size
    check.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )
