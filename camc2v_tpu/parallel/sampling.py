"""Data-parallel sharded generation: one SPMD program over a device mesh.

The reference serves evaluation-set generation with one independent process
per GPU (02_generate_videos.py under torchrun, rank-strided dataset split).
TPU-natively the same scale-out is ONE jitted `model.sample` spanning every
chip: the batch axis is sharded over the `data` mesh axis, params are
replicated, and XLA keeps the whole DDIM scan on-device per shard with no
collectives on the hot path (generation is embarrassingly data-parallel).

Multi-process (multi-host) use works unchanged: `shard_batch` assembles the
global batch from per-process shards (parallel/mesh.py).
"""

from __future__ import annotations

from typing import Any, Optional

import jax

from camc2v_tpu.parallel.mesh import DATA_AXIS, batch_sharding, replicated, shard_batch


def make_sharded_sampler(model, mesh, sample_kwargs: Optional[dict] = None):
    """Returns `sampler(params, batch, key) -> videos` jitted over `mesh`.

    * params / key: replicated; batch: leading axis sharded over `data`.
    * The global batch size must be divisible by the mesh size (the CLI
      falls back to the unsharded path for remainder batches).
    * `sample_kwargs` are closed over statically (they select the compiled
      program — same contract as `model.sample`).
    """
    kw = dict(sample_kwargs or {})
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)

    def run(p, b, k):
        # activate the trace mesh so the Pallas kernel seams shard_map over
        # `data` (parallel/kernel_shard.py) instead of being replicated by
        # SPMD with global-batch all-gathers around every kernel site
        from camc2v_tpu.parallel.tp import activation_sharding

        with activation_sharding(mesh):
            return model.sample(p, b, k, **kw)

    fn = jax.jit(run, in_shardings=(rep, bsh, rep), out_shardings=bsh)

    def sampler(params: Any, device_batch: dict, key: jax.Array):
        n = mesh.shape[DATA_AXIS]
        b = next(iter(device_batch.values())).shape[0] * jax.process_count()
        if b % n != 0:
            raise ValueError(f"global batch {b} not divisible by mesh size {n}")
        return fn(params, shard_batch(mesh, device_batch), key)

    return sampler
