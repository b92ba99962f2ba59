"""shard_map wrappers for the Pallas kernel seams under SPMD meshes.

XLA's SPMD partitioner has no partitioning rule for custom calls, so under
pjit with batch-sharded operands every Pallas site is REPLICATED: the
partitioner all-gathers the full global batch of each operand and every
device computes every sample, keeping only its shard of the result. The r5
flagship dp collective audit (tools/collective_audit.py, 8-device mesh)
measured the damage: 743 all-gathers / 48.7 GB per train step and 43.7 GB of
per-device temps, with the HLO showing `f32[8, ...]` (global-batch) gathers
feeding each kernel region.

`data_shard` fixes the seams: when a mesh is active for the current trace
(parallel/tp.py::activation_sharding — set by the sharded train step, the TP
step, and the sharded sampler), the kernel call runs under `jax.shard_map`
manual over the `data` axis, so each device runs its own batch shard through
the kernel — zero collectives, each device 1/N of the kernel FLOPs. On a
2-D (data, model) mesh only `data` goes manual; `model` stays with the
auto partitioner (the kernels are batch-parallel and model-replicated).

Single-device paths are untouched: with no trace mesh (or an indivisible
batch axis) the call falls through unchanged, so single-chip benchmarks and
CPU tests see the exact same program as before.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
from jax.sharding import PartitionSpec as P

from camc2v_tpu.parallel.mesh import DATA_AXIS


def _spec(arr, batch_dim: Optional[int]) -> P:
    if batch_dim is None:
        return P()
    spec = [None] * arr.ndim
    spec[batch_dim] = DATA_AXIS
    return P(*spec)


def data_shard(
    fn: Callable,
    args: Sequence[Any],
    in_batch_dims: Sequence[Optional[int]],
    out_batch_dims,
):
    """Run `fn(*args)` sharded over the data mesh axis, or plainly when not
    applicable.

    in_batch_dims[i] is the global-batch dimension of args[i] (None =
    replicated operand). `out_batch_dims` mirrors fn's output structure:
    an int/None for a single array, or a tuple for tuple outputs.

    Falls back to a direct call when no mesh is active for this trace, the
    mesh has no >1 `data` axis, or any batch dim does not divide it.
    """
    from camc2v_tpu.parallel.tp import _trace_mesh

    mesh, _ = _trace_mesh()
    if mesh is None or mesh.shape.get(DATA_AXIS, 1) <= 1:
        return fn(*args)
    n = mesh.shape[DATA_AXIS]
    for a, bd in zip(args, in_batch_dims):
        if bd is None:
            continue
        if a is None or a.shape[bd] % n != 0 or a.shape[bd] == 0:
            return fn(*args)

    in_specs = tuple(_spec(a, bd) for a, bd in zip(args, in_batch_dims))
    if isinstance(out_batch_dims, tuple):
        def out_specs_of(shapes):
            return tuple(
                P(*[DATA_AXIS if i == bd else None for i in range(len(s.shape))])
                if bd is not None else P()
                for s, bd in zip(shapes, out_batch_dims)
            )
        out_shapes = jax.eval_shape(fn, *args)
        out_specs = out_specs_of(out_shapes)
    else:
        out_shape = jax.eval_shape(fn, *args)
        out_specs = (
            P(*[DATA_AXIS if i == out_batch_dims else None
                for i in range(len(out_shape.shape))])
            if out_batch_dims is not None else P()
        )
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        axis_names={DATA_AXIS},
        check_vma=False,
    )(*args)
