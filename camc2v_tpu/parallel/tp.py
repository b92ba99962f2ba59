"""Tensor-parallel sharding rules: a 2-D (data, model) mesh option.

Beyond the reference's scaling story (DDP/ZeRO-1 only — main/trainer.py:47-194,
configs/models/camcontexti2v_256.yaml:208): Megatron-style tensor parallelism
for the UNet's transformer blocks, expressed purely as pjit shardings — no
module changes. Column-parallel weights shard their OUTPUT features, the
matching row-parallel output projections shard their INPUT features, and XLA's
sharding propagation inserts the psum at each block boundary.

Rules (paths are '/'-joined param-tree keys):
  * column-parallel (last axis over "model"): attention to_q/to_k/to_v
    (+ to_kv, to_k_ip, to_v_ip) kernels, GEGLU/ff first projections and their
    biases — head and hidden dims divide over chips;
  * row-parallel (first axis over "model"): attention to_out kernels and the
    ff second projections (fc2 / ff_out) — outputs come out replicated via an
    XLA-inserted all-reduce; their biases stay replicated;
  * everything else (convs, norms, embeddings, VAE/CLIP) replicated.

Pallas custom-call sites (fused temporal MHA, fused LN+GEGLU FF, flash and
epipolar attention) are not partitioned by XLA — when they trigger, their
operands are gathered around the call. Two of those kernels consume RAW
WEIGHTS as operands (the fused temporal MHA takes to_q/to_k/to_v/to_out of
the temporal blocks, the fused FF takes ff/geglu/proj + ff/fc2 — see
nn/attention.py), so sharding those weights would buy a per-step all-gather
with zero sharded compute in return. `tp_param_shardings` therefore excludes
them whenever the corresponding kernel is enabled (disable the kernels —
CAMC2V_DISABLE_FUSED_TEMPORAL=1 / CAMC2V_DISABLE_FUSED_FF=1 or their
use_fused(False) overrides — and the weights shard again). What TP accelerates at flagship: the spatial/cross attention
projections, the XLA-path FFs, and every matmul XLA partitions natively.
Validated multi-chip on the CPU mesh (tests/test_tp.py) and by
`__graft_entry__.dryrun_multichip`.
"""

from __future__ import annotations

import contextlib
import contextvars
import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from camc2v_tpu.parallel.mesh import DATA_AXIS, path_str

MODEL_AXIS = "model"

# Mesh the current trace should constrain attention activations to. Set by
# make_tp_train_step's wrapper DURING TRACING (jit traces lazily on first
# call, so a plain `with` around jit construction would not reach the body).
_TP_TRACE_MESH: contextvars.ContextVar[Optional[Mesh]] = contextvars.ContextVar(
    "camc2v_tp_trace_mesh", default=None
)


@contextlib.contextmanager
def activation_sharding(mesh: Optional[Mesh]):
    """Enable head-axis activation constraints inside attention for this trace."""
    tok = _TP_TRACE_MESH.set(mesh)
    try:
        yield
    finally:
        _TP_TRACE_MESH.reset(tok)


def _trace_mesh() -> tuple[Optional[Mesh], int]:
    """(mesh, model_parallel) of the active trace; mp == 1 means a data-only
    mesh (DP/FSDP), where activations are still pinned batch-over-data so the
    partitioner cannot leak 1/N PARAM shardings into activation reshapes
    (the FSDP gather-at-use pattern triggered the same involuntary-remat
    diagnostics on the attention head splits)."""
    mesh = _TP_TRACE_MESH.get()
    if mesh is None or DATA_AXIS not in mesh.shape:
        return None, 1
    return mesh, mesh.shape.get(MODEL_AXIS, 1)


def constrain_heads(x: jax.Array, heads_axis: int = 2) -> jax.Array:
    """with_sharding_constraint (batch=data, heads=model) on an attention
    activation, e.g. (N, L, H, D) after the head split.

    Without this, XLA's propagation picks a fully-batch sharding for the
    to_q/to_k/to_v dots and then hits "Involuntary full rematerialization"
    (replicate-then-repartition) at every head-split reshape — the r3 TP
    dryrun compiled but replicated the biggest activations (VERDICT r3 #3).
    No-op outside a `activation_sharding(mesh)` trace or when shapes do not
    divide the mesh axes.
    """
    mesh, mp = _trace_mesh()
    if mesh is None:
        return x
    if x.shape[0] % mesh.shape[DATA_AXIS] != 0:
        return x
    spec = [None] * x.ndim
    spec[0] = DATA_AXIS
    if mp > 1 and x.shape[heads_axis] % mp == 0:
        spec[heads_axis] = MODEL_AXIS
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def constrain_merged(x: jax.Array) -> jax.Array:
    """(N, L, H*D) merged-heads constraint: last axis on `model`, so the
    row-parallel to_out dot contracts a sharded axis (psum at the boundary)
    instead of re-gathering the merged activation. On data-only meshes the
    constraint pins plain batch-over-data (see _trace_mesh)."""
    mesh, mp = _trace_mesh()
    if mesh is None:
        return x
    if x.shape[0] % mesh.shape[DATA_AXIS] != 0:
        return x
    spec = [None] * x.ndim
    spec[0] = DATA_AXIS
    if mp > 1 and x.shape[-1] % mp == 0:
        spec[-1] = MODEL_AXIS
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))

# column-parallel: shard the LAST axis (output features / heads)
_COL_RE = re.compile(
    r"(to_q|to_k|to_v|to_kv|to_k_ip|to_v_ip)/kernel$"
    r"|geglu/proj/(kernel|bias)$"
    r"|ff/fc1/(kernel|bias)$"
    r"|ff_proj/(kernel|bias)$"
)
# row-parallel: shard the FIRST axis (input features); bias replicated
_ROW_RE = re.compile(r"to_out/kernel$|ff/fc2/kernel$|ff_out/kernel$")

# weights consumed directly by Pallas kernels (UNet temporal blocks are named
# *_temporal / init_attn / mid_temporal — nn/unet3d.py:200-249)
_FUSED_MHA_RE = re.compile(r"(_temporal|init_attn)/.*(to_q|to_k|to_v|to_out)/")
_FUSED_FF_RE = re.compile(r"ff/(geglu/proj|fc2)/")


def _fused_weight_exclusions() -> list:
    """Regexes for weights that are operands of enabled fused Pallas kernels.

    XLA cannot partition a custom call, so a model-axis-sharded weight that
    only feeds one is all-gathered every step for nothing — keep those
    replicated. Evaluated at sharding-build time against the same env switches
    the dispatch sites read (ops/temporal_attention.fused_enabled,
    ops/geglu_ff.fused_enabled)."""
    from camc2v_tpu.ops import geglu_ff as gff
    from camc2v_tpu.ops import temporal_attention as ta

    ex = []
    if ta.fused_enabled():
        ex.append(_FUSED_MHA_RE)
    if gff.fused_enabled():
        ex.append(_FUSED_FF_RE)
    return ex


def make_tp_mesh(model_parallel: int, devices: Optional[list] = None) -> Mesh:
    """(data, model) mesh: `model_parallel` chips per model group."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def tp_param_shardings(mesh: Mesh, params: Any, fused_aware: bool = True) -> Any:
    """Per-leaf NamedSharding tree implementing the column/row rules.

    `fused_aware` (default) keeps weights replicated when their only consumer
    is an enabled fused Pallas kernel (see _fused_weight_exclusions)."""
    mp = mesh.shape[MODEL_AXIS]
    exclusions = _fused_weight_exclusions() if fused_aware else []

    def leaf(path, x) -> NamedSharding:
        p = path_str(path)
        if not hasattr(x, "shape") or x.ndim == 0:
            return NamedSharding(mesh, P())
        if any(r.search(p) for r in exclusions):
            return NamedSharding(mesh, P())
        if _COL_RE.search(p) and x.shape[-1] % mp == 0:
            spec = [None] * x.ndim
            spec[-1] = MODEL_AXIS
            return NamedSharding(mesh, P(*spec))
        if _ROW_RE.search(p) and x.ndim >= 2 and x.shape[0] % mp == 0:
            spec = [None] * x.ndim
            spec[0] = MODEL_AXIS
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf, params)


def tp_state_shardings(mesh: Mesh, state: Any) -> Any:
    """TrainState shardings: params (and EMA) by the TP rules, optimizer state
    mirrored from its matching param leaf where shapes line up, scalars
    replicated. Optimizer moments share their param's layout, so ZeRO-style
    data-axis splitting is left off in TP mode (moments are already 1/mp)."""
    import dataclasses as dc

    psh = tp_param_shardings(mesh, state.params)
    repl = NamedSharding(mesh, P())

    param_leaves = {
        tuple(path_str(path).split("/")): s
        for path, s in jax.tree_util.tree_flatten_with_path(psh)[0]
    }

    def opt_leaf(path, x):
        if not hasattr(x, "shape") or x.ndim == 0:
            return repl
        # match the trailing param path inside optimizer-state wrappers
        keys = tuple(path_str(path).split("/"))
        for plen in range(len(keys), 0, -1):
            cand = keys[-plen:]
            if cand in param_leaves:
                return param_leaves[cand]
        return repl

    return dc.replace(
        state,
        params=psh,
        opt_state=jax.tree_util.tree_map_with_path(opt_leaf, state.opt_state),
        ema_params=None if state.ema_params is None else tp_param_shardings(mesh, state.ema_params),
        step=repl,
    )


def make_tp_train_step(model, mesh: Mesh, state, cfg,
                       world_batch_scale: float = 1.0,
                       loss_kwargs: Optional[dict] = None):
    """jit the generic train step over the (data, model) mesh.

    Batch shards over `data`; params/opt-state follow the TP rules; the step
    donates its input state like the data-parallel trainer.
    `world_batch_scale` feeds cfg.scale_lr exactly as in the DP trainer.
    """
    from camc2v_tpu.parallel.trainer import make_train_step

    step = make_train_step(model, cfg, world_batch_scale, loss_kwargs=loss_kwargs)

    def step_tp(state, batch, rng):
        # set during TRACING so attention applies its head-axis constraints
        with activation_sharding(mesh):
            return step(state, batch, rng)

    out_shardings = (tp_state_shardings(mesh, state), NamedSharding(mesh, P()))
    return jax.jit(step_tp, donate_argnums=(0,), out_shardings=out_shardings)


def shard_tp_train_state(mesh: Mesh, state: Any) -> Any:
    """Place a host TrainState onto the mesh per tp_state_shardings."""
    return jax.tree_util.tree_map(jax.device_put, state, tp_state_shardings(mesh, state))
