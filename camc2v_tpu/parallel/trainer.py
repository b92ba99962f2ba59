"""Data-parallel pjit trainer: train state, optimizer, sharded train step.

Replaces the reference's Lightning + DeepSpeed harness
(reference: CamContextI2V/main/trainer.py:47-194, model/base.py:71-110
configure_optimizers, configs/models/camcontexti2v_256.yaml:203-220):

  * AdamW (lr 1e-4, wd 1e-2) over a regex-selected trainable subset — the
    equivalent of the reference's `requires_grad` surgery
    (model/camcontexti2v.py:574-626);
  * gradient accumulation (optax.MultiSteps, reference accum x4);
  * global-norm clip 0.5;
  * optional LR scaling by world size x batch (reference trainer.py:98-103);
  * EMA (reference lvdm/ema.py) inside the jitted step;
  * batch sharded over the `data` mesh axis; gradients all-reduced by XLA;
    optimizer state sharded per-leaf over `data` (ZeRO-1 analogue).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from camc2v_tpu.core import ema as ema_lib
from camc2v_tpu.parallel.mesh import path_str, replicated, zero1_sharding


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    scale_lr: bool = False
    weight_decay: float = 1e-2
    grad_clip: float = 0.5
    accumulate_grad_batches: int = 1
    use_ema: bool = False
    ema_decay: float = 0.9999
    # regex patterns matched against '/'-joined param paths; empty => all trainable
    trainable_patterns: tuple[str, ...] = ()
    # dtype for FROZEN param leaves in the train state (e.g. "bfloat16").
    # None keeps fp32 everywhere. The reference's `precision: "16-mixed"` +
    # ZeRO-1 recipe (configs/models/camcontexti2v_256.yaml:208-209) holds
    # non-trainable params in half precision — at flagship scale (97M trainable
    # of 2852M total) fp32 frozen masters alone are 11.4 GB and cannot fit a
    # 16 GB chip next to the backward's 6 GB of temps. Compute is bf16 either
    # way; only fp32-stat upcasts of frozen weights see the (one-time) rounding.
    frozen_param_dtype: Optional[str] = None
    # FSDP analogue: shard params/EMA over `data` like optimizer state
    # (1/N param memory per chip; XLA inserts the per-use all-gathers)
    shard_params: bool = False
    # lr scheduler: None | ("lambda_warmup", warmup_steps) | ("cosine", t_max, eta_min)
    lr_schedule: Optional[tuple] = None
    max_steps: int = 50000


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema_params: Any  # None when EMA disabled
    step: jax.Array


def param_labels(params: Any, patterns: tuple[str, ...]) -> Any:
    """Label each leaf 'train' / 'freeze' by path regex.

    Path format: 'unet/in_0_res/out_conv/kernel' etc. Empty patterns => all
    trainable (reference: DynamiCrafter trains the full UNet; camera models
    freeze it and train adapters — model/base.py:35-69).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    labels = {}
    for path, _ in flat:
        s = path_str(path)
        trainable = not patterns or any(re.search(p, s) for p in patterns)
        labels[s] = "train" if trainable else "freeze"

    treedef = jax.tree_util.tree_structure(params)
    label_leaves = [labels[path_str(path)] for path, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, label_leaves)


def make_lr_schedule(cfg: TrainConfig, world_batch_scale: float = 1.0):
    base = cfg.learning_rate * (world_batch_scale if cfg.scale_lr else 1.0)
    if cfg.lr_schedule is None:
        return base
    kind = cfg.lr_schedule[0]
    if kind == "lambda_warmup":
        warmup = int(cfg.lr_schedule[1])
        return optax.linear_schedule(0.0, base, warmup)
    if kind == "cosine":
        t_max = int(cfg.lr_schedule[1])
        eta_min = float(cfg.lr_schedule[2]) if len(cfg.lr_schedule) > 2 else 0.0
        return optax.cosine_decay_schedule(base, t_max, alpha=eta_min / base if base else 0.0)
    raise ValueError(f"unknown lr schedule '{kind}'")


def make_optimizer(cfg: TrainConfig, params: Any, world_batch_scale: float = 1.0) -> optax.GradientTransformation:
    lr = make_lr_schedule(cfg, world_batch_scale)
    adamw = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(lr, weight_decay=cfg.weight_decay),
    )
    # MultiSteps INSIDE multi_transform: optax.masked hides frozen leaves from
    # the inner init, so accumulation state exists only for trainable params.
    # The flagship set is 97M trainable of 2852M total — the other nesting
    # allocates an 11.4 GB fp32 accumulator tree and cannot fit a 16 GB chip.
    if cfg.accumulate_grad_batches > 1:
        adamw = optax.MultiSteps(adamw, cfg.accumulate_grad_batches)
    return optax.multi_transform(
        {"train": adamw, "freeze": optax.set_to_zero()},
        param_labels(params, cfg.trainable_patterns),
    )


def cast_frozen_params(cfg: TrainConfig, params: Any) -> Any:
    """Cast frozen float param leaves to cfg.frozen_param_dtype (no-op when None).

    Trainable leaves keep fp32 masters. Only floating leaves are cast; the
    label set is cfg.trainable_patterns, so this must be applied AFTER the
    final trainable set is known (flag-schedule phases that change
    trainability must not use frozen casting on leaves they later unfreeze).
    """
    if cfg.frozen_param_dtype is None:
        return params
    dt = jnp.dtype(cfg.frozen_param_dtype)
    labels = param_labels(params, cfg.trainable_patterns)

    def cast(lab, p):
        if lab == "train" or not jnp.issubdtype(jnp.asarray(p).dtype, jnp.floating):
            return p
        return jnp.asarray(p, dt)

    return jax.tree_util.tree_map(cast, labels, params)


def init_train_state(cfg: TrainConfig, params: Any, world_batch_scale: float = 1.0) -> TrainState:
    params = cast_frozen_params(cfg, params)
    tx = make_optimizer(cfg, params, world_batch_scale)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        ema_params=ema_lib.init_ema(params) if cfg.use_ema else None,
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    model, cfg: TrainConfig, world_batch_scale: float = 1.0, loss_kwargs: Optional[dict] = None
) -> Callable:
    """Build the (unjitted) train step: (state, batch, rng) -> (state, metrics).

    `loss_kwargs` are static flags forwarded to model.training_loss (phase
    schedules rebuild the step with different flags — one retrace per flip).
    """
    loss_kwargs = loss_kwargs or {}

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)
        labels = param_labels(state.params, cfg.trainable_patterns)

        def loss_fn(params):
            # stop_gradient on frozen leaves: their grads become constant
            # zeros XLA folds away, so backward never materialises the
            # 11.4 GB full-tree fp32 gradient at flagship scale (the frozen
            # ACTIVATIONS still backprop — adapters feed the UNet input side)
            params = jax.tree_util.tree_map(
                lambda lab, p: p if lab == "train" else jax.lax.stop_gradient(p),
                labels, params,
            )
            return model.training_loss(params, batch, step_rng, **loss_kwargs)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        local_tx = make_optimizer(cfg, state.params, world_batch_scale)
        updates, opt_state = local_tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = state.ema_params
        if ema_params is not None:
            ema_params = ema_lib.update_ema(ema_params, params, state.step, cfg.ema_decay)
        new_state = TrainState(
            params=params, opt_state=opt_state, ema_params=ema_params, step=state.step + 1
        )
        gn = optax.global_norm(grads)
        metrics = dict(metrics)
        metrics["grad_norm"] = gn
        return new_state, metrics

    return train_step


def train_state_shardings(mesh: Mesh, state: TrainState,
                          shard_params: bool = False) -> TrainState:
    """Sharding pytree for a TrainState: optimizer state ZeRO-1 sharded
    per-leaf over `data`; params/EMA replicated (default) or, with
    `shard_params=True`, sharded like optimizer state — the FSDP analogue
    (XLA's SPMD partitioner inserts the per-use all-gathers; memory for
    params drops to 1/N per chip at the cost of gather traffic on ICI)."""
    rep = replicated(mesh)
    p_tree = ((lambda t: zero1_sharding(mesh, t)) if shard_params
              else (lambda t: jax.tree_util.tree_map(lambda _: rep, t)))
    return TrainState(
        params=p_tree(state.params),
        opt_state=zero1_sharding(mesh, state.opt_state),
        ema_params=p_tree(state.ema_params) if state.ema_params is not None else None,
        step=rep,
    )


def shard_train_state(mesh: Mesh, state: TrainState,
                      shard_params: bool = False) -> TrainState:
    """Place a host TrainState onto the mesh per train_state_shardings."""
    shardings = train_state_shardings(mesh, state, shard_params)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)


def make_sharded_train_step(
    model, cfg: TrainConfig, mesh: Mesh, world_batch_scale: float = 1.0,
    loss_kwargs: Optional[dict] = None, state: Optional[TrainState] = None,
    shard_params: bool = False,
):
    """jit the train step; the batch arrives sharded on `data` and XLA inserts
    the gradient psum over ICI.

    When a `state` template is given, the OUTPUT shardings are pinned to the
    ZeRO-1 layout (params/EMA replicated, optimizer state sharded) so a
    refactor cannot silently replicate the optimizer state; without it the
    layout still follows the pre-placed inputs.
    """
    step = make_train_step(model, cfg, world_batch_scale, loss_kwargs)

    def step_constrained(state, batch, rng):
        # pin attention activations batch-over-data during tracing: with 1/N
        # FSDP param shardings the partitioner otherwise leaks weight
        # shardings into the head-split reshapes and replicates activations
        # ("Involuntary full rematerialization" diagnostics)
        from camc2v_tpu.parallel.tp import activation_sharding

        with activation_sharding(mesh):
            return step(state, batch, rng)

    if state is None:
        return jax.jit(step_constrained, donate_argnums=(0,))
    out_shardings = (train_state_shardings(mesh, state, shard_params), replicated(mesh))
    return jax.jit(step_constrained, donate_argnums=(0,), out_shardings=out_shardings)


def make_sharded_eval_step(model, mesh: Optional[Mesh], loss_kwargs: Optional[dict] = None):
    """jitted validation loss over a data-sharded batch.

    The per-sample loss mean runs over the GLOBAL batch (the batch array is
    sharded over `data`, so jnp.mean is a cross-host reduction under SPMD) —
    the multi-host-correct replacement for the eager per-host validate loop.
    """
    loss_kwargs = loss_kwargs or {}

    def eval_step(params, batch, rng):
        loss, metrics = model.training_loss(params, batch, rng, **loss_kwargs)
        return dict(metrics, loss=loss)

    if mesh is None:
        return jax.jit(eval_step)
    return jax.jit(eval_step, out_shardings=replicated(mesh))
