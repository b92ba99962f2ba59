"""Trainer tests: param freezing, accumulation, EMA, and the 8-device DP mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from camc2v_tpu.parallel import mesh as M
from camc2v_tpu.parallel import trainer as TR
from camc2v_tpu.models.dynamicrafter import DynamiCrafter
from tests.test_dynamicrafter import tiny_config, _batch


@pytest.fixture(scope="module")
def model_and_params():
    model = DynamiCrafter(tiny_config(), dtype=jnp.float32)
    params = model.init_params(jax.random.key(0), image_hw=(32, 32))
    # zero-init projections block upstream gradients at init — perturb them so
    # optimizer tests see non-zero grads (trained checkpoints are never zero)
    from tests.util import perturb_zero_kernels

    params = perturb_zero_kernels(params)
    return model, params


def test_param_labels_regex(model_and_params):
    _, params = model_and_params
    labels = TR.param_labels(params, ("^image_proj/", "zero_conv"))
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    trainable = [v for _, v in flat if v == "train"]
    frozen = [v for _, v in flat if v == "freeze"]
    assert trainable and frozen
    # all unet leaves frozen, all image_proj leaves trainable
    for path, v in flat:
        s = "/".join(str(getattr(k, "key", k)) for k in path)
        if s.startswith("unet/"):
            assert v == "freeze", s
        if s.startswith("image_proj/"):
            assert v == "train", s


def test_frozen_params_do_not_move(model_and_params):
    model, params = model_and_params
    cfg = TR.TrainConfig(trainable_patterns=("^image_proj/",), accumulate_grad_batches=1)
    state = TR.init_train_state(cfg, params)
    step = TR.make_train_step(model, cfg)
    batch = _batch()
    new_state, metrics = jax.jit(step)(state, batch, jax.random.key(0))
    assert float(metrics["loss"]) > 0
    # unet frozen: identical
    u0 = jax.tree_util.tree_leaves(params["unet"])
    u1 = jax.tree_util.tree_leaves(new_state.params["unet"])
    for a, b in zip(u0, u1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # image_proj moved
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(params["image_proj"]),
            jax.tree_util.tree_leaves(new_state.params["image_proj"]),
        )
    )
    assert moved


def test_grad_accumulation_updates_every_n(model_and_params):
    model, params = model_and_params
    cfg = TR.TrainConfig(trainable_patterns=(), accumulate_grad_batches=2)
    state = TR.init_train_state(cfg, params)
    step = jax.jit(TR.make_train_step(model, cfg))
    batch = _batch()
    s1, _ = step(state, batch, jax.random.key(0))
    # after 1 micro-step params unchanged (accumulating)
    p0 = jax.tree_util.tree_leaves(params)
    p1 = jax.tree_util.tree_leaves(s1.params)
    assert all(np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(p0, p1))
    s2, _ = step(s1, batch, jax.random.key(1))
    p2 = jax.tree_util.tree_leaves(s2.params)
    assert any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(p0, p2))


def test_ema_tracks_params(model_and_params):
    model, params = model_and_params
    cfg = TR.TrainConfig(use_ema=True, ema_decay=0.9999)
    state = TR.init_train_state(cfg, params)
    step = jax.jit(TR.make_train_step(model, cfg))
    s1, _ = step(state, _batch(), jax.random.key(0))
    assert s1.ema_params is not None
    # warmup decay = (1+0)/(10+0) = 0.1 => ema moves 90% toward params
    e = jax.tree_util.tree_leaves(s1.ema_params)
    assert len(e) == len(jax.tree_util.tree_leaves(s1.params))


def test_data_parallel_mesh_8_devices(model_and_params):
    model, params = model_and_params
    assert jax.device_count() == 8
    mesh = M.make_mesh()
    cfg = TR.TrainConfig(trainable_patterns=("^image_proj/",))
    # the sharded step DONATES its state, and device_put views can share
    # buffers with the module-scoped fixture params — copy first so later
    # tests still see live fixture arrays (CLAUDE.md donation note)
    params = jax.tree_util.tree_map(jnp.array, params)
    state = TR.init_train_state(cfg, params)
    state = TR.shard_train_state(mesh, state)
    batch = _batch(b=8)
    batch = M.shard_batch(mesh, batch)
    step = TR.make_sharded_train_step(model, cfg, mesh)
    new_state, metrics = step(state, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    # params stay replicated, opt state stays sharded
    p_leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert p_leaf.sharding.is_fully_replicated


def test_frozen_param_dtype_bf16(model_and_params):
    """frozen_param_dtype casts only frozen float leaves; training still runs.

    Reference analogue: `precision: "16-mixed"` holds non-master weights in
    half precision (configs/models/camcontexti2v_256.yaml:209) — here frozen
    leaves go bf16 while the trainable subset keeps fp32 masters.
    """
    model, params = model_and_params
    cfg = TR.TrainConfig(
        trainable_patterns=("^image_proj/",), frozen_param_dtype="bfloat16"
    )
    state = TR.init_train_state(cfg, params)
    for leaf in jax.tree_util.tree_leaves(state.params["unet"]):
        assert leaf.dtype == jnp.bfloat16, "frozen leaves must be bf16"
    for leaf in jax.tree_util.tree_leaves(state.params["image_proj"]):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32, "trainable masters must stay fp32"
    step = jax.jit(TR.make_train_step(model, cfg))
    new_state, metrics = step(state, _batch(), jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    # frozen leaves bit-identical (no optimizer touch), trainable moved in fp32
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params["unet"]),
        jax.tree_util.tree_leaves(new_state.params["unet"]),
    ):
        assert b.dtype == jnp.bfloat16
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(params["image_proj"]),
            jax.tree_util.tree_leaves(new_state.params["image_proj"]),
        )
    )
    assert moved


def test_precision_yaml_maps_to_frozen_bf16():
    from camc2v_tpu.config_yaml import build_train_config

    base = {
        "model": {"base_learning_rate": 1e-4, "params": {}},
        "lightning": {"trainer": {"precision": "16-mixed"}},
    }
    assert build_train_config(base).frozen_param_dtype == "bfloat16"
    base["lightning"]["trainer"]["precision"] = "32"
    assert build_train_config(base).frozen_param_dtype is None


def test_zero1_sharding_splits_largest_axis():
    mesh = M.make_mesh()
    tree = {"a": jnp.zeros((16, 3)), "b": jnp.zeros((3, 5)), "c": jnp.zeros(())}
    sh = M.zero1_sharding(mesh, tree)
    assert "data" in str(sh["a"].spec)
    assert sh["b"].is_fully_replicated  # no axis divisible by 8
    assert sh["c"].is_fully_replicated


def test_lr_schedules():
    cfg = TR.TrainConfig(learning_rate=1e-4, lr_schedule=("lambda_warmup", 100))
    sched = TR.make_lr_schedule(cfg)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(100)), 1e-4, rtol=1e-6)
    cfg2 = TR.TrainConfig(learning_rate=1e-4, scale_lr=True, lr_schedule=None)
    assert TR.make_lr_schedule(cfg2, world_batch_scale=16) == 16e-4


def test_fsdp_shard_params_matches_dp(model_and_params):
    """shard_params=True (the FSDP analogue / deepspeed stage_2-3 mapping):
    params live sharded over `data` (1/N per chip), the step still reproduces
    the replicated-DP loss, and updated params remain sharded."""
    model, params = model_and_params
    mesh = M.make_mesh()
    cfg = TR.TrainConfig(trainable_patterns=("^image_proj/",))
    params = jax.tree_util.tree_map(jnp.array, params)
    # the train step DONATES its state (which aliases `params`); copy first
    params2 = jax.tree_util.tree_map(jnp.copy, params)
    batch = _batch(b=8)

    # replicated-DP reference
    state_dp = TR.shard_train_state(mesh, TR.init_train_state(cfg, params))
    step_dp = TR.make_sharded_train_step(model, cfg, mesh)
    sbatch = M.shard_batch(mesh, batch)
    _, m_dp = step_dp(state_dp, sbatch, jax.random.key(0))
    state = TR.init_train_state(cfg, params2)
    state = TR.shard_train_state(mesh, state, shard_params=True)
    step = TR.make_sharded_train_step(model, cfg, mesh, state=state, shard_params=True)
    new_state, metrics = step(state, M.shard_batch(mesh, batch), jax.random.key(0))

    np.testing.assert_allclose(float(metrics["loss"]), float(m_dp["loss"]), rtol=2e-4)
    # a large param leaf actually lives sharded: addressable shard is 1/8
    flat = jax.tree_util.tree_flatten_with_path(new_state.params)[0]
    checked = 0
    for path, leaf in flat:
        if leaf.ndim >= 2 and any(s % 8 == 0 and s >= 8 for s in leaf.shape):
            assert not leaf.sharding.is_fully_replicated, path
            shard_elems = np.prod(leaf.addressable_shards[0].data.shape)
            assert shard_elems * 8 == leaf.size, path
            checked += 1
            if checked >= 3:
                break
    assert checked >= 3


def test_yaml_strategy_maps_to_shard_params():
    from camc2v_tpu.config_yaml import build_train_config

    cfg = {"model": {"base_learning_rate": 1e-4, "params": {}},
           "lightning": {"trainer": {"strategy": "deepspeed_stage_2"}}}
    # build_train_config reads the lightning trainer node
    tc = build_train_config(cfg)
    assert tc.shard_params
    cfg["lightning"]["trainer"]["strategy"] = "deepspeed_stage_1"
    assert not build_train_config(cfg).shard_params
