"""Tensor-parallel (data, model) mesh tests on the 8-device CPU mesh.

Beyond-reference scaling option (the reference ships DDP/ZeRO-1 only):
Megatron-style column/row sharding of the transformer denses via pjit
shardings (camc2v_tpu/parallel/tp.py). The TP step must (a) actually shard
the attention/FF weights, (b) reproduce the single-device loss, and (c) train.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from camc2v_tpu.models.dynamicrafter import DynamiCrafter
from camc2v_tpu.parallel import tp as TP
from camc2v_tpu.parallel import trainer as TR
from camc2v_tpu.parallel.mesh import path_str, shard_batch
from tests.test_dynamicrafter import tiny_config, _batch


@pytest.fixture(scope="module")
def model_state():
    model = DynamiCrafter(tiny_config(), dtype=jnp.float32)
    params = model.init_params(jax.random.key(0), image_hw=(32, 32))
    from tests.util import perturb_zero_kernels

    params = perturb_zero_kernels(params)
    cfg = TR.TrainConfig(accumulate_grad_batches=1)
    state = TR.init_train_state(cfg, params)
    return model, cfg, state


def _batch2():
    b1 = _batch()
    return jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x, x], axis=0) if hasattr(x, "ndim") and x.ndim else x, b1
    )


def test_tp_shardings_split_attention_weights(model_state):
    _, _, state = model_state
    mesh = TP.make_tp_mesh(4)
    sh = TP.tp_param_shardings(mesh, state.params)
    flat = jax.tree_util.tree_flatten_with_path(sh)[0]
    col = row = repl = 0
    for path, s in flat:
        p = path_str(path)
        spec = tuple(s.spec)
        if p.endswith("to_q/kernel"):
            assert spec[-1] == TP.MODEL_AXIS, p
            col += 1
        elif p.endswith("to_out/kernel"):
            assert spec and spec[0] == TP.MODEL_AXIS, p
            row += 1
        elif "conv" in p or p.endswith("scale") or p.endswith("bias"):
            pass  # mixture; not asserted per-leaf
        if not any(spec):
            repl += 1
    assert col >= 4 and row >= 4 and repl > col + row


def test_tp_fused_kernel_weights_stay_replicated(model_state):
    """Weights that are raw operands of enabled fused Pallas kernels must not
    shard: XLA can't partition the custom call, so sharding them only buys a
    per-step all-gather. Forced on here (CPU auto-dispatch is off)."""
    from camc2v_tpu.ops import geglu_ff as gff
    from camc2v_tpu.ops import temporal_attention as ta

    _, _, state = model_state
    mesh = TP.make_tp_mesh(4)
    ta.use_fused(True)
    gff.use_fused(True)
    try:
        sh = TP.tp_param_shardings(mesh, state.params)
    finally:
        ta.use_fused(None)
        gff.use_fused(None)
    flat = jax.tree_util.tree_flatten_with_path(sh)[0]
    checked_temporal = checked_ff = checked_spatial = 0
    for path, s in flat:
        p = path_str(path)
        spec = tuple(s.spec)
        if ("_temporal/" in p or "init_attn/" in p) and p.endswith(
            ("to_q/kernel", "to_k/kernel", "to_v/kernel", "to_out/kernel")
        ):
            assert not any(spec), f"fused-MHA operand sharded: {p}"
            checked_temporal += 1
        elif "ff/geglu/proj/" in p or "ff/fc2/" in p:
            assert not any(spec), f"fused-FF operand sharded: {p}"
            checked_ff += 1
        elif "_spatial/" in p and p.endswith("to_q/kernel"):
            # spatial attention projections are NOT kernel operands: still TP
            assert spec and spec[-1] == TP.MODEL_AXIS, p
            checked_spatial += 1
    assert checked_temporal and checked_ff and checked_spatial


def test_tp_train_step_matches_single_device(model_state):
    model, cfg, state = model_state
    batch = _batch2()

    # single-device reference (same rng, same batch)
    ref_step = jax.jit(TR.make_train_step(model, cfg))
    ref_state, ref_metrics = ref_step(
        jax.tree_util.tree_map(lambda x: x, state), batch, jax.random.key(7)
    )
    ref_loss = float(ref_metrics["loss"])

    mesh = TP.make_tp_mesh(4)  # 2 data x 4 model on the 8 CPU devices
    tp_state = TP.shard_tp_train_state(mesh, state)
    tp_step = TP.make_tp_train_step(model, mesh, state, cfg)
    tp_batch = shard_batch(mesh, batch)
    new_state, metrics = tp_step(tp_state, tp_batch, jax.random.key(7))
    tp_loss = float(metrics["loss"])

    assert np.isfinite(tp_loss)
    np.testing.assert_allclose(tp_loss, ref_loss, rtol=2e-4)

    # weights actually live sharded: a to_q kernel's addressable shard is 1/4
    def find_to_q(tree, pre=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                r = find_to_q(v, pre + "/" + k)
                if r is not None:
                    return r
            return None
        return tree if pre.endswith("to_q/kernel") else None

    leaf = find_to_q(new_state.params["unet"])
    assert leaf is not None
    shard = leaf.addressable_shards[0].data
    assert shard.shape[-1] * 4 == leaf.shape[-1], (shard.shape, leaf.shape)

    # updated params stay numerically aligned with the single-device step
    ref_leaf = find_to_q(ref_state.params["unet"])
    np.testing.assert_allclose(
        np.asarray(leaf), np.asarray(ref_leaf), atol=2e-5
    )


def test_tp_compile_no_involuntary_remat():
    """The (data, model) TP step must compile without XLA's 'Involuntary full
    rematerialization' diagnostics (VERDICT r3 weak #3): those mean the
    partitioner replicates the biggest activations at the attention
    head-split reshapes. The activation constraints
    (parallel/tp.py::constrain_heads/constrain_merged, applied on BOTH sides
    of the reshapes) must keep the layout transitions local.

    Runs in a subprocess because the diagnostics are C++ absl logs on stderr.
    """
    import pathlib
    import subprocess
    import sys

    src = r"""
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, %(root)r)
sys.path.insert(0, %(root)r + "/tests")
from camc2v_tpu.models.dynamicrafter import DynamiCrafter
from camc2v_tpu.parallel import tp as TP
from camc2v_tpu.parallel import trainer as TR
from camc2v_tpu.parallel.mesh import shard_batch
from tests.test_dynamicrafter import tiny_config, _batch
import numpy as np

model = DynamiCrafter(tiny_config(), dtype=jnp.float32)
params = model.init_params(jax.random.key(0), image_hw=(32, 32))
cfg = TR.TrainConfig(accumulate_grad_batches=1)
state = TR.init_train_state(cfg, params)
mesh = TP.make_tp_mesh(2)
state = TP.shard_tp_train_state(mesh, state)
b1 = _batch()
batch = jax.tree_util.tree_map(
    lambda x: jnp.concatenate([x] * 4, axis=0) if hasattr(x, "ndim") and x.ndim else x, b1)
batch = shard_batch(mesh, batch)
step = TP.make_tp_train_step(model, mesh, state, cfg)
step.lower(state, batch, jax.random.key(1)).compile()
# FSDP (1/N params over data) hits the same partitioner pattern through the
# gather-at-use weights — must also compile without involuntary remat
from camc2v_tpu.parallel import mesh as M
dmesh = M.make_mesh(jax.devices()[:8])
fstate = TR.init_train_state(cfg, model.init_params(jax.random.key(0), image_hw=(32, 32)))
fstate = TR.shard_train_state(dmesh, fstate, shard_params=True)
fbatch = shard_batch(dmesh, jax.tree_util.tree_map(
    lambda x: jnp.concatenate([x] * 8, axis=0) if hasattr(x, "ndim") and x.ndim else x, b1))
fstep = TR.make_sharded_train_step(model, cfg, dmesh, state=fstate, shard_params=True)
fstep.lower(fstate, fbatch, jax.random.key(1)).compile()
print("COMPILED_OK")
"""
    root = str(pathlib.Path(__file__).resolve().parents[1])
    r = subprocess.run(
        [sys.executable, "-c", src % {"root": root}],
        capture_output=True, text=True, timeout=1200,
        env={**__import__("os").environ,
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
             "JAX_PLATFORMS": "cpu"},
    )
    assert "COMPILED_OK" in r.stdout, r.stderr[-2000:]
    bad = [l for l in r.stderr.splitlines() if "Involuntary full rematerialization" in l]
    assert not bad, f"{len(bad)} involuntary-remat diagnostics; first:\n{bad[0][:500]}"
