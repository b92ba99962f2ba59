"""Pallas kernel seams under SPMD meshes (parallel/kernel_shard.py).

XLA cannot partition custom calls: without the shard_map seams, a mesh trace
replicates every Pallas site (global-batch all-gathers — the r5 collective
audit measured 48.7 GB/step at flagship dp). These tests check, on the
8-device CPU mesh, that the seams (a) produce bit-identical values and grads
to the unsharded path, and (b) actually remove the kernel-site all-gathers
from the compiled HLO.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from camc2v_tpu.parallel import mesh as M
from camc2v_tpu.parallel.kernel_shard import data_shard
from camc2v_tpu.parallel.tp import activation_sharding

pytestmark = pytest.mark.skipif(
    len(jax.devices("cpu")) < 8, reason="needs the 8-device CPU mesh"
)


def _mesh():
    return M.make_mesh(jax.devices("cpu")[:8])


# ------------------------------------------------------------------ helper


def test_data_shard_fallbacks():
    f = lambda x: x * 2
    x = jnp.arange(8.0)
    # no trace mesh -> plain call
    np.testing.assert_array_equal(np.asarray(data_shard(f, (x,), (0,), 0)), np.asarray(x * 2))
    # indivisible batch -> plain call (no error)
    with activation_sharding(_mesh()):
        y = data_shard(f, (jnp.arange(9.0),), (0,), 0)
    assert y.shape == (9,)


def test_data_shard_matches_plain_with_mesh():
    mesh = _mesh()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 4)), jnp.float32)
    w = jnp.asarray(np.random.default_rng(1).normal(size=(4, 4)), jnp.float32)
    f = lambda x_, w_: jnp.tanh(x_ @ w_)

    plain = f(x, w)

    @jax.jit
    def sharded(x_, w_):
        with activation_sharding(mesh):
            return data_shard(f, (x_, w_), (0, None), 0)

    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    np.testing.assert_allclose(np.asarray(sharded(xs, w)), np.asarray(plain), atol=1e-6)


# -------------------------------------------- epipolar kernel seam (values)


def _adaptor_case(b=8):
    """Kernel-eligible epipolar cross-attention inputs (hw=256, T=4 targets,
    2 context key frames), batched b=8 for the 8-device mesh."""
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_adaptor_kernel_mask import HL, HW, N_CTX, T, _poses

    from camc2v_tpu.camera import geometry as G
    from camc2v_tpu.ops import epipolar_flash as ef

    K, RT, RTc = _poses()
    K = jnp.broadcast_to(K, (b,) + K.shape[1:])
    RT = jnp.broadcast_to(RT, (b,) + RT.shape[1:])
    RTc = jnp.broadcast_to(RTc, (b,) + RTc.shape[1:])
    idx = jnp.zeros((b,), jnp.int32)
    F = G.conditional_fundamental(K, RT, RTc, idx)
    lines = ef.epipolar_lines(F, HL, HL, 8)
    blk = ef.BLOCK_K if HW % ef.BLOCK_K == 0 else HW
    tiles = ef.epipolar_tile_map(lines, 1 + N_CTX, HL, HL, 8,
                                 block_q=ef.BLOCK_Q, block_k=blk)
    rng = np.random.default_rng(0)
    heads, d = 2, 64
    q = jnp.asarray(rng.normal(size=(b, T * HW, heads, d)) * 0.1, jnp.float32)
    lk = (1 + N_CTX) * HW + blk
    k = jnp.asarray(rng.normal(size=(b, lk, heads, d)) * 0.1, jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, lk, heads, d)) * 0.1, jnp.float32)
    geom = dict(t=1 + N_CTX, h=HL, w=HL, downsample=8, block_k=blk, num_registers=2)
    return q, k, v, lines, tiles, geom


def test_epipolar_kernel_seam_values_and_grads():
    from camc2v_tpu.ops import epipolar_flash as ef

    mesh = _mesh()
    q, k, v, lines, tiles, geom = _adaptor_case()

    def call(q_, k_, v_, l_, t_):
        return ef.epipolar_flash_attention(q_, k_, v_, l_, tile_any=t_, **geom)

    def loss(q_, k_, v_):
        return jnp.sum(call(q_, k_, v_, lines, tiles).astype(jnp.float32) ** 2)

    ref_out = call(q, k, v, lines, tiles)
    ref_g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    bsh = NamedSharding(mesh, P("data"))
    qs, ks, vs, ls_, ts_ = (jax.device_put(a, bsh) for a in (q, k, v, lines, tiles))

    @jax.jit
    def sharded_loss_and_grad(q_, k_, v_, l_, t_):
        with activation_sharding(mesh):
            def inner(qq, kk, vv):
                return jnp.sum(
                    data_shard(call, (qq, kk, vv, l_, t_), (0, 0, 0, 0, 0), 0)
                    .astype(jnp.float32) ** 2
                )

            return jax.value_and_grad(inner, argnums=(0, 1, 2))(q_, k_, v_)

    val, grads = sharded_loss_and_grad(qs, ks, vs, ls_, ts_)
    np.testing.assert_allclose(float(val), float(loss(q, k, v)), rtol=1e-5)
    for a, b_ in zip(grads, ref_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4, rtol=1e-4)


def test_epipolar_seam_removes_all_gathers_from_hlo():
    """Compile the seam under the mesh and assert NO all-gather touches the
    kernel operands (the replicated-custom-call signature); the epilogue sum
    may still all-reduce."""
    from camc2v_tpu.ops import epipolar_flash as ef

    mesh = _mesh()
    q, k, v, lines, tiles, geom = _adaptor_case()
    bsh = NamedSharding(mesh, P("data"))

    def call(q_, k_, v_, l_, t_):
        return ef.epipolar_flash_attention(q_, k_, v_, l_, tile_any=t_, **geom)

    def with_seam(q_, k_, v_, l_, t_):
        with activation_sharding(mesh):
            return data_shard(call, (q_, k_, v_, l_, t_), (0, 0, 0, 0, 0), 0)

    args = tuple(
        jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=bsh)
        for a in (q, k, v, lines, tiles)
    )
    txt = jax.jit(with_seam).lower(*args).compile().as_text()
    ags = [l for l in txt.splitlines() if re.search(r"= \S+ all-gather", l)]
    assert not ags, f"kernel operands still gathered: {ags[:3]}"

    # and WITHOUT the seam the partitioner must gather (the failure mode)
    txt_plain = jax.jit(call).lower(*args).compile().as_text()
    ags_plain = [l for l in txt_plain.splitlines() if re.search(r"= \S+ all-gather", l)]
    assert ags_plain, "expected replicated-custom-call gathers without the seam"
