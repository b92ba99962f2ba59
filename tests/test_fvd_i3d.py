"""InceptionI3D structural tests (weights are external; math is testable)."""

import jax
import jax.numpy as jnp
import numpy as np

from camc2v_tpu.eval.fvd import InceptionBlock, InceptionI3D, Unit3D


def test_unit3d_shapes():
    m = Unit3D(8, (3, 3, 3), (2, 2, 2))
    x = jnp.zeros((1, 8, 16, 16, 3))
    v = m.init(jax.random.key(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 4, 8, 8, 8)
    assert "batch_stats" in v


def test_inception_block_concat():
    m = InceptionBlock((4, 2, 6, 2, 8, 3))
    x = jnp.zeros((1, 4, 8, 8, 16))
    v = m.init(jax.random.key(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 4, 8, 8, 4 + 6 + 8 + 3)


def test_i3d_logits_and_pool_variants():
    x = jnp.zeros((1, 9, 64, 64, 3))
    logits_net = InceptionI3D(features="logits")
    v = logits_net.init(jax.random.key(0), x)
    out = logits_net.apply(v, x)
    assert out.shape == (1, 400)

    pool_net = InceptionI3D(features="pool")
    # identical trunk params: pooled features come before the logits head
    out_pool = pool_net.apply(v, x)
    assert out_pool.shape == (1, 1024)
