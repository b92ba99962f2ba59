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


def test_frechet_distance_known_values():
    """Closed-form checks: FD between diagonal Gaussians is
    |m1-m2|^2 + sum((sqrt(s1)-sqrt(s2))^2)."""
    from camc2v_tpu.eval.fvd import frechet_distance

    d = 6
    rng = np.random.default_rng(0)
    m1 = rng.normal(size=d)
    m2 = rng.normal(size=d)
    s1 = np.diag(rng.uniform(0.5, 2.0, d))
    s2 = np.diag(rng.uniform(0.5, 2.0, d))
    want = float(((m1 - m2) ** 2).sum() + ((np.sqrt(np.diag(s1)) - np.sqrt(np.diag(s2))) ** 2).sum())
    got = frechet_distance(m1, s1, m2, s2)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # identical distributions -> 0
    assert abs(frechet_distance(m1, s1, m1, s1)) < 1e-8
    # invariant under joint rotation
    q, _ = np.linalg.qr(rng.normal(size=(d, d)))
    got_rot = frechet_distance(q @ m1, q @ s1 @ q.T, q @ m2, q @ s2 @ q.T)
    np.testing.assert_allclose(got_rot, want, rtol=1e-5)
