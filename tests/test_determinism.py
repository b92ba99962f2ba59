"""Reproducibility: identical keys -> identical samples and losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from camc2v_tpu.models.dynamicrafter import DynamiCrafter
from tests.test_dynamicrafter import _batch, tiny_config
from tests.util import perturb_zero_kernels


@pytest.fixture(scope="module")
def setup():
    model = DynamiCrafter(tiny_config(), dtype=jnp.float32)
    params = perturb_zero_kernels(model.init_params(jax.random.key(0), (32, 32)))
    return model, params


def test_sample_deterministic(setup):
    model, params = setup
    batch = _batch()
    a = model.sample(params, batch, jax.random.key(7), ddim_steps=2, guidance_scale=3.0, decode=False)
    b = model.sample(params, batch, jax.random.key(7), ddim_steps=2, guidance_scale=3.0, decode=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = model.sample(params, batch, jax.random.key(8), ddim_steps=2, guidance_scale=3.0, decode=False)
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_training_loss_deterministic(setup):
    model, params = setup
    batch = _batch()
    l1, _ = model.training_loss(params, batch, jax.random.key(3))
    l2, _ = model.training_loss(params, batch, jax.random.key(3))
    assert float(l1) == float(l2)
    l3, _ = model.training_loss(params, batch, jax.random.key(4))
    assert float(l1) != float(l3)
