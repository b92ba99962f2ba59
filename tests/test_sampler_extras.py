"""Sampler extras: noise shaping, img2img decode, stochastic encode."""

import jax
import jax.numpy as jnp
import numpy as np

from camc2v_tpu.core.schedules import DDIMSchedule, DiffusionSchedule
from camc2v_tpu.models.sampler import (
    SamplerOptions,
    ddim_decode,
    ddim_sample,
    ddim_stochastic_encode,
)

SCHED = DiffusionSchedule.create(timesteps=100)
DDIM = DDIMSchedule.create(SCHED, 10, "uniform", eta=0.0)
SHAPE = (1, 2, 4, 4, 4)


def _zero_model(x, t):
    return jnp.zeros_like(x)


def test_ddim_sample_zero_eps_recovers_scaled_x():
    # with eps=0 prediction, x_prev = sqrt(a_prev)/sqrt(a_t) * x each step
    x_T = jnp.ones(SHAPE)
    out = ddim_sample(jax.random.key(0), DDIM, x_T, _zero_model, options=SamplerOptions())
    expected = float(np.prod(np.sqrt(np.asarray(DDIM.alphas_prev) / np.asarray(DDIM.alphas))))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4)


def test_noise_shaping_pins_masked_region():
    origin = jnp.full(SHAPE, 0.7)
    mask = jnp.zeros(SHAPE).at[:, 0].set(1.0)  # shape frame 0 only
    opts = SamplerOptions(noise_shaping=True, noise_shaping_min_t=0)
    out = ddim_sample(
        jax.random.key(0), DDIM, jnp.ones(SHAPE), _zero_model,
        options=opts, schedule=SCHED, origin_z0=origin, scene_mask=mask,
    )
    assert np.isfinite(np.asarray(out)).all()
    # the shaped frame followed the re-noised scene latents, diverging from
    # the untouched frame's deterministic trajectory
    assert not np.allclose(np.asarray(out[:, 0]), np.asarray(out[:, 1]))


def test_stochastic_encode_then_decode_roundtrip_shape():
    x0 = jnp.ones(SHAPE) * 0.3
    t_idx = jnp.array([5])
    noise = jax.random.normal(jax.random.key(1), SHAPE)
    x_t = ddim_stochastic_encode(DDIM, x0, t_idx, noise)
    assert x_t.shape == SHAPE
    dec = ddim_decode(jax.random.key(2), DDIM, x_t, _zero_model, t_start=5, schedule=SCHED)
    assert dec.shape == SHAPE
    assert np.isfinite(np.asarray(dec)).all()
