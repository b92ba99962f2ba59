"""Golden-value tests for schedule math against hand-derived reference formulas."""

import numpy as np
import jax.numpy as jnp

from camc2v_tpu.core import schedules as S


def test_linear_beta_schedule_endpoints():
    betas = S.make_beta_schedule("linear", 1000, linear_start=0.00085, linear_end=0.012)
    assert betas.shape == (1000,)
    # linear in sqrt-space: endpoints recover start/end exactly
    np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-12)
    np.testing.assert_allclose(betas[-1], 0.012, rtol=1e-12)
    assert np.all(np.diff(betas) > 0)


def test_cosine_beta_schedule_bounds():
    betas = S.make_beta_schedule("cosine", 1000)
    assert np.all(betas > 0) and np.all(betas <= 0.999)


def test_zero_terminal_snr():
    betas = S.make_beta_schedule("linear", 1000, linear_start=0.00085, linear_end=0.012)
    rescaled = S.rescale_zero_terminal_snr(betas)
    abar = np.cumprod(1 - rescaled)
    # terminal SNR is exactly zero: alphas_cumprod[-1] == 0
    np.testing.assert_allclose(abar[-1], 0.0, atol=1e-12)
    # first-step abar preserved
    np.testing.assert_allclose(abar[0], np.cumprod(1 - betas)[0], rtol=1e-9)


def test_ddim_uniform_trailing_25_of_1000():
    # reference: uniform_trailing starts from the last timestep (999)
    steps = S.make_ddim_timesteps("uniform_trailing", 25, 1000)
    assert steps.shape == (25,)
    assert steps[-1] == 999
    expected = np.flip(np.round(np.arange(1000, 0, -40.0))).astype(np.int64) - 1
    np.testing.assert_array_equal(steps, expected)


def test_ddim_uniform_25_of_1000():
    steps = S.make_ddim_timesteps("uniform", 25, 1000)
    np.testing.assert_array_equal(steps, np.arange(0, 1000, 40) + 1)


def test_ddim_sampling_parameters_eta1():
    betas = S.make_beta_schedule("linear", 1000, 0.00085, 0.012)
    abar = np.cumprod(1 - betas)
    ts = S.make_ddim_timesteps("uniform_trailing", 25, 1000)
    sigmas, alphas, alphas_prev = S.make_ddim_sampling_parameters(abar, ts, eta=1.0)
    assert alphas.shape == sigmas.shape == alphas_prev.shape == (25,)
    np.testing.assert_allclose(alphas, abar[ts])
    np.testing.assert_allclose(alphas_prev[0], abar[0])
    np.testing.assert_allclose(
        sigmas, np.sqrt((1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev))
    )


def test_timestep_embedding_shape_and_values():
    emb = S.timestep_embedding(jnp.array([0.0, 1.0, 999.0]), 320)
    assert emb.shape == (3, 320)
    # t=0: cos half all ones, sin half all zeros
    np.testing.assert_allclose(np.asarray(emb[0, :160]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 160:]), 0.0, atol=1e-6)
    # t=1 first freq: cos(1), sin(1)
    np.testing.assert_allclose(float(emb[1, 0]), np.cos(1.0), rtol=1e-6)
    np.testing.assert_allclose(float(emb[1, 160]), np.sin(1.0), rtol=1e-6)


def test_schedule_pytree_create_and_q_sample():
    sched = S.DiffusionSchedule.create(
        timesteps=1000, beta_schedule="linear", linear_start=0.00085, linear_end=0.012
    )
    assert sched.num_timesteps == 1000
    x0 = jnp.ones((2, 4, 4, 4, 4))
    noise = jnp.zeros_like(x0)
    t = jnp.array([0, 999])
    xt = S.q_sample(sched, x0, t, noise)
    np.testing.assert_allclose(
        np.asarray(xt[0]).ravel()[0], float(sched.sqrt_alphas_cumprod[0]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(xt[1]).ravel()[0], float(sched.sqrt_alphas_cumprod[999]), rtol=1e-6
    )


def test_v_parameterization_roundtrip():
    sched = S.DiffusionSchedule.create(timesteps=100, parameterization="v")
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(2, 3, 8, 8, 4)), dtype=jnp.float32)
    noise = jnp.asarray(rng.normal(size=x0.shape), dtype=jnp.float32)
    t = jnp.array([10, 50])
    xt = S.q_sample(sched, x0, t, noise)
    v = S.get_v(sched, x0, noise, t)
    x0_rec = S.predict_start_from_z_and_v(sched, xt, t, v)
    eps_rec = S.predict_eps_from_z_and_v(sched, xt, t, v)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(noise), atol=1e-5)


def test_rescale_noise_cfg():
    rng = np.random.default_rng(1)
    cfg = jnp.asarray(rng.normal(size=(2, 4, 8), scale=2.0), dtype=jnp.float32)
    text = jnp.asarray(rng.normal(size=(2, 4, 8)), dtype=jnp.float32)
    out_0 = S.rescale_noise_cfg(cfg, text, 0.0)
    np.testing.assert_allclose(np.asarray(out_0), np.asarray(cfg), rtol=1e-6)
    out_1 = S.rescale_noise_cfg(cfg, text, 1.0)
    np.testing.assert_allclose(
        np.asarray(out_1).std(axis=(1, 2)), np.asarray(text).std(axis=(1, 2)), rtol=1e-5
    )


def test_registry_instantiation():
    from camc2v_tpu.config import register, instantiate_from_config

    @register(["dummy.Target", "lvdm.alias.Target"])
    class Dummy:
        def __init__(self, a, b=2):
            self.a, self.b = a, b

    obj = instantiate_from_config({"target": "dummy.Target", "params": {"a": 1}})
    assert (obj.a, obj.b) == (1, 2)
    obj2 = instantiate_from_config({"target": "lvdm.alias.Target", "params": {"a": 3, "b": 4}})
    assert (obj2.a, obj2.b) == (3, 4)
