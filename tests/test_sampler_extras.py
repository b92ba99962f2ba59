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


# ------------------------------------------------------------- DPM-Solver++


def _exact_eps_model(x0_true):
    """The exact eps-predictor for a known clean latent: for any x on the
    forward path x = sqrt(abar_t) x0 + sqrt(1-abar_t) eps, returns eps."""
    abar = jnp.asarray(SCHED.alphas_cumprod)

    def fn(x, t):
        a = abar[t[0]]
        return (x - jnp.sqrt(a) * x0_true) / jnp.sqrt(1.0 - a)

    return fn


def test_dpmpp_exact_denoiser_recovers_x0():
    from camc2v_tpu.models.sampler import dpmpp_2m_sample

    x0_true = jnp.full(SHAPE, 0.42)
    ddim20 = DDIMSchedule.create(SCHED, 20, "uniform", eta=0.0)
    x_T = jax.random.normal(jax.random.key(0), SHAPE)
    out = dpmpp_2m_sample(jax.random.key(1), ddim20, x_T, _exact_eps_model(x0_true))
    # with exact x0 predictions every multistep D equals x0_true, so the
    # trajectory contracts onto it up to the terminal sigma (abar_prev[last]
    # = alphas_cumprod[0] < 1 leaves a small residual)
    np.testing.assert_allclose(np.asarray(out), 0.42, atol=5e-2)


def test_dpmpp_deterministic():
    from camc2v_tpu.models.sampler import dpmpp_2m_sample

    x_T = jax.random.normal(jax.random.key(3), SHAPE)
    a = dpmpp_2m_sample(jax.random.key(0), DDIM, x_T, _zero_model)
    b = dpmpp_2m_sample(jax.random.key(9), DDIM, x_T, _zero_model)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(np.asarray(a)).all()


def test_dpmpp_second_order_beats_ddim_at_low_steps():
    """On a nonlinear denoiser, dpm++(2M) at 8 steps must land closer to the
    fine-grained DDIM(eta=0, 100-step) reference than DDIM at 8 steps does."""
    from camc2v_tpu.models.sampler import dpmpp_2m_sample

    abar = jnp.asarray(SCHED.alphas_cumprod)

    def nonlinear_model(x, t):
        # smooth, t-dependent, nonlinear eps field (no exact-recovery shortcut)
        a = abar[t[0]]
        return jnp.tanh(x) * jnp.sqrt(1.0 - a) + 0.1 * x * a

    x_T = jax.random.normal(jax.random.key(5), SHAPE)
    fine = DDIMSchedule.create(SCHED, 50, "uniform", eta=0.0)
    ref = ddim_sample(jax.random.key(0), fine, x_T, nonlinear_model)

    coarse = DDIMSchedule.create(SCHED, 8, "uniform", eta=0.0)
    ddim8 = ddim_sample(jax.random.key(0), coarse, x_T, nonlinear_model)
    dpm8 = dpmpp_2m_sample(jax.random.key(0), coarse, x_T, nonlinear_model)

    err_ddim = float(jnp.abs(ddim8 - ref).mean())
    err_dpm = float(jnp.abs(dpm8 - ref).mean())
    assert err_dpm < err_ddim, (err_dpm, err_ddim)


def test_dpmpp_latent_surgery_pins_frames():
    from camc2v_tpu.models.sampler import dpmpp_2m_sample

    origin = jnp.full(SHAPE, 0.7)
    cond_idx = jnp.array([0])
    opts = SamplerOptions(paste_cond_frame=True, num_overlap=1)
    out = dpmpp_2m_sample(
        jax.random.key(0), DDIM, jnp.ones(SHAPE), _zero_model,
        options=opts, schedule=SCHED, origin_z0=origin, cond_frame_index=cond_idx,
    )
    np.testing.assert_allclose(np.asarray(out[:, 0]), 0.7, rtol=1e-6)


def test_dynamic_rescale_scan_product():
    """zero-eps model + rescale tables: out = x * prod(sqrt(a_prev/a_t) * s_prev/s_t)."""
    scale_full = np.linspace(1.0, 0.7, SCHED.num_timesteps).astype(np.float32)
    ddim = DDIMSchedule.create(SCHED, 10, "uniform", eta=0.0, scale_arr=scale_full)
    # table semantics: gather at ddim timesteps; prev = shifted right
    s = scale_full[np.asarray(ddim.timesteps)]
    np.testing.assert_allclose(np.asarray(ddim.scale_arr), s, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ddim.scale_arr_prev), np.concatenate([s[:1], s[:-1]]), rtol=1e-6)

    out = ddim_sample(jax.random.key(0), ddim, jnp.ones(SHAPE), _zero_model)
    expected = float(
        np.prod(np.sqrt(np.asarray(ddim.alphas_prev) / np.asarray(ddim.alphas))
                * np.asarray(ddim.scale_arr_prev) / np.asarray(ddim.scale_arr))
    )
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4)


def test_blend_mask_clean_cond():
    """mask/x0 blend with clean_cond pins the masked region to the x0 update."""
    x0 = jnp.full(SHAPE, 0.5)
    mask = jnp.ones(SHAPE)
    opts = SamplerOptions(clean_cond=True)
    out = ddim_sample(
        jax.random.key(0), DDIM, jnp.ones(SHAPE), _zero_model,
        options=opts, blend_mask=mask, blend_x0=x0,
    )
    # every step starts from x=x0; only the LAST update survives:
    # x_prev = sqrt(a_prev[0]/a_t[0]) * x0
    expected = 0.5 * float(np.sqrt(np.asarray(DDIM.alphas_prev)[0] / np.asarray(DDIM.alphas)[0]))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_blend_mask_zero_is_noop():
    """blend with an all-zero mask must reproduce the unblended trajectory."""
    x_T = jax.random.normal(jax.random.key(2), SHAPE)
    base = ddim_sample(jax.random.key(0), DDIM, x_T, _zero_model)
    blended = ddim_sample(
        jax.random.key(0), DDIM, x_T, _zero_model,
        schedule=SCHED, blend_mask=jnp.zeros(SHAPE), blend_x0=jnp.full(SHAPE, 3.0),
    )
    np.testing.assert_allclose(np.asarray(blended), np.asarray(base), rtol=1e-6)


# ------------------------------------------------- ancestral DDPM p_sample_loop


def test_p_sample_loop_zero_eps_temperature0_product():
    """temperature=0 kills the posterior noise, so with eps-hat == 0 every step
    is x_{t-1} = (coef1[t] * sqrt_recip_abar[t] + coef2[t]) * x_t — the loop
    contracts x_T by the product of those factors (reference p_sample formula,
    ddpm3d.py:277-283 with noise = 0)."""
    from camc2v_tpu.models.sampler import p_sample_loop

    out = p_sample_loop(
        jax.random.key(0), SCHED, jnp.ones(SHAPE), _zero_model,
        options=SamplerOptions(temperature=0.0),
    )
    c1 = np.asarray(SCHED.posterior_mean_coef1)
    c2 = np.asarray(SCHED.posterior_mean_coef2)
    sr = np.asarray(SCHED.sqrt_recip_alphas_cumprod)
    expected = float(np.prod(c1 * sr + c2))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4)


def test_p_sample_loop_exact_denoiser_recovers_x0():
    """With the exact eps-predictor the posterior mean at every step points at
    x0_true; at t == 0 coef1 == 1, coef2 == 0 and the noise is gated off, so
    the loop lands on x0_true exactly (the ancestral-consistency invariant)."""
    from camc2v_tpu.models.sampler import p_sample_loop

    x0_true = jnp.full(SHAPE, 0.42)
    x_T = jax.random.normal(jax.random.key(0), SHAPE)
    out = p_sample_loop(jax.random.key(1), SCHED, x_T, _exact_eps_model(x0_true))
    np.testing.assert_allclose(np.asarray(out), 0.42, atol=1e-3)


def test_p_sample_loop_deterministic_and_noisy():
    from camc2v_tpu.models.sampler import p_sample_loop

    x_T = jax.random.normal(jax.random.key(2), SHAPE)
    a = p_sample_loop(jax.random.key(7), SCHED, x_T, _zero_model)
    b = p_sample_loop(jax.random.key(7), SCHED, x_T, _zero_model)
    c = p_sample_loop(jax.random.key(8), SCHED, x_T, _zero_model)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))  # ancestral noise is live
    assert np.isfinite(np.asarray(a)).all()


def test_p_sample_loop_clip_denoised_bounds_x_recon():
    """clip_denoised clamps x0-hat to [-1, 1] (reference ddpm3d.py:269-270):
    with eps-hat == 0 and a huge x_T, the temperature-0 trajectory then decays
    through the posterior coef2 products instead of blowing up unclipped."""
    from camc2v_tpu.models.sampler import p_sample_loop

    x_T = jnp.full(SHAPE, 50.0)
    opts = SamplerOptions(temperature=0.0)
    clipped = p_sample_loop(jax.random.key(0), SCHED, x_T, _zero_model,
                            options=opts, clip_denoised=True)
    unclipped = p_sample_loop(jax.random.key(0), SCHED, x_T, _zero_model, options=opts)
    assert float(jnp.abs(clipped).max()) < float(jnp.abs(unclipped).max())
    # with x_recon pinned at 1, the recursion x_{t-1} = c1[t] + c2[t] x_t has
    # fixed point 1 as t -> 0 (c1[0] == 1, c2[0] == 0)
    np.testing.assert_allclose(np.asarray(clipped), 1.0, atol=1e-4)


def test_p_sample_loop_blend_mask_pins_region():
    """The mask/x0 blend is re-imposed AFTER each update (reference
    ddpm3d.py:961-963); the final iteration blends q_sample(x0, t=0) which is
    x0 up to sqrt(1 - abar_0) noise."""
    from camc2v_tpu.models.sampler import p_sample_loop

    x0 = jnp.full(SHAPE, 0.5)
    out = p_sample_loop(
        jax.random.key(0), SCHED, jnp.ones(SHAPE), _zero_model,
        blend_mask=jnp.ones(SHAPE), blend_x0=x0,
    )
    tol = 5 * float(np.sqrt(1.0 - np.asarray(SCHED.alphas_cumprod)[0]))
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=tol)


def test_p_sample_loop_t_start_truncates():
    from camc2v_tpu.models.sampler import p_sample_loop

    x_T = jax.random.normal(jax.random.key(4), SHAPE)
    opts = SamplerOptions(temperature=0.0)
    out = p_sample_loop(jax.random.key(0), SCHED, x_T, _zero_model,
                        options=opts, t_start=5)
    c1 = np.asarray(SCHED.posterior_mean_coef1)[:5]
    c2 = np.asarray(SCHED.posterior_mean_coef2)[:5]
    sr = np.asarray(SCHED.sqrt_recip_alphas_cumprod)[:5]
    expected = np.asarray(x_T) * np.prod(c1 * sr + c2)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4)


def test_p_sample_loop_rejects_v_param():
    from camc2v_tpu.models.sampler import p_sample_loop

    try:
        p_sample_loop(jax.random.key(0), SCHED, jnp.ones(SHAPE), _zero_model,
                      options=SamplerOptions(parameterization="v"))
    except NotImplementedError:
        return
    raise AssertionError("v-parameterization must raise (reference parity)")


def test_blend_mask_noised_cond_finite():
    """clean_cond=False path q_samples x0 each step (needs the full schedule)."""
    out = ddim_sample(
        jax.random.key(0), DDIM, jnp.ones(SHAPE), _zero_model,
        schedule=SCHED,
        blend_mask=jnp.zeros(SHAPE).at[:, 0].set(1.0), blend_x0=jnp.full(SHAPE, 0.5),
    )
    assert np.isfinite(np.asarray(out)).all()
