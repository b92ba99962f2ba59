"""Diffusion schedule math as pure functions.

Re-derives the schedule semantics of the reference implementation
(reference: CamContextI2V/lvdm/models/utils_diffusion.py:31-144 and
CamContextI2V/lvdm/models/ddpm3d.py:125-188) in numpy/JAX form. Schedules are
built once on host in float64 (matching the reference's precision) and frozen
into a `DiffusionSchedule` pytree of float32 device arrays, so everything the
jitted train/sample steps need is a static gather away — no host round-trips.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Literal, Optional

import jax
import jax.numpy as jnp
import numpy as np

BetaScheduleName = Literal["linear", "cosine", "sqrt_linear", "sqrt"]


def make_beta_schedule(
    schedule: BetaScheduleName,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Beta schedule (float64 host array). reference: utils_diffusion.py:31-53."""
    if schedule == "linear":
        betas = np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64) ** 2
    elif schedule == "cosine":
        timesteps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(timesteps / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1.0 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0.0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"unknown beta schedule '{schedule}'")
    return betas


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Zero-terminal-SNR rescale (arXiv 2305.08891 alg. 1).

    reference: utils_diffusion.py:112-144.
    """
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    abar_sqrt = np.sqrt(alphas_cumprod)

    abar_sqrt_0 = abar_sqrt[0].copy()
    abar_sqrt_T = abar_sqrt[-1].copy()
    abar_sqrt -= abar_sqrt_T
    abar_sqrt *= abar_sqrt_0 / (abar_sqrt_0 - abar_sqrt_T)

    abar = abar_sqrt**2
    alphas = abar[1:] / abar[:-1]
    alphas = np.concatenate([abar[0:1], alphas])
    return 1.0 - alphas


def make_ddim_timesteps(
    method: Literal["uniform", "uniform_trailing", "quad"],
    num_ddim_timesteps: int,
    num_ddpm_timesteps: int,
) -> np.ndarray:
    """DDIM timestep subset (int64 host array). reference: utils_diffusion.py:56-76."""
    if method == "uniform":
        c = num_ddpm_timesteps // num_ddim_timesteps
        steps = np.asarray(list(range(0, num_ddpm_timesteps, c))) + 1
        # the reference formula indexes out of bounds when T % S != 0
        # (utils_diffusion.py:61-64 has the same bug: steps can reach T);
        # clamp the overshoot instead of crashing — divisible S is unchanged.
        # NOTE the reference (and this port) returns ceil(T/c) entries, which
        # can exceed the requested S — callers treat len(steps) as truth.
        if steps[-1] >= num_ddpm_timesteps:
            steps = np.minimum(steps, num_ddpm_timesteps - 1)
            steps = np.unique(steps)  # degenerate c=1 clamp would duplicate T-1
    elif method == "uniform_trailing":
        c = num_ddpm_timesteps / num_ddim_timesteps
        steps = np.flip(np.round(np.arange(num_ddpm_timesteps, 0, -c))).astype(np.int64) - 1
    elif method == "quad":
        steps = (np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8), num_ddim_timesteps) ** 2).astype(int) + 1
    else:
        raise NotImplementedError(f"unknown ddim discretization '{method}'")
    return steps.astype(np.int64)


def make_ddim_sampling_parameters(
    alphacums: np.ndarray, ddim_timesteps: np.ndarray, eta: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(sigmas, alphas, alphas_prev) for the DDIM subset. reference: utils_diffusion.py:79-91."""
    alphas = alphacums[ddim_timesteps]
    alphas_prev = np.concatenate([alphacums[0:1], alphacums[ddim_timesteps[:-1]]])
    sigmas = eta * np.sqrt((1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev))
    return sigmas, alphas, alphas_prev


def timestep_embedding(timesteps: jax.Array, dim: int, max_period: int = 10000) -> jax.Array:
    """Sinusoidal timestep embedding, [cos | sin] order. reference: utils_diffusion.py:8-28.

    timesteps: (N,) possibly-fractional scalars -> (N, dim) float32.
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def sinusoidal_positional_encoding(length: int, dim: int) -> np.ndarray:
    """Interleaved sin/cos positional table (host array, (length, dim)).

    Matches the pose-encoder's PositionalEncoding (reference:
    model/modules/camera_pose_encoder.py:81-99): even dims sin, odd dims cos.
    """
    position = np.arange(length)[:, None].astype(np.float64)
    div_term = np.exp(np.arange(0, dim, 2).astype(np.float64) * (-math.log(10000.0) / dim))
    pe = np.zeros((length, dim), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe.astype(np.float32)


def rescale_noise_cfg(noise_cfg: jax.Array, noise_pred_text: jax.Array, guidance_rescale: float) -> jax.Array:
    """Guidance-rescale trick (arXiv 2305.08891 §3.4). reference: utils_diffusion.py:147-158."""
    axes = tuple(range(1, noise_pred_text.ndim))
    std_text = jnp.std(noise_pred_text, axis=axes, keepdims=True)
    std_cfg = jnp.std(noise_cfg, axis=axes, keepdims=True)
    rescaled = noise_cfg * (std_text / std_cfg)
    return guidance_rescale * rescaled + (1 - guidance_rescale) * noise_cfg


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """All DDPM schedule buffers as a frozen pytree of f32 device arrays.

    Mirrors the buffers registered by the reference DDPM (ddpm3d.py:125-188);
    being a pytree, it threads through jit/scan without recompilation.
    """

    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    log_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array
    lvlb_weights: jax.Array

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]

    @classmethod
    def create(
        cls,
        timesteps: int = 1000,
        beta_schedule: BetaScheduleName = "linear",
        linear_start: float = 1e-4,
        linear_end: float = 2e-2,
        cosine_s: float = 8e-3,
        given_betas: np.ndarray | None = None,
        rescale_betas_zero_snr: bool = False,
        v_posterior: float = 0.0,
        parameterization: str = "eps",
    ) -> "DiffusionSchedule":
        betas = (
            np.asarray(given_betas, dtype=np.float64)
            if given_betas is not None
            else make_beta_schedule(beta_schedule, timesteps, linear_start, linear_end, cosine_s)
        )
        if rescale_betas_zero_snr:
            betas = rescale_zero_terminal_snr(betas)

        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas, axis=0)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])

        posterior_variance = (1 - v_posterior) * betas * (1.0 - alphas_cumprod_prev) / (
            1.0 - alphas_cumprod
        ) + v_posterior * betas

        if parameterization == "eps":
            # posterior_variance[0] == 0; the inf is overwritten by lvlb[0] = lvlb[1] below
            with np.errstate(divide="ignore"):
                lvlb = betas**2 / (2 * posterior_variance * alphas * (1 - alphas_cumprod))
        elif parameterization == "x0":
            lvlb = 0.5 * np.sqrt(alphas_cumprod) / (2.0 * 1 - alphas_cumprod)
        elif parameterization == "v":
            lvlb = np.ones_like(betas)
        else:
            raise NotImplementedError(f"parameterization '{parameterization}'")
        lvlb[0] = lvlb[1]

        if parameterization != "v":
            sqrt_recip = np.sqrt(1.0 / alphas_cumprod)
            sqrt_recipm1 = np.sqrt(1.0 / alphas_cumprod - 1)
        else:
            sqrt_recip = np.zeros_like(alphas_cumprod)
            sqrt_recipm1 = np.zeros_like(alphas_cumprod)

        f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
        return cls(
            betas=f32(betas),
            alphas_cumprod=f32(alphas_cumprod),
            alphas_cumprod_prev=f32(alphas_cumprod_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
            log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
            sqrt_recip_alphas_cumprod=f32(sqrt_recip),
            sqrt_recipm1_alphas_cumprod=f32(sqrt_recipm1),
            posterior_variance=f32(posterior_variance),
            posterior_log_variance_clipped=f32(np.log(np.maximum(posterior_variance, 1e-20))),
            posterior_mean_coef1=f32(betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
            posterior_mean_coef2=f32((1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)),
            lvlb_weights=f32(lvlb),
        )


def extract(buf: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather per-timestep scalars and broadcast to an ndim-rank batch shape.

    Equivalent of the reference's `extract_into_tensor` (lvdm/common.py).
    """
    out = buf[t]
    return out.reshape(out.shape + (1,) * (ndim - 1))


def q_sample(schedule: DiffusionSchedule, x_start: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
    """Forward diffusion q(x_t | x_0). reference: ddpm3d.py:307-312."""
    return (
        extract(schedule.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        + extract(schedule.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
    )


def get_v(schedule: DiffusionSchedule, x: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
    """v-parameterization target. reference: ddpm3d.py (get_v)."""
    return (
        extract(schedule.sqrt_alphas_cumprod, t, x.ndim) * noise
        - extract(schedule.sqrt_one_minus_alphas_cumprod, t, x.ndim) * x
    )


def predict_start_from_noise(
    schedule: DiffusionSchedule, x_t: jax.Array, t: jax.Array, noise: jax.Array
) -> jax.Array:
    """x0-hat from an eps prediction. reference: ddpm3d.py:233-238."""
    return (
        extract(schedule.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
        - extract(schedule.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise
    )


def q_posterior(
    schedule: DiffusionSchedule, x_start: jax.Array, x_t: jax.Array, t: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Mean and clipped log-variance of q(x_{t-1} | x_t, x0).

    reference: ddpm3d.py:254-261 (q_posterior); the variance itself is unused
    by the sampler (p_sample consumes the clipped log-variance only).
    """
    mean = (
        extract(schedule.posterior_mean_coef1, t, x_t.ndim) * x_start
        + extract(schedule.posterior_mean_coef2, t, x_t.ndim) * x_t
    )
    return mean, extract(schedule.posterior_log_variance_clipped, t, x_t.ndim)


def predict_start_from_z_and_v(schedule: DiffusionSchedule, x_t: jax.Array, t: jax.Array, v: jax.Array) -> jax.Array:
    return (
        extract(schedule.sqrt_alphas_cumprod, t, x_t.ndim) * x_t
        - extract(schedule.sqrt_one_minus_alphas_cumprod, t, x_t.ndim) * v
    )


def predict_eps_from_z_and_v(schedule: DiffusionSchedule, x_t: jax.Array, t: jax.Array, v: jax.Array) -> jax.Array:
    return (
        extract(schedule.sqrt_alphas_cumprod, t, x_t.ndim) * v
        + extract(schedule.sqrt_one_minus_alphas_cumprod, t, x_t.ndim) * x_t
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    """Per-DDIM-step buffers, indexable inside a `lax.scan` sampling loop.

    Built once per (S, spacing, eta) combination; all arrays have leading dim S.
    reference: samplers/ddim.py:24-57.
    """

    timesteps: jax.Array  # (S,) int32 ddpm step ids
    alphas: jax.Array
    alphas_prev: jax.Array
    sqrt_one_minus_alphas: jax.Array
    sigmas: jax.Array
    # dynamic-rescale tables (use_dynamic_rescale models; reference:
    # samplers/ddim.py:31-33): scale_arr[i] = model scale_arr at timesteps[i],
    # scale_arr_prev shifted by one DDIM step. None when rescale is off.
    scale_arr: Optional[jax.Array] = None
    scale_arr_prev: Optional[jax.Array] = None

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]

    @classmethod
    def create(
        cls,
        schedule: DiffusionSchedule,
        num_steps: int,
        spacing: Literal["uniform", "uniform_trailing", "quad"] = "uniform",
        eta: float = 0.0,
        scale_arr: Optional[jax.Array] = None,
    ) -> "DDIMSchedule":
        alphacums = np.asarray(schedule.alphas_cumprod, dtype=np.float64)
        ddim_ts = make_ddim_timesteps(spacing, num_steps, schedule.num_timesteps)
        sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(alphacums, ddim_ts, eta)
        f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
        sarr = sarr_prev = None
        if scale_arr is not None:
            # reference ddim.py:31-33: gather at the DDIM timesteps, prev is
            # the same table shifted right with the first entry repeated
            s = np.asarray(scale_arr, dtype=np.float64)[ddim_ts]
            sarr = f32(s)
            sarr_prev = f32(np.concatenate([s[:1], s[:-1]]))
        return cls(
            timesteps=jnp.asarray(ddim_ts, dtype=jnp.int32),
            alphas=f32(alphas),
            alphas_prev=f32(alphas_prev),
            sqrt_one_minus_alphas=f32(np.sqrt(1.0 - alphas)),
            sigmas=f32(sigmas),
            scale_arr=sarr,
            scale_arr_prev=sarr_prev,
        )
