"""Latent distributions (pure functions over (mean, logvar) arrays).

Replaces the reference's `DiagonalGaussianDistribution` class
(reference: CamContextI2V/lvdm/distributions.py:24-66) with stateless helpers:
the VAE encoder returns `moments` = concat(mean, logvar) on the channel axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def split_moments(moments: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Split encoder output into (mean, logvar); logvar clamped to [-30, 20]."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def sample(moments: jax.Array, rng: jax.Array) -> jax.Array:
    mean, logvar = split_moments(moments)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)


def mode(moments: jax.Array) -> jax.Array:
    mean, _ = split_moments(moments)
    return mean


def kl(moments: jax.Array) -> jax.Array:
    """KL(q || N(0, I)) reduced over non-batch dims."""
    mean, logvar = split_moments(moments)
    var = jnp.exp(logvar)
    return 0.5 * jnp.sum(mean**2 + var - 1.0 - logvar, axis=tuple(range(1, mean.ndim)))


def nll(moments: jax.Array, x: jax.Array) -> jax.Array:
    mean, logvar = split_moments(moments)
    logtwopi = jnp.log(2.0 * jnp.pi)
    return 0.5 * jnp.sum(
        logtwopi + logvar + (x - mean) ** 2 / jnp.exp(logvar), axis=tuple(range(1, mean.ndim))
    )
