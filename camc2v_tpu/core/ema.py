"""Exponential moving average over a params pytree.

Replaces the reference's `LitEma` module (reference: CamContextI2V/lvdm/ema.py):
same decay warmup `min(decay, (1 + step) / (10 + step))` driven by an update
counter, but as pure pytree ops that live inside the jitted train step.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def init_ema(params: Any) -> Any:
    return jax.tree_util.tree_map(jnp.asarray, params)


def update_ema(ema_params: Any, params: Any, step: jax.Array, decay: float = 0.9999, use_num_updates: bool = True) -> Any:
    if use_num_updates:
        d = jnp.minimum(decay, (1.0 + step) / (10.0 + step))
    else:
        d = jnp.asarray(decay)
    return jax.tree_util.tree_map(lambda e, p: e - (1.0 - d) * (e - p), ema_params, params)
