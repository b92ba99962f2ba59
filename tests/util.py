"""Shared test helpers."""

import jax
import jax.numpy as jnp


def perturb_zero_kernels(params, rng=None, scale=0.02):
    """Replace all-zero 'kernel' leaves with small noise.

    Zero-init projections (zero_module semantics, matching the reference) make
    entire branches gradient-dead at random init; trained checkpoints are never
    zero, so tests that need gradient flow perturb them first.
    """
    rng = rng if rng is not None else jax.random.key(1234)
    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = flat
    out = []
    key = rng
    for path, leaf in leaves:
        name = str(getattr(path[-1], "key", ""))
        if name == "kernel" and hasattr(leaf, "shape") and not bool(jnp.any(leaf != 0)):
            key, sub = jax.random.split(key)
            leaf = scale * jax.random.normal(sub, leaf.shape, leaf.dtype)
        out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)
