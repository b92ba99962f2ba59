"""Config-driven component instantiation.

Keeps the reference's `{target: dotted.path, params: {...}}` YAML semantics
(reference: CamContextI2V/utils/utils.py:44-59) but resolves targets through an
explicit registry first, so configs are portable across the two codebases:
reference dotted paths (e.g. ``lvdm.modules.networks.openaimodel3d.UNetModel``)
are aliased onto the TPU-native classes. Unknown targets fall back to a normal
dotted import within this package.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable

_REGISTRY: dict[str, Any] = {}


def register(name: str | list[str]) -> Callable:
    """Class decorator: register under one or more target names (incl. reference aliases)."""

    names = [name] if isinstance(name, str) else name

    def deco(cls):
        for n in names:
            _REGISTRY[n] = cls
        return cls

    return deco


def resolve(target: str) -> Any:
    if target in _REGISTRY:
        return _REGISTRY[target]
    module, _, name = target.rpartition(".")
    if not module:
        raise ValueError(f"cannot resolve bare target '{target}' — not in registry")
    try:
        return getattr(importlib.import_module(module, package=None), name)
    except (ImportError, AttributeError) as e:
        raise ImportError(f"cannot resolve config target '{target}': {e}") from e


def instantiate_from_config(config: dict, **extra_kwargs) -> Any:
    """Build the object described by a `{target, params}` node."""
    if not isinstance(config, dict) or "target" not in config:
        raise KeyError(f"expected a config dict with a 'target' key, got: {config!r}")
    cls = resolve(config["target"])
    params = dict(config.get("params") or {})
    params.update(extra_kwargs)
    return cls(**params)


def get_obj_from_str(target: str) -> Any:
    """Alias matching the reference helper name (utils/utils.py:52-59)."""
    return resolve(target)
