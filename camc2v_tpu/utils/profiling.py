"""Profiling + determinism utilities.

reference analogues: Lightning AdvancedProfiler / DeviceStatsMonitor
(main/trainer.py:17,145-150, configs/...yaml:254-263) -> `trace` context using
jax.profiler (TensorBoard-viewable); `seed_everything(seed + rank)`
(main/trainer.py:62) + per-worker numpy seeding (main/utils_data.py:15-28)
-> `seed_everything`.
"""

from __future__ import annotations

import contextlib
import os
import random
import time
from typing import Iterator, Optional

import numpy as np


def seed_everything(seed: int, rank: int = 0) -> int:
    """Deterministic seeding across python/numpy (+ per-rank offset).

    JAX randomness is explicitly keyed, so only host-side RNGs need seeding.
    """
    s = seed + rank
    random.seed(s)
    np.random.seed(s % 2**32)
    os.environ["PYTHONHASHSEED"] = str(s)
    return s


@contextlib.contextmanager
def trace(logdir: str, enabled: bool = True) -> Iterator[None]:
    """jax.profiler trace scope -> TensorBoard trace files under logdir."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(name: str, sink: Optional[dict] = None) -> Iterator[None]:
    """Wall-time a block; optionally record into a dict."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if sink is not None:
            sink[name] = sink.get(name, 0.0) + dt


def annotate(name: str):
    """jax.named_scope wrapper for profiler-visible region names."""
    import jax

    return jax.named_scope(name)
