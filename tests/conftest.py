"""Test harness config: force an 8-device virtual CPU mesh.

Mirrors the multi-device test strategy called for in SURVEY.md §4: real TPU
hardware isn't required for correctness tests — sharding/collective code paths
run against `--xla_force_host_platform_device_count=8`.

NOTE: this environment's sitecustomize registers an `axon` TPU backend and
forces JAX_PLATFORMS=axon; the env var alone is NOT enough to opt out (ops
would silently dispatch over the TPU tunnel, making eager tests ~30x slower).
`jax.config.update("jax_platforms", "cpu")` after import is authoritative.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-process / compile-heavy tests (minutes each)"
    )
