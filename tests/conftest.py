"""Test harness config: force an 8-device virtual CPU mesh before jax imports.

Mirrors the multi-device test strategy called for in SURVEY.md §4: real TPU
hardware isn't required for correctness tests — sharding/collective code paths
run against `--xla_force_host_platform_device_count=8`.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
