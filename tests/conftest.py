"""Test harness config: run on a virtual 8-device CPU backend.

Tests run on CPU with 8 virtual devices (SURVEY.md section 4: multi-host
logic is exercised via --xla_force_host_platform_device_count). Benchmarks
(bench.py) use the real TPU; tests prioritize determinism and speed.

The container's sitecustomize registers the axon TPU plugin and pins
JAX_PLATFORMS=axon at import, so the env var alone is not enough — the
platform must also be forced through jax.config before any backend
initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
