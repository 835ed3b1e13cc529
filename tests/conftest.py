"""Test configuration: run on CPU with 8 virtual devices so sharding tests
exercise a real (virtual) mesh without TPU hardware.

Note: the jaxtyping pytest plugin imports jax before this conftest runs, so
setting env vars here is too late for JAX_PLATFORMS; we use jax.config
updates instead (the backend is not initialized until first use).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
