"""Test harness: run everything on a virtual 8-device CPU mesh so multi-chip
sharding paths are exercised without TPU hardware.

Note: the hosting environment pre-sets ``JAX_PLATFORMS=axon`` (a TPU tunnel
plugin) which wins over the env var, so the platform is forced via
``jax.config`` before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu"
