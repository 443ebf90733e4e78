"""Test env: force the CPU backend with 8 virtual devices.

The container's sitecustomize registers a tunneled TPU PJRT plugin and
force-sets jax_platforms to "axon,cpu" at interpreter startup (so plain
JAX_PLATFORMS=cpu in the env is overridden).  Tests must run on the host
CPU — fast, local, and with a virtual 8-device mesh for sharding tests —
so we override the config *after* jax import, before any backend is used.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
