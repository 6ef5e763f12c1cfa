"""Test configuration: force an 8-device virtual CPU mesh.

This environment's sitecustomize imports jax and registers a remote-TPU
plugin before pytest starts, so the ``JAX_PLATFORMS`` env var is already
latched — the platform must be forced through ``jax.config`` instead.
The 8 virtual CPU devices are the JAX-native analogue of a fake
distributed backend (SURVEY.md §4): all sharding/collective tests execute
on them, no TPU needed.
"""

import os

# Must be set before the first backend initialization.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
