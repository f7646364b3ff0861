"""Test configuration: force CPU with 8 virtual devices so sharding tests can
emulate a multi-chip mesh without TPU hardware (SURVEY.md §4).

Note: the host image pre-registers a TPU PJRT plugin via sitecustomize (jax is
already imported by the time conftest runs), so the platform must be switched
through jax.config rather than JAX_PLATFORMS.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
