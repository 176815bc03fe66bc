"""Test configuration: force CPU backend with 8 virtual devices + float64.

Multi-chip sharding logic is exercised on a virtual 8-device CPU mesh
(xla_force_host_platform_device_count), and parity tests against the float64
NumPy oracle require x64 mode.

Note: this image pre-imports jax via a sitecustomize hook that registers a
remote-TPU PJRT plugin, so JAX_PLATFORMS/JAX_ENABLE_X64 environment variables
are already consumed by the time conftest runs — the jax.config.update calls
below are the authoritative overrides.  XLA_FLAGS is still read lazily at
first backend initialization, so setting it here works as long as no test
module touches a jax array at import time.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
