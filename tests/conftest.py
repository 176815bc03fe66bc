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

# Persistent XLA compilation cache across test processes AND suite runs.
# The suite's wall-clock is dominated by XLA:CPU compiles of the
# interpret-mode Pallas programs (measured: the Hover-DYN fused step is
# 18.5 s compile vs 0.4 s trace; the 3-drone routing fused step ~8 min,
# mostly compile).  scripts/run_tests.py isolates each file in a fresh
# process, so without a disk cache every process recompiles from zero.
# With the cache, identical programs (same file re-run, or shared kernels
# across files) load in seconds.  Correctness-neutral: the cache key is
# the full HLO + compile options + backend, and a miss just compiles.
# XLA:CPU's AOT loader prints cosmetic E-level "machine feature" warnings
# when loading cached executables (its compile-feature list includes
# tuning pseudo-features like +prefer-no-scatter that the host-feature
# list never names) — same-host loads are safe and tested.
_cache_dir = os.environ.get(
    "GPDT_JAX_CACHE", os.path.join(os.path.dirname(__file__), "..",
                                   ".cache", "jax_xla_cache"))
if _cache_dir != "off":
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
