"""Backend selection helper for example scripts.

The single-env example demos are host-loop programs (one env.step per
Python iteration): running them against a remote accelerator turns every
step into a device round-trip.  They therefore default to the CPU backend;
batched training and benchmarks (learn.py with --device, bench.py) are the
accelerator paths.  Must be called before any jax computation.
"""
from __future__ import annotations

import os

import jax


def select_platform(device: str | None = None) -> str:
    """Set jax's platform: explicit arg > GPD_PLATFORM env var > cpu."""
    name = device or os.environ.get("GPD_PLATFORM", "cpu")
    if name != "default":
        jax.config.update("jax_platforms", name)
    return name
