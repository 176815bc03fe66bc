"""Profiling/observability helpers.

The reference's only built-in throughput signal is the real-time factor
printed by render() (reference BaseAviary.py:404-406; mirrored by our
adapter's render()).  This module adds the TPU-native instrumentation:
jax.profiler trace capture around arbitrary sections and a steps/sec
measurement harness used by bench.py.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def measure_steps_per_sec(step_fn, state, n_iters: int = 5,
                          steps_per_iter: int = 1):
    """Best-of-n wall-clock rate of a jitted step function.

    step_fn(state) -> state-like (anything blockable); compile excluded via
    one warmup call.
    """
    state = step_fn(state)
    jax.block_until_ready(state)
    best = 0.0
    for _ in range(n_iters):
        t0 = time.perf_counter()
        state = step_fn(state)
        jax.block_until_ready(state)
        dt = time.perf_counter() - t0
        best = max(best, steps_per_iter / dt)
    return best, state
