"""Benchmark: env-steps/s per chip (HoverAviary, 4096 envs, RPM actions).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no benchmark numbers (BASELINE.md); vs_baseline is
reported against the BASELINE.json north-star aggregate target of
10M env-steps/s (value / 1e7), measured here on a single chip.

Timing is honest wall-clock: every timed iteration ends with a host
readback of a reduction over the rollout's rewards, so asynchronous
dispatch (including remote-TPU tunnels) cannot overlap timed work.  The
chunk size adapts to the measured speed so the benchmark completes quickly
even when the device link is degraded, while still amortizing per-call
overhead on a healthy chip.  The hot path is the fully-fused env step
(ops/pallas_fused.py): physics, task logic, obs assembly, and auto-reset
in ONE Pallas launch per control step with a one-buffer scan carry.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu import params as P
from gym_pybullet_drones_tpu.envs import AviaryConfig, HoverTask
from gym_pybullet_drones_tpu.envs.fast import make_fused_rollout
from gym_pybullet_drones_tpu.utils.enums import ActionType, Physics

NUM_ENVS = 4096
TIME_BUDGET_S = 60.0  # total measurement budget after compile


def main():
    cfg = AviaryConfig(drone=P.CF2X, num_drones=1, physics=Physics.DYN,
                       pyb_freq=240, ctrl_freq=30)
    task = HoverTask(act=ActionType.RPM)
    reset_fn, step_fn = make_fused_rollout(cfg, task, NUM_ENVS,
                                           obs_layout="flat")
    state, obs = reset_fn()

    def one_step(carry, action):
        state = carry
        state, obs, r, te, tr = step_fn(state, action)
        # fold the observation into the scan output so XLA cannot
        # dead-code-eliminate the per-step obs computation (the reference
        # env.step returns an observation every control step)
        return state, r + 1e-30 * jnp.sum(obs)

    import functools

    @functools.partial(jax.jit, static_argnums=(2, 3))
    def rollout(state, actions, n, repeats):
        # inner scan over the action sequence; outer scan re-plays it
        # `repeats` times so one device launch covers n*repeats control
        # steps (the remote-dispatch cost is a tunnel artifact, not sim
        # work — every step still executes on-device)
        def once(s, _):
            s, r = jax.lax.scan(one_step, s, actions[:n])
            return s, jnp.sum(r)
        return jax.lax.scan(once, state, None, length=repeats)

    key = jax.random.key(0)
    base_actions = 0.1 * jax.random.normal(
        key, (2048, NUM_ENVS, 1, 4), jnp.float32)

    # warmup / compile at the small chunk
    chunk, repeats = 128, 1
    state, rew = rollout(state, base_actions, chunk, repeats)
    float(jnp.sum(rew))

    best = 0.0
    t_start = time.perf_counter()
    while time.perf_counter() - t_start < TIME_BUDGET_S:
        t0 = time.perf_counter()
        state, rew = rollout(state, base_actions, chunk, repeats)
        float(jnp.sum(rew))  # host readback: forces full completion
        dt = time.perf_counter() - t0
        best = max(best, NUM_ENVS * chunk * repeats / dt)
        # healthy chip: grow the per-launch work to amortize call overhead.
        # The kernel runs at the HBM roofline (~4.6 us per 4096-env control
        # step, artifacts/roofline.json env_kernels), so a 32k-step launch
        # still spends ~15% of its wall in the fixed ~26 ms remote-tunnel
        # dispatch; 128k-step launches (~0.6 s) push that under 5%.
        if dt < 5.0 and chunk < 2048:
            chunk *= 4
        elif dt < 5.0 and repeats < 64:
            repeats *= 4
        else:
            continue
        state, rew = rollout(state, base_actions, chunk, repeats)
        float(jnp.sum(rew))  # recompile outside the timed window

    print(json.dumps({
        "metric": "env_steps_per_sec_per_chip_hover4096",
        "value": round(best, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(best / 1e7, 4),
    }))


if __name__ == "__main__":
    main()
