"""Benchmark: env-steps/s per chip (HoverAviary, 4096 envs, RPM actions).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no benchmark numbers (BASELINE.md); vs_baseline is
reported against the BASELINE.json north-star aggregate target of
10M env-steps/s (value / 1e7), measured here on a single chip.

Timing is honest wall-clock: every timed iteration ends with a host
readback of a reduction over the rollout's rewards, so asynchronous
dispatch (including remote-TPU tunnels) cannot overlap timed work.  The
hot path is the Pallas-fused DYN control step (ops/pallas_dyn.py) under
the Hover task logic (envs/fast.py); one jitted lax.scan advances all
envs CHUNK control steps per call.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu import params as P
from gym_pybullet_drones_tpu.envs import AviaryConfig, HoverTask
from gym_pybullet_drones_tpu.envs.fast import make_batched_step
from gym_pybullet_drones_tpu.utils.enums import ActionType, Physics

NUM_ENVS = 4096
CHUNK = 2048         # ctrl steps per timed scan call
REPEATS = 4


def main():
    cfg = AviaryConfig(drone=P.CF2X, num_drones=1, physics=Physics.DYN,
                       pyb_freq=240, ctrl_freq=30)
    task = HoverTask(act=ActionType.RPM)
    reset_fn, step_fn = make_batched_step(cfg, task, NUM_ENVS)
    state, obs = reset_fn()

    def one_step(carry, action):
        state = carry
        state, obs, r, te, tr = step_fn(state, action)
        return state, r

    @jax.jit
    def rollout(state, actions):
        return jax.lax.scan(one_step, state, actions)

    key = jax.random.key(0)
    actions = 0.1 * jax.random.normal(
        key, (CHUNK, NUM_ENVS, 1, 4), jnp.float32)

    # warmup / compile
    state, rew = rollout(state, actions)
    float(jnp.sum(rew))

    best = 0.0
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        state, rew = rollout(state, actions)
        float(jnp.sum(rew))  # host readback: forces full completion
        dt = time.perf_counter() - t0
        best = max(best, NUM_ENVS * CHUNK / dt)

    print(json.dumps({
        "metric": "env_steps_per_sec_per_chip_hover4096",
        "value": round(best, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(best / 1e7, 4),
    }))


if __name__ == "__main__":
    main()
