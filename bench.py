"""Benchmark: env-steps/s per chip (HoverAviary, 4096 envs, RPM actions).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no benchmark numbers (BASELINE.md); vs_baseline is
reported against the BASELINE.json north-star aggregate target of
10M env-steps/s (value / 1e7), measured here on a single chip.

Runs on whatever jax's default backend is (the real TPU chip under the
driver; CPU if forced).  The whole rollout — physics substeps, task logic,
auto-reset — is one jitted lax.scan; steps are counted at the control rate
(one env.step() of the reference == one step here).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu import params as P
from gym_pybullet_drones_tpu.envs import AviaryConfig, HoverTask, core
from gym_pybullet_drones_tpu.utils.enums import ActionType, Physics

NUM_ENVS = 4096
CHUNK = 256          # ctrl steps per timed scan
REPEATS = 5


def main():
    cfg = AviaryConfig(drone=P.CF2X, num_drones=1, physics=Physics.DYN,
                       pyb_freq=240, ctrl_freq=30)
    task = HoverTask(act=ActionType.RPM)

    reset_b = jax.jit(jax.vmap(lambda _: core.reset(cfg, task)))
    state, obs, _ = reset_b(jnp.zeros(NUM_ENVS))

    def one_step(carry, action):
        state = carry
        state, obs, r, te, tr, _ = jax.vmap(
            lambda s, a: core.step_autoreset(cfg, task, s, a))(state, action)
        return state, r

    @jax.jit
    def rollout(state, actions):
        return jax.lax.scan(one_step, state, actions)

    # mild random actions so control flow exercises the full path
    key = jax.random.key(0)
    actions = 0.1 * jax.random.normal(
        key, (CHUNK, NUM_ENVS, 1, 4), jnp.float32)

    # warmup / compile
    state2, rew = rollout(state, actions)
    jax.block_until_ready(rew)

    best = 0.0
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        state2, rew = rollout(state2, actions)
        jax.block_until_ready(rew)
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
