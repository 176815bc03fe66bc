"""Quick A/B: fused one-launch rollout vs envs/fast.make_batched_step.

Honest timing: host readback inside every timed iteration (see SKILL.md).
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu import params as P
from gym_pybullet_drones_tpu.envs import AviaryConfig, HoverTask, MultiHoverTask
from gym_pybullet_drones_tpu.envs.fast import make_batched_step, make_fused_rollout
from gym_pybullet_drones_tpu.utils.enums import ActionType, Physics

NUM_ENVS = 4096


def measure(step_fn, carry0, n_drones, act_dim, chunk=512, budget_s=25.0,
            repeats=4):
    def one(carry, action):
        carry, obs, r, te, tr = step_fn(carry, action)[:5]
        return carry, r + 1e-30 * jnp.sum(obs)

    @functools.partial(jax.jit, static_argnums=(2, 3))
    def rollout(carry, actions, n, reps):
        def once(c, _):
            c, r = jax.lax.scan(one, c, actions[:n])
            return c, jnp.sum(r)
        return jax.lax.scan(once, carry, None, length=reps)

    key = jax.random.key(0)
    actions = 0.1 * jax.random.normal(
        key, (chunk, NUM_ENVS, n_drones, act_dim), jnp.float32)
    carry, rew = rollout(carry0, actions, chunk, 1)
    float(jnp.sum(rew))  # compile + warm
    best = 0.0
    t_start = time.perf_counter()
    while time.perf_counter() - t_start < budget_s:
        t0 = time.perf_counter()
        carry, rew = rollout(carry, actions, chunk, repeats)
        float(jnp.sum(rew))
        dt = time.perf_counter() - t0
        best = max(best, NUM_ENVS * chunk * repeats / dt)
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    for name, cfg, task in [
        ("hover", AviaryConfig(drone=P.CF2X, num_drones=1,
                               physics=Physics.DYN, pyb_freq=240,
                               ctrl_freq=30), HoverTask(act=ActionType.RPM)),
        ("multihover2", AviaryConfig(drone=P.CF2X, num_drones=2,
                                     physics=Physics.DYN, pyb_freq=240,
                                     ctrl_freq=30),
         MultiHoverTask(act=ActionType.RPM)),
    ]:
        n = cfg.num_drones
        _, act_dim = task.action_buffer_shape(cfg)
        r_reset, r_step = make_batched_step(cfg, task, NUM_ENVS,
                                            obs_layout="flat")
        rs, _ = r_reset()
        rate_b = measure(r_step, rs, n, act_dim)
        print(f"{name} batched: {rate_b/1e6:.1f}M env-steps/s", flush=True)
        f_reset, f_step = make_fused_rollout(cfg, task, NUM_ENVS,
                                             obs_layout="flat")
        fc, _ = f_reset()
        rate_f = measure(f_step, fc, n, act_dim)
        print(f"{name} fused:   {rate_f/1e6:.1f}M env-steps/s "
              f"({rate_f/rate_b:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
