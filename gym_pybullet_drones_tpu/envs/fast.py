"""Fast batched stepping path: Pallas-fused physics under the task layer.

The general path (core.step under jax.vmap) is fully flexible; this module
provides the throughput configuration used by benchmarks and large-scale
training: the env batch is kept as explicit leading axes and the DYN physics
of a whole control step runs as ONE fused Pallas launch over the flattened
(envs * drones) batch (ops/pallas_dyn.py), with the cheap task logic
(action mapping, obs/reward/termination, auto-reset) vmapped around it.

Only Physics.DYN + float32 states are eligible (the kernel's fused f32
math); other configs fall back to the vmapped core path transparently.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.envs import core
from gym_pybullet_drones_tpu.utils.enums import Physics
from gym_pybullet_drones_tpu.ops import pallas_dyn
from gym_pybullet_drones_tpu.ops.dynamics import DynState


def make_batched_step(cfg: core.AviaryConfig, task, num_envs: int,
                      use_pallas: bool = True, autoreset: bool = True,
                      dtype=jnp.float32):
    """Build step_fn(state_B, action_B) over batched EnvState leaves (B, ...).

    Returns (reset_fn, step_fn); step_fn -> (state, obs, reward, term,
    trunc) with per-env leading axes.
    """
    n = cfg.num_drones
    # the fused kernel is float32-only; other dtypes (e.g. the f64 parity
    # path) fall back to the vmapped core kernels
    pallas_ok = (use_pallas and cfg.physics == Physics.DYN
                 and dtype == jnp.float32)

    batched_reset = jax.vmap(
        lambda k: core.reset(cfg, task, key=k, dtype=dtype))

    def reset_fn(seed: int = 0):
        keys = jax.random.split(jax.random.PRNGKey(seed), num_envs)
        state, obs, _ = batched_reset(keys)
        return state, obs

    def _physics(state, rpm):
        if pallas_ok:
            flat = DynState(
                pos=state.pos.reshape(num_envs * n, 3),
                quat=state.quat.reshape(num_envs * n, 4),
                vel=state.vel.reshape(num_envs * n, 3),
                rpy_rates=state.rpy_rates.reshape(num_envs * n, 3),
                ang_v=state.ang_v.reshape(num_envs * n, 3))
            out = pallas_dyn.dyn_ctrl_step(
                cfg.drone, flat, cfg.steps_per_ctrl, cfg.pyb_dt,
                rpm.reshape(num_envs * n, 4))
            return state._replace(
                pos=out.pos.reshape(num_envs, n, 3),
                quat=out.quat.reshape(num_envs, n, 4),
                vel=out.vel.reshape(num_envs, n, 3),
                rpy_rates=out.rpy_rates.reshape(num_envs, n, 3),
                ang_v=out.ang_v.reshape(num_envs, n, 3),
                last_rpm=rpm)

        def sub(s, r):
            for _ in range(cfg.steps_per_ctrl):
                s = core._apply_physics_substep(cfg, s, r)
            return s
        return jax.vmap(sub)(state, rpm)

    pre = jax.vmap(lambda s, a: task.preprocess_action(cfg, s, a))
    post = jax.vmap(lambda s: (task.compute_obs(cfg, s),
                               task.compute_reward(cfg, s),
                               task.compute_terminated(cfg, s),
                               task.compute_truncated(cfg, s)))

    def step_fn(state, action):
        action = jnp.asarray(action, state.pos.dtype)
        rpm, state = pre(state, action)
        state = _physics(state, rpm)
        state = state._replace(
            step_counter=state.step_counter + cfg.steps_per_ctrl)
        obs, reward, term, trunc = post(state)
        if not autoreset:
            return state, obs, reward, term, trunc
        done = jnp.logical_or(term, trunc)
        # per-env re-reset from each env's carried rng (randomized tasks
        # re-randomize; deterministic tasks reproduce the fixed init)
        init_state, init_obs, _ = batched_reset(state.rng)

        def pick(i, nxt):
            d = done.reshape((num_envs,) + (1,) * (nxt.ndim - 1))
            return jnp.where(d, i, nxt)
        state = jax.tree.map(pick, init_state, state)
        state = state._replace(rng=init_state.rng)
        d = done.reshape((num_envs,) + (1,) * (obs.ndim - 1))
        obs = jnp.where(d, init_obs, obs)
        return state, obs, reward, term, trunc

    return reset_fn, step_fn
