"""Fast batched stepping path: Pallas-fused physics under the task layer.

The general path (core.step under jax.vmap) is fully flexible; this module
provides the throughput configuration used by benchmarks and large-scale
training: the env batch is kept as explicit leading axes and the DYN physics
of a whole control step runs as ONE fused Pallas launch over the flattened
(envs * drones) batch (ops/pallas_dyn.py), with the cheap task logic
(action mapping, obs/reward/termination, auto-reset) vmapped around it.

Layout note: the lax.scan CARRY holds state leaves with the (env, drone)
axes collapsed — (B*N, k) — because TPU tiles the trailing two dims of every
materialized buffer to (8, 128): a (B, 2, 3) carry would be padded ~350x
and relayout-copied every iteration (measured ~10x slowdown for 2-drone
tasks).  The (B, N, k) views used by the task layer are ephemeral reshapes
inside the fused step, never carried.

Only Physics.DYN + float32 states are eligible for the Pallas kernel (the
fused f32 math); other configs fall back to the vmapped core kernels
transparently (still with the flattened carry).
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
    """Build step_fn over batched EnvState with a flattened (B*N, ...) carry.

    Returns (reset_fn, step_fn); reset_fn(seed) -> (state, obs);
    step_fn(state, action) -> (state, obs, reward, term, trunc) with per-env
    leading axes on the outputs (obs (B, N, D), reward/term/trunc (B,)).
    """
    n = cfg.num_drones
    bn = num_envs * n
    pallas_ok = (use_pallas and cfg.physics == Physics.DYN
                 and dtype == jnp.float32)

    batched_reset = jax.vmap(
        lambda k: core.reset(cfg, task, key=k, dtype=dtype))

    def _flatten(s: core.EnvState) -> core.EnvState:
        r2 = lambda x: x.reshape((bn,) + x.shape[2:])
        return s._replace(
            pos=r2(s.pos), quat=r2(s.quat), vel=r2(s.vel),
            rpy_rates=r2(s.rpy_rates), ang_v=r2(s.ang_v),
            last_rpm=r2(s.last_rpm), action_buffer=r2(s.action_buffer),
            ctrl_state=jax.tree.map(r2, s.ctrl_state))

    def _unflatten(s: core.EnvState) -> core.EnvState:
        r3 = lambda x: x.reshape((num_envs, n) + x.shape[1:])
        return s._replace(
            pos=r3(s.pos), quat=r3(s.quat), vel=r3(s.vel),
            rpy_rates=r3(s.rpy_rates), ang_v=r3(s.ang_v),
            last_rpm=r3(s.last_rpm), action_buffer=r3(s.action_buffer),
            ctrl_state=jax.tree.map(r3, s.ctrl_state))

    def reset_fn(seed: int = 0):
        keys = jax.random.split(jax.random.PRNGKey(seed), num_envs)
        state, obs, _ = batched_reset(keys)
        return _flatten(state), obs

    def _physics(flat: core.EnvState, flat_rpm: jnp.ndarray):
        """Advance the physics on the flattened carry."""
        if pallas_ok:
            dyn = DynState(pos=flat.pos, quat=flat.quat, vel=flat.vel,
                           rpy_rates=flat.rpy_rates, ang_v=flat.ang_v)
            out = pallas_dyn.dyn_ctrl_step(
                cfg.drone, dyn, cfg.steps_per_ctrl, cfg.pyb_dt, flat_rpm)
            return flat._replace(
                pos=out.pos, quat=out.quat, vel=out.vel,
                rpy_rates=out.rpy_rates, ang_v=out.ang_v,
                last_rpm=flat_rpm)

        def sub(s, r):
            for _ in range(cfg.steps_per_ctrl):
                s = core._apply_physics_substep(cfg, s, r)
            return s
        st = jax.vmap(sub)(_unflatten(flat),
                           flat_rpm.reshape(num_envs, n, 4))
        return _flatten(st)

    pre = jax.vmap(lambda s, a: task.preprocess_action(cfg, s, a))
    post = jax.vmap(lambda s: (task.compute_obs(cfg, s),
                               task.compute_reward(cfg, s),
                               task.compute_terminated(cfg, s),
                               task.compute_truncated(cfg, s)))

    def step_fn(flat: core.EnvState, action):
        action = jnp.asarray(action, flat.pos.dtype)
        rpm, view = pre(_unflatten(flat), action)
        flat = _flatten(view)
        flat = _physics(flat, rpm.reshape(bn, 4))
        flat = flat._replace(
            step_counter=flat.step_counter + cfg.steps_per_ctrl)
        obs, reward, term, trunc = post(_unflatten(flat))
        if not autoreset:
            return flat, obs, reward, term, trunc
        done = jnp.logical_or(term, trunc)                     # (B,)
        # per-env re-reset from each env's carried key (randomized tasks
        # re-randomize; deterministic tasks reproduce the fixed init)
        init_state, init_obs, _ = batched_reset(flat.rng)
        init_flat = _flatten(init_state)
        done_bn = jnp.repeat(done, n)                          # (B*N,)

        def pick(i, nxt):
            d = done_bn if nxt.shape[:1] == (bn,) else done
            d = d.reshape(d.shape + (1,) * (nxt.ndim - 1))
            return jnp.where(d, i, nxt)
        flat = jax.tree.map(pick, init_flat, flat)
        flat = flat._replace(rng=init_flat.rng)
        d = done.reshape((num_envs,) + (1,) * (obs.ndim - 1))
        obs = jnp.where(d, init_obs, obs)
        return flat, obs, reward, term, trunc

    return reset_fn, step_fn
