"""Swarm showcase: thousands of routing fleets advancing in lockstep.

Demonstrates the scale the reference cannot reach (its engine steps one env
process at a time): a batch of multi-drone routing environments — tens of
thousands of drones — advances as one jitted program on the accelerator,
then a ray-traced frame of one fleet is rendered from the same state.

    python examples/swarm.py --num_envs 4096 --num_drones 4
"""
import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.envs.fast import make_batched_step
from gym_pybullet_drones_tpu.envs.routing import make_routing_config
from gym_pybullet_drones_tpu.utils.enums import Physics
from gym_pybullet_drones_tpu.utils.utils import str2bool


def run(num_envs=4096, num_drones=4, duration_sec=8, render_frame=True,
        output_folder="results"):
    # PYB physics: the closed-loop PID is stable there (the DYN mode's
    # inverted roll-torque quirk, inherited from the reference, makes
    # PID-controlled flight tumble in DYN)
    cfg, task = make_routing_config(num_drones=num_drones,
                                    physics=Physics.PYB)
    # scripted flight: absolute waypoint commands (the reference
    # BaseRLAviary PID convention); the trainable default is
    # relative_actions=True (see envs/routing.py).  The routing goals are
    # deliberately crossing paths (reversed line positions), and since the
    # contact model gained full angular response, a scripted mid-air
    # collision tumbles drones just like Bullet's — so the script flies the
    # de-conflicted two-leg plan a trained routing policy converges to:
    # cruise to the goal's (x, y) at a per-drone altitude band, then
    # descend onto the goal once overhead.
    import dataclasses
    task = dataclasses.replace(task, relative_actions=False)
    dests = jnp.asarray(task.destinations, jnp.float32)
    # band starts at a NONZERO offset so every drone — including drone 0 —
    # cruises above its goal altitude with its own de-conflicting band
    cruise = dests.at[:, 2].add(0.15 * (jnp.arange(num_drones,
                                                   dtype=jnp.float32) + 1.0))
    # no auto-reset: we want the final arrival snapshot, not episode cycling
    reset_fn, step_fn = make_batched_step(cfg, task, num_envs,
                                          autoreset=False)
    state, obs = reset_fn()

    import functools

    @functools.partial(jax.jit, static_argnums=1)
    def rollout(state, n_chunk):
        def body(carry, _):
            s, descend = carry
            pos = s.pos.reshape(num_envs, num_drones, 3)
            xy_err = jnp.linalg.norm(pos[..., :2] - dests[None, :, :2],
                                     axis=-1)
            # latch the leg switch: once a drone has been overhead its
            # goal it keeps the descend command (a plain threshold
            # chatters at the boundary and destabilizes the PID)
            descend = descend | (xy_err < 0.15)
            action = jnp.where(descend[..., None], dests[None],
                               cruise[None])
            s, obs, r, te, tr = step_fn(s, action)
            return (s, descend), r
        descend0 = jnp.zeros((num_envs, num_drones), bool)
        (state, _), rew = jax.lax.scan(body, (state, descend0), None,
                                       length=n_chunk)
        return state, rew

    n_steps = duration_sec * cfg.ctrl_freq
    # compile warmup on a single step, then the timed rollout
    _s, _r = rollout(state, 1)
    float(jnp.sum(_r))
    t0 = time.perf_counter()
    state, rewards = rollout(state, n_steps)
    float(jnp.sum(rewards))  # force completion
    dt = time.perf_counter() - t0
    total_drones = num_envs * num_drones
    # the fast-path carry is flattened (envs*drones, 3)
    err = jnp.linalg.norm(
        state.pos - jnp.tile(dests, (num_envs, 1)), axis=-1)
    arrived = float(jnp.mean(err < 0.15))
    print(f"[RESULT] {num_envs} envs x {num_drones} drones "
          f"({total_drones} drones) x {n_steps} ctrl steps in {dt:.2f}s "
          f"= {num_envs * n_steps / dt / 1e6:.2f}M env-steps/s "
          f"({total_drones * n_steps * cfg.steps_per_ctrl / dt / 1e6:.0f}M "
          f"drone-substeps/s)")
    print(f"[RESULT] mean goal error {float(jnp.mean(err)):.3f} m; "
          f"{arrived * 100:.1f}% of drones within 15 cm "
          f"after {duration_sec}s sim time")

    if render_frame:
        import os
        from PIL import Image
        from gym_pybullet_drones_tpu.ops import render
        eye = np.array([3.0, -2.0, 2.0], np.float32)
        fwd = -eye / np.linalg.norm(eye)
        right = np.cross(fwd, [0, 0, 1.0]); right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        rot = np.stack([fwd, -right, up], axis=-1).astype(np.float32)
        rgba, _, _ = render.render(cfg.drone, render.empty_scene(),
                                   jnp.asarray(eye), jnp.asarray(rot),
                                   drone_pos=state.pos[:num_drones],
                                   width=320, height=240)
        os.makedirs(output_folder, exist_ok=True)
        out = f"{output_folder}/swarm_frame.png"
        Image.fromarray(np.asarray(rgba).astype("uint8"), "RGBA").save(out)
        print(f"[RESULT] rendered fleet 0 to {out}")
    return arrived


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Batched swarm showcase")
    parser.add_argument("--num_envs", default=4096, type=int, metavar="")
    parser.add_argument("--num_drones", default=4, type=int, metavar="")
    parser.add_argument("--duration_sec", default=8, type=int, metavar="")
    parser.add_argument("--render_frame", default=True, type=str2bool,
                        metavar="")
    parser.add_argument("--output_folder", default="results", type=str,
                        metavar="")
    ARGS = parser.parse_args()
    run(**vars(ARGS))
