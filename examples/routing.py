"""Multi-drone routing demo: a fleet swaps positions via waypoint navigation.

Showcases the routing-fork capability (intermediate waypoints toward distant
destinations, reference BaseAviary._calculateNextStep:1105-1147) on the
batched engine: a scripted router commands each drone's final destination
every step; the task's waypoint clamp turns that into safe unit steps, and
the embedded DSL-PID flies them.
"""
import argparse
import time

import numpy as np

from gym_pybullet_drones_tpu.utils.platform import select_platform

select_platform()  # host-loop demo: CPU by default (GPD_PLATFORM overrides)

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.envs import core
from gym_pybullet_drones_tpu.envs.routing import make_routing_config
from gym_pybullet_drones_tpu.utils.logger import Logger
from gym_pybullet_drones_tpu.utils.utils import str2bool

DEFAULT_NUM_DRONES = 4
DEFAULT_DURATION_SEC = 10
DEFAULT_OUTPUT_FOLDER = "results"


def run(num_drones=DEFAULT_NUM_DRONES, duration_sec=DEFAULT_DURATION_SEC,
        output_folder=DEFAULT_OUTPUT_FOLDER, plot=True, gui=False):
    cfg, task = make_routing_config(num_drones=num_drones)
    dests = np.asarray(task.destinations)
    state, obs, _ = core.reset(cfg, task)
    stepper = jax.jit(lambda s, a: core.step(cfg, task, s, a))

    logger = Logger(logging_freq_hz=cfg.ctrl_freq, num_drones=num_drones,
                    output_folder=output_folder)
    action = jnp.asarray(dests, jnp.float32)  # command final goals directly
    n_steps = duration_sec * cfg.ctrl_freq
    t0 = time.time()
    for i in range(n_steps):
        state, obs, reward, term, trunc, _ = stepper(state, action)
        sv = np.asarray(core.state_vector(state))
        for j in range(num_drones):
            logger.log(drone=j, timestamp=i / cfg.ctrl_freq, state=sv[j],
                       control=np.hstack([dests[j], np.zeros(9)]))
        if bool(term):
            print(f"[INFO] all drones arrived at t={i / cfg.ctrl_freq:.2f}s")
            break
    final = np.asarray(state.pos)
    err = np.linalg.norm(final - dests, axis=-1)
    print(f"[RESULT] {n_steps} steps in {time.time()-t0:.1f}s; "
          f"final goal errors: {np.round(err, 3)}")
    logger.save()
    logger.save_as_csv("routing")
    if plot:
        logger.plot()
    return err


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Multi-drone routing demo")
    parser.add_argument("--num_drones", default=DEFAULT_NUM_DRONES, type=int,
                        metavar="")
    parser.add_argument("--duration_sec", default=DEFAULT_DURATION_SEC,
                        type=int, metavar="")
    parser.add_argument("--output_folder", default=DEFAULT_OUTPUT_FOLDER,
                        type=str, metavar="")
    parser.add_argument("--plot", default=True, type=str2bool, metavar="")
    parser.add_argument("--gui", default=False, type=str2bool, metavar="")
    ARGS = parser.parse_args()
    run(**vars(ARGS))
