"""Generate golden-trajectory fixtures from the float64 NumPy oracle.

Run manually: python -m tests.make_golden
The fixtures pin the DYN-mode physics and the closed-loop PID behavior so
future kernel changes cannot silently drift (SURVEY.md §4 golden parity).
"""
import os

import numpy as np

from gym_pybullet_drones_tpu import params as P
from tests import _oracle as oracle

OUT = os.path.join(os.path.dirname(__file__), "golden")


def gen_dyn():
    model = P.CF2X
    rng = np.random.default_rng(2024)
    pos = np.array([0.1, -0.2, 1.0])
    quat = oracle.rpy_to_quat([0.05, -0.1, 0.3])
    vel = np.array([0.2, 0.1, -0.05])
    rates = np.array([0.5, -0.3, 0.8])
    rpms = model.hover_rpm * (1 + 0.03 * rng.standard_normal((1200, 4)))
    traj = np.zeros((1200, 13))
    for t in range(1200):
        pos, quat, vel, rates, angv = oracle.dyn_step(
            model, pos, quat, vel, rates, rpms[t], 1 / 240)
        traj[t] = np.hstack([pos, quat, vel, rates])
    np.savez_compressed(os.path.join(OUT, "dyn_cf2x.npz"),
                        rpms=rpms, traj=traj)


def gen_pid():
    model = P.CF2X
    ctl = oracle.dsl_pid_init()
    pos = np.array([0.0, 0.0, 0.1])
    quat = oracle.rpy_to_quat([0, 0, 0])
    vel = np.zeros(3)
    rates = np.zeros(3)
    target = np.array([0.3, -0.2, 0.8])
    log = np.zeros((200, 7))  # rpm(4) + pos(3)
    for t in range(200):
        rpm, ctl = oracle.dsl_pid_step(model, ctl, 1 / 48, pos, quat, vel,
                                       target)
        for _ in range(5):
            pos, quat, vel, rates, _ = oracle.dyn_step(
                model, pos, quat, vel, rates, rpm, 1 / 240)
        log[t] = np.hstack([rpm, pos])
    np.savez_compressed(os.path.join(OUT, "pid_closedloop_cf2x.npz"),
                        target=target, log=log)


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    gen_dyn()
    gen_pid()
    print("fixtures written to", OUT)
