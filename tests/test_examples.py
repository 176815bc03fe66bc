"""End-to-end example smoke tests (reference tests/test_examples.py parity)
plus trajectory-quality assertions the reference lacks (SURVEY.md §4)."""
import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_pid(tmp_path):
    from examples.pid import run
    logger = run(gui=False, plot=False, output_folder=str(tmp_path),
                 duration_sec=4)
    # drones should track the circle at their initial altitudes
    for j in range(3):
        z = logger.states[j, 2, -48:]
        target_z = 0.1 + j * 0.05
        assert abs(float(np.mean(z)) - target_z) < 0.1


def test_pid_velocity(tmp_path):
    from examples.pid_velocity import run
    logger = run(gui=False, plot=False, output_folder=str(tmp_path),
                 duration_sec=3)
    # all drones moved and stayed finite
    assert np.all(np.isfinite(logger.states))
    assert float(np.max(np.abs(logger.states[:, 1, :]))) > 0.05  # y motion


def test_downwash(tmp_path):
    from examples.downwash import run
    logger = run(gui=False, plot=False, output_folder=str(tmp_path),
                 duration_sec=3)
    assert np.all(np.isfinite(logger.states))


def test_learn(tmp_path):
    from examples.learn import run
    best = run(gui=False, plot=False, output_folder=str(tmp_path),
               local=False, num_envs=8)
    assert np.isfinite(best)


def test_logger_csv_and_npy(tmp_path):
    from gym_pybullet_drones_tpu.utils.logger import Logger
    lg = Logger(logging_freq_hz=48, num_drones=2, output_folder=str(tmp_path))
    state = np.arange(20.0)
    for t in range(10):
        for d in range(2):
            lg.log(d, t / 48, state, np.zeros(12))
    npy = lg.save()
    assert os.path.exists(npy)
    with open(npy, "rb") as f:
        data = np.load(f)
        assert data["states"].shape[1] == 16
        # channel order: pos, vel, rpy, ang_vel, rpm (reference Logger.py:117)
        np.testing.assert_array_equal(
            data["states"][0, :, 0],
            np.hstack([state[0:3], state[10:13], state[7:10], state[13:20]]))
    csv_dir = lg.save_as_csv("t")
    assert os.path.exists(os.path.join(csv_dir, "x0.csv"))
    assert os.path.exists(os.path.join(csv_dir, "pwm3-1.csv"))


def test_learn_multiagent(tmp_path):
    from examples.learn import run
    best = run(gui=False, plot=False, output_folder=str(tmp_path),
               local=False, num_envs=4, multiagent=True)
    assert np.isfinite(best)


def test_swarm(tmp_path):
    from examples.swarm import run
    arrived = run(num_envs=2, num_drones=3, duration_sec=4,
                  render_frame=False, output_folder=str(tmp_path))
    assert arrived > 0.5  # most drones reach their goals
