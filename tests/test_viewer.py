"""Host-side GUI analogue (utils/viewer.py): the matplotlib flight view
replacing the reference's PyBullet OpenGL GUI (BaseAviary.py:148-167)."""
import os

import numpy as np

from gym_pybullet_drones_tpu.utils.viewer import FlightViewer


def test_viewer_records_and_saves(tmp_path):
    v = FlightViewer(2, obstacles=((0.0, 2.0, 0.5, 0.5),
                                   (-0.5, -2.5, 0.5, 0.5, 0.5, 0.5)),
                     targets=np.array([[0.0, 0.0, 1.0]]), show=False)
    for k in range(10):
        pos = np.array([[0.0, 0.0, 0.1 + 0.05 * k],
                        [0.5, 0.0, 0.1 + 0.03 * k]])
        rpy = np.array([[0.0, 0.0, 0.1 * k], [0.05, 0.0, 0.0]])
        v.update(pos, rpy)
    out = v.save(str(tmp_path / "flight.gif"), every=2)
    assert os.path.getsize(out) > 0
    v.close()


def test_gui_env_step_headless():
    """gui=True on a headless host: frames accumulate, no display needed."""
    from gym_pybullet_drones_tpu.envs import HoverAviary
    env = HoverAviary(gui=True)
    env.reset(seed=7)
    for _ in range(3):
        env.step(env.action_space.sample())
    assert env._viewer is not None and len(env._viewer._frames) == 3
    env.close()
