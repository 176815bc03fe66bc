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


def test_mjpeg_avi_writer(tmp_path):
    """Pure-Python MJPEG AVI assembly: valid RIFF structure, all frames."""
    import struct
    import numpy as np
    from gym_pybullet_drones_tpu.utils.video import (
        MJPEGWriter, assemble_frame_dir)

    w = MJPEGWriter(str(tmp_path / "clip.avi"), fps=24)
    for i in range(5):
        frame = np.zeros((48, 64, 3), np.uint8)
        frame[:, : (i + 1) * 10] = 200
        w.add_frame(frame)
    out = w.close()
    data = open(out, "rb").read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
    assert data.count(b"00dc") == 10  # 5 movi chunks + 5 idx1 entries
    assert b"MJPG" in data and b"idx1" in data

    # frame-dir assembly path used by the adapter record mode
    from PIL import Image
    d = tmp_path / "frames"
    d.mkdir()
    for i in range(3):
        Image.fromarray(np.full((24, 32, 3), i * 40, np.uint8)).save(
            d / f"frame_{i}.png")
    out2 = assemble_frame_dir(str(d), fps=12)
    assert out2 and open(out2, "rb").read()[:4] == b"RIFF"
    assert assemble_frame_dir(str(tmp_path)) is None  # no frames -> None
