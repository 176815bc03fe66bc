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


def test_user_debug_gui_rpm_override():
    """Slider-driven flight parity (reference BaseAviary.py:162-167,318-341):
    pressing "Use GUI RPM" toggles USE_GUI_RPM; while on, the four slider
    RPMs override the action (preprocessing bypassed), tiled over drones;
    pressing again hands control back."""
    import numpy as np
    from gym_pybullet_drones_tpu.envs.gym_adapter import CtrlAviary

    env = CtrlAviary(num_drones=2, gui=True, user_debug_gui=True,
                     pyb_freq=240, ctrl_freq=48)
    env.reset()
    env.step(np.zeros((2, 4)))
    v = env._viewer
    assert v.user_debug and len(v._sliders) == 4
    # sliders initialize at HOVER_RPM (reference addUserDebugParameter init)
    np.testing.assert_allclose(v.slider_values(), env.HOVER_RPM, rtol=1e-6)
    # local-axes overlays exist per drone (reference _showDroneLocalAxes)
    assert len(v._axes_lines) == env.NUM_DRONES

    v.press_input_switch()
    for i in range(4):
        v.set_slider(i, 1.05 * env.HOVER_RPM)
    for _ in range(48):
        obs, *_ = env.step(np.zeros((2, 4)))  # zero action ignored
    assert env.USE_GUI_RPM
    assert obs[0, 2] > 0.3          # climbed under slider RPM
    np.testing.assert_allclose(env.gui_input, 1.05 * env.HOVER_RPM,
                               rtol=1e-6)

    v.press_input_switch()          # toggle back off
    for _ in range(24):
        obs, *_ = env.step(np.zeros((2, 4)))
    assert not env.USE_GUI_RPM
    assert obs[0, 2] < 0.1          # zero-RPM action in effect again
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
