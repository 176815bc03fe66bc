"""Firmware stack tests: LPF, Mellinger closed loop, commander, Beta bridge."""
import numpy as np
import pytest

import jax.numpy as jnp

from gym_pybullet_drones_tpu.control import firmware as fw
from gym_pybullet_drones_tpu.control.commander import HighLevelCommander
from gym_pybullet_drones_tpu.control.ctbr import CTBRControl, compute_ctbr
from gym_pybullet_drones_tpu.utils.enums import Physics


def test_lpf2p_dc_gain_and_attenuation():
    """Butterworth biquad: unit DC gain, strong attenuation above cutoff."""
    coeffs = fw.lpf2p_coeffs(500, 80)
    st = fw.lpf2p_init(())
    # DC: constant input converges to the same constant
    y = None
    for _ in range(200):
        y, st = fw.lpf2p_apply(coeffs, st, jnp.asarray(1.0))
    assert abs(float(y) - 1.0) < 1e-3
    # High frequency (200 Hz at fs=500) heavily attenuated
    st = fw.lpf2p_init(())
    amp = 0.0
    for n in range(300):
        x = np.sin(2 * np.pi * 200 * n / 500)
        y, st = fw.lpf2p_apply(coeffs, st, jnp.asarray(x))
        if n > 100:
            amp = max(amp, abs(float(y)))
    assert amp < 0.2


def test_power_distribution_directions():
    # pure thrust: all motors equal
    pwm = np.asarray(fw.power_distribution(
        jnp.asarray([30000.0, 0.0, 0.0, 0.0])))
    assert np.allclose(pwm, pwm[0])
    # positive roll: right-side (m1, m2) lower than left-side (m3, m4)
    pwm = np.asarray(fw.power_distribution(
        jnp.asarray([30000.0, 5000.0, 0.0, 0.0])))
    assert pwm[0] < pwm[2] and pwm[1] < pwm[3]


def test_commander_takeoff_goto_profile():
    c = HighLevelCommander()
    c.tell_state([0, 0, 0.1], 0.0)
    c.update_time(0.0)
    c.takeoff(1.0, 2.0)
    c.update_time(1.0)  # halfway
    pos, vel, acc, yaw = c.get_setpoint()
    assert 0.3 < pos[2] < 0.8 and vel[2] > 0
    c.update_time(2.5)  # done
    pos, vel, acc, yaw = c.get_setpoint()
    np.testing.assert_allclose(pos, [0, 0, 1.0], atol=1e-9)
    np.testing.assert_allclose(vel, 0, atol=1e-9)
    # goto relative
    c.update_time(3.0)
    c.go_to(1.0, 0.0, 0.0, 0.0, 2.0, True)
    c.update_time(5.5)
    pos, *_ = c.get_setpoint()
    np.testing.assert_allclose(pos, [1.0, 0, 1.0], atol=1e-9)


def test_cf_aviary_square_flight():
    """Firmware-in-the-loop: Mellinger tracks takeoff + lateral legs."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    from examples.cf import run
    logger = run(gui=False, plot=False, output_folder="/tmp/cftest",
                 duration_fraction=0.45)  # ground + climb + first leg
    st = logger.states[0]
    # after climb phase the drone reaches z ~ 1 and moves along +x
    assert st[2, 150] > 0.8          # z after climb (t=6 s)
    assert st[0, -1] > 0.5           # moved along +x on the first leg
    assert np.all(np.isfinite(st))


def test_ctbr_hover_thrust_direction():
    # level hover at target directly above -> thrust ~ g, zero rates
    thrust, rates = compute_ctbr(
        jnp.zeros(3), jnp.asarray([0., 0, 0, 1]), jnp.zeros(3),
        jnp.zeros(3))
    assert abs(float(thrust) - 9.8) < 0.2
    np.testing.assert_allclose(np.asarray(rates), 0, atol=1e-6)
    # target above -> more thrust
    t2, _ = compute_ctbr(jnp.zeros(3), jnp.asarray([0., 0, 0, 1]),
                         jnp.zeros(3), jnp.asarray([0., 0, 1.]))
    assert float(t2) > float(thrust)


def test_beta_aviary_bridge_no_sitl():
    """Without a SITL process the bridge runs with stale zero actions."""
    from gym_pybullet_drones_tpu.envs.beta_aviary import BetaAviary
    env = BetaAviary(num_drones=1, physics=Physics.PYB, pyb_freq=240,
                     ctrl_freq=48)
    obs, _ = env.reset()
    a = np.zeros((1, 4))
    for i in range(10):
        obs, *_ = env.step(a, i)
    assert obs.shape == (1, 20)
    # no PWM received -> beta_action stays zero -> free fall
    assert obs[0, 2] < 0.12
    env.close()


def test_ctbr2beta_channels():
    from gym_pybullet_drones_tpu.envs.beta_aviary import BetaAviary
    thro, r, p, y = BetaAviary.ctbr2beta(20.45, 0.0, 0.0, 0.0)
    assert abs(thro - 1500) < 1  # half of MAX_THRUST -> mid channel
    assert r == 1500 and p == 1500 and y == 1500
    thro, r, p, y = BetaAviary.ctbr2beta(0.0, np.pi, 0.0, 0.0)
    assert abs(r - 1750) < 1  # 180 deg/s = MAX_RATE/2 above mid channel


def test_cf_aviary_pid_controller_variant():
    """CONTROLLER='pid' flies a climb via the firmware controller_pid
    cascade (control/firmware_pid.py)."""
    import numpy as np
    from gym_pybullet_drones_tpu.envs.cf_aviary import CFAviary

    class CFPid(CFAviary):
        CONTROLLER = "pid"

    env = CFPid(initial_xyzs=np.array([[0, 0, 0.5]]), physics=Physics.PYB,
                pyb_freq=1000, ctrl_freq=25)
    env.sendFullStateCmd([0, 0, 0.8], np.zeros(3), np.zeros(3), 0.0,
                         np.zeros(3), 0)
    obs = None
    for i in range(50):  # 2 s
        obs, *_ = env.step(i)
    assert abs(float(obs[0][2]) - 0.8) < 0.15
    # lateral waypoint: exercises the position->attitude yaw rotation and
    # the control_t pitch/yaw sign mapping (firmware_pid module docstring)
    env.sendFullStateCmd([0.4, -0.3, 0.8], np.zeros(3), np.zeros(3), 0.0,
                         np.zeros(3), 2.0)
    for i in range(50, 150):  # 4 more seconds
        obs, *_ = env.step(i)
    pos = np.asarray(obs[0][0:3])
    assert np.linalg.norm(pos - [0.4, -0.3, 0.8]) < 0.15, pos


def test_beta_aviary_native_bridge():
    """Native-bridge BetaAviary sends the same wire format as the Python path."""
    import socket
    import struct
    from gym_pybullet_drones_tpu import native
    if not native.available():
        import pytest
        pytest.skip("no g++")
    from gym_pybullet_drones_tpu.envs.beta_aviary import BetaAviary

    listener = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    listener.bind(("127.0.0.1", 9003))  # drone 0 FDM port
    listener.settimeout(2.0)
    env = BetaAviary(num_drones=1, physics=Physics.PYB, pyb_freq=240,
                     ctrl_freq=48, use_native_bridge=True)
    env.reset()
    env.step(np.zeros((1, 4)), 0)
    data, _ = listener.recvfrom(1024)
    fdm = struct.unpack("@dddddddddddddddddd", data)
    assert fdm[0] == 0.0 and fdm[17] == 1.0
    env.close()
    listener.close()
