"""Native C++ oracle vs NumPy oracle vs JAX kernel (triple cross-check)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu import params as P
from gym_pybullet_drones_tpu import native
from gym_pybullet_drones_tpu.ops.dynamics import DynState, dyn_step
from tests import _oracle as oracle

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ toolchain unavailable")

DT = 1 / 240


@pytest.mark.parametrize("model", [P.CF2X, P.CF2P, P.RACE])
def test_cpp_matches_numpy_oracle(model):
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(1, 3)) + [0, 0, 1]
    rpy = rng.normal(size=3) * 0.3
    quat = oracle.rpy_to_quat(rpy)[None]
    vel = rng.normal(size=(1, 3)) * 0.5
    rates = rng.normal(size=(1, 3))
    rpms = model.hover_rpm * (1 + 0.05 * rng.normal(size=(100, 1, 4)))

    out = native.dyn_rollout(model, pos, quat, vel, rates, rpms, DT)

    p, q, v, r = pos[0].copy(), quat[0].copy(), vel[0].copy(), rates[0].copy()
    for t in range(100):
        p, q, v, r, av = oracle.dyn_step(model, p, q, v, r, rpms[t, 0], DT)
    np.testing.assert_allclose(out["pos"][0], p, rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(out["quat"][0], q, rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(out["vel"][0], v, rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(out["rpy_rates"][0], r, rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(out["ang_v"][0], av, rtol=1e-12, atol=1e-13)


def test_cpp_matches_jax_kernel_long_rollout():
    model = P.CF2X
    rng = np.random.default_rng(1)
    B = 3
    pos = rng.normal(size=(B, 3)) * 0.3 + [0, 0, 1]
    quat = np.stack([oracle.rpy_to_quat(rng.normal(size=3) * 0.2)
                     for _ in range(B)])
    vel = rng.normal(size=(B, 3)) * 0.3
    rates = rng.normal(size=(B, 3))
    rpms = model.hover_rpm * (1 + 0.02 * rng.normal(size=(480, B, 4)))

    out = native.dyn_rollout(model, pos, quat, vel, rates, rpms, DT)

    state = DynState(pos=jnp.asarray(pos), quat=jnp.asarray(quat),
                     vel=jnp.asarray(vel), rpy_rates=jnp.asarray(rates),
                     ang_v=jnp.zeros((B, 3), jnp.float64))

    @jax.jit
    def rollout(state, rpms):
        def body(s, r):
            return dyn_step(model, s, r, DT), None
        return jax.lax.scan(body, state, rpms)[0]

    final = rollout(state, jnp.asarray(rpms))
    np.testing.assert_allclose(np.asarray(final.pos), out["pos"],
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(final.quat), out["quat"],
                               rtol=1e-9, atol=1e-10)


def test_cpp_trajectory_output():
    model = P.CF2X
    pos = np.array([[0.0, 0.0, 1.0]])
    quat = np.array([[0.0, 0, 0, 1]])
    vel = np.zeros((1, 3))
    rates = np.zeros((1, 3))
    rpms = np.full((10, 1, 4), model.hover_rpm)
    out = native.dyn_rollout(model, pos, quat, vel, rates, rpms, DT,
                             return_traj=True)
    assert out["traj"].shape == (10, 1, 3)
    np.testing.assert_allclose(out["traj"][:, 0, 2], 1.0, atol=1e-12)


def test_sitl_bridge_loopback():
    """C++ bridge: packets arrive with the exact reference wire format."""
    import socket
    import struct
    from gym_pybullet_drones_tpu import native

    idx = 7  # ports 9072-9074, clear of anything else
    # emulate the SITL side: listen on STATE and RC, send PWM
    state_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    state_sock.bind(("127.0.0.1", 9003 + 10 * idx))
    state_sock.settimeout(2.0)
    rc_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rc_sock.bind(("127.0.0.1", 9004 + 10 * idx))
    rc_sock.settimeout(2.0)

    bridge = native.SitlBridge(index=idx)
    rc = np.array([1500, 1500, 1000, 1500] + [1000] * 12, np.uint16)
    fresh, pwm = bridge.tick(0.25, [0.1, -0.2, 0.3], rc)
    assert not fresh  # nothing sent back yet

    data, _ = state_sock.recvfrom(1024)
    fdm = struct.unpack("@dddddddddddddddddd", data)
    assert fdm[0] == 0.25
    np.testing.assert_allclose(fdm[1:4], [0.1, 0.2, -0.3])  # ENU->NED flips
    assert fdm[7] == 1.0 and fdm[17] == 1.0

    data, _ = rc_sock.recvfrom(1024)
    vals = struct.unpack("@dHHHHHHHHHHHHHHHH", data)
    assert vals[0] == 0.25
    assert vals[1:5] == (1500, 1500, 1000, 1500)

    # send PWMs back; next tick should pick them up
    pwm_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    pwm_sock.sendto(struct.pack("@ffff", 0.1, 0.2, 0.3, 0.4),
                    ("127.0.0.1", 9002 + 10 * idx))
    import time
    time.sleep(0.05)
    fresh, pwm = bridge.tick(0.3, [0, 0, 0], rc)
    assert fresh
    np.testing.assert_allclose(pwm, [0.1, 0.2, 0.3, 0.4], rtol=1e-6)
    bridge.close()
    state_sock.close(); rc_sock.close(); pwm_sock.close()
