"""Golden-trajectory regression tests: JAX kernels vs committed fixtures.

Fixtures are float64 oracle rollouts (tests/make_golden.py); any silent
drift in the DYN kernel or the DSL-PID closed loop fails here.
"""
import os

import numpy as np

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu import params as P
from gym_pybullet_drones_tpu.control import dsl_pid
from gym_pybullet_drones_tpu.ops.dynamics import DynState, dyn_step
from tests import _oracle as oracle

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_dyn_golden_trajectory():
    data = np.load(os.path.join(GOLDEN, "dyn_cf2x.npz"))
    model = P.CF2X
    state = DynState(
        pos=jnp.asarray([0.1, -0.2, 1.0]),
        quat=jnp.asarray(oracle.rpy_to_quat([0.05, -0.1, 0.3])),
        vel=jnp.asarray([0.2, 0.1, -0.05]),
        rpy_rates=jnp.asarray([0.5, -0.3, 0.8]),
        ang_v=jnp.zeros(3, jnp.float64))

    @jax.jit
    def rollout(state, rpms):
        def body(s, r):
            s = dyn_step(model, s, r, 1 / 240)
            return s, jnp.concatenate([s.pos, s.quat, s.vel, s.rpy_rates])
        return jax.lax.scan(body, state, rpms)[1]

    traj = np.asarray(rollout(state, jnp.asarray(data["rpms"])))
    np.testing.assert_allclose(traj, data["traj"], rtol=1e-8, atol=1e-9)


def test_pid_closedloop_golden():
    data = np.load(os.path.join(GOLDEN, "pid_closedloop_cf2x.npz"))
    model = P.CF2X
    target = jnp.asarray(data["target"])
    ctl = dsl_pid.init_state((), jnp.float64)
    st = DynState(pos=jnp.asarray([0.0, 0.0, 0.1]),
                  quat=jnp.asarray(oracle.rpy_to_quat([0, 0, 0])),
                  vel=jnp.zeros(3, jnp.float64),
                  rpy_rates=jnp.zeros(3, jnp.float64),
                  ang_v=jnp.zeros(3, jnp.float64))

    @jax.jit
    def rollout(st, ctl):
        def body(carry, _):
            st, ctl = carry
            rpm, ctl, _, _ = dsl_pid.compute_control(
                model, ctl, 1 / 48, st.pos, st.quat, st.vel, target)
            for _ in range(5):
                st = dyn_step(model, st, rpm, 1 / 240)
            return (st, ctl), jnp.concatenate([rpm, st.pos])
        return jax.lax.scan(body, (st, ctl), None, length=200)[1]

    log = np.asarray(rollout(st, ctl))
    # rpm columns to 1e-6 relative, positions to 1e-7 absolute
    np.testing.assert_allclose(log[:, :4], data["log"][:, :4], rtol=1e-6)
    np.testing.assert_allclose(log[:, 4:], data["log"][:, 4:], atol=1e-6)
