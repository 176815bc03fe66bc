"""DSL PID controller parity vs scipy-based oracle + closed-loop behavior."""
import numpy as np
import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu import params as P
from gym_pybullet_drones_tpu.control import dsl_pid
from tests import _oracle as oracle


def test_pid_single_tick_parity():
    model = P.CF2X
    rng = np.random.default_rng(0)
    for trial in range(5):
        pos = rng.normal(size=3) * 0.3 + [0, 0, 0.5]
        rpy = rng.normal(size=3) * 0.2
        q = oracle.rpy_to_quat(rpy)
        vel = rng.normal(size=3) * 0.3
        tgt = rng.normal(size=3) * 0.5 + [0, 0, 1.0]

        octl = oracle.dsl_pid_init()
        o_rpm, _ = oracle.dsl_pid_step(model, octl, 1 / 48, pos, q, vel, tgt)

        st = dsl_pid.init_state((), jnp.float64)
        rpm, st2, pos_e, yaw_e = dsl_pid.compute_control(
            model, st, 1 / 48, jnp.asarray(pos), jnp.asarray(q),
            jnp.asarray(vel), jnp.asarray(tgt))
        np.testing.assert_allclose(np.asarray(rpm), o_rpm, rtol=1e-9,
                                   err_msg=f"trial {trial}")


def test_pid_multi_tick_state_parity():
    """Carried integrals/last_rpy match over a closed-loop-ish sequence."""
    model = P.CF2X
    rng = np.random.default_rng(1)
    octl = oracle.dsl_pid_init()
    st = dsl_pid.init_state((), jnp.float64)
    for t in range(20):
        pos = rng.normal(size=3) * 0.2 + [0, 0, 0.5]
        rpy = rng.normal(size=3) * 0.15
        q = oracle.rpy_to_quat(rpy)
        vel = rng.normal(size=3) * 0.2
        tgt = np.array([0.0, 0.0, 1.0])
        o_rpm, octl = oracle.dsl_pid_step(model, octl, 1 / 48, pos, q, vel, tgt)
        rpm, st, _, _ = dsl_pid.compute_control(
            model, st, 1 / 48, jnp.asarray(pos), jnp.asarray(q),
            jnp.asarray(vel), jnp.asarray(tgt))
        np.testing.assert_allclose(np.asarray(rpm), o_rpm, rtol=1e-8,
                                   err_msg=f"tick {t}")
