"""Quaternion/rotation math vs NumPy oracle and scipy conventions."""
import numpy as np
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from gym_pybullet_drones_tpu.ops import quat as quat_ops
from tests import _oracle as oracle


def rand_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_to_mat_matches_scipy():
    q = rand_quats(64)
    ours = np.asarray(quat_ops.quat_to_mat(jnp.asarray(q)))
    ref = Rotation.from_quat(q).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-14)


def test_rpy_roundtrip_matches_scipy_zyx():
    """PyBullet's Euler convention == scipy extrinsic 'xyz' (R = Rz Ry Rx)."""
    q = rand_quats(64, 1)
    ours = np.asarray(quat_ops.quat_to_rpy(jnp.asarray(q)))
    ref = Rotation.from_quat(q).as_euler("xyz")
    np.testing.assert_allclose(ours, ref, atol=1e-12)

    back = np.asarray(quat_ops.rpy_to_quat(jnp.asarray(ours)))
    ref_q = Rotation.from_euler("xyz", ref).as_quat()
    sign = np.sign(np.sum(back * ref_q, axis=-1, keepdims=True))
    np.testing.assert_allclose(back, sign * ref_q, atol=1e-12)


def test_euler_xyz_matches_scipy_intrinsic():
    rng = np.random.default_rng(2)
    e = rng.uniform(-1.2, 1.2, size=(64, 3))
    ref_q = Rotation.from_euler("XYZ", e).as_quat()
    ours = np.asarray(quat_ops.euler_xyz_to_quat(jnp.asarray(e)))
    sign = np.sign(np.sum(ours * ref_q, axis=-1, keepdims=True))
    np.testing.assert_allclose(ours, sign * ref_q, atol=1e-12)

    m = Rotation.from_euler("XYZ", e).as_matrix()
    back = np.asarray(quat_ops.mat_to_euler_xyz(jnp.asarray(m)))
    np.testing.assert_allclose(back, Rotation.from_matrix(m).as_euler("XYZ"),
                               atol=1e-12)


def test_rotate_vector_matches_matrix():
    q = rand_quats(32, 3)
    rng = np.random.default_rng(4)
    v = rng.normal(size=(32, 3))
    ours = np.asarray(quat_ops.rotate_vector(jnp.asarray(v), jnp.asarray(q)))
    ref = np.einsum("nij,nj->ni", Rotation.from_quat(q).as_matrix(), v)
    np.testing.assert_allclose(ours, ref, atol=1e-13)


def test_quat_mul_matches_scipy():
    q1, q2 = rand_quats(16, 5), rand_quats(16, 6)
    ours = np.asarray(quat_ops.quat_mul(jnp.asarray(q1), jnp.asarray(q2)))
    ref = (Rotation.from_quat(q1) * Rotation.from_quat(q2)).as_quat()
    sign = np.sign(np.sum(ours * ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(ours, sign * ref, atol=1e-13)


def test_integrate_quat_matches_oracle():
    rng = np.random.default_rng(7)
    for _ in range(20):
        q = rand_quats(1, rng.integers(1 << 30))[0]
        w = rng.normal(size=3) * 3
        ours = np.asarray(quat_ops.integrate_quat(
            jnp.asarray(q), jnp.asarray(w), 1 / 240))
        ref = oracle.integrate_q(q, w, 1 / 240)
        np.testing.assert_allclose(ours, ref, rtol=1e-13, atol=1e-15)
