"""Batched quaternion / rotation math in JAX.

TPU-native replacement of the quaternion utilities the reference consumes from
PyBullet's C++ core (`p.getMatrixFromQuaternion`, `p.getEulerFromQuaternion`,
`p.getQuaternionFromEuler`; reference BaseAviary.py:518,592,836) and from
scipy.spatial.transform.Rotation (reference DSLPIDControl.py:205,242-244).

Conventions:
- Quaternions are `xyzw` (PyBullet's layout), stored in the last axis.
- "rpy" means roll-pitch-yaw about fixed world axes, i.e. R = Rz(y)Ry(p)Rx(r)
  — PyBullet's Euler convention.
- `euler_xyz_*` functions implement scipy's intrinsic-'XYZ' convention,
  R = Rx(a) @ Ry(b) @ Rz(c), needed for DSL PID parity.

All functions broadcast over arbitrary leading batch dimensions.
"""
from __future__ import annotations

import jax.numpy as jnp


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """xyzw quaternion -> (..., 3, 3) rotation matrix.

    Matches PyBullet's getMatrixFromQuaternion (which normalizes internally).
    """
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def rpy_to_quat(rpy: jnp.ndarray) -> jnp.ndarray:
    """Roll-pitch-yaw (fixed-axis XYZ) -> xyzw quaternion.

    Matches PyBullet's getQuaternionFromEuler.
    """
    r, p, y = rpy[..., 0] * 0.5, rpy[..., 1] * 0.5, rpy[..., 2] * 0.5
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.stack(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ],
        axis=-1,
    )


def quat_to_rpy(q: jnp.ndarray) -> jnp.ndarray:
    """xyzw quaternion -> roll-pitch-yaw (fixed-axis XYZ).

    Matches PyBullet's getEulerFromQuaternion (Bullet btMatrix3x3::getEulerZYX).
    """
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sinp = jnp.clip(2 * (w * y - z * x), -1.0, 1.0)
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = jnp.arcsin(sinp)
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw], axis=-1)


def mat_to_euler_xyz(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation matrix -> intrinsic-XYZ Euler angles (a, b, c).

    Matches scipy Rotation.from_matrix(m).as_euler('XYZ') away from gimbal
    lock: R = Rx(a) @ Ry(b) @ Rz(c), so b = asin(R[0,2]),
    a = atan2(-R[1,2], R[2,2]), c = atan2(-R[0,1], R[0,0]).
    """
    b = jnp.arcsin(jnp.clip(m[..., 0, 2], -1.0, 1.0))
    a = jnp.arctan2(-m[..., 1, 2], m[..., 2, 2])
    c = jnp.arctan2(-m[..., 0, 1], m[..., 0, 0])
    return jnp.stack([a, b, c], axis=-1)


def euler_xyz_to_quat(e: jnp.ndarray) -> jnp.ndarray:
    """Intrinsic-XYZ Euler angles -> xyzw quaternion.

    Matches scipy Rotation.from_euler('XYZ', e).as_quat():
    q = qx(a) * qy(b) * qz(c) with Hamilton product.
    """
    a, b, c = e[..., 0] * 0.5, e[..., 1] * 0.5, e[..., 2] * 0.5
    ca, sa = jnp.cos(a), jnp.sin(a)
    cb, sb = jnp.cos(b), jnp.sin(b)
    cc, sc = jnp.cos(c), jnp.sin(c)
    # Hamilton product qx * qy * qz expanded:
    w = ca * cb * cc - sa * sb * sc
    x = sa * cb * cc + ca * sb * sc
    y = ca * sb * cc - sa * cb * sc
    z = ca * cb * sc + sa * sb * cc
    return jnp.stack([x, y, z, w], axis=-1)


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of xyzw quaternions (rotation q1 followed-by-local q2)."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate of an xyzw quaternion."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def rotate_vector(v: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by xyzw quaternion(s) q (active rotation)."""
    qv = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def integrate_quat(q: jnp.ndarray, omega: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Exact exponential-map quaternion integration.

    Bit-level parity target: reference BaseAviary._integrateQ
    (BaseAviary.py:876-889).  The reference builds the 4x4 skew operator
    Lambda (scaled by .5), then applies
        q' = (cos(theta) I + (2/||w||) sin(theta) Lambda) q,
    theta = ||w|| dt / 2, returning q unchanged when ||w|| ~= 0
    (np.isclose default: |w| <= atol=1e-8 since b=0).

    This implementation reproduces the same arithmetic order elementwise:
    the matrix-vector product rows are expanded with identical multiply/add
    ordering so float64 results match the reference exactly.
    """
    wx, wy, wz = omega[..., 0], omega[..., 1], omega[..., 2]
    omega_norm = jnp.sqrt(wx * wx + wy * wy + wz * wz)
    theta = omega_norm * dt / 2
    cos_t = jnp.cos(theta)
    # s = (2/||w||) sin(theta) * 0.5  -- the .5 from Lambda's definition
    safe_norm = jnp.where(omega_norm > 0, omega_norm, 1.0)
    s = 2.0 / safe_norm * jnp.sin(theta) * 0.5
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    # Rows of (cos I + sin-scaled Lambda) @ q, Lambda per reference :881-886
    nx = cos_t * x + s * (wz * y - wy * z + wx * w)
    ny = cos_t * y + s * (-wz * x + wx * z + wy * w)
    nz = cos_t * z + s * (wy * x - wx * y + wz * w)
    nw = cos_t * w + s * (-wx * x - wy * y - wz * z)
    new_q = jnp.stack([nx, ny, nz, nw], axis=-1)
    # np.isclose(omega_norm, 0): |omega_norm| <= 1e-8 (atol), rtol term is 0.
    keep = (omega_norm <= 1e-8)[..., None]
    return jnp.where(keep, q, new_q)


def integrate_quat_world(q: jnp.ndarray, omega_world: jnp.ndarray,
                         dt: float) -> jnp.ndarray:
    """Exponential-map integration with a WORLD-frame angular velocity.

    q' = exp(omega_world * dt) (x) q  (left Hamilton product), the update
    Bullet's integrator applies to base orientations.  `integrate_quat`
    above is the BODY-rate (right-multiply) variant used by the explicit
    DYN mode.
    """
    norm = jnp.linalg.norm(omega_world, axis=-1, keepdims=True)
    theta = norm * dt / 2
    safe = jnp.where(norm > 0, norm, 1.0)
    axis = omega_world / safe
    rot = jnp.concatenate(
        [jnp.sin(theta) * axis, jnp.cos(theta)], axis=-1)
    out = quat_mul(rot, q)
    return jnp.where(norm <= 1e-8, q, out)
