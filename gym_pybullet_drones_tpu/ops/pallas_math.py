"""Polynomial transcendentals for Pallas TPU kernels.

Mosaic (the Pallas TPU compiler) has no lowering for atan/asin/acos/atan2
(probed on v5e; sin/cos/sqrt/rsqrt/exp are native).  The Euler-angle
extractions the reference relies on (PyBullet getEulerFromQuaternion,
scipy as_euler — see ops/quat.py) therefore use a Cephes-style polynomial
atan (max error ~2 ulp in f32) with standard range reduction and quadrant
fixups.  Accuracy is asserted against numpy over dense grids in
tests/test_pallas.py.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

_PI = math.pi
_PIO2 = math.pi / 2
_PIO4 = math.pi / 4
_TAN_3PI_8 = 2.414213562373095
_TAN_PI_8 = 0.4142135623730950


def atan(x):
    """Cephes atanf: range-reduced 4-term polynomial, ~2 ulp in f32."""
    sign = jnp.where(x < 0, -1.0, 1.0)
    t = jnp.abs(x)
    big = t > _TAN_3PI_8
    mid = t > _TAN_PI_8
    safe_t = jnp.where(t == 0, 1.0, t)
    xr = jnp.where(big, -1.0 / safe_t,
                   jnp.where(mid, (t - 1.0) / (t + 1.0), t))
    y0 = jnp.where(big, _PIO2, jnp.where(mid, _PIO4, 0.0))
    z = xr * xr
    y = (((8.05374449538e-2 * z - 1.38776856032e-1) * z
          + 1.99777106478e-1) * z - 3.33329491539e-1) * z * xr + xr
    return sign * (y0 + y)


def atan2(y, x):
    """numpy-convention atan2 built on the polynomial atan."""
    safe_x = jnp.where(x == 0, 1.0, x)
    base = atan(y / safe_x)
    sgn_y = jnp.where(y < 0, -1.0, 1.0)
    res = jnp.where(x > 0, base, base + sgn_y * _PI)
    res = jnp.where(x == 0, sgn_y * _PIO2, res)
    return jnp.where((x == 0) & (y == 0), jnp.zeros_like(res), res)


def asin(x):
    x = jnp.clip(x, -1.0, 1.0)
    return atan2(x, jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0)))


def quat_rpy_rows(qx, qy, qz, qw):
    """Roll/pitch/yaw rows from (possibly unnormalized) quaternion rows.

    Same math as ops/quat.quat_to_rpy: atan2 is scale-invariant so the
    un-normalized quadratic terms feed it directly; the asin argument is
    normalized by the squared norm.
    """
    n2 = qx * qx + qy * qy + qz * qz + qw * qw
    roll = atan2(2.0 * (qw * qx + qy * qz), n2 - 2.0 * (qx * qx + qy * qy))
    pitch = asin(jnp.clip(2.0 * (qw * qy - qz * qx) / n2, -1.0, 1.0))
    yaw = atan2(2.0 * (qw * qz + qx * qy), n2 - 2.0 * (qy * qy + qz * qz))
    return roll, pitch, yaw
