"""Collective-thrust / body-rates controller (for Betaflight-style SITL).

Parity target: reference /root/reference/gym_pybullet_drones/control/
CTBRControl.py:103-168 — PD position loop (K_P=[3,3,8], K_D=[2.5,2.5,5]),
quaternion-error body-rate law (K_RATES=[5,5,1]), returning
(normalized_thrust, p, q, r) instead of motor RPMs.

The reference computes in transforms3d's wxyz quaternion convention (its
computeControlFromState reorders the state quat to wxyz at :92); the
functional core here takes our native xyzw and is algebraically identical.
"""
from __future__ import annotations

import jax.numpy as jnp

from gym_pybullet_drones_tpu.ops import quat as quat_ops

K_P = (3.0, 3.0, 8.0)
K_D = (2.5, 2.5, 5.0)
K_RATES = (5.0, 5.0, 1.0)


def _mat_to_quat_xyzw(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> xyzw quaternion (branch-free Shepperd variant)."""
    tr = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    # four candidate formulations; pick the numerically largest pivot
    qw = jnp.sqrt(jnp.maximum(0.0, 1.0 + tr)) / 2
    qx = jnp.sqrt(jnp.maximum(
        0.0, 1.0 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2])) / 2
    qy = jnp.sqrt(jnp.maximum(
        0.0, 1.0 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2])) / 2
    qz = jnp.sqrt(jnp.maximum(
        0.0, 1.0 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2])) / 2
    qx = jnp.copysign(qx, m[..., 2, 1] - m[..., 1, 2])
    qy = jnp.copysign(qy, m[..., 0, 2] - m[..., 2, 0])
    qz = jnp.copysign(qz, m[..., 1, 0] - m[..., 0, 1])
    q = jnp.stack([qx, qy, qz, qw], axis=-1)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def compute_ctbr(cur_pos, cur_quat, cur_vel, target_pos,
                 target_vel=None):
    """(thrust, body_rates): collective thrust + body-rate commands.

    cur_quat is xyzw.  Broadcasts over leading batch dims.
    """
    if target_vel is None:
        target_vel = jnp.zeros_like(cur_vel)
    dtype = cur_pos.dtype
    kp = jnp.asarray(K_P, dtype)
    kd = jnp.asarray(K_D, dtype)
    krates = jnp.asarray(K_RATES, dtype)
    g = jnp.asarray([0.0, 0.0, -9.8], dtype)

    pos_e = target_pos - cur_pos
    vel_e = target_vel - cur_vel
    tar_acc = kp * pos_e + kd * vel_e - g
    z_world = jnp.zeros_like(cur_pos).at[..., 2].set(1.0)
    body_z = quat_ops.rotate_vector(z_world, cur_quat)
    norm_thrust = jnp.sum(tar_acc * body_z, axis=-1)

    # target attitude from desired acceleration direction
    z_body = tar_acc / jnp.linalg.norm(tar_acc, axis=-1, keepdims=True)
    y_axis = jnp.zeros_like(cur_pos).at[..., 1].set(1.0)
    x_body = jnp.cross(y_axis, z_body)
    x_body = x_body / jnp.linalg.norm(x_body, axis=-1, keepdims=True)
    y_body = jnp.cross(z_body, x_body)
    y_body = y_body / jnp.linalg.norm(y_body, axis=-1, keepdims=True)
    tar_rot = jnp.stack([x_body, y_body, z_body], axis=-1)  # columns
    tar_att = _mat_to_quat_xyzw(tar_rot)

    # quaternion error in the body frame; shortest-rotation sign fix
    q_err = quat_ops.quat_mul(quat_ops.quat_conj(cur_quat), tar_att)
    rates = 2.0 * krates * q_err[..., :3]
    rates = jnp.where(q_err[..., 3:4] < 0, -rates, rates)
    return norm_thrust, rates


class CTBRControl:
    """Class wrapper with the reference's API (control/CTBRControl.py).

    computeControlFromState slices the 20-dim state vector; note the
    reference feeds transforms3d wxyz internally — this wrapper consumes the
    state's native xyzw directly, which is the same rotation.
    """

    def __init__(self, drone_model=None, g: float = 9.8):
        self.DRONE_MODEL = drone_model

    def reset(self):
        pass

    def computeControlFromState(self, control_timestep, state, target_pos,
                                target_rpy=None, target_vel=None,
                                target_rpy_rates=None):
        state = jnp.asarray(state)
        return self.computeControl(
            control_timestep, cur_pos=state[0:3], cur_quat=state[3:7],
            cur_vel=state[10:13], cur_ang_vel=state[13:16],
            target_pos=jnp.asarray(target_pos), target_vel=target_vel)

    def computeControl(self, control_timestep, cur_pos, cur_quat, cur_vel,
                       cur_ang_vel=None, target_pos=None, target_rpy=None,
                       target_vel=None, target_rpy_rates=None):
        import numpy as np
        tv = None if target_vel is None else jnp.asarray(target_vel)
        thrust, rates = compute_ctbr(
            jnp.asarray(cur_pos), jnp.asarray(cur_quat),
            jnp.asarray(cur_vel), jnp.asarray(target_pos), tv)
        r = np.asarray(rates)
        return float(thrust), float(r[0]), float(r[1]), float(r[2])
