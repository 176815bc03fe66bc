"""Semi-implicit rigid-body integrator with ground-plane contact (PYB mode).

TPU-native stand-in for the Bullet C++ integrator the reference drives through
`p.stepSimulation` (reference BaseAviary.py:369-370).  Scope per SURVEY.md §7.4
/ BASELINE.json: exact Bullet bit-parity is NOT the target (that is reserved
for the explicit-dynamics mode in ops/dynamics.py); this stepper approximates
Bullet's discrete dynamics well enough that the PYB* physics modes fly the
same trajectories qualitatively:

- external prop forces applied at prop link positions (LINK frame semantics of
  p.applyExternalForce, reference BaseAviary.py:679-711) => world force
  R @ f and torque (R @ offset) x (R @ f) about the CoM,
- gravity, then semi-implicit Euler: v += dt a; w += dt I_w^-1 (tau);
  x += dt v; q integrated by exponential map,
- Bullet-style velocity damping v *= (1-d)^dt with PyBullet's URDF default
  d = 0.04 (linear and angular),
- ground-plane contact approximated by position projection + inelastic normal
  response + Coulomb-like tangential friction on the collision cylinder
  (radius/height from the URDF collision geometry).

State layout matches DynState but `rpy_rates` carries the BODY angular
velocity is unused here; `ang_v` (world angular velocity) is the carry.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.params import DroneParams
from gym_pybullet_drones_tpu.ops import quat as quat_ops
from gym_pybullet_drones_tpu.ops.dynamics import motor_forces_torques

# PyBullet defaults for URDF-loaded bodies (changeDynamics docs)
LINEAR_DAMPING = 0.04
ANGULAR_DAMPING = 0.04
GROUND_FRICTION = 0.5


class PybState(NamedTuple):
    pos: jnp.ndarray    # (..., 3)
    quat: jnp.ndarray   # (..., 4) xyzw
    vel: jnp.ndarray    # (..., 3) world linear velocity
    ang_v: jnp.ndarray  # (..., 3) world angular velocity


def pyb_step(params: DroneParams, state: PybState, rpm: jnp.ndarray,
             dt: float,
             ext_force: jnp.ndarray | None = None,
             ext_torque: jnp.ndarray | None = None,
             obstacles: tuple = ()) -> PybState:
    """One physics substep of the Bullet-like integrator.

    ext_force / ext_torque are additional world-frame force/torque about the
    CoM (the aero effects from ops/aero.py), already composed by the caller
    according to the active Physics mode.
    """
    dtype = state.pos.dtype
    rot = quat_ops.quat_to_mat(state.quat)             # (..., 3, 3)
    forces, _ = motor_forces_torques(params, rpm)      # per-motor thrusts
    # z-torque with model-dependent sign (reference BaseAviary.py:693-697)
    z_t = rpm * rpm * params.km
    if params.model.value == "racer":
        z_t = -z_t
    z_torque = -z_t[..., 0] + z_t[..., 1] - z_t[..., 2] + z_t[..., 3]

    # World force: sum of per-prop thrusts along the body z axis.
    z_axis = rot[..., :, 2]
    total_thrust = jnp.sum(forces, axis=-1)
    force_w = z_axis * total_thrust[..., None]
    # Torque about CoM from per-prop application points: R @ (off x [0,0,f])
    offsets = jnp.asarray(params.prop_offsets, dtype=dtype)       # (4, 3)
    f_body = jnp.zeros(forces.shape + (3,), dtype) \
        .at[..., 2].set(forces)                                    # (..., 4, 3)
    tau_body = jnp.sum(jnp.cross(offsets, f_body), axis=-2)       # (..., 3)
    tau_body = tau_body.at[..., 2].add(z_torque)
    torque_w = jnp.einsum("...ij,...j->...i", rot, tau_body)

    if ext_force is not None:
        force_w = force_w + ext_force
    if ext_torque is not None:
        torque_w = torque_w + ext_torque

    # Gravity + velocity update
    acc = force_w / params.m
    acc = acc.at[..., 2].add(-9.8)
    vel = state.vel + dt * acc
    # World-frame inertia: I_w^-1 = R I_b^-1 R^T (diagonal body inertia)
    j_inv = jnp.asarray(
        [1.0 / params.ixx, 1.0 / params.iyy, 1.0 / params.izz], dtype=dtype)
    tau_b = jnp.einsum("...ji,...j->...i", rot, torque_w)         # R^T tau
    dw_b = j_inv * tau_b
    ang_v = state.ang_v + dt * jnp.einsum("...ij,...j->...i", rot, dw_b)

    # Bullet-style damping (applied after velocity integration)
    vel = vel * (1.0 - LINEAR_DAMPING) ** dt
    ang_v = ang_v * (1.0 - ANGULAR_DAMPING) ** dt

    # Transform integration
    pos = state.pos + dt * vel
    # Bullet integrates orientation with the world angular velocity
    # (left-multiplied exponential map — NOT the body-rate variant)
    quat = quat_ops.integrate_quat_world(state.quat, ang_v, dt)

    # --- Ground-plane contact (approximate) ---
    # Lowest point of the collision cylinder: account for tilt via the body z
    # axis; support depth = (h/2)|R33| + r*sqrt(1-R33^2) below the CoM.
    r33 = jnp.clip(quat_ops.quat_to_mat(quat)[..., 2, 2], -1.0, 1.0)
    sin_tilt = jnp.sqrt(jnp.maximum(1.0 - r33 * r33, 0.0))
    support = (params.collision_h / 2) * jnp.abs(r33) + \
        params.collision_r * sin_tilt
    bottom = pos[..., 2] - params.collision_z_offset - support
    penetration = jnp.maximum(-bottom, 0.0)
    in_contact = penetration > 0
    # Project out penetration; kill downward normal velocity (restitution 0);
    # apply Coulomb-like tangential slowdown while in contact.
    pos = pos.at[..., 2].add(penetration)
    vz = vel[..., 2]
    new_vz = jnp.where(in_contact, jnp.maximum(vz, 0.0), vz)
    tangential_scale = jnp.where(
        in_contact, jnp.maximum(1.0 - GROUND_FRICTION * dt * 60.0, 0.0), 1.0)
    vel = jnp.concatenate(
        [vel[..., :2] * tangential_scale[..., None], new_vz[..., None]],
        axis=-1)
    ang_v = jnp.where(in_contact[..., None],
                      ang_v * jnp.asarray(tangential_scale)[..., None], ang_v)

    # --- Static obstacles (approximate, inelastic pushout) ---
    # Entry formats: (x, y, z, radius) = sphere; (x, y, z, hx, hy, hz) =
    # axis-aligned box (center + half extents).  The drone is its bounding
    # sphere (collision_r), matching Bullet's convex contact qualitatively.
    if obstacles:
        body_r = params.collision_r
        for entry in obstacles:
            if len(entry) == 4:
                ox, oy, oz, orad = entry
                center = jnp.asarray([ox, oy, oz], dtype)
                delta = pos - center
                dist = jnp.linalg.norm(delta, axis=-1, keepdims=True)
                min_d = orad + body_r
                hit = dist < min_d
                n_hat = delta / jnp.maximum(dist, 1e-6)
                pos = jnp.where(hit, center + n_hat * min_d, pos)
                vn = jnp.sum(vel * n_hat, axis=-1, keepdims=True)
                vel = jnp.where(hit & (vn < 0), vel - vn * n_hat, vel)
            else:
                ox, oy, oz, hx, hy, hz = entry
                center = jnp.asarray([ox, oy, oz], dtype)
                half = jnp.asarray([hx, hy, hz], dtype)
                rel = pos - center
                closest = jnp.clip(rel, -half, half)
                delta = rel - closest                 # 0 inside the box
                dist = jnp.linalg.norm(delta, axis=-1, keepdims=True)
                out_hit = (dist < body_r) & (dist > 1e-6)
                n_out = delta / jnp.maximum(dist, 1e-6)
                pos = jnp.where(out_hit,
                                center + closest + n_out * body_r, pos)
                # center inside the box: push out along the axis of least
                # penetration (face normal)
                inside = dist <= 1e-6
                pen = half + body_r - jnp.abs(rel)    # (..., 3) depths
                axis_1h = jax.nn.one_hot(
                    jnp.argmin(pen, axis=-1), 3, dtype=dtype)
                sgn = jnp.where(rel >= 0, 1.0, -1.0)
                n_in = axis_1h * sgn
                pos = jnp.where(inside, pos + n_in * pen, pos)
                n_hat = jnp.where(out_hit, n_out, n_in)
                hit = out_hit | inside
                vn = jnp.sum(vel * n_hat, axis=-1, keepdims=True)
                vel = jnp.where(hit & (vn < 0), vel - vn * n_hat, vel)
    return PybState(pos=pos, quat=quat, vel=vel, ang_v=ang_v)


def resolve_drone_collisions(params: DroneParams, pos: jnp.ndarray,
                             vel: jnp.ndarray):
    """Pairwise drone-drone contact within one env (bounding spheres).

    TPU-native approximation of Bullet's multibody contact between drone
    collision shapes (the reference loads every drone into one PyBullet
    world, BaseAviary.py:484-491, so bodies collide in all PYB* modes).
    Each penetrating pair (center distance < 2 * collision_r) is separated
    symmetrically along the pair normal and the approaching normal
    velocity component is cancelled inelastically (restitution 0, matching
    the URDF default).  pos/vel are (..., N, 3); O(N^2) masked pairwise,
    vectorized over leading batch dims.
    """
    dtype = pos.dtype
    n = pos.shape[-2]
    if n < 2:
        return pos, vel
    min_d = 2.0 * params.collision_r
    diff = pos[..., :, None, :] - pos[..., None, :, :]     # d[i,j] = p_i - p_j
    dist = jnp.linalg.norm(diff, axis=-1)                  # (..., N, N)
    eye = jnp.eye(n, dtype=bool)
    hit = (dist < min_d) & ~eye
    n_hat = diff / jnp.maximum(dist, 1e-6)[..., None]
    # symmetric positional pushout: each of the pair moves half the overlap
    overlap = jnp.maximum(min_d - dist, 0.0)
    push = jnp.sum(
        jnp.where(hit[..., None], 0.5 * overlap[..., None] * n_hat, 0.0),
        axis=-2)
    pos = pos + push
    # inelastic normal response: cancel the approaching relative-velocity
    # component (split evenly between the two equal-mass bodies)
    rel_v = vel[..., :, None, :] - vel[..., None, :, :]
    vn = jnp.sum(rel_v * n_hat, axis=-1)                   # (..., N, N)
    approaching = hit & (vn < 0)
    dv = jnp.sum(
        jnp.where(approaching[..., None], -0.5 * vn[..., None] * n_hat, 0.0),
        axis=-2)
    vel = vel + dv
    return pos, vel
