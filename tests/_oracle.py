"""Independent NumPy float64 oracle for the reference physics equations.

pybullet is not installed in this image, so the mounted reference cannot be
executed directly.  This oracle is an independent transcription of the
documented math contracts (SURVEY.md §2.2; reference
gym_pybullet_drones/envs/BaseAviary.py:679-889) in plain NumPy float64 —
single drone, no batching — used as ground truth for the JAX kernels'
bit-level parity tests.
"""
import numpy as np


def quat_to_mat(q):
    """xyzw quaternion -> 3x3 rotation matrix (PyBullet convention)."""
    q = np.asarray(q, dtype=np.float64)
    q = q / np.linalg.norm(q)
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def quat_to_rpy(q):
    """xyzw -> roll/pitch/yaw, Bullet getEulerZYX convention."""
    x, y, z, w = np.asarray(q, np.float64) / np.linalg.norm(q)
    roll = np.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = np.arcsin(np.clip(2 * (w * y - z * x), -1, 1))
    yaw = np.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return np.array([roll, pitch, yaw])


def rpy_to_quat(rpy):
    r, p, y = np.asarray(rpy, np.float64) / 2
    cr, sr, cp, sp, cy, sy = np.cos(r), np.sin(r), np.cos(p), np.sin(p), np.cos(y), np.sin(y)
    return np.array([
        sr * cp * cy - cr * sp * sy,
        cr * sp * cy + sr * cp * sy,
        cr * cp * sy - sr * sp * cy,
        cr * cp * cy + sr * sp * sy,
    ])


def integrate_q(quat, omega, dt):
    """Exponential-map quaternion update (reference BaseAviary.py:876-889)."""
    omega_norm = np.linalg.norm(omega)
    p, q, r = omega
    if np.isclose(omega_norm, 0):
        return quat
    lam = np.array([
        [0, r, -q, p],
        [-r, 0, p, q],
        [q, -p, 0, r],
        [-p, -q, -r, 0],
    ]) * 0.5
    theta = omega_norm * dt / 2
    return np.dot(np.eye(4) * np.cos(theta) + 2 / omega_norm * lam * np.sin(theta), quat)


def dyn_step(params, pos, quat, vel, rpy_rates, rpm, dt):
    """Single-drone explicit dynamics substep (reference BaseAviary.py:815-874).

    Returns (pos, quat, vel, rpy_rates, ang_v_world).
    """
    pos = np.asarray(pos, np.float64)
    quat = np.asarray(quat, np.float64)
    vel = np.asarray(vel, np.float64)
    rpy_rates = np.asarray(rpy_rates, np.float64)
    rpm = np.asarray(rpm, np.float64)

    J = np.diag([params.ixx, params.iyy, params.izz])
    J_INV = np.linalg.inv(J)
    rotation = quat_to_mat(quat)
    forces = rpm**2 * params.kf
    thrust = np.array([0, 0, np.sum(forces)])
    thrust_world = np.dot(rotation, thrust)
    force_world = thrust_world - np.array([0, 0, 9.8 * params.m])
    z_torques = rpm**2 * params.km
    if params.model.value == "racer":
        z_torques = -z_torques
    z_torque = -z_torques[0] + z_torques[1] - z_torques[2] + z_torques[3]
    if params.model.value in ("cf2x", "racer"):
        x_torque = (forces[0] + forces[1] - forces[2] - forces[3]) * (params.l / np.sqrt(2))
        y_torque = (-forces[0] + forces[1] + forces[2] - forces[3]) * (params.l / np.sqrt(2))
    else:
        x_torque = (forces[1] - forces[3]) * params.l
        y_torque = (-forces[0] + forces[2]) * params.l
    torques = np.array([x_torque, y_torque, z_torque])
    torques = torques - np.cross(rpy_rates, np.dot(J, rpy_rates))
    rpy_rates_deriv = np.dot(J_INV, torques)
    acc = force_world / params.m
    vel = vel + dt * acc
    rpy_rates = rpy_rates + dt * rpy_rates_deriv
    pos = pos + dt * vel
    quat = integrate_q(quat, rpy_rates, dt)
    ang_v = np.dot(rotation, rpy_rates)
    return pos, quat, vel, rpy_rates, ang_v


def ground_effect(params, rpm, pos, quat, rpy):
    """Per-prop ground-effect magnitudes (reference BaseAviary.py:715-750)."""
    rot = quat_to_mat(quat)
    offsets = np.asarray(params.prop_offsets, np.float64)
    heights = np.array([pos[2] + np.dot(rot, offsets[i])[2] for i in range(4)])
    heights = np.clip(heights, params.gnd_eff_h_clip, np.inf)
    gnd = rpm**2 * params.kf * params.gnd_eff_coeff * \
        (params.prop_radius / (4 * heights))**2
    if not (abs(rpy[0]) < np.pi / 2 and abs(rpy[1]) < np.pi / 2):
        gnd = np.zeros(4)
    return gnd


def drag_force(params, last_rpm, vel, quat):
    """World drag force (reference BaseAviary.py:754-781 + LINK_FRAME apply)."""
    rot = quat_to_mat(quat)
    coeff = np.array([params.drag_coeff_xy, params.drag_coeff_xy, params.drag_coeff_z])
    factors = -1 * coeff * np.sum(2 * np.pi * last_rpm / 60)
    body = np.dot(rot.T, factors * vel)
    return np.dot(rot, body)


def downwash_force(params, all_pos, n):
    """World downwash magnitude on drone n (reference BaseAviary.py:785-811)."""
    total = 0.0
    for i in range(all_pos.shape[0]):
        dz = all_pos[i, 2] - all_pos[n, 2]
        dxy = np.linalg.norm(all_pos[i, :2] - all_pos[n, :2])
        if dz > 0 and dxy < 10:
            alpha = params.dw_coeff_1 * (params.prop_radius / (4 * dz))**2
            beta = params.dw_coeff_2 * dz + params.dw_coeff_3
            total += alpha * np.exp(-0.5 * (dxy / beta)**2)
    return total


# ---------------------------------------------------------------------------
# DSL PID oracle (reference control/DSLPIDControl.py:37-259), scipy-based.
# ---------------------------------------------------------------------------
from scipy.spatial.transform import Rotation as _Rotation  # noqa: E402

MIXER_CF2X = np.array([[-.5, -.5, -1], [-.5, .5, 1], [.5, .5, -1], [.5, -.5, 1]])


def dsl_pid_init():
    return dict(last_rpy=np.zeros(3), integral_pos_e=np.zeros(3),
                integral_rpy_e=np.zeros(3))


def dsl_pid_step(params, ctl, dt, cur_pos, cur_quat, cur_vel, target_pos,
                 target_rpy=np.zeros(3), target_vel=np.zeros(3),
                 target_rpy_rates=np.zeros(3)):
    """One control tick; mutates and returns ctl. CF2X mixer."""
    g = 9.8 * params.m
    P_FOR, I_FOR, D_FOR = np.array([.4, .4, 1.25]), np.array([.05] * 3), np.array([.2, .2, .5])
    P_TOR, I_TOR, D_TOR = np.array([70000., 70000., 60000.]), np.array([0., 0., 500.]), np.array([20000., 20000., 12000.])
    cur_rotation = quat_to_mat(cur_quat)
    pos_e = target_pos - cur_pos
    vel_e = target_vel - cur_vel
    ctl["integral_pos_e"] = np.clip(ctl["integral_pos_e"] + pos_e * dt, -2., 2.)
    ctl["integral_pos_e"][2] = np.clip(ctl["integral_pos_e"][2], -0.15, .15)
    target_thrust = P_FOR * pos_e + I_FOR * ctl["integral_pos_e"] + \
        D_FOR * vel_e + np.array([0, 0, g])
    scalar_thrust = max(0., np.dot(target_thrust, cur_rotation[:, 2]))
    thrust = (np.sqrt(scalar_thrust / (4 * params.kf)) - 4070.3) / 0.2685
    target_z_ax = target_thrust / np.linalg.norm(target_thrust)
    target_x_c = np.array([np.cos(target_rpy[2]), np.sin(target_rpy[2]), 0])
    target_y_ax = np.cross(target_z_ax, target_x_c)
    target_y_ax = target_y_ax / np.linalg.norm(target_y_ax)
    target_x_ax = np.cross(target_y_ax, target_z_ax)
    target_rotation = np.vstack([target_x_ax, target_y_ax, target_z_ax]).T
    target_euler = _Rotation.from_matrix(target_rotation).as_euler('XYZ')

    cur_rpy = quat_to_rpy(cur_quat)
    tq = _Rotation.from_euler('XYZ', target_euler).as_quat()
    w, x, y, z = tq
    target_rot2 = _Rotation.from_quat([w, x, y, z]).as_matrix()
    rme = target_rot2.T @ cur_rotation - cur_rotation.T @ target_rot2
    rot_e = np.array([rme[2, 1], rme[0, 2], rme[1, 0]])
    rpy_rates_e = target_rpy_rates - (cur_rpy - ctl["last_rpy"]) / dt
    ctl["last_rpy"] = cur_rpy
    ctl["integral_rpy_e"] = np.clip(ctl["integral_rpy_e"] - rot_e * dt, -1500., 1500.)
    ctl["integral_rpy_e"][0:2] = np.clip(ctl["integral_rpy_e"][0:2], -1., 1.)
    tt = np.clip(-P_TOR * rot_e + D_TOR * rpy_rates_e + I_TOR * ctl["integral_rpy_e"], -3200, 3200)
    pwm = np.clip(thrust + MIXER_CF2X @ tt, 20000, 65535)
    return 0.2685 * pwm + 4070.3, ctl
