"""Pallas TPU kernel: fully-fused multi-drone control step, ALL physics modes.

ops/pallas_dyn.py and ops/pallas_pid.py flatten (env, drone) into lanes,
which is optimal when drones are independent (explicit DYN dynamics).  The
PYB-family modes couple drones within an env — downwash pairs
(reference BaseAviary.py:785-811) and Bullet-style drone-drone contact —
so this kernel uses the other natural TPU layout: **envs in lanes, drones
in rows**.  Every per-drone component is a (1, B) row; cross-drone terms
(downwash, pairwise collision pushout) are ordinary row arithmetic unrolled
over the static drone count.  One launch per control step runs:

    [optional cascaded DSL-PID per drone (pallas_pid._pid_tick)]
    -> n_substeps x [ per-drone forces (thrust/torques + ground effect +
                      rotor drag + downwash, per the Physics mode)
                     -> Bullet-like semi-implicit integration + ground
                        contact + static obstacles (ops/rigid_body.py)
                     -> pairwise drone-drone contact resolution ]

Semantics match envs/core._apply_physics_substep composed over the substep
loop, including the reference's stale-action drag (first substep of a
control step uses the PREVIOUS control step's rpm, BaseAviary.py:359,372)
and the aero formulas of ops/aero.py.  DYN mode is also supported (it
reuses pallas_dyn._dyn_substeps per drone) so one kernel covers every
(physics, action-family) combination.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gym_pybullet_drones_tpu.params import DroneParams
from gym_pybullet_drones_tpu.utils.enums import DroneModel, Physics
from gym_pybullet_drones_tpu.ops import pallas_dyn, pallas_pid
from gym_pybullet_drones_tpu.ops.rigid_body import (
    LINEAR_DAMPING, ANGULAR_DAMPING, GROUND_FRICTION)

LANE = 128
S_ROWS = 16   # pos3 quat4 vel3 rpy_rates3 ang_v3 per drone
PID_ROWS = 9
TGT_ROWS = 12

_GND_MODES = (Physics.PYB_GND, Physics.PYB_GND_DRAG_DW)
_DRAG_MODES = (Physics.PYB_DRAG, Physics.PYB_GND_DRAG_DW)
_DW_MODES = (Physics.PYB_DW, Physics.PYB_GND_DRAG_DW)


def _rot_rows(qx, qy, qz, qw):
    """Normalized rotation-matrix rows from quaternion rows (9-tuple)."""
    n2 = qx * qx + qy * qy + qz * qz + qw * qw
    inv = 1.0 / n2
    xx, yy, zz = qx * qx * inv, qy * qy * inv, qz * qz * inv
    xy, xz, yz = qx * qy * inv, qx * qz * inv, qy * qz * inv
    wx, wy, wz = qw * qx * inv, qw * qy * inv, qw * qz * inv
    return (1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy))


def _pyb_substep_all(params: DroneParams, physics: Physics, dt: float,
                     obstacles, drones, rpm, drag_rpm):
    """One coupled PYB substep for every drone of the env.

    drones: list of dicts with row lists p[3], q[4], v[3], w[3] (world
    ang-vel); rpm/drag_rpm: per-drone 4-row lists.  Mutates `drones`.
    Mirrors ops/rigid_body.pyb_step + ops/aero.* composed by
    envs/core._apply_physics_substep.
    """
    n = len(drones)
    kf, km = params.kf, params.km
    offs = params.prop_offsets                        # ((ox, oy, oz) x4)
    lin_damp = (1.0 - LINEAR_DAMPING) ** dt
    ang_damp = (1.0 - ANGULAR_DAMPING) ** dt
    tang = max(1.0 - GROUND_FRICTION * dt * 60.0, 0.0)

    # ---- pre-substep rotations (shared by force terms) ----
    rots = [_rot_rows(*d["q"]) for d in drones]

    # ---- forces/torques per drone from the PRE-substep state ----
    forces, torques = [], []
    for di, d in enumerate(drones):
        r = rots[di]
        f = [rr * rr * kf for rr in rpm[di]]          # per-motor thrusts
        thrust = f[0] + f[1] + f[2] + f[3]
        zt = [rr * rr * km for rr in rpm[di]]
        if params.model == DroneModel.RACE:
            zt = [-t for t in zt]
        z_torque = -zt[0] + zt[1] - zt[2] + zt[3]
        # tau_body = sum_i offset_i x [0, 0, f_i]  (+ z_torque about z)
        tau_bx = sum(offs[i][1] * f[i] for i in range(4))
        tau_by = sum(-offs[i][0] * f[i] for i in range(4))
        tau_bz = z_torque
        fx = r[2] * thrust
        fy = r[5] * thrust
        fz = r[8] * thrust
        tx = r[0] * tau_bx + r[1] * tau_by + r[2] * tau_bz
        ty = r[3] * tau_bx + r[4] * tau_by + r[5] * tau_bz
        tz = r[6] * tau_bx + r[7] * tau_by + r[8] * tau_bz

        if physics in _GND_MODES:
            # ops/aero.ground_effect: per-prop heights via analytic FK
            roll = pallas_pid._atan2(
                2.0 * (d["q"][3] * d["q"][0] + d["q"][1] * d["q"][2]),
                (d["q"][0] ** 2 + d["q"][1] ** 2 + d["q"][2] ** 2
                 + d["q"][3] ** 2) - 2.0 * (d["q"][0] ** 2 + d["q"][1] ** 2))
            n2q = (d["q"][0] ** 2 + d["q"][1] ** 2 + d["q"][2] ** 2
                   + d["q"][3] ** 2)
            pitch = pallas_pid._asin(jnp.clip(
                2.0 * (d["q"][3] * d["q"][1] - d["q"][2] * d["q"][0]) / n2q,
                -1.0, 1.0))
            upright = ((jnp.abs(roll) < math.pi / 2)
                       & (jnp.abs(pitch) < math.pi / 2))
            gate = jnp.where(upright, 1.0, 0.0)
            for i in range(4):
                ox, oy = offs[i][0], offs[i][1]
                wox = r[0] * ox + r[1] * oy
                woy = r[3] * ox + r[4] * oy
                woz = r[6] * ox + r[7] * oy
                h = jnp.maximum(d["p"][2] + woz, params.gnd_eff_h_clip)
                g = (f[i] * params.gnd_eff_coeff
                     * (params.prop_radius / (4.0 * h)) ** 2) * gate
                gx, gy, gz = g * r[2], g * r[5], g * r[8]
                fx, fy, fz = fx + gx, fy + gy, fz + gz
                # torque: world_off x world-frame prop force
                tx = tx + (woy * gz - woz * gy)
                ty = ty + (woz * gx - wox * gz)
                tz = tz + (wox * gy - woy * gx)

        if physics in _DRAG_MODES:
            # ops/aero.drag with the stale-action rpm of this substep
            omega = sum(drag_rpm[di]) * (2.0 * math.pi / 60.0)
            pre = [-params.drag_coeff[k] * omega * d["v"][k]
                   for k in range(3)]
            bx = r[0] * pre[0] + r[3] * pre[1] + r[6] * pre[2]   # R^T pre
            by = r[1] * pre[0] + r[4] * pre[1] + r[7] * pre[2]
            bz = r[2] * pre[0] + r[5] * pre[1] + r[8] * pre[2]
            fx = fx + r[0] * bx + r[1] * by + r[2] * bz          # R body
            fy = fy + r[3] * bx + r[4] * by + r[5] * bz
            fz = fz + r[6] * bx + r[7] * by + r[8] * bz

        if physics in _DW_MODES:
            # ops/aero.downwash: every drone i above receiver di
            total = None
            for si in range(n):
                if si == di:
                    continue
                src = drones[si]
                dz = src["p"][2] - d["p"][2]
                dx = src["p"][0] - d["p"][0]
                dy = src["p"][1] - d["p"][1]
                dxy = jnp.sqrt(dx * dx + dy * dy)
                mask = (dz > 0) & (dxy < 10.0)
                safe_dz = jnp.where(mask, dz, 1.0)
                alpha = params.dw_coeff_1 * \
                    (params.prop_radius / (4.0 * safe_dz)) ** 2
                beta = params.dw_coeff_2 * safe_dz + params.dw_coeff_3
                mag = alpha * jnp.exp(-0.5 * (dxy / beta) ** 2)
                mag = jnp.where(mask, mag, 0.0)
                total = mag if total is None else total + mag
            if total is not None:
                fx = fx - total * r[2]
                fy = fy - total * r[5]
                fz = fz - total * r[8]

        forces.append((fx, fy, fz))
        torques.append((tx, ty, tz))

    # ---- integrate every drone (ops/rigid_body.pyb_step) ----
    inv_m = 1.0 / params.m
    j_inv = (1.0 / params.ixx, 1.0 / params.iyy, 1.0 / params.izz)
    for di, d in enumerate(drones):
        r = rots[di]
        fx, fy, fz = forces[di]
        tx, ty, tz = torques[di]
        v = d["v"]
        v[0] = (v[0] + dt * fx * inv_m) * lin_damp
        v[1] = (v[1] + dt * fy * inv_m) * lin_damp
        v[2] = (v[2] + dt * (fz * inv_m - 9.8)) * lin_damp
        # I_w^-1 tau: R (J^-1 (R^T tau))
        tbx = r[0] * tx + r[3] * ty + r[6] * tz
        tby = r[1] * tx + r[4] * ty + r[7] * tz
        tbz = r[2] * tx + r[5] * ty + r[8] * tz
        dbx, dby, dbz = j_inv[0] * tbx, j_inv[1] * tby, j_inv[2] * tbz
        w = d["w"]
        w[0] = (w[0] + dt * (r[0] * dbx + r[1] * dby + r[2] * dbz)) * ang_damp
        w[1] = (w[1] + dt * (r[3] * dbx + r[4] * dby + r[5] * dbz)) * ang_damp
        w[2] = (w[2] + dt * (r[6] * dbx + r[7] * dby + r[8] * dbz)) * ang_damp
        p = d["p"]
        p[0] = p[0] + dt * v[0]
        p[1] = p[1] + dt * v[1]
        p[2] = p[2] + dt * v[2]
        # world-frame exponential-map quat update (left Hamilton product)
        norm = jnp.sqrt(w[0] ** 2 + w[1] ** 2 + w[2] ** 2)
        theta = norm * (dt / 2)
        c = jnp.cos(theta)
        safe = jnp.where(norm > 0, norm, 1.0)
        s = jnp.sin(theta) / safe
        ax, ay, az = s * w[0], s * w[1], s * w[2]   # sin(theta) * axis
        qx, qy, qz, qw = d["q"]
        nqx = c * qx + ax * qw + ay * qz - az * qy
        nqy = c * qy - ax * qz + ay * qw + az * qx
        nqz = c * qz + ax * qy - ay * qx + az * qw
        nqw = c * qw - ax * qx - ay * qy - az * qz
        keep = norm <= 1e-8
        d["q"][0] = jnp.where(keep, qx, nqx)
        d["q"][1] = jnp.where(keep, qy, nqy)
        d["q"][2] = jnp.where(keep, qz, nqz)
        d["q"][3] = jnp.where(keep, qw, nqw)
        # ground contact on the post-step pose
        nq = d["q"]
        n2q = nq[0] ** 2 + nq[1] ** 2 + nq[2] ** 2 + nq[3] ** 2
        r33 = jnp.clip(1.0 - 2.0 * (nq[0] ** 2 + nq[1] ** 2) / n2q,
                       -1.0, 1.0)
        sin_tilt = jnp.sqrt(jnp.maximum(1.0 - r33 * r33, 0.0))
        support = (params.collision_h / 2) * jnp.abs(r33) + \
            params.collision_r * sin_tilt
        bottom = p[2] - params.collision_z_offset - support
        pen = jnp.maximum(-bottom, 0.0)
        contact = pen > 0
        p[2] = p[2] + pen
        v[2] = jnp.where(contact, jnp.maximum(v[2], 0.0), v[2])
        scale = jnp.where(contact, tang, 1.0)
        v[0] = v[0] * scale
        v[1] = v[1] * scale
        w[0] = w[0] * scale
        w[1] = w[1] * scale
        w[2] = w[2] * scale
        # static obstacles (inelastic pushout): 4-tuple = sphere,
        # 6-tuple = axis-aligned box (ops/rigid_body.pyb_step semantics)
        for entry in obstacles:
            if len(entry) == 4:
                ox, oy, oz, orad = entry
                dx, dy, dz = p[0] - ox, p[1] - oy, p[2] - oz
                dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)
                min_d = orad + params.collision_r
                hit = dist < min_d
                inv_d = 1.0 / jnp.maximum(dist, 1e-6)
                nx, ny, nz = dx * inv_d, dy * inv_d, dz * inv_d
                p[0] = jnp.where(hit, ox + nx * min_d, p[0])
                p[1] = jnp.where(hit, oy + ny * min_d, p[1])
                p[2] = jnp.where(hit, oz + nz * min_d, p[2])
                vn = v[0] * nx + v[1] * ny + v[2] * nz
                rm = hit & (vn < 0)
                v[0] = jnp.where(rm, v[0] - vn * nx, v[0])
                v[1] = jnp.where(rm, v[1] - vn * ny, v[1])
                v[2] = jnp.where(rm, v[2] - vn * nz, v[2])
            else:
                ox, oy, oz, hx, hy, hz = entry
                br = params.collision_r
                rx, ry, rz = p[0] - ox, p[1] - oy, p[2] - oz
                cx = jnp.clip(rx, -hx, hx)
                cy = jnp.clip(ry, -hy, hy)
                cz = jnp.clip(rz, -hz, hz)
                dx, dy, dz = rx - cx, ry - cy, rz - cz
                dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)
                out_hit = (dist < br) & (dist > 1e-6)
                inv_d = 1.0 / jnp.maximum(dist, 1e-6)
                nox, noy, noz = dx * inv_d, dy * inv_d, dz * inv_d
                p[0] = jnp.where(out_hit, ox + cx + nox * br, p[0])
                p[1] = jnp.where(out_hit, oy + cy + noy * br, p[1])
                p[2] = jnp.where(out_hit, oz + cz + noz * br, p[2])
                # center inside the box: face push along least penetration
                inside = dist <= 1e-6
                px_ = hx + br - jnp.abs(rx)
                py_ = hy + br - jnp.abs(ry)
                pz_ = hz + br - jnp.abs(rz)
                isx = inside & (px_ <= py_) & (px_ <= pz_)
                isy = inside & ~isx & (py_ <= pz_)
                isz = inside & ~isx & ~isy
                sgx = jnp.where(rx >= 0, 1.0, -1.0)
                sgy = jnp.where(ry >= 0, 1.0, -1.0)
                sgz = jnp.where(rz >= 0, 1.0, -1.0)
                p[0] = jnp.where(isx, p[0] + sgx * px_, p[0])
                p[1] = jnp.where(isy, p[1] + sgy * py_, p[1])
                p[2] = jnp.where(isz, p[2] + sgz * pz_, p[2])
                nx = jnp.where(out_hit, nox, jnp.where(isx, sgx, 0.0))
                ny = jnp.where(out_hit, noy, jnp.where(isy, sgy, 0.0))
                nz = jnp.where(out_hit, noz, jnp.where(isz, sgz, 0.0))
                hit = out_hit | inside
                vn = v[0] * nx + v[1] * ny + v[2] * nz
                rm = hit & (vn < 0)
                v[0] = jnp.where(rm, v[0] - vn * nx, v[0])
                v[1] = jnp.where(rm, v[1] - vn * ny, v[1])
                v[2] = jnp.where(rm, v[2] - vn * nz, v[2])

    # ---- pairwise drone-drone contact (rigid_body.resolve_drone_collisions)
    if n > 1:
        min_d = 2.0 * params.collision_r
        for i in range(n):
            for j in range(i + 1, n):
                pi, pj = drones[i]["p"], drones[j]["p"]
                vi, vj = drones[i]["v"], drones[j]["v"]
                dx, dy, dz = pi[0] - pj[0], pi[1] - pj[1], pi[2] - pj[2]
                dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)
                hit = dist < min_d
                overlap = jnp.maximum(min_d - dist, 0.0)
                inv_d = 1.0 / jnp.maximum(dist, 1e-6)
                nx, ny, nz = dx * inv_d, dy * inv_d, dz * inv_d
                hpo = jnp.where(hit, 0.5 * overlap, 0.0)
                pi[0], pi[1], pi[2] = (pi[0] + hpo * nx, pi[1] + hpo * ny,
                                       pi[2] + hpo * nz)
                pj[0], pj[1], pj[2] = (pj[0] - hpo * nx, pj[1] - hpo * ny,
                                       pj[2] - hpo * nz)
                vn = ((vi[0] - vj[0]) * nx + (vi[1] - vj[1]) * ny
                      + (vi[2] - vj[2]) * nz)
                dv = jnp.where(hit & (vn < 0), -0.5 * vn, 0.0)
                vi[0], vi[1], vi[2] = (vi[0] + dv * nx, vi[1] + dv * ny,
                                       vi[2] + dv * nz)
                vj[0], vj[1], vj[2] = (vj[0] - dv * nx, vj[1] - dv * ny,
                                       vj[2] - dv * nz)


def _kernel(pid_params, dyn_params: DroneParams, physics: Physics,
            n_drones: int, n_substeps: int, pyb_dt: float, ctrl_dt: float,
            obstacles, emit_obs12: bool, *refs):
    use_pid = pid_params is not None
    drag = physics in _DRAG_MODES
    i = 0
    s_ref = refs[i]; i += 1
    act_ref = refs[i]; i += 1
    pid_ref = refs[i] if use_pid else None
    i += use_pid
    lr_ref = refs[i] if drag else None
    i += drag
    os_ref = refs[i]; i += 1
    orpm_ref = refs[i]; i += 1
    opid_ref = refs[i] if use_pid else None
    i += use_pid
    obs_ref = refs[i] if emit_obs12 else None

    n = n_drones
    state = [[s_ref[d * S_ROWS + k:d * S_ROWS + k + 1, :]
              for k in range(S_ROWS)] for d in range(n)]

    # ---- controller tick (optional) ----
    rpm, new_pid = [], []
    for d in range(n):
        if use_pid:
            tgt = [act_ref[d * TGT_ROWS + k:d * TGT_ROWS + k + 1, :]
                   for k in range(TGT_ROWS)]
            pid = [pid_ref[d * PID_ROWS + k:d * PID_ROWS + k + 1, :]
                   for k in range(PID_ROWS)]
            r, np_ = pallas_pid._pid_tick(pid_params, ctrl_dt,
                                          state[d], pid, tgt)
            rpm.append(r)
            new_pid.append(np_)
        else:
            rpm.append([act_ref[d * 4 + k:d * 4 + k + 1, :]
                        for k in range(4)])

    # ---- physics ----
    if physics == Physics.DYN:
        final = []
        for d in range(n):
            thrust, xt, yt, zt = pallas_dyn._motor_mix(dyn_params, *rpm[d])
            final.append(tuple(pallas_dyn._dyn_substeps(
                dyn_params, n_substeps, pyb_dt, tuple(state[d][:13]),
                thrust, xt, yt, zt)))
    else:
        drones = [{"p": list(state[d][0:3]), "q": list(state[d][3:7]),
                   "v": list(state[d][7:10]), "w": list(state[d][13:16])}
                  for d in range(n)]
        if drag:
            last = [[lr_ref[d * 4 + k:d * 4 + k + 1, :] for k in range(4)]
                    for d in range(n)]
        for step_i in range(n_substeps):
            # stale-action drag: substep 0 uses the previous control
            # step's rpm (reference BaseAviary.py:359,372)
            drag_rpm = (last if (drag and step_i == 0) else rpm)
            _pyb_substep_all(dyn_params, physics, pyb_dt, obstacles,
                             drones, rpm, drag_rpm)
        final = [tuple(drones[d]["p"] + drones[d]["q"] + drones[d]["v"]
                       + list(state[d][10:13]) + drones[d]["w"])
                 for d in range(n)]
    for d in range(n):
        for k, row in enumerate(final[d]):
            os_ref[d * S_ROWS + k:d * S_ROWS + k + 1, :] = row
        if emit_obs12:
            from gym_pybullet_drones_tpu.ops import pallas_math
            roll, pitch, yaw = pallas_math.quat_rpy_rows(*final[d][3:7])
            rows12 = (final[d][0:3] + (roll, pitch, yaw)
                      + final[d][7:10] + final[d][13:16])
            for k, row in enumerate(rows12):
                obs_ref[d * 12 + k:d * 12 + k + 1, :] = row

    for d in range(n):
        for k in range(4):
            orpm_ref[d * 4 + k:d * 4 + k + 1, :] = rpm[d][k]
        if use_pid:
            for k, row in enumerate(new_pid[d]):
                opid_ref[d * PID_ROWS + k:d * PID_ROWS + k + 1, :] = row


def _to_rows(x, b, n, k):
    """(B*N, k) -> (N*k, B) drone-major rows."""
    return x.reshape(b, n * k).T


def _from_rows(rows, b, n, k):
    return rows.T.reshape(b * n, k)


@functools.partial(jax.jit,
                   static_argnums=(0, 1, 2, 3, 4, 5, 6, 7, 12))
def env_ctrl_step(pid_params, dyn_params: DroneParams, physics: Physics,
                  n_drones: int, n_substeps: int, pyb_dt: float,
                  ctrl_dt: float, obstacles: tuple, state, ctrl_state,
                  action_rows, last_rpm, emit_obs12: bool = False):
    """Fused control step over (B env-lanes) x (N drone-rows).

    state: NamedTuple with pos/quat/vel/rpy_rates/ang_v leaves of shape
    (B*N, k), drone-major; ctrl_state: dsl_pid.PIDState (B*N, 3) leaves
    (pass None when pid_params is None); action_rows: (B*N, 12) PID
    targets when pid_params is set, else (B*N, 4) rpm; last_rpm: (B*N, 4)
    (consumed by the drag modes).  Returns (state', ctrl_state', rpm)
    plus the in-kernel (B*N, 12) kinematic obs block when emit_obs12.
    """
    use_pid = pid_params is not None
    n = n_drones
    bn = state.pos.shape[0]
    b = bn // n
    dtype = state.pos.dtype

    flat16 = jnp.concatenate(
        [state.pos, state.quat, state.vel, state.rpy_rates, state.ang_v],
        axis=-1)                                        # (B*N, 16)
    s_rows = _to_rows(flat16, b, n, S_ROWS)             # (N*16, B)
    inputs = [s_rows]
    in_rows = [n * S_ROWS]
    if use_pid:
        act_rows = _to_rows(action_rows, b, n, TGT_ROWS)
        pid_flat = jnp.concatenate(
            [ctrl_state.last_rpy, ctrl_state.integral_pos_e,
             ctrl_state.integral_rpy_e], axis=-1)
        inputs += [act_rows, _to_rows(pid_flat, b, n, PID_ROWS)]
        in_rows += [n * TGT_ROWS, n * PID_ROWS]
    else:
        inputs.append(_to_rows(action_rows, b, n, 4))
        in_rows.append(n * 4)
    if physics in _DRAG_MODES:
        inputs.append(_to_rows(last_rpm, b, n, 4))
        in_rows.append(n * 4)

    pad = (-b) % LANE
    if pad:
        inputs = [jnp.pad(x, ((0, 0), (0, pad))) for x in inputs]
    bp = b + pad
    out_rows = [n * S_ROWS, n * 4] + ([n * PID_ROWS] if use_pid else []) \
        + ([n * 12] if emit_obs12 else [])
    # block size: keep the block's VMEM footprint under ~6 MB
    total_rows = sum(in_rows) + sum(out_rows)
    block = min(bp, 2048)
    while block > LANE and total_rows * block * 4 > 6 * 2 ** 20:
        block //= 2
    if bp % block:
        block = LANE
    interpret = jax.default_backend() != "tpu"

    outs = pl.pallas_call(
        functools.partial(_kernel, pid_params, dyn_params, physics,
                          n, n_substeps, pyb_dt, ctrl_dt, obstacles,
                          emit_obs12),
        interpret=interpret,
        out_shape=[jax.ShapeDtypeStruct((r, bp), dtype) for r in out_rows],
        grid=(bp // block,),
        in_specs=[pl.BlockSpec((r, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM) for r in in_rows],
        out_specs=[pl.BlockSpec((r, block), lambda i: (0, i),
                                memory_space=pltpu.VMEM) for r in out_rows],
    )(*inputs)
    if pad:
        outs = [o[:, :b] for o in outs]
    o_state = _from_rows(outs[0], b, n, S_ROWS)
    new_state = state._replace(
        pos=o_state[:, 0:3], quat=o_state[:, 3:7], vel=o_state[:, 7:10],
        rpy_rates=o_state[:, 10:13], ang_v=o_state[:, 13:16])
    rpm = _from_rows(outs[1], b, n, 4)
    new_ctrl = ctrl_state
    if use_pid:
        p = _from_rows(outs[2], b, n, PID_ROWS)
        new_ctrl = ctrl_state._replace(
            last_rpy=p[:, 0:3], integral_pos_e=p[:, 3:6],
            integral_rpy_e=p[:, 6:9])
    if emit_obs12:
        return new_state, new_ctrl, rpm, _from_rows(outs[-1], b, n, 12)
    return new_state, new_ctrl, rpm
