"""Pallas TPU kernel: fully-fused multi-drone control step, ALL physics modes.

ops/pallas_dyn.py and ops/pallas_pid.py flatten (env, drone) into lanes,
which is optimal when drones are independent (explicit DYN dynamics).  The
PYB-family modes couple drones within an env — downwash pairs
(reference BaseAviary.py:785-811) and Bullet-style drone-drone contact —
so this kernel uses the other natural TPU layout: **envs in lanes, drones
in rows**.  Every per-drone component is a (1, B) row; cross-drone terms
(downwash, pairwise collision impulses) are ordinary row arithmetic unrolled
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
    LINEAR_DAMPING, ANGULAR_DAMPING, GROUND_FRICTION, CONTACT_ERP,
    SOLVER_ITERATIONS, CONTACT_SLOP)

LANE = 128
S_ROWS = 16   # pos3 quat4 vel3 rpy_rates3 ang_v3 per drone
PID_ROWS = 9
TGT_ROWS = 12

_GND_MODES = (Physics.PYB_GND, Physics.PYB_GND_DRAG_DW)
_DRAG_MODES = (Physics.PYB_DRAG, Physics.PYB_GND_DRAG_DW)
_DW_MODES = (Physics.PYB_DW, Physics.PYB_GND_DRAG_DW)


def _mv(r, v):
    """Rotation-rows 9-tuple @ 3-tuple."""
    return (r[0] * v[0] + r[1] * v[1] + r[2] * v[2],
            r[3] * v[0] + r[4] * v[1] + r[5] * v[2],
            r[6] * v[0] + r[7] * v[1] + r[8] * v[2])


def _mtv(r, v):
    """Transposed rotation-rows @ 3-tuple (world -> body)."""
    return (r[0] * v[0] + r[3] * v[1] + r[6] * v[2],
            r[1] * v[0] + r[4] * v[1] + r[7] * v[2],
            r[2] * v[0] + r[5] * v[1] + r[8] * v[2])


def _cr(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _iinv_w(r, j_inv, v):
    """World inverse inertia: R (J^-1 (R^T v)) on 3-tuples of rows."""
    b = _mtv(r, v)
    return _mv(r, (j_inv[0] * b[0], j_inv[1] * b[1], j_inv[2] * b[2]))


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

    # ---- pre-substep rotations (shared by force terms) ----
    rots = [_rot_rows(*d["q"]) for d in drones]

    # ---- forces/torques per drone from the PRE-substep state ----
    forces, torques = [], []
    for di, d in enumerate(drones):
        r = rots[di]
        f = [rr * rr * kf for rr in rpm[di]]          # per-motor thrusts
        thrust = f[0] + f[1] + f[2] + f[3]
        # z-torque via factored squared-rpm differences (exact cancellation
        # for equal rpms under FMA contraction — see pallas_dyn._motor_mix)
        r0, r1, r2, r3 = rpm[di]
        km_s = -km if params.model == DroneModel.RACE else km
        z_torque = (((r1 - r0) * (r1 + r0)) + ((r3 - r2) * (r3 + r2))) * km_s
        # tau_body = sum_i offset_i x [0, 0, f_i]  (+ z_torque about z),
        # with paired factored differences for exact symmetric cancellation
        # (ops/rigid_body._paired_prop_torque)
        from gym_pybullet_drones_tpu.ops.rigid_body import _prop_coef_pairs

        def tau_axis(coefs):
            pairs, left = _prop_coef_pairs(coefs)
            out = 0.0
            for i, j, c in pairs:
                ri, rj = rpm[di][i], rpm[di][j]
                out = out + ((ri - rj) * (ri + rj)) * (c * kf)
            for i in left:
                out = out + (rpm[di][i] * rpm[di][i]) * (coefs[i] * kf)
            return out
        tau_bx = tau_axis([offs[i][1] for i in range(4)])
        tau_by = tau_axis([-offs[i][0] for i in range(4)])
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
    j_diag = (params.ixx, params.iyy, params.izz)
    j_inv = (1.0 / params.ixx, 1.0 / params.iyy, 1.0 / params.izz)
    mu = GROUND_FRICTION
    beta = CONTACT_ERP / dt
    inv_dt = 1.0 / dt
    rc, h2 = params.collision_r, params.collision_h / 2
    zoff = params.collision_z_offset
    for di, d in enumerate(drones):
        r = rots[di]
        fx, fy, fz = forces[di]
        tx, ty, tz = torques[di]
        v = d["v"]
        v[0] = (v[0] + dt * fx * inv_m) * lin_damp
        v[1] = (v[1] + dt * fy * inv_m) * lin_damp
        v[2] = (v[2] + dt * (fz * inv_m - 9.8)) * lin_damp
        # body torque with the gyroscopic bias (rigid_body.pyb_step):
        # dw_b = J^-1 (R^T tau - w_b x (J w_b))
        w = d["w"]
        tb = _mtv(r, (tx, ty, tz))
        wb = _mtv(r, (w[0], w[1], w[2]))
        gy = _cr(wb, (j_diag[0] * wb[0], j_diag[1] * wb[1],
                      j_diag[2] * wb[2]))
        db = (j_inv[0] * (tb[0] - gy[0]), j_inv[1] * (tb[1] - gy[1]),
              j_inv[2] * (tb[2] - gy[2]))
        dw = _mv(r, db)
        w[0] = (w[0] + dt * dw[0]) * ang_damp
        w[1] = (w[1] + dt * dw[1]) * ang_damp
        w[2] = (w[2] + dt * dw[2]) * ang_damp

        # ---- contact solve on the PRE-substep pose (rigid_body PGS) ----
        p = d["p"]
        arms, pens = [], []
        for cx, cy in ((rc, 0.0), (0.0, rc), (-rc, 0.0), (0.0, -rc)):
            arm = _mv(r, (cx, cy, zoff - h2))
            arms.append(arm)
            pens.append(-(p[2] + arm[2]))
        zero = jnp.zeros_like(p[2])
        nvec = (zero, zero, zero + 1.0)
        t1v = (zero + 1.0, zero, zero)
        t2v = (zero, zero + 1.0, zero)
        kn, kt1, kt2 = [], [], []
        for arm in arms:
            rxn = _cr(arm, nvec)
            kn.append(inv_m + _dot3(_cr(_iinv_w(r, j_inv, rxn), arm), nvec))
            rxt = _cr(arm, t1v)
            kt1.append(inv_m + _dot3(_cr(_iinv_w(r, j_inv, rxt), arm), t1v))
            rxt = _cr(arm, t2v)
            kt2.append(inv_m + _dot3(_cr(_iinv_w(r, j_inv, rxt), arm), t2v))
        acc_n = [zero] * 4
        acc_t1 = [zero] * 4
        acc_t2 = [zero] * 4
        # static obstacles as centered bounding-sphere contacts: list of
        # (normal rows, depth row); 4-tuple = sphere, 6-tuple = AA box
        extras = []
        for entry in obstacles:
            if len(entry) == 4:
                ox, oy, oz, orad = entry
                dx, dy, dz = p[0] - ox, p[1] - oy, p[2] - oz
                dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)
                inv_d = 1.0 / jnp.maximum(dist, 1e-6)
                extras.append(((dx * inv_d, dy * inv_d, dz * inv_d),
                               orad + rc - dist))
            else:
                ox, oy, oz, hx, hy, hz = entry
                rx, ry, rz = p[0] - ox, p[1] - oy, p[2] - oz
                cx = jnp.clip(rx, -hx, hx)
                cy = jnp.clip(ry, -hy, hy)
                cz = jnp.clip(rz, -hz, hz)
                dx, dy, dz = rx - cx, ry - cy, rz - cz
                dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)
                outside = dist > 1e-6
                inv_d = 1.0 / jnp.maximum(dist, 1e-6)
                px_ = hx + rc - jnp.abs(rx)
                py_ = hy + rc - jnp.abs(ry)
                pz_ = hz + rc - jnp.abs(rz)
                isx = (px_ <= py_) & (px_ <= pz_)
                isy = ~isx & (py_ <= pz_)
                isz = ~isx & ~isy
                sgx = jnp.where(rx >= 0, 1.0, -1.0)
                sgy = jnp.where(ry >= 0, 1.0, -1.0)
                sgz = jnp.where(rz >= 0, 1.0, -1.0)
                nx = jnp.where(outside, dx * inv_d,
                               jnp.where(isx, sgx, 0.0))
                ny = jnp.where(outside, dy * inv_d,
                               jnp.where(isy, sgy, 0.0))
                nz = jnp.where(outside, dz * inv_d,
                               jnp.where(isz, sgz, 0.0))
                pen_in = jnp.minimum(jnp.minimum(px_, py_), pz_)
                depth = jnp.where(outside, rc - dist, pen_in)
                extras.append(((nx, ny, nz), depth))
        extra_acc = [zero] * len(extras)
        extra_t = [zero] * len(extras)
        for _ in range(SOLVER_ITERATIONS):
            for ki in range(4):
                arm = arms[ki]
                a = jnp.where(pens[ki] > -CONTACT_SLOP, 1.0, 0.0)
                # normal impulse (accumulated, clamped >= 0); speculative
                # target: Baumgarte push-out when penetrating, closing
                # limit depth/dt when separated within the slop window
                wxr = _cr((w[0], w[1], w[2]), arm)
                vn = v[2] + wxr[2]
                tgt = jnp.where(pens[ki] > 0, beta * pens[ki],
                                inv_dt * pens[ki])
                dj = (tgt - vn) / kn[ki]
                new_acc = jnp.maximum(acc_n[ki] + dj, 0.0) * a
                dj = new_acc - acc_n[ki]
                acc_n[ki] = new_acc
                v[2] = v[2] + inv_m * dj
                dwv = _iinv_w(r, j_inv, _cr(arm, (zero, zero, dj)))
                w[0], w[1], w[2] = w[0] + dwv[0], w[1] + dwv[1], w[2] + dwv[2]
                lim = mu * acc_n[ki]
                # tangential impulses (Coulomb cone on accumulated normal)
                for tdir, kt, acc_t in ((0, kt1, acc_t1), (1, kt2, acc_t2)):
                    wxr = _cr((w[0], w[1], w[2]), arm)
                    vt = v[tdir] + wxr[tdir]
                    dj = -vt / kt[ki]
                    new_acc = jnp.clip(acc_t[ki] + dj, -lim, lim) * a
                    dj = new_acc - acc_t[ki]
                    acc_t[ki] = new_acc
                    v[tdir] = v[tdir] + inv_m * dj
                    imp = (dj, zero, zero) if tdir == 0 else (zero, dj, zero)
                    dwv = _iinv_w(r, j_inv, _cr(arm, imp))
                    w[0], w[1], w[2] = (w[0] + dwv[0], w[1] + dwv[1],
                                        w[2] + dwv[2])
            for ei, (en, depth) in enumerate(extras):
                a = jnp.where(depth > -CONTACT_SLOP, 1.0, 0.0)
                vn = v[0] * en[0] + v[1] * en[1] + v[2] * en[2]
                tgt = jnp.where(depth > 0, beta * depth, inv_dt * depth)
                dj = (tgt - vn) * params.m
                new_acc = jnp.maximum(extra_acc[ei] + dj, 0.0) * a
                dj = new_acc - extra_acc[ei]
                extra_acc[ei] = new_acc
                v[0] = v[0] + dj * inv_m * en[0]
                v[1] = v[1] + dj * inv_m * en[1]
                v[2] = v[2] + dj * inv_m * en[2]
                # linear Coulomb friction; ACCUMULATED tangential impulse
                # clamped to the cone mu*acc_n (matches ops/rigid_body.py)
                vn2 = v[0] * en[0] + v[1] * en[1] + v[2] * en[2]
                vtx = v[0] - vn2 * en[0]
                vty = v[1] - vn2 * en[1]
                vtz = v[2] - vn2 * en[2]
                vt_norm = jnp.sqrt(vtx * vtx + vty * vty + vtz * vtz)
                j_stop = vt_norm * params.m
                new_t = jnp.minimum(extra_t[ei] + j_stop,
                                    mu * new_acc) * a
                dj_t = jnp.maximum(new_t - extra_t[ei], 0.0)
                extra_t[ei] = new_t
                lim_v = dj_t * inv_m
                scale = jnp.where(
                    vt_norm > 1e-9,
                    jnp.maximum(vt_norm - lim_v, 0.0)
                    / jnp.maximum(vt_norm, 1e-9), 1.0)
                scale = jnp.where(a > 0, scale, 1.0)
                v[0] = vtx * scale + (v[0] - vtx)
                v[1] = vty * scale + (v[1] - vty)
                v[2] = vtz * scale + (v[2] - vtz)

        # ---- position integration with the corrected velocities ----
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

    # ---- pairwise drone-drone contact (rigid_body.resolve_drone_collisions):
    # cylinder-manifold contact with full angular response on post-step
    # poses — contact point is the midpoint of the two cylinder-clamped
    # closest points toward the pair midpoint; normal impulse (Baumgarte /
    # speculative target) + Coulomb friction, both with lever-arm torque
    if n > 1:
        min_d = 2.0 * params.collision_r
        post_rots = [_rot_rows(*d["q"]) for d in drones]
        snap = [([row for row in d["p"]], [row for row in d["v"]],
                 [row for row in d["w"]]) for d in drones]

        def _cyl_clamp(p_, r_, mx, my, mz):
            # world point clamped into this body's collision cylinder
            u = _mtv(r_, (mx - p_[0], my - p_[1], mz - p_[2]))
            ur = jnp.sqrt(u[0] * u[0] + u[1] * u[1])
            s = jnp.minimum(1.0, rc / jnp.maximum(ur, 1e-9))
            wq = _mv(r_, (u[0] * s, u[1] * s,
                          jnp.clip(u[2], zoff - h2, zoff + h2)))
            return (p_[0] + wq[0], p_[1] + wq[1], p_[2] + wq[2])

        # each unordered pair computed ONCE: the ordered-pair quantities are
        # exactly antisymmetric in IEEE float (diff, rel, vt negate exactly;
        # dist, vn, keff, j_n, j_t are even in the sign), so applying -imp
        # to body j is bitwise identical to recomputing the (j, i) pair —
        # this halves the pair cost that dominates multi-drone PYB kernels
        acc_v = [[None, None, None] for _ in range(n)]
        acc_w = [[None, None, None] for _ in range(n)]

        def _acc(slot, vals):
            for k in range(3):
                slot[k] = vals[k] if slot[k] is None else slot[k] + vals[k]

        for i in range(n):
            pi, vi, wi = snap[i]
            ri_ = post_rots[i]
            for j in range(i + 1, n):
                pj, vj, wj = snap[j]
                rj_ = post_rots[j]
                dx, dy, dz = pi[0] - pj[0], pi[1] - pj[1], pi[2] - pj[2]
                dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)
                depth = min_d - dist
                hitm = jnp.where((depth > -CONTACT_SLOP) & (dist > 1e-6),
                                 1.0, 0.0)
                inv_d = 1.0 / jnp.maximum(dist, 1e-6)
                nv = (dx * inv_d, dy * inv_d, dz * inv_d)
                mx = 0.5 * (pi[0] + pj[0])
                my = 0.5 * (pi[1] + pj[1])
                mz = 0.5 * (pi[2] + pj[2])
                si = _cyl_clamp(pi, ri_, mx, my, mz)
                sj = _cyl_clamp(pj, rj_, mx, my, mz)
                r_i = (0.5 * (si[0] + sj[0]) - pi[0],
                       0.5 * (si[1] + sj[1]) - pi[1],
                       0.5 * (si[2] + sj[2]) - pi[2])
                r_j = (0.5 * (si[0] + sj[0]) - pj[0],
                       0.5 * (si[1] + sj[1]) - pj[1],
                       0.5 * (si[2] + sj[2]) - pj[2])
                wxr_i = _cr((wi[0], wi[1], wi[2]), r_i)
                wxr_j = _cr((wj[0], wj[1], wj[2]), r_j)
                rel = (vi[0] + wxr_i[0] - vj[0] - wxr_j[0],
                       vi[1] + wxr_i[1] - vj[1] - wxr_j[1],
                       vi[2] + wxr_i[2] - vj[2] - wxr_j[2])
                vn = _dot3(rel, nv)
                tgt = jnp.where(depth > 0, beta * depth, inv_dt * depth)

                def keff(dvec):
                    t_i = _dot3(_cr(_iinv_w(ri_, j_inv, _cr(r_i, dvec)),
                                    r_i), dvec)
                    t_j = _dot3(_cr(_iinv_w(rj_, j_inv, _cr(r_j, dvec)),
                                    r_j), dvec)
                    return 2.0 * inv_m + t_i + t_j

                j_n = jnp.maximum(tgt - vn, 0.0) / keff(nv) * hitm
                vtv = (rel[0] - vn * nv[0], rel[1] - vn * nv[1],
                       rel[2] - vn * nv[2])
                vt_n = jnp.sqrt(_dot3(vtv, vtv))
                inv_vt = 1.0 / jnp.maximum(vt_n, 1e-9)
                tv = (vtv[0] * inv_vt, vtv[1] * inv_vt, vtv[2] * inv_vt)
                j_t = jnp.minimum(vt_n / keff(tv), mu * j_n) * hitm
                imp = (j_n * nv[0] - j_t * tv[0],
                       j_n * nv[1] - j_t * tv[1],
                       j_n * nv[2] - j_t * tv[2])
                imp_n = (-imp[0], -imp[1], -imp[2])
                _acc(acc_v[i], imp)
                _acc(acc_w[i], _iinv_w(ri_, j_inv, _cr(r_i, imp)))
                _acc(acc_v[j], imp_n)
                _acc(acc_w[j], _iinv_w(rj_, j_inv, _cr(r_j, imp_n)))
        for i in range(n):
            if acc_v[i][0] is None:
                continue
            vi_live = drones[i]["v"]
            vi_live[0] = vi_live[0] + inv_m * acc_v[i][0]
            vi_live[1] = vi_live[1] + inv_m * acc_v[i][1]
            vi_live[2] = vi_live[2] + inv_m * acc_v[i][2]
            wi_live = drones[i]["w"]
            wi_live[0] = wi_live[0] + acc_w[i][0]
            wi_live[1] = wi_live[1] + acc_w[i][1]
            wi_live[2] = wi_live[2] + acc_w[i][2]


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
