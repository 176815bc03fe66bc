"""Pallas TPU kernel: fused DSL-PID tick + DYN control step.

The embedded-PID action paths (ActionType.PID/VEL/ONE_D_PID — reference
BaseRLAviary.py:193-223 — and the routing task built on them) spend their
step time in the ~60 small XLA ops of the cascaded PID
(control/dsl_pid.compute_control), not in the physics.  This kernel runs
the WHOLE control step — position PID, attitude PID, motor mixing, and all
physics substeps — as one Pallas program with every intermediate in vector
registers, in the same component-per-row / env-per-lane layout as
ops/pallas_dyn.py.

Mosaic has no atan/asin/atan2 lowering (probed on v5e), so the Euler-angle
extractions (quat_to_rpy, mat_to_euler_xyz — ops/quat.py) use an in-kernel
Cephes-style polynomial atan (max error ~2 ulp f32) with standard quadrant
fixups; parity vs the XLA path is asserted to 1e-4 in tests/test_pallas.py.

Reference parity notes:
- PID gains/constants and the CF2X/CF2P mixers are the module constants of
  control/dsl_pid.py (reference DSLPIDControl.py:37-60).
- The controller params (`pid_params`) are passed separately from the
  dynamics params: embedded controllers are ALWAYS CF2X (reference
  BaseRLAviary.py:76, QUIRKS.md #2).
- The target rotation R(target_euler) is built directly (the reference's
  euler->quat->matrix round-trip is a no-op permutation, see
  control/dsl_pid.py module docstring).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gym_pybullet_drones_tpu.params import DroneParams, G
from gym_pybullet_drones_tpu.utils.enums import DroneModel
from gym_pybullet_drones_tpu.control import dsl_pid as C
from gym_pybullet_drones_tpu.ops import pallas_dyn
from gym_pybullet_drones_tpu.ops.pallas_math import (
    atan as _atan, atan2 as _atan2, asin as _asin)

LANE = 128


# ---- the PID tick over row vectors (shared with ops/pallas_env.py) ----

def _pid_tick(pid_params: DroneParams, ctrl_dt: float, state_rows,
              pid_rows, tgt_rows):
    """One cascaded-PID tick on (1, B) row vectors.

    state_rows: 10+ rows (px..pz, qx..qw, vx..vz); pid_rows: 9 rows
    (last_rpy, integral_pos_e, integral_rpy_e); tgt_rows: 12 rows
    (target pos/rpy/vel/rpy_rates).  Returns (4 rpm rows, 9 new pid rows).
    """
    px, py, pz = state_rows[0:3]
    qx, qy, qz, qw = state_rows[3:7]
    vx, vy, vz = state_rows[7:10]
    lr_r, lr_p, lr_y = pid_rows[0:3]      # last_rpy
    ip_x, ip_y, ip_z = pid_rows[3:6]      # integral pos error
    ir_x, ir_y, ir_z = pid_rows[6:9]      # integral rpy error
    tp = tgt_rows[0:3]                    # target_pos
    trpy = tgt_rows[3:6]                  # target_rpy
    tv = tgt_rows[6:9]                    # target_vel
    trr = tgt_rows[9:12]                  # target_rpy_rates

    # current rotation matrix from the (normalization-invariant) quat
    n2 = qx * qx + qy * qy + qz * qz + qw * qw
    inv_n2 = 1.0 / n2
    xx, yy, zz = qx * qx * inv_n2, qy * qy * inv_n2, qz * qz * inv_n2
    xy, xz, yz = qx * qy * inv_n2, qx * qz * inv_n2, qy * qz * inv_n2
    wxq, wyq, wzq = qw * qx * inv_n2, qw * qy * inv_n2, qw * qz * inv_n2
    c00, c01, c02 = 1 - 2 * (yy + zz), 2 * (xy - wzq), 2 * (xz + wyq)
    c10, c11, c12 = 2 * (xy + wzq), 1 - 2 * (xx + zz), 2 * (yz - wxq)
    c20, c21, c22 = 2 * (xz - wyq), 2 * (yz + wxq), 1 - 2 * (xx + yy)

    # ---- position loop (control/dsl_pid.py, reference :149-208) ----
    pe = [tp[0] - px, tp[1] - py, tp[2] - pz]
    ve = [tv[0] - vx, tv[1] - vy, tv[2] - vz]
    ip_x = jnp.clip(ip_x + pe[0] * ctrl_dt, -2.0, 2.0)
    ip_y = jnp.clip(ip_y + pe[1] * ctrl_dt, -2.0, 2.0)
    ip_z = jnp.clip(jnp.clip(ip_z + pe[2] * ctrl_dt, -2.0, 2.0),
                    -0.15, 0.15)
    gravity = G * pid_params.m
    tt = [C.P_FOR[i] * pe[i] + C.I_FOR[i] * (ip_x, ip_y, ip_z)[i]
          + C.D_FOR[i] * ve[i] for i in range(3)]
    tt[2] = tt[2] + gravity
    scalar_thrust = jnp.maximum(
        0.0, tt[0] * c02 + tt[1] * c12 + tt[2] * c22)
    thrust_pwm = (jnp.sqrt(scalar_thrust / (4.0 * pid_params.kf))
                  - C.PWM2RPM_CONST) / C.PWM2RPM_SCALE
    tt_norm = jnp.sqrt(tt[0] * tt[0] + tt[1] * tt[1] + tt[2] * tt[2])
    zax = [t / tt_norm for t in tt]
    cyaw, syaw = jnp.cos(trpy[2]), jnp.sin(trpy[2])
    # y_ax = normalize(z_ax x x_c), x_c = [cos yaw, sin yaw, 0]
    zxc = [-zax[2] * syaw, zax[2] * cyaw, zax[0] * syaw - zax[1] * cyaw]
    zxc_n = jnp.sqrt(zxc[0] * zxc[0] + zxc[1] * zxc[1] + zxc[2] * zxc[2])
    yax = [v / zxc_n for v in zxc]
    xax = [yax[1] * zax[2] - yax[2] * zax[1],
           yax[2] * zax[0] - yax[0] * zax[2],
           yax[0] * zax[1] - yax[1] * zax[0]]
    # target rotation columns are (x_ax, y_ax, z_ax); intrinsic-XYZ Euler
    # (ops/quat.mat_to_euler_xyz): b = asin(m02), a = atan2(-m12, m22),
    # c = atan2(-m01, m00)
    ea = _atan2(-zax[1], zax[2])
    eb = _asin(zax[0])
    ec = _atan2(-yax[0], xax[0])

    # ---- attitude loop (reference :212-259) ----
    # cur_rpy (ops/quat.quat_to_rpy; atan2 is scale-invariant so the
    # un-normalized quadratic terms can be used directly)
    cr = _atan2(2.0 * (qw * qx + qy * qz), n2 - 2.0 * (qx * qx + qy * qy))
    cp = _asin(jnp.clip(2.0 * (qw * qy - qz * qx) * inv_n2, -1.0, 1.0))
    cy_ = _atan2(2.0 * (qw * qz + qx * qy), n2 - 2.0 * (qy * qy + qz * qz))
    # R(target_euler) = Rx(ea) @ Ry(eb) @ Rz(ec)
    ca, sa = jnp.cos(ea), jnp.sin(ea)
    cb, sb = jnp.cos(eb), jnp.sin(eb)
    cc, sc = jnp.cos(ec), jnp.sin(ec)
    t00, t01, t02 = cb * cc, -cb * sc, sb
    t10, t11, t12 = ca * sc + sa * sb * cc, ca * cc - sa * sb * sc, -sa * cb
    t20, t21, t22 = sa * sc - ca * sb * cc, sa * cc + ca * sb * sc, ca * cb
    # rot_matrix_e = Rt^T Rc - Rc^T Rt = E - E^T with E = Rt^T Rc
    e21 = t02 * c01 + t12 * c11 + t22 * c21
    e12 = t01 * c02 + t11 * c12 + t21 * c22
    e02 = t00 * c02 + t10 * c12 + t20 * c22
    e20 = t02 * c00 + t12 * c10 + t22 * c20
    e10 = t01 * c00 + t11 * c10 + t21 * c20
    e01 = t00 * c01 + t10 * c11 + t20 * c21
    rot_e = [e21 - e12, e02 - e20, e10 - e01]
    rre = [trr[0] - (cr - lr_r) / ctrl_dt,
           trr[1] - (cp - lr_p) / ctrl_dt,
           trr[2] - (cy_ - lr_y) / ctrl_dt]
    ir_x = jnp.clip(jnp.clip(ir_x - rot_e[0] * ctrl_dt, -1500.0, 1500.0),
                    -1.0, 1.0)
    ir_y = jnp.clip(jnp.clip(ir_y - rot_e[1] * ctrl_dt, -1500.0, 1500.0),
                    -1.0, 1.0)
    ir_z = jnp.clip(ir_z - rot_e[2] * ctrl_dt, -1500.0, 1500.0)
    ir = (ir_x, ir_y, ir_z)
    tq = [jnp.clip(-C.P_TOR[i] * rot_e[i] + C.D_TOR[i] * rre[i]
                   + C.I_TOR[i] * ir[i], -3200.0, 3200.0)
          for i in range(3)]
    mixer = (C.MIXER_CF2P if pid_params.model == DroneModel.CF2P
             else C.MIXER_CF2X)
    rpm_rows = []
    for m in mixer:
        pwm = thrust_pwm + m[0] * tq[0] + m[1] * tq[1] + m[2] * tq[2]
        pwm = jnp.clip(pwm, C.MIN_PWM, C.MAX_PWM)
        rpm_rows.append(C.PWM2RPM_SCALE * pwm + C.PWM2RPM_CONST)
    return rpm_rows, (cr, cp, cy_, ip_x, ip_y, ip_z, ir_x, ir_y, ir_z)


# ---- the fused kernel ----

def _kernel(pid_params: DroneParams, dyn_params: DroneParams,
            n_substeps: int, pyb_dt: float, ctrl_dt: float,
            emit_obs12: bool, s_ref, pid_ref, tgt_ref, os_ref, opid_ref,
            orpm_ref, *obs_ref):
    state_rows = tuple(s_ref[i:i + 1, :] for i in range(13))
    pid_rows = tuple(pid_ref[i:i + 1, :] for i in range(9))
    tgt_rows = tuple(tgt_ref[i:i + 1, :] for i in range(12))
    rpm_rows, new_pid = _pid_tick(pid_params, ctrl_dt, state_rows,
                                  pid_rows, tgt_rows)
    # ---- physics substeps (shared with ops/pallas_dyn.py) ----
    thrust, x_t, y_t, z_t = pallas_dyn._motor_mix(dyn_params, *rpm_rows)
    out = pallas_dyn._dyn_substeps(dyn_params, n_substeps, pyb_dt,
                                   state_rows, thrust, x_t, y_t, z_t)
    for i, row in enumerate(out):
        os_ref[i:i + 1, :] = row
    for i, row in enumerate(new_pid):
        opid_ref[i:i + 1, :] = row
    for i, row in enumerate(rpm_rows):
        orpm_ref[i:i + 1, :] = row
    if emit_obs12:
        from gym_pybullet_drones_tpu.ops import pallas_math
        roll, pitch, yaw = pallas_math.quat_rpy_rows(*out[3:7])
        rows12 = out[0:3] + (roll, pitch, yaw) + out[7:10] + out[13:16]
        for i, row in enumerate(rows12):
            obs_ref[0][i:i + 1, :] = row


@functools.partial(jax.jit, static_argnums=(0, 1, 4, 5, 6, 11))
def pid_dyn_ctrl_step(pid_params: DroneParams, dyn_params: DroneParams,
                      state, pid_state, n_substeps: int, pyb_dt: float,
                      ctrl_dt: float, target_pos, target_rpy, target_vel,
                      target_rpy_rates, emit_obs12: bool = False):
    """Fused DSL-PID tick + n DYN substeps in one Pallas launch.

    state: NamedTuple with pos/quat/vel/rpy_rates/ang_v of shape (B, k)
    (flattened env*drone batch); pid_state: dsl_pid.PIDState with (B, 3)
    leaves; targets: (B, 3) each.  Returns (state', pid_state', rpm (B, 4))
    plus the in-kernel (B, 12) kinematic obs block when emit_obs12.
    """
    b = state.pos.shape[0]
    pad = (-b) % LANE
    packed = pallas_dyn._pack(state)                   # (16, B)
    pid_packed = jnp.concatenate(
        [pid_state.last_rpy, pid_state.integral_pos_e,
         pid_state.integral_rpy_e], axis=-1).T          # (9, B)
    tgt_packed = jnp.concatenate(
        [target_pos, target_rpy, target_vel, target_rpy_rates], axis=-1).T
    if pad:
        packed = jnp.pad(packed, ((0, 0), (0, pad)))
        pid_packed = jnp.pad(pid_packed, ((0, 0), (0, pad)))
        # quat rows of the padding are all-zero -> 1/n2 = inf; harmless
        # (lanes are discarded) but keep targets finite to avoid slow NaNs
        tgt_packed = jnp.pad(tgt_packed, ((0, 0), (0, pad)))
    bp = b + pad
    block = min(bp, 2048)
    if bp % block:
        block = LANE
    interpret = jax.default_backend() != "tpu"
    dtype = packed.dtype
    out_rows = [16, 9, 4] + ([12] if emit_obs12 else [])
    outs = pl.pallas_call(
        functools.partial(_kernel, pid_params, dyn_params, n_substeps,
                          pyb_dt, ctrl_dt, emit_obs12),
        interpret=interpret,
        out_shape=[jax.ShapeDtypeStruct((r, bp), dtype) for r in out_rows],
        grid=(bp // block,),
        in_specs=[
            pl.BlockSpec((16, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((r, block), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
                   for r in out_rows],
    )(packed, pid_packed, tgt_packed)
    if pad:
        outs = [o[:, :b] for o in outs]
    o_state, o_pid, o_rpm = outs[:3]
    new_state = pallas_dyn._unpack(o_state, state)
    pid_flat = o_pid.T
    new_pid = pid_state._replace(
        last_rpy=pid_flat[:, 0:3], integral_pos_e=pid_flat[:, 3:6],
        integral_rpy_e=pid_flat[:, 6:9])
    if emit_obs12:
        return new_state, new_pid, o_rpm.T, outs[3].T
    return new_state, new_pid, o_rpm.T
