"""Pallas TPU kernel: a fully-fused DYN control step (N substeps in VMEM).

The XLA-compiled explicit-dynamics path (ops/dynamics.py) lowers each
substep to several small VPU kernels over (B, 3)/(B, 4) tensors whose
128-wide lane dimension is almost entirely padding; kernel-launch and
layout overhead dominate at simulation state sizes.  This kernel removes
both: state is packed **component-per-sublane-row, env-per-lane** as a
(16, B) block, and all `n_substeps` substeps of one control step execute
inside a single Pallas program with every intermediate held in vector
registers / VMEM — one launch per control step, full lane utilization.

Row layout (16, B):
    0..2  pos xyz      3..6  quat xyzw      7..9  vel xyz
   10..12 body rpy-rates xyz               13..15 world ang_v xyz

Semantics match ops/dynamics.dyn_step (reference BaseAviary.py:815-889)
including the stale-rotation ang_v store and the zero-omega quat branch,
at float32 precision (the float64 parity path stays on the XLA kernels).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gym_pybullet_drones_tpu.params import DroneParams
from gym_pybullet_drones_tpu.utils.enums import DroneModel

LANE = 128


def _motor_mix(params: DroneParams, r0, r1, r2, r3):
    """Per-motor rpm rows -> (total thrust, x/y/z torques) rows.

    Same arithmetic as ops/dynamics.motor_forces_torques + the DYN torque
    composition (reference BaseAviary.py:838-852).
    """
    kf, km = params.kf, params.km
    f0, f1, f2, f3 = (r * r * kf for r in (r0, r1, r2, r3))
    thrust = f0 + f1 + f2 + f3
    # Torques via factored squared-rpm differences, exactly as the f32 branch
    # of ops/dynamics.motor_forces_torques: (a-b)*(a+b) cancels exactly for
    # bitwise-equal rpms regardless of FMA contraction, so symmetric hovers
    # stay symmetric (the naive sum-of-thrusts form leaves ~1e-10 residuals
    # that the 7e4 attitude gains amplify ~6x per control step).
    dsq = lambda a, b: (a - b) * (a + b)
    km_s = -km if params.model == DroneModel.RACE else km
    z_torque = (dsq(r1, r0) + dsq(r3, r2)) * km_s
    if params.model == DroneModel.CF2P:
        x_torque = dsq(r1, r3) * (kf * params.l)
        y_torque = dsq(r2, r0) * (kf * params.l)
    else:
        karm = kf * params.l / math.sqrt(2)
        x_torque = (dsq(r0, r2) + dsq(r1, r3)) * karm
        y_torque = (dsq(r1, r0) + dsq(r2, r3)) * karm
    return thrust, x_torque, y_torque, z_torque


def _dyn_substeps(params: DroneParams, n_substeps: int, dt: float,
                  state_rows, thrust, x_torque, y_torque, z_torque):
    """Run n explicit-dynamics substeps on (1, B) row vectors.

    state_rows = (px..pz, qx..qw, vx..vz, wx..wz) (13 rows); returns the 13
    updated rows plus the stored world ang-vel rows (avx, avy, avz).
    Semantics: ops/dynamics.dyn_step (reference BaseAviary.py:815-889).
    """
    (px, py, pz, qx, qy, qz, qw, vx, vy, vz, wx, wy, wz) = state_rows
    jx, jy, jz = params.ixx, params.iyy, params.izz
    inv_jx, inv_jy, inv_jz = 1.0 / jx, 1.0 / jy, 1.0 / jz
    inv_m = 1.0 / params.m
    gm = 9.8 * params.m

    avx = avy = avz = None
    for _ in range(n_substeps):
        # rotation matrix from (normalized) quaternion
        n2 = qx * qx + qy * qy + qz * qz + qw * qw
        inv_n2 = 1.0 / n2
        xx, yy, zz = qx * qx * inv_n2, qy * qy * inv_n2, qz * qz * inv_n2
        xy, xz, yz = qx * qy * inv_n2, qx * qz * inv_n2, qy * qz * inv_n2
        wxq, wyq, wzq = qw * qx * inv_n2, qw * qy * inv_n2, qw * qz * inv_n2
        r00, r01, r02 = 1 - 2 * (yy + zz), 2 * (xy - wzq), 2 * (xz + wyq)
        r10, r11, r12 = 2 * (xy + wzq), 1 - 2 * (xx + zz), 2 * (yz - wxq)
        r20, r21, r22 = 2 * (xz - wyq), 2 * (yz + wxq), 1 - 2 * (xx + yy)

        fx = r02 * thrust
        fy = r12 * thrust
        fz = r22 * thrust - gm
        # tau -= w x (J w)
        tau_x = x_torque - (wy * (jz * wz) - wz * (jy * wy))
        tau_y = y_torque - (wz * (jx * wx) - wx * (jz * wz))
        tau_z = z_torque - (wx * (jy * wy) - wy * (jx * wx))

        vx = vx + dt * fx * inv_m
        vy = vy + dt * fy * inv_m
        vz = vz + dt * fz * inv_m
        wx = wx + dt * tau_x * inv_jx
        wy = wy + dt * tau_y * inv_jy
        wz = wz + dt * tau_z * inv_jz
        px = px + dt * vx
        py = py + dt * vy
        pz = pz + dt * vz

        # exact exponential-map quat update (body rates)
        norm = jnp.sqrt(wx * wx + wy * wy + wz * wz)
        theta = norm * (dt / 2)
        c = jnp.cos(theta)
        safe = jnp.where(norm > 0, norm, 1.0)
        s = jnp.sin(theta) / safe
        nqx = c * qx + s * (wz * qy - wy * qz + wx * qw)
        nqy = c * qy + s * (-wz * qx + wx * qz + wy * qw)
        nqz = c * qz + s * (wy * qx - wx * qy + wz * qw)
        nqw = c * qw + s * (-wx * qx - wy * qy - wz * qz)
        keep = norm <= 1e-8
        qx = jnp.where(keep, qx, nqx)
        qy = jnp.where(keep, qy, nqy)
        qz = jnp.where(keep, qz, nqz)
        qw = jnp.where(keep, qw, nqw)

        # stored world angular velocity: PRE-step rotation, post-step rates
        avx = r00 * wx + r01 * wy + r02 * wz
        avy = r10 * wx + r11 * wy + r12 * wz
        avz = r20 * wx + r21 * wy + r22 * wz

    return (px, py, pz, qx, qy, qz, qw, vx, vy, vz, wx, wy, wz,
            avx, avy, avz)


def _kernel(params: DroneParams, n_substeps: int, dt: float,
            emit_obs12: bool, s_ref, rpm_ref, o_ref, *obs_ref):
    # load rows as (1, B) vectors
    state_rows = tuple(s_ref[i:i + 1, :] for i in range(13))
    r0, r1, r2, r3 = (rpm_ref[i:i + 1, :] for i in range(4))
    thrust, x_t, y_t, z_t = _motor_mix(params, r0, r1, r2, r3)
    out = _dyn_substeps(params, n_substeps, dt, state_rows,
                        thrust, x_t, y_t, z_t)
    for i, row in enumerate(out):
        o_ref[i:i + 1, :] = row
    if emit_obs12:
        # the 12-dim kinematic observation block of the RL tasks
        # (pos, rpy, vel, world ang-vel — envs/tasks.RLTask.flat_post),
        # with the Euler extraction fused in-kernel (pallas_math)
        from gym_pybullet_drones_tpu.ops import pallas_math
        roll, pitch, yaw = pallas_math.quat_rpy_rows(*out[3:7])
        rows12 = out[0:3] + (roll, pitch, yaw) + out[7:10] + out[13:16]
        for i, row in enumerate(rows12):
            obs_ref[0][i:i + 1, :] = row


def _pack(state):
    """EnvState-like pieces (B, k) -> (16, B) packed rows."""
    flat = jnp.concatenate(
        [state.pos, state.quat, state.vel, state.rpy_rates, state.ang_v],
        axis=-1)                                      # (B, 16)
    return flat.T                                     # (16, B)


def _unpack(packed, state):
    flat = packed.T
    return state._replace(
        pos=flat[:, 0:3], quat=flat[:, 3:7], vel=flat[:, 7:10],
        rpy_rates=flat[:, 10:13], ang_v=flat[:, 13:16])


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 5))
def dyn_ctrl_step(params: DroneParams, state, n_substeps: int, dt: float,
                  rpm, emit_obs12: bool = False):
    """Run n_substeps DYN substeps fused in one Pallas launch.

    state: any NamedTuple with pos/quat/vel/rpy_rates/ang_v of shape (B, k)
    (flattened env*drone batch); rpm: (B, 4).  Returns the updated state,
    or (state, obs12 (B, 12)) when emit_obs12 — the RL tasks' kinematic
    observation block computed in-kernel (saves the XLA-side Euler
    extraction and concat in the hot loop).
    """
    b = state.pos.shape[0]
    pad = (-b) % LANE
    packed = _pack(state)                             # (16, B)
    rpm_t = rpm.T                                     # (4, B)
    if pad:
        packed = jnp.pad(packed, ((0, 0), (0, pad)))
        rpm_t = jnp.pad(rpm_t, ((0, 0), (0, pad)))
    bp = b + pad
    block = min(bp, 2048)
    if bp % block:
        block = LANE
    out_shape = [jax.ShapeDtypeStruct((16, bp), packed.dtype)]
    out_specs = [pl.BlockSpec((16, block), lambda i: (0, i),
                              memory_space=pltpu.VMEM)]
    if emit_obs12:
        out_shape.append(jax.ShapeDtypeStruct((12, bp), packed.dtype))
        out_specs.append(pl.BlockSpec((12, block), lambda i: (0, i),
                                      memory_space=pltpu.VMEM))
    # off-TPU backends (tests) run the kernel in interpreter mode
    interpret = jax.default_backend() != "tpu"
    outs = pl.pallas_call(
        functools.partial(_kernel, params, n_substeps, dt, emit_obs12),
        interpret=interpret,
        out_shape=out_shape,
        grid=(bp // block,),
        in_specs=[
            pl.BlockSpec((16, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
    )(packed, rpm_t)
    if not emit_obs12:
        out = outs[0]
        if pad:
            out = out[:, :b]
        return _unpack(out, state)
    out, obs12 = outs
    if pad:
        out = out[:, :b]
        obs12 = obs12[:, :b]
    return _unpack(out, state), obs12.T
