"""Functional environment core: config, state, reset/step.

TPU-first redesign of the reference's template-method engine
(/root/reference/gym_pybullet_drones/envs/BaseAviary.py): instead of a
stateful gym.Env whose step() loops Python over substeps and drones issuing
PyBullet C-API calls (reference BaseAviary.py:343-372), an environment here is
a pure function over a pytree state:

    step(cfg, task, state, action) -> (state, obs, reward, term, trunc, info)

- the substep x drone nest becomes a lax.scan over substeps of batched
  kernels (drone axis vectorized, env axis vmap-ed by callers),
- subclass hooks (_preprocessAction/_computeObs/_computeReward/... declared
  at reference BaseAviary.py:1018-1101) become methods of a static, hashable
  Task dataclass resolved at trace time,
- controller objects embedded per drone (reference BaseRLAviary.py:73-78)
  become PIDState carried inside EnvState.

Stepping semantics parity (reference BaseAviary.py:339-383):
- preprocess action once per control step,
- PYB_STEPS_PER_CTRL = pyb_freq // ctrl_freq physics substeps,
- `last_rpm` updated at the END of each substep, so the drag model's first
  substep uses the previous control step's rpm (reference :359,372),
- obs/reward/terminated/truncated computed once per control step,
- step_counter advances by PYB_STEPS_PER_CTRL.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.params import DroneParams
from gym_pybullet_drones_tpu.utils.enums import Physics
from gym_pybullet_drones_tpu.ops import aero, quat as quat_ops
from gym_pybullet_drones_tpu.ops.dynamics import DynState, dyn_step
from gym_pybullet_drones_tpu.ops.rigid_body import (
    PybState, pyb_step, resolve_drone_collisions)
from gym_pybullet_drones_tpu.control import dsl_pid


class EnvState(NamedTuple):
    """Full simulation state for one environment (N = num_drones).

    Callers add leading batch dims via vmap; all kernels broadcast.
    """

    pos: jnp.ndarray            # (N, 3)
    quat: jnp.ndarray           # (N, 4) xyzw
    vel: jnp.ndarray            # (N, 3)
    rpy_rates: jnp.ndarray      # (N, 3)  body rates carry (DYN mode)
    ang_v: jnp.ndarray          # (N, 3)  world angular velocity
    last_rpm: jnp.ndarray       # (N, 4)  last applied clipped rpm
    action_buffer: jnp.ndarray  # (N, BUF, A) action history, oldest first
                                # (drone-major so the obs concat needs no
                                # transpose; the reference's deque is
                                # time-major, BaseRLAviary.py:66-67)
    ctrl_state: dsl_pid.PIDState  # embedded-PID carry (zeros when unused)
    step_counter: jnp.ndarray   # () int32, counts PYB substeps
    rng: jnp.ndarray            # (2,) uint32 legacy PRNG key (randomized
                                # resets; inert when tasks use no noise)


@dataclasses.dataclass(frozen=True)
class AviaryConfig:
    """Static environment configuration (hashable; closed over by jit).

    Mirrors the reference constructor surface (BaseAviary.py:25-40) minus the
    GUI/recording options, which are host-side concerns of the adapter layer.
    """

    drone: DroneParams
    num_drones: int = 1
    physics: Physics = Physics.PYB
    pyb_freq: int = 240
    ctrl_freq: int = 240
    neighbourhood_radius: float = float("inf")
    # initial poses as nested tuples (hashable); None -> reference default grid
    init_xyzs: tuple | None = None
    init_rpys: tuple | None = None
    # static obstacles: (x, y, z, radius) = sphere, (x, y, z, hx, hy, hz) =
    # axis-aligned box (center + half extents).  Collision in the PYB-family
    # modes (the reference's obstacle bodies, BaseAviary:955-978, approximated
    # by their bounding primitives)
    obstacles: tuple = ()
    # PGS contact-solver sweep count (PYB-family modes).  4 (default) is
    # converged for single-island contacts and matches the fused Pallas
    # kernels; PyBullet's numSolverIterations default is 50 — set 50 for a
    # fully-converged Bullet-default solve on the XLA path (the measured
    # 4-vs-50 truncation is ~mm-scale over 2 s, see PARITY.md; the fast
    # path falls back to XLA when this differs from the kernel's 4).
    solver_iterations: int = 4

    def __post_init__(self):
        if self.pyb_freq % self.ctrl_freq != 0:
            raise ValueError("pyb_freq must be divisible by ctrl_freq")

    @property
    def steps_per_ctrl(self) -> int:
        return self.pyb_freq // self.ctrl_freq

    @property
    def pyb_dt(self) -> float:
        return 1.0 / self.pyb_freq

    @property
    def ctrl_dt(self) -> float:
        return 1.0 / self.ctrl_freq

    def default_init_xyzs(self, dtype=jnp.float32) -> jnp.ndarray:
        """Reference default spawn grid (BaseAviary.py:194-197).

        Computed natively in `dtype` (not computed in f32 then cast) so the
        float64 parity harness sees the reference's exact double values.
        """
        if self.init_xyzs is not None:
            return jnp.asarray(self.init_xyzs, dtype)
        d = self.drone
        i = jnp.arange(self.num_drones, dtype=dtype)
        return jnp.stack(
            [i * 4 * d.l, i * 4 * d.l,
             jnp.full_like(i, d.init_z)], axis=-1)

    def default_init_rpys(self, dtype=jnp.float32) -> jnp.ndarray:
        if self.init_rpys is not None:
            return jnp.asarray(self.init_rpys, dtype)
        return jnp.zeros((self.num_drones, 3), dtype)


def state_vector(state: EnvState) -> jnp.ndarray:
    """(N, 20) per-drone state [pos, quat, rpy, vel, ang_v, last_rpm].

    Layout parity: reference BaseAviary._getDroneStateVector (:541-561).
    """
    rpy = quat_ops.quat_to_rpy(state.quat)
    return jnp.concatenate(
        [state.pos, state.quat, rpy, state.vel, state.ang_v, state.last_rpm],
        axis=-1)


def adjacency_matrix(cfg: AviaryConfig, state: EnvState) -> jnp.ndarray:
    """(N, N) 0/1 adjacency by neighbourhood radius.

    Parity: reference BaseAviary._getAdjacencyMatrix (:658-675), vectorized.
    """
    diff = state.pos[:, None, :] - state.pos[None, :, :]
    dist = jnp.linalg.norm(diff, axis=-1)
    adj = (dist < cfg.neighbourhood_radius) | jnp.eye(
        cfg.num_drones, dtype=bool)
    return adj.astype(state.pos.dtype)


def normalized_action_to_rpm(cfg: AviaryConfig,
                             action: jnp.ndarray) -> jnp.ndarray:
    """De-normalize [-1, 1] actions to [0, MAX_RPM] rpm.

    Parity: reference BaseAviary._normalizedActionToRPM (:893-911) — the
    piecewise-linear map -1 -> 0, 0 -> HOVER_RPM, 1 -> MAX_RPM.  (The
    reference prints a warning on out-of-range input; here inputs are
    clipped, the jit-compatible equivalent.)
    """
    action = jnp.clip(action, -1.0, 1.0)
    d = cfg.drone
    return jnp.where(action <= 0, (action + 1) * d.hover_rpm,
                     d.hover_rpm + (d.max_rpm - d.hover_rpm) * action)


def next_waypoint(current_position: jnp.ndarray, destination: jnp.ndarray,
                  step_size: float = 1.0) -> jnp.ndarray:
    """Routing-fork waypoint stepper: move step_size toward destination.

    Parity: reference BaseAviary._calculateNextStep (:1105-1147) — returns the
    destination itself once within step_size, else a unit step toward it.
    Batched over leading dims (the reference is scalar per call).
    """
    direction = destination - current_position
    distance = jnp.linalg.norm(direction, axis=-1, keepdims=True)
    safe = jnp.where(distance > 0, distance, 1.0)
    stepped = current_position + direction / safe * step_size
    return jnp.where(distance <= step_size, destination, stepped)


def _apply_physics_substep(cfg: AviaryConfig, state: EnvState,
                           rpm: jnp.ndarray) -> EnvState:
    """One physics substep in the configured mode (reference :349-372)."""
    d = cfg.drone
    dt = cfg.pyb_dt
    mode = cfg.physics
    if mode == Physics.DYN:
        dyn = DynState(pos=state.pos, quat=state.quat, vel=state.vel,
                       rpy_rates=state.rpy_rates, ang_v=state.ang_v)
        out = dyn_step(d, dyn, rpm, dt)
        return state._replace(pos=out.pos, quat=out.quat, vel=out.vel,
                              rpy_rates=out.rpy_rates, ang_v=out.ang_v,
                              last_rpm=rpm)

    # PYB family: compose aero effects as external force/torque about CoM.
    rot = quat_ops.quat_to_mat(state.quat)
    ext_f = jnp.zeros_like(state.pos)
    ext_t = jnp.zeros_like(state.pos)
    if mode in (Physics.PYB_GND, Physics.PYB_GND_DRAG_DW):
        rpy = quat_ops.quat_to_rpy(state.quat)
        f, t = aero.ground_effect(d, rpm, state.pos, rot, rpy)
        ext_f, ext_t = ext_f + f, ext_t + t
    if mode in (Physics.PYB_DRAG, Physics.PYB_GND_DRAG_DW):
        # stale-action semantics: previous substep's rpm (reference :359)
        f, t = aero.drag(d, state.last_rpm, state.vel, rot)
        ext_f, ext_t = ext_f + f, ext_t + t
    if mode in (Physics.PYB_DW, Physics.PYB_GND_DRAG_DW):
        f, t = aero.downwash(d, state.pos, rot)
        ext_f, ext_t = ext_f + f, ext_t + t

    pyb = PybState(pos=state.pos, quat=state.quat, vel=state.vel,
                   ang_v=state.ang_v)
    out = pyb_step(d, pyb, rpm, dt, ext_force=ext_f, ext_torque=ext_t,
                   obstacles=cfg.obstacles,
                   solver_iterations=cfg.solver_iterations)
    pos, vel, ang_v = out.pos, out.vel, out.ang_v
    if cfg.num_drones > 1:
        # Bullet resolves drone-drone contact in all PYB* modes (every
        # drone lives in one world, reference BaseAviary.py:484-491); DYN
        # mode has no contact in the reference either (state is reset, not
        # stepped, :862-872).  Cylinder-manifold contact with angular
        # response (normal lever arms + Coulomb friction torque).
        pos, vel, ang_v = resolve_drone_collisions(
            d, pos, vel, dt, quat=out.quat, ang_v=ang_v)
    return state._replace(pos=pos, quat=out.quat, vel=vel,
                          ang_v=ang_v, last_rpm=rpm)


def reset(cfg: AviaryConfig, task, key: jax.Array | None = None,
          dtype=jnp.float32):
    """Initial (state, obs, info).

    Deterministic by default like the reference (its reset() ignores the
    seed, BaseAviary.py:243).  Pass `key` (legacy uint32 PRNGKey) to enable
    a task's `randomize_reset` hook (a superset feature — RLTask exposes
    pos/rpy/vel noise fields); the carried per-env key also drives
    randomized auto-resets inside jitted rollouts.
    """
    n = cfg.num_drones
    xyz = cfg.default_init_xyzs(dtype)
    rpy = cfg.default_init_rpys(dtype)
    quat = quat_ops.rpy_to_quat(rpy)
    buf_size, act_dim = task.action_buffer_shape(cfg)
    if key is None:
        key = jax.random.PRNGKey(0)
    key, sub = jax.random.split(key)
    state = EnvState(
        pos=xyz,
        quat=quat,
        vel=jnp.zeros((n, 3), dtype),
        rpy_rates=jnp.zeros((n, 3), dtype),
        ang_v=jnp.zeros((n, 3), dtype),
        last_rpm=jnp.zeros((n, 4), dtype),
        action_buffer=jnp.zeros((n, buf_size, act_dim), dtype),
        ctrl_state=dsl_pid.init_state((n,), dtype),
        step_counter=jnp.zeros((), jnp.int32),
        rng=key,
    )
    if hasattr(task, "randomize_reset"):
        state = task.randomize_reset(cfg, state, sub)
    obs = task.compute_obs(cfg, state)
    return state, obs, {}


def step(cfg: AviaryConfig, task, state: EnvState, action: jnp.ndarray,
         rpm_override: jnp.ndarray | None = None):
    """One control step: (state, obs, reward, terminated, truncated, info).

    Control-flow parity with reference BaseAviary.step (:259-383); the
    substep loop is a lax.scan compiled into the single fused program.

    `rpm_override` (N, 4), when given, bypasses the task's action
    preprocessing and applies the raw clipped RPMs directly — the
    reference's GUI-slider input path (`USE_GUI_RPM`, BaseAviary.py:324-341
    skips `_preprocessAction` and tiles the slider values).
    """
    if rpm_override is not None:
        rpm = jnp.asarray(rpm_override, state.pos.dtype)
    else:
        action = jnp.asarray(action, state.pos.dtype)  # guard dtype promotion
        rpm, state = task.preprocess_action(cfg, state, action)

    # Substep loop: statically unrolled for small repeat counts so XLA fuses
    # the whole control step into one kernel region (a lax.scan lowers to an
    # XLA While whose per-iteration barrier blocks fusion and costs far more
    # than the physics itself at these tensor sizes); scan for larger ratios
    # where the traced code size would blow up.  PYB-family substeps carry
    # the PGS contact solve, so their unroll budget is much smaller (the
    # TPU throughput path for PYB runs in the fused Pallas kernel anyway —
    # this XLA path is the parity/flexibility surface where compile time
    # matters more than the last few percent of fusion).
    unroll_budget = 16 if cfg.physics == Physics.DYN else 2
    if cfg.steps_per_ctrl <= unroll_budget:
        for _ in range(cfg.steps_per_ctrl):
            state = _apply_physics_substep(cfg, state, rpm)
    else:
        state, _ = jax.lax.scan(
            lambda s, _: (_apply_physics_substep(cfg, s, rpm), None),
            state, None, length=cfg.steps_per_ctrl)
    # Hooks see the PRE-increment step counter: the reference advances
    # step_counter only after obs/reward/terminated/truncated
    # (BaseAviary.py:376-382), so a task's time-based truncation counts the
    # substeps of *previous* control steps only.
    obs = task.compute_obs(cfg, state)
    reward = task.compute_reward(cfg, state)
    terminated = task.compute_terminated(cfg, state)
    truncated = task.compute_truncated(cfg, state)
    state = state._replace(
        step_counter=state.step_counter + cfg.steps_per_ctrl)
    return state, obs, reward, terminated, truncated, {}


def step_autoreset(cfg: AviaryConfig, task, state: EnvState,
                   action: jnp.ndarray, dtype=jnp.float32):
    """step() + masked auto-reset on done, for batched RL rollouts.

    Equivalent of SB3's VecEnv auto-reset (SURVEY.md §3.2); done envs return
    the terminal reward/flags but the carried state is re-initialized.  The
    post-reset obs is returned (Gymnasium VecEnv convention).
    """
    next_state, obs, reward, term, trunc, info = step(cfg, task, state, action)
    done = jnp.logical_or(term, trunc)  # scalar for one env; vmap maps it
    # re-reset with the env's carried key so randomized tasks re-randomize
    init_state, init_obs, _ = reset(cfg, task, key=next_state.rng,
                                    dtype=dtype)
    new_state = jax.tree.map(lambda i, n: jnp.where(done, i, n),
                             init_state, next_state)
    # advance the carried rng either way so episodes stay decorrelated
    new_state = new_state._replace(rng=init_state.rng)
    new_obs = jnp.where(done, init_obs, obs)
    return new_state, new_obs, reward, term, trunc, info
