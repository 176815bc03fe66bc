"""Gymnasium-compatible class adapters over the functional core.

Drop-in counterparts of the reference aviaries (same constructor surface,
reference envs/BaseAviary.py:25-40 and subclasses) for users of the
single-env gym.Env workflow; the jitted functional core does the work, and
numpy conversion happens only at this boundary.  Batched/sharded training
should use `BatchedEnv` or the functional API directly.
"""
from __future__ import annotations

import math
import time

import numpy as np
import jax
import jax.numpy as jnp
import gymnasium as gym
from gymnasium import spaces

from gym_pybullet_drones_tpu.params import get_params
from gym_pybullet_drones_tpu.utils.enums import (
    ActionType, DroneModel, ObservationType, Physics)
from gym_pybullet_drones_tpu.envs import core, tasks


class FunctionalAviary(gym.Env):
    """gym.Env wrapper around (cfg, task) with jit-compiled reset/step."""

    metadata = {"render_modes": ["human"]}

    def __init__(self, cfg: core.AviaryConfig, task, dtype=jnp.float32,
                 record: bool = False, output_folder: str = "results",
                 gui: bool = False, user_debug_gui: bool = True):
        self.cfg = cfg
        self.task = task
        self.dtype = dtype
        # Host-side GUI analogue (reference BaseAviary GUI branch, :148-167):
        # a matplotlib 3D flight view updated per control step — live when an
        # interactive backend exists, otherwise frames accumulate for
        # viewer.save() (utils/viewer.py).
        self.GUI = gui
        self._viewer = None
        # User-debug surface (reference :162-167,318-341,497-499): RPM
        # sliders + "Use GUI RPM" input switch + local-axes overlays; when
        # toggled on, slider RPMs are tiled over all drones and the task's
        # action preprocessing is bypassed, exactly like the reference's
        # USE_GUI_RPM branch skipping _preprocessAction.
        self.USER_DEBUG = user_debug_gui
        self.USE_GUI_RPM = False
        self.last_input_switch = 0
        self.gui_input = np.zeros(4)
        # Frame recording (reference BaseAviary DIRECT-mode PNG capture,
        # :174-192,292-317): ray-traced third-person frames at 24 fps.
        self.RECORD = record
        self.OUTPUT_FOLDER = output_folder
        self.FRAME_PER_SEC = 24
        self.CAPTURE_FREQ = max(1, int(cfg.pyb_freq / self.FRAME_PER_SEC))
        self.FRAME_NUM = 0
        self._record_dir = None
        self._reset = jax.jit(
            lambda: core.reset(cfg, task, dtype=dtype))
        self._step = jax.jit(
            lambda s, a: core.step(cfg, task, s, a))
        self._step_rpm = jax.jit(
            lambda s, r: core.step(cfg, task, s, None, rpm_override=r))
        self.state: core.EnvState | None = None
        self._reset_time = time.time()
        self.action_space = self._action_space()
        self.observation_space = self._observation_space()
        # Reference-style constants, exposed for example-script parity
        self.NUM_DRONES = cfg.num_drones
        self.CTRL_FREQ = cfg.ctrl_freq
        self.PYB_FREQ = cfg.pyb_freq
        self.CTRL_TIMESTEP = cfg.ctrl_dt
        self.PYB_TIMESTEP = cfg.pyb_dt
        self.MAX_RPM = cfg.drone.max_rpm
        self.HOVER_RPM = cfg.drone.hover_rpm
        self.INIT_XYZS = np.asarray(cfg.default_init_xyzs())
        self.INIT_RPYS = np.asarray(cfg.default_init_rpys())

    # -- spaces ---------------------------------------------------------
    def _action_space(self):
        n = self.cfg.num_drones
        if isinstance(self.task, tasks.RLTask):
            size = self.task.action_dim(self.cfg)
            return spaces.Box(low=-np.ones((n, size), np.float32),
                              high=np.ones((n, size), np.float32),
                              dtype=np.float32)
        if isinstance(self.task, tasks.VelocityTask):
            low = np.tile([-1, -1, -1, 0], (n, 1)).astype(np.float32)
            high = np.tile([1, 1, 1, 1], (n, 1)).astype(np.float32)
            return spaces.Box(low=low, high=high, dtype=np.float32)
        max_rpm = self.cfg.drone.max_rpm
        return spaces.Box(low=np.zeros((n, 4), np.float32),
                          high=np.full((n, 4), max_rpm, np.float32),
                          dtype=np.float32)

    def _observation_space(self):
        n = self.cfg.num_drones
        if isinstance(self.task, tasks.RLTask) and \
                self.task.obs == ObservationType.RGB:
            # Reference quirk preserved: the space is declared uint8
            # (BaseRLAviary.py:252-255) while _computeObs returns float32
            # values in [0, 255] (:306); we mirror both sides.
            return spaces.Box(low=0, high=255, shape=(n, 48, 64, 4),
                              dtype=np.uint8)
        if isinstance(self.task, tasks.RLTask):
            d = self.task.obs_dim(self.cfg)
            lo = np.full((n, d), -np.inf, np.float32)
            hi = np.full((n, d), np.inf, np.float32)
            lo[:, 2] = 0.0  # z >= 0 (reference BaseRLAviary.py:262)
            lo[:, 12:] = -1.0
            hi[:, 12:] = 1.0
            return spaces.Box(low=lo, high=hi, dtype=np.float32)
        max_rpm = self.cfg.drone.max_rpm
        lo = np.array([[-np.inf, -np.inf, 0, -1, -1, -1, -1, -np.pi,
                        -np.pi, -np.pi, -np.inf, -np.inf, -np.inf, -np.inf,
                        -np.inf, -np.inf, 0, 0, 0, 0]] * n, np.float32)
        hi = np.array([[np.inf, np.inf, np.inf, 1, 1, 1, 1, np.pi, np.pi,
                        np.pi, np.inf, np.inf, np.inf, np.inf, np.inf,
                        np.inf, max_rpm, max_rpm, max_rpm, max_rpm]] * n,
                      np.float32)
        return spaces.Box(low=lo, high=hi, dtype=np.float32)

    # -- gym API --------------------------------------------------------
    def reset(self, seed: int | None = None, options: dict | None = None):
        super().reset(seed=seed)
        self.state, obs, info = self._reset()
        self._reset_time = time.time()
        return np.asarray(obs), info

    def step(self, action):
        if self.state is None:
            # The reference engine is steppable straight after construction
            # (BaseAviary.__init__ runs _housekeeping, :211-214; e.g.
            # examples/beta.py steps without calling reset())
            self.state, _, _ = self._reset()
        if self.RECORD and \
                int(self.state.step_counter) % self.CAPTURE_FREQ == 0:
            self._capture_frame()
        # GUI input-switch polling + slider override (reference :318-341):
        # each press of "Use GUI RPM" toggles USE_GUI_RPM; while on, the
        # four slider RPMs are tiled over all drones and applied raw
        if self.GUI and self.USER_DEBUG:
            viewer = self._ensure_viewer()
            cur = viewer.input_switch_count
            if cur > self.last_input_switch:
                self.last_input_switch = cur
                self.USE_GUI_RPM = not self.USE_GUI_RPM
                viewer.show_gui_rpm_text(self.USE_GUI_RPM)
        if self.USE_GUI_RPM:
            self.gui_input = self._viewer.slider_values()
            rpm = np.tile(self.gui_input, (self.NUM_DRONES, 1))
            self.state, obs, reward, term, trunc, info = self._step_rpm(
                self.state, jnp.asarray(rpm, self.dtype))
        else:
            action = jnp.asarray(action, self.dtype)
            self.state, obs, reward, term, trunc, info = self._step(
                self.state, action)
        if self.GUI:
            self._update_viewer()
        return (np.asarray(obs), float(reward), bool(term), bool(trunc),
                info)

    def _ensure_viewer(self):
        if self._viewer is None:
            from gym_pybullet_drones_tpu.utils.viewer import FlightViewer
            targets = getattr(self.task, "target_pos", None)
            if targets is None:
                targets = getattr(self, "TARGET_POS", None)
            self._viewer = FlightViewer(
                self.cfg.num_drones, arm=self.cfg.drone.l,
                obstacles=self.cfg.obstacles, targets=targets,
                fps=min(30.0, self.cfg.ctrl_freq),
                user_debug=self.USER_DEBUG,
                max_rpm=self.MAX_RPM, hover_rpm=self.HOVER_RPM)
        return self._viewer

    def _update_viewer(self):
        from gym_pybullet_drones_tpu.ops import quat as quat_ops
        self._ensure_viewer()
        rpy = quat_ops.quat_to_rpy(self.state.quat)
        self._viewer.update(np.asarray(self.state.pos), np.asarray(rpy))

    def _capture_frame(self):
        """Save a third-person PNG frame (reference CAM_VIEW: distance 3,
        yaw -30 deg, pitch -30 deg, target the origin; :180-192)."""
        import os
        from PIL import Image
        from gym_pybullet_drones_tpu.ops import render
        if self._record_dir is None:
            from datetime import datetime
            self._record_dir = os.path.join(
                self.OUTPUT_FOLDER, "recording_"
                + datetime.now().strftime("%m.%d.%Y_%H.%M.%S"))
            os.makedirs(self._record_dir, exist_ok=True)
        yaw, pitch, dist = np.radians(-30.0), np.radians(-30.0), 3.0
        eye = np.array([dist * np.cos(pitch) * np.cos(yaw),
                        dist * np.cos(pitch) * np.sin(yaw),
                        -dist * np.sin(pitch)])
        forward = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(forward, up)
        right /= np.linalg.norm(right)
        cam_up = np.cross(right, forward)
        rot = np.stack([forward, -right, cam_up], axis=-1)  # col0 = forward
        rgba, _, _ = render.render(
            self.cfg.drone, render.landmark_scene(),
            jnp.asarray(eye, jnp.float32), jnp.asarray(rot, jnp.float32),
            drone_pos=self.state.pos, width=160, height=120)
        Image.fromarray(np.asarray(rgba).astype("uint8"), "RGBA").save(
            os.path.join(self._record_dir, f"frame_{self.FRAME_NUM}.png"))
        self.FRAME_NUM += 1

    def render(self):
        """Text render with real-time factor (reference BaseAviary.py:387-412)."""
        sc = int(self.state.step_counter)
        wall = time.time() - self._reset_time
        sim_t = sc * self.cfg.pyb_dt
        print(f"[INFO] it {sc:04d} --- wall-clock {wall:.1f}s, "
              f"sim time {sim_t:.1f}s@{self.cfg.pyb_freq}Hz "
              f"({sim_t / max(wall, 1e-9):.2f}x)")

    def close(self):
        if self._viewer is not None:
            self._viewer.close()
            self._viewer = None
        if self.RECORD and self._record_dir is not None:
            # assemble the PNG frames into a playable video (counterpart
            # of the reference's mp4 state logging, BaseAviary.py:523-537;
            # MJPEG-AVI because this image ships no ffmpeg)
            from gym_pybullet_drones_tpu.utils.video import \
                assemble_frame_dir
            # frames are only captured when the step counter (advancing by
            # steps_per_ctrl per env step) lands on a CAPTURE_FREQ multiple,
            # so the EFFECTIVE interval is lcm(CAPTURE_FREQ, steps_per_ctrl)
            # substeps — using the nominal CAPTURE_FREQ here would play the
            # video up to steps_per_ctrl/gcd times too fast
            interval = math.lcm(self.CAPTURE_FREQ, self.cfg.steps_per_ctrl)
            out = assemble_frame_dir(
                self._record_dir, fps=self.cfg.pyb_freq / interval)
            if out:
                print(f"[INFO] recording assembled: {out}")

    # -- extras mirroring reference helpers -----------------------------
    def getPyBulletClient(self):
        """Reference-API stub: there is no PyBullet client (engine is JAX);
        returns None so drop-in scripts keep working."""
        return None

    def getDroneIds(self) -> np.ndarray:
        """Drone indices 0..N-1 (reference BaseAviary.getDroneIds)."""
        return np.arange(self.cfg.num_drones)

    def getDroneStateVector(self, nth_drone: int) -> np.ndarray:
        return np.asarray(core.state_vector(self.state))[nth_drone]

    def getDroneImages(self, nth_drone: int, segmentation: bool = True):
        """Per-drone POV (rgb, depth, seg) via the on-device ray tracer
        (reference BaseAviary._getDroneImages:565-617)."""
        from gym_pybullet_drones_tpu.ops import render, quat as quat_ops
        scene = render.landmark_scene()
        rot = quat_ops.quat_to_mat(self.state.quat)
        rgba, dep, seg = render.render(
            self.cfg.drone, scene, self.state.pos[nth_drone],
            rot[nth_drone], drone_pos=self.state.pos)
        return np.asarray(rgba), np.asarray(dep), np.asarray(seg)

    def exportImage(self, img_input, path: str, frame_num: int = 0,
                    img_type=None):
        """Save an RGB(A)/depth/seg capture as PNG
        (reference BaseAviary._exportImage:621-654)."""
        import os
        from PIL import Image
        from gym_pybullet_drones_tpu.utils.enums import ImageType
        img_type = ImageType.RGB if img_type is None else img_type
        os.makedirs(path, exist_ok=True)
        out = os.path.join(path, f"frame_{frame_num}.png")
        arr = np.asarray(img_input)
        if img_type == ImageType.RGB:
            Image.fromarray(arr.astype("uint8"), "RGBA").save(out)
        elif img_type == ImageType.BW:
            Image.fromarray(
                (np.sum(arr[:, :, 0:2], axis=2) / 3).astype("uint8")
            ).save(out)
        else:  # DEP / SEG: normalize to 0..255 grayscale
            lo, hi = float(np.min(arr)), float(np.max(arr))
            scaled = (arr - lo) * 255 / max(hi - lo, 1e-9)
            Image.fromarray(scaled.astype("uint8")).save(out)
        return out

    def getAdjacencyMatrix(self) -> np.ndarray:
        return np.asarray(core.adjacency_matrix(self.cfg, self.state))


# The reference's obstacle bodies (BaseAviary._addObstacles:955-978:
# duck/cube/sphere around the origin) as collision primitives: the duck
# mesh by its bounding sphere, cube_no_rotation as a true 1 m box, sphere2
# as its exact sphere.  4-tuple = sphere, 6-tuple = box (center + half
# extents) — see envs/core.AviaryConfig.obstacles.
OBSTACLE_SPHERES = (
    (-0.5, -0.5, 0.05, 0.06),           # duck (bounding sphere; the same
                                        # r=0.06 primitive the ref_harness
                                        # shim assigns duck_vhacd.urdf, so
                                        # obstacle parity runs compare like
                                        # for like — see PARITY.md)
    (-0.5, -2.5, 0.5, 0.5, 0.5, 0.5),   # cube_no_rotation (1 m box)
    (0.0, 2.0, 0.5, 0.5),               # sphere2
)


def _make_cfg(drone_model, num_drones, neighbourhood_radius, initial_xyzs,
              initial_rpys, physics, pyb_freq, ctrl_freq, obstacles=False):
    to_tuple = lambda a: None if a is None else tuple(
        tuple(float(v) for v in row) for row in np.asarray(a))
    return core.AviaryConfig(
        drone=get_params(drone_model), num_drones=num_drones,
        physics=Physics(physics), pyb_freq=pyb_freq, ctrl_freq=ctrl_freq,
        neighbourhood_radius=float(neighbourhood_radius),
        init_xyzs=to_tuple(initial_xyzs), init_rpys=to_tuple(initial_rpys),
        obstacles=OBSTACLE_SPHERES if obstacles else ())


class CtrlAviary(FunctionalAviary):
    """Direct-RPM control env (reference envs/CtrlAviary.py)."""

    def __init__(self, drone_model=DroneModel.CF2X, num_drones=1,
                 neighbourhood_radius=np.inf, initial_xyzs=None,
                 initial_rpys=None, physics=Physics.PYB, pyb_freq=240,
                 ctrl_freq=240, gui=False, record=False, obstacles=False,
                 user_debug_gui=True, output_folder="results", **kw):
        cfg = _make_cfg(drone_model, num_drones, neighbourhood_radius,
                        initial_xyzs, initial_rpys, physics, pyb_freq,
                        ctrl_freq, obstacles=obstacles)
        super().__init__(cfg, tasks.CtrlTask(), record=record,
                         output_folder=output_folder, gui=gui,
                         user_debug_gui=user_debug_gui)


class VelocityAviary(FunctionalAviary):
    """Velocity-command env (reference envs/VelocityAviary.py)."""

    def __init__(self, drone_model=DroneModel.CF2X, num_drones=1,
                 neighbourhood_radius=np.inf, initial_xyzs=None,
                 initial_rpys=None, physics=Physics.PYB, pyb_freq=240,
                 ctrl_freq=240, gui=False, record=False, obstacles=False,
                 user_debug_gui=True, output_folder="results", **kw):
        cfg = _make_cfg(drone_model, num_drones, neighbourhood_radius,
                        initial_xyzs, initial_rpys, physics, pyb_freq,
                        ctrl_freq, obstacles=obstacles)
        super().__init__(cfg, tasks.VelocityTask(), record=record,
                         output_folder=output_folder, gui=gui,
                         user_debug_gui=user_debug_gui)


class HoverAviary(FunctionalAviary):
    """Single-agent hover RL env (reference envs/HoverAviary.py)."""

    def __init__(self, drone_model=DroneModel.CF2X, initial_xyzs=None,
                 initial_rpys=None, physics=Physics.PYB, pyb_freq=240,
                 ctrl_freq=30, gui=False, record=False,
                 obs=ObservationType.KIN, act=ActionType.RPM, **kw):
        cfg = _make_cfg(drone_model, 1, np.inf, initial_xyzs, initial_rpys,
                        physics, pyb_freq, ctrl_freq)
        task = tasks.HoverTask(act=ActionType(act), obs=ObservationType(obs))
        super().__init__(cfg, task, record=record, gui=gui)
        self.EPISODE_LEN_SEC = task.episode_len_sec
        self.TARGET_POS = np.asarray(task.target_pos)


class MultiHoverAviary(FunctionalAviary):
    """Multi-agent hover RL env (reference envs/MultiHoverAviary.py)."""

    def __init__(self, drone_model=DroneModel.CF2X, num_drones=2,
                 neighbourhood_radius=np.inf, initial_xyzs=None,
                 initial_rpys=None, physics=Physics.PYB, pyb_freq=240,
                 ctrl_freq=30, gui=False, record=False,
                 obs=ObservationType.KIN, act=ActionType.RPM, **kw):
        cfg = _make_cfg(drone_model, num_drones, neighbourhood_radius,
                        initial_xyzs, initial_rpys, physics, pyb_freq,
                        ctrl_freq)
        task = tasks.MultiHoverTask(act=ActionType(act),
                                    obs=ObservationType(obs))
        super().__init__(cfg, task, record=record, gui=gui)
        self.EPISODE_LEN_SEC = task.episode_len_sec
        self.TARGET_POS = np.asarray(task._targets(
            cfg, core.reset(cfg, task)[0]))


class BatchedEnv:
    """Vectorized batch of identical envs, fully on-device with auto-reset.

    The TPU-native replacement of SB3's DummyVecEnv (SURVEY.md §2.4): the env
    batch axis is a vmap axis, one jitted program advances all instances, and
    rollouts can stay on device end-to-end.
    """

    def __init__(self, cfg: core.AviaryConfig, task, num_envs: int,
                 dtype=jnp.float32):
        self.cfg, self.task, self.num_envs = cfg, task, num_envs
        self.dtype = dtype
        self._reset = jax.jit(jax.vmap(
            lambda k: core.reset(cfg, task, key=k, dtype=dtype)))
        self._step = jax.jit(jax.vmap(
            lambda s, a: core.step_autoreset(cfg, task, s, a, dtype=dtype)))

    def reset(self, seed: int = 0):
        keys = jax.random.split(jax.random.PRNGKey(seed), self.num_envs)
        state, obs, _ = self._reset(keys)
        return state, obs

    def step(self, state, action):
        """action: (num_envs, N, A) -> (state, obs, reward, term, trunc)."""
        state, obs, r, te, tr, _ = self._step(state, action)
        return state, obs, r, te, tr
