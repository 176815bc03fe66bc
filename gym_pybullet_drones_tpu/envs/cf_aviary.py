"""CFAviary: Crazyflie firmware-in-the-loop environment.

Counterpart of the reference CFAviary (reference envs/CFAviary.py), which
drives the C `pycffirmware` bindings; here the firmware stack — 2-pole sensor
LPFs, Mellinger controller, high-level commander, X-formation power
distribution, brushed PWM curve — is the native JAX/NumPy implementation in
gym_pybullet_drones_tpu.control.{firmware,commander}.

Reproduced semantics (with reference line cites):
- env steps at the firmware rate; `step(i)` is called at ctrl_freq and runs
  firmware ticks until sim time catches up (:201-259),
- finite-difference rate/acc estimation feeding the sensor model
  (:215-218), sensor LPFs (:127-131; including the reference's swapped
  cutoff assignment: the accel LPF gets the GYRO cutoff and vice versa),
- tumble detection killing motors after 30 low-acc ticks (:377-386),
- command queue processed once per control step (:199,428-434),
- PWM -> RPM conversion 0.2685*pwm + 4070.3 (:244).
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.params import get_params
from gym_pybullet_drones_tpu.utils.enums import DroneModel, Physics
from gym_pybullet_drones_tpu.envs import core, tasks
from gym_pybullet_drones_tpu.envs.gym_adapter import FunctionalAviary, _make_cfg
from gym_pybullet_drones_tpu.control import firmware as fw
from gym_pybullet_drones_tpu.control.commander import HighLevelCommander
from gym_pybullet_drones_tpu.ops import quat as quat_ops

RAD_TO_DEG = 180 / math.pi


class CFAviary(FunctionalAviary):
    """Firmware-in-the-loop single-drone environment."""

    ACTION_DELAY = 0
    SENSOR_DELAY = 0
    CONTROLLER = "mellinger"
    GYRO_LPF_CUTOFF_FREQ = 80
    ACCEL_LPF_CUTOFF_FREQ = 30
    QUAD_FORMATION_X = True

    PWM2RPM_SCALE = 0.2685
    PWM2RPM_CONST = 4070.3
    MIN_PWM = 20000
    MAX_PWM = 65535

    def __init__(self, drone_model=DroneModel.CF2X, num_drones=1,
                 neighbourhood_radius=np.inf, initial_xyzs=None,
                 initial_rpys=None, physics=Physics.PYB, pyb_freq=500,
                 ctrl_freq=25, gui=False, record=False, obstacles=False,
                 user_debug_gui=True, output_folder="results",
                 verbose=False):
        firmware_freq = 500 if self.CONTROLLER == "mellinger" else 1000
        assert pyb_freq % firmware_freq == 0, (
            f"pyb_freq ({pyb_freq}) must be a multiple of firmware_freq "
            f"({firmware_freq}) for CFAviary.")
        if num_drones != 1:
            raise NotImplementedError(
                "Multi-agent support for CF Aviary is not yet implemented.")
        cfg = _make_cfg(drone_model, num_drones, neighbourhood_radius,
                        initial_xyzs, initial_rpys, physics, pyb_freq,
                        firmware_freq)
        super().__init__(cfg, tasks.CtrlTask())
        self.firmware_freq = firmware_freq
        self.ctrl_freq = ctrl_freq
        self.ctrl_dt = 1.0 / ctrl_freq
        self.firmware_dt = 1.0 / firmware_freq
        self.verbose = verbose
        self._mellinger = jax.jit(
            lambda st, sp, pos, vel, quat, gyro: fw.mellinger_control(
                st, sp, pos, vel, quat, gyro, self.firmware_dt))
        # CONTROLLER options:
        # - 'mellinger' (default): control/firmware.mellinger_control
        # - 'pid': the firmware controller_pid cascade
        #   (control/firmware_pid.py — reference CFAviary CONTROLLER='pid'
        #   path, :157-159,401-408, firm.controllerPid); position loop at
        #   100 Hz, attitude+rate loops at the firmware rate
        # - 'dsl': the DSL PID (this repo's extra option)
        from gym_pybullet_drones_tpu.control import dsl_pid as _dsl
        from gym_pybullet_drones_tpu.control import firmware_pid as _fwpid
        self._dsl = _dsl
        self._fwpid = _fwpid
        self._pid_state = _dsl.init_state((), jnp.float32)
        self._fwpid_state = _fwpid.init_state()
        self._reset_firmware()

    # ------------------------------------------------------------------
    def _reset_firmware(self):
        obs, info = super().reset()
        # sensor LPFs: NOTE the reference initializes the accel filter with
        # the GYRO cutoff and the gyro filter with the ACCEL cutoff
        # (reference CFAviary.py:129-131); reproduced as-is.
        self._acc_lpf_coeffs = fw.lpf2p_coeffs(
            self.firmware_freq, self.GYRO_LPF_CUTOFF_FREQ)
        self._gyro_lpf_coeffs = fw.lpf2p_coeffs(
            self.firmware_freq, self.ACCEL_LPF_CUTOFF_FREQ)
        self._acc_lpf = fw.lpf2p_init((3,))
        self._gyro_lpf = fw.lpf2p_init((3,))

        self.fw_state = fw.firmware_init()
        self._fwpid_state = self._fwpid.init_state()
        self.commander = HighLevelCommander()
        self.command_queue: list = []
        self.full_state_cmd_override = True
        self.tick = 0
        self.pwms = np.zeros(4)
        self.action = np.zeros((1, 4))
        self.tumble_counter = 0
        self._error = False
        self.first_motor_killed_print = True
        self.takeoff_sent = False
        self.states_log: list = []

        self.prev_vel = np.asarray(obs[0][10:13])
        self.prev_rpy = np.asarray(obs[0][7:10])
        self._setpoint = fw.Setpoint(
            position=jnp.asarray(obs[0][0:3], jnp.float32),
            velocity=jnp.zeros(3, jnp.float32),
            acceleration=jnp.zeros(3, jnp.float32),
            attitude_rate=jnp.zeros(3, jnp.float32),
            quat=jnp.asarray([0, 0, 0, 1], jnp.float32))
        self.commander.tell_state(obs[0][0:3], obs[0][9])
        return obs, info

    def reset(self, seed=None, options=None):
        return self._reset_firmware()

    # ------------------------------------------------------------------
    def step(self, i):
        """Advance by one control period (i is the control-step index)."""
        t = i / self.ctrl_freq
        self._process_command_queue(t)

        obs = reward = terminated = truncated = info = None
        while self.tick / self.firmware_freq < t + self.ctrl_dt:
            obs, reward, terminated, truncated, info = super().step(
                self.action)
            cur_pos = np.asarray(obs[0][0:3])
            cur_vel = np.asarray(obs[0][10:13])
            cur_rpy = np.asarray(obs[0][7:10])
            cur_quat = np.asarray(obs[0][3:7])

            if self.takeoff_sent:
                self.states_log.append(
                    [self.tick / self.firmware_freq, *cur_pos])

            # finite-difference rates/acc (reference :215-218)
            rates = (cur_rpy - self.prev_rpy) / self.firmware_dt
            self.prev_rpy = cur_rpy
            acc_world = ((cur_vel - self.prev_vel) / self.firmware_dt / 9.8
                         + np.array([0, 0, 1]))
            self.prev_vel = cur_vel

            # body-frame accelerometer reading + LPFs
            rot = np.asarray(quat_ops.quat_to_mat(jnp.asarray(cur_quat)))
            acc_body = rot.T @ acc_world
            acc_f, self._acc_lpf = fw.lpf2p_apply(
                self._acc_lpf_coeffs, self._acc_lpf,
                jnp.asarray(acc_body, jnp.float32))
            gyro_f, self._gyro_lpf = fw.lpf2p_apply(
                self._gyro_lpf_coeffs, self._gyro_lpf,
                jnp.asarray(rates * RAD_TO_DEG, jnp.float32))

            # high-level commander setpoint (unless full-state override)
            self._update_setpoint(self.tick / self.firmware_freq,
                                  cur_pos, cur_rpy[2])

            # tumble detection (reference :377-386) — acc.z in body Gs
            if float(acc_f[2]) < -0.5:
                self.tumble_counter += 1
            else:
                self.tumble_counter = 0
            if self.tumble_counter >= 30 or self._error:
                if self.first_motor_killed_print and not self._error:
                    print("WARNING: CrazyFlie is Tumbling. "
                          "Killing motors to save propellers.")
                    self.first_motor_killed_print = False
                self._error = True
                self.pwms = np.zeros(4)
                self.action = np.zeros((1, 4))
                self.tick += 1
                continue

            if self.CONTROLLER == "pid":
                # firmware controller_pid scheduling (reference
                # CFAviary.py:388-398): position loop at 100 Hz, attitude
                # + rate loops at every firmware tick
                fs = self._fwpid_state
                rpy_deg = cur_rpy * RAD_TO_DEG
                if self.tick % max(1, self.firmware_freq // 100) == 0:
                    fs = self._fwpid.position_controller(
                        fs, 1.0 / 100.0,
                        jnp.asarray(cur_pos, jnp.float32),
                        jnp.asarray(cur_vel, jnp.float32),
                        jnp.asarray(rpy_deg[2], jnp.float32),
                        self._setpoint.position)
                if self.tick % max(1, self.firmware_freq // 500) == 0:
                    sp_yaw_deg = float(np.degrees(np.asarray(
                        quat_ops.quat_to_rpy(self._setpoint.quat))[2]))
                    control, fs = self._fwpid.attitude_rate_controller(
                        fs, 1.0 / 500.0,
                        jnp.asarray(rpy_deg, jnp.float32), gyro_f,
                        jnp.asarray(sp_yaw_deg, jnp.float32))
                    self.pwms = np.asarray(fw.power_distribution(
                        jnp.stack(control), self.QUAD_FORMATION_X))
                self._fwpid_state = fs
            elif self.CONTROLLER == "dsl":
                rpm_cmd, self._pid_state, _, _ = self._dsl.compute_control(
                    self.cfg.drone, self._pid_state, self.firmware_dt,
                    jnp.asarray(cur_pos, jnp.float32),
                    jnp.asarray(cur_quat, jnp.float32),
                    jnp.asarray(cur_vel, jnp.float32),
                    target_pos=self._setpoint.position,
                    target_vel=self._setpoint.velocity)
                self.pwms = np.clip(
                    (np.asarray(rpm_cmd) - self.PWM2RPM_CONST)
                    / self.PWM2RPM_SCALE, 0, self.MAX_PWM)
            else:
                control, self.fw_state = self._mellinger(
                    self.fw_state, self._setpoint,
                    jnp.asarray(cur_pos, jnp.float32),
                    jnp.asarray(cur_vel, jnp.float32),
                    jnp.asarray(cur_quat, jnp.float32), gyro_f)
                self.pwms = np.asarray(
                    fw.power_distribution(control, self.QUAD_FORMATION_X))
            rpm = self.PWM2RPM_SCALE * np.clip(
                self.pwms, self.MIN_PWM, self.MAX_PWM) + self.PWM2RPM_CONST
            self.action = rpm[None, :]
            self.tick += 1
        return obs, reward, terminated, truncated, info

    # ------------------------------------------------------------------
    def _update_setpoint(self, timestep, cur_pos, cur_yaw):
        if not self.full_state_cmd_override:
            self.commander.tell_state(cur_pos, cur_yaw)
            self.commander.update_time(timestep)
            pos, vel, acc, yaw = self.commander.get_setpoint()
            self._setpoint = fw.Setpoint(
                position=jnp.asarray(pos, jnp.float32),
                velocity=jnp.asarray(vel, jnp.float32),
                acceleration=jnp.asarray(acc, jnp.float32),
                attitude_rate=jnp.zeros(3, jnp.float32),
                quat=quat_ops.rpy_to_quat(
                    jnp.asarray([0, 0, yaw], jnp.float32)))

    def _process_command_queue(self, sim_time):
        if self.command_queue:
            self.commander.stop()
            self.commander.update_time(sim_time)
            command, args = self.command_queue.pop(0)
            getattr(self, command)(*args)

    # -- command surface (reference :435-606) ---------------------------
    def sendFullStateCmd(self, pos, vel, acc, yaw, rpy_rate, timestep):
        self.command_queue.append(
            ["_sendFullStateCmd", [pos, vel, acc, yaw, rpy_rate, timestep]])

    def _sendFullStateCmd(self, pos, vel, acc, yaw, rpy_rate, timestep):
        self._setpoint = fw.Setpoint(
            position=jnp.asarray(pos, jnp.float32),
            velocity=jnp.asarray(vel, jnp.float32),
            acceleration=jnp.asarray(acc, jnp.float32),
            attitude_rate=jnp.asarray(np.asarray(rpy_rate) * RAD_TO_DEG,
                                      jnp.float32),
            quat=quat_ops.rpy_to_quat(jnp.asarray([0, 0, yaw], jnp.float32)))
        self.full_state_cmd_override = True

    def sendTakeoffCmd(self, height, duration):
        self.command_queue.append(["_sendTakeoffCmd", [height, duration]])

    def _sendTakeoffCmd(self, height, duration):
        print(f"INFO_{self.tick}: Takeoff command sent.")
        self.takeoff_sent = True
        self.commander.takeoff(height, duration)
        self.full_state_cmd_override = False

    def sendTakeoffYawCmd(self, height, duration, yaw):
        self.command_queue.append(
            ["_sendTakeoffYawCmd", [height, duration, yaw]])

    def _sendTakeoffYawCmd(self, height, duration, yaw):
        self.commander.takeoff(height, duration, yaw)
        self.full_state_cmd_override = False

    def sendTakeoffVelCmd(self, height, vel, relative):
        self.command_queue.append(
            ["_sendTakeoffVelCmd", [height, vel, relative]])

    def _sendTakeoffVelCmd(self, height, vel, relative):
        self.commander.takeoff_with_velocity(height, vel, relative)
        self.full_state_cmd_override = False

    def sendLandCmd(self, height, duration):
        self.command_queue.append(["_sendLandCmd", [height, duration]])

    def _sendLandCmd(self, height, duration):
        print(f"INFO_{self.tick}: Land command sent.")
        self.commander.land(height, duration)
        self.full_state_cmd_override = False

    def sendLandYawCmd(self, height, duration, yaw):
        self.command_queue.append(
            ["_sendLandYawCmd", [height, duration, yaw]])

    def _sendLandYawCmd(self, height, duration, yaw):
        self.commander.land(height, duration, yaw)
        self.full_state_cmd_override = False

    def sendLandVelCmd(self, height, vel, relative):
        self.command_queue.append(
            ["_sendLandVelCmd", [height, vel, relative]])

    def _sendLandVelCmd(self, height, vel, relative):
        self.commander.land_with_velocity(height, vel, relative)
        self.full_state_cmd_override = False

    def sendStopCmd(self):
        self.command_queue.append(["_sendStopCmd", []])

    def _sendStopCmd(self):
        self.commander.stop()
        self.full_state_cmd_override = False

    def sendGotoCmd(self, pos, yaw, duration_s, relative):
        self.command_queue.append(
            ["_sendGotoCmd", [pos, yaw, duration_s, relative]])

    def _sendGotoCmd(self, pos, yaw, duration_s, relative):
        print(f"INFO_{self.tick}: Go to command sent.")
        self.commander.go_to(*pos, yaw, duration_s, relative)
        self.full_state_cmd_override = False

    def notifySetpointStop(self):
        self.command_queue.append(["_notifySetpointStop", []])

    def _notifySetpointStop(self):
        self.full_state_cmd_override = False
