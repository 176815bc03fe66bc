"""`pycffirmware` shim backed by the C++ firmware oracle.

Lets the GENUINE reference CFAviary (/root/reference/gym_pybullet_drones/
envs/CFAviary.py) import and run verbatim: its entire Python machinery —
struct marshaling (:272-361), wall-clock controller tick scheduling
(:388-398), command queue (:428-434), power distribution + brushed PWM curve
(:613-652) — executes unmodified, with the `firm.*` C surface it consumes
(:127-180,293-301,401-416) provided here.

The controller math bottoms out in native/cf_firmware_oracle.cpp via the
ctypes bindings in gym_pybullet_drones_tpu.native.firmware_oracle — the same
double-precision transcription of the crazyflie-firmware sources that
tests/test_firmware_oracle.py bit-compares against control/firmware*.py.
pycffirmware itself is not installable offline (it builds the firmware C
tree); this shim replaces only the binding layer, keeping the reference's
Python side genuine (VERDICT.md round-2 "Missing #1").

Tick gating replicates the firmware's RATE_DO_EXECUTE macro with
RATE_MAIN_LOOP = 1000 Hz: attitude/Mellinger at 500 Hz (tick % 2 == 0),
position loop at 100 Hz (tick % 10 == 0).  The reference passes
_tick in {0, 1, 2} computed by its own wall-clock scheduler
(CFAviary.py:388-398): 0 -> both loops, 2 -> attitude only, 1 -> neither.

The high-level commander (crtpCommanderHighLevel*) implements the planner's
takeoff/land/goto 7th-order polynomial trajectories (firmware planner.c /
pptraj.c semantics) in NumPy — only the subset the reference surface calls.
"""
from __future__ import annotations

import math

import numpy as np

from gym_pybullet_drones_tpu.native import firmware_oracle as oracle

modeDisable = 0
modeAbs = 1
modeVelocity = 2

ATTITUDE_RATE = 500
POSITION_RATE = 100
RATE_MAIN_LOOP = 1000
ATTITUDE_DT = 1.0 / ATTITUDE_RATE
POSITION_DT = 1.0 / POSITION_RATE


# ---------------------------------------------------------------------------
# struct types (stabilizer_types.h equivalents; plain attribute records)
# ---------------------------------------------------------------------------
class _Vec3:
    def __init__(self):
        self.x = 0.0
        self.y = 0.0
        self.z = 0.0
        self.timestamp = 0


class _Attitude:
    def __init__(self):
        self.roll = 0.0
        self.pitch = 0.0
        self.yaw = 0.0
        self.timestamp = 0


class _Quaternion:
    def __init__(self):
        self.x = 0.0
        self.y = 0.0
        self.z = 0.0
        self.w = 1.0
        self.timestamp = 0


class _Baro:
    def __init__(self):
        self.pressure = 0.0
        self.temperature = 0.0
        self.asl = 0.0


class _Mode:
    def __init__(self):
        self.x = modeDisable
        self.y = modeDisable
        self.z = modeDisable
        self.roll = modeDisable
        self.pitch = modeDisable
        self.yaw = modeDisable
        self.quat = modeDisable


class control_t:
    def __init__(self):
        self.thrust = 0.0
        self.roll = 0.0
        self.pitch = 0.0
        self.yaw = 0.0


class setpoint_t:
    def __init__(self):
        self.position = _Vec3()
        self.velocity = _Vec3()
        self.acceleration = _Vec3()
        self.attitude = _Attitude()
        self.attitudeRate = _Attitude()
        self.attitudeQuaternion = _Quaternion()
        self.mode = _Mode()
        self.timestamp = 0


class sensorData_t:
    def __init__(self):
        self.acc = _Vec3()
        self.gyro = _Vec3()
        self.mag = _Vec3()
        self.baro = _Baro()
        self.interruptTimestamp = 0


class state_t:
    def __init__(self):
        self.attitude = _Attitude()
        self.attitudeQuaternion = _Quaternion()
        self.position = _Vec3()
        self.velocity = _Vec3()
        self.acc = _Vec3()


class lpf2pData:
    """Opaque biquad state handle (filter.c lpf2pData)."""

    def __init__(self):
        self._oracle = None


# ---------------------------------------------------------------------------
# filter.c
# ---------------------------------------------------------------------------
def lpf2pInit(lpf: lpf2pData, sample_freq, cutoff_freq):
    lpf._oracle = oracle.Lpf2pOracle(float(sample_freq), float(cutoff_freq))


def lpf2pApply(lpf: lpf2pData, sample):
    return lpf._oracle.apply(float(sample))


# ---------------------------------------------------------------------------
# controllers (module-global state like the firmware's statics)
# ---------------------------------------------------------------------------
_pid_oracle = None
_mellinger_oracle = None


def controllerPidInit():
    global _pid_oracle
    _pid_oracle = oracle.FirmwarePidOracle()


def controllerPidTest():
    return _pid_oracle is not None


def controllerMellingerInit():
    global _mellinger_oracle
    _mellinger_oracle = oracle.MellingerOracle()


def controllerMellingerTest():
    return _mellinger_oracle is not None


def _quat_yaw_deg(q: _Quaternion) -> float:
    """atan2 yaw of an xyzw quaternion, in degrees."""
    siny = 2.0 * (q.w * q.z + q.x * q.y)
    cosy = 1.0 - 2.0 * (q.y * q.y + q.z * q.z)
    return math.degrees(math.atan2(siny, cosy))


def controllerPid(control: control_t, setpoint: setpoint_t,
                  sensorData: sensorData_t, state: state_t, tick: int):
    """controller_pid.c: position at POSITION_RATE, attitude+rate at
    ATTITUDE_RATE (RATE_DO_EXECUTE over the 1000 Hz main loop).

    The oracle cascade runs in the standard angle convention with the
    legacy control_t frame applied at its output (see
    native/cf_firmware_oracle.cpp fwpid_attitude); state.attitude carries
    the legacy inverted pitch (reference CFAviary.py:359), undone here.
    """
    if _pid_oracle is None:
        raise RuntimeError("controllerPidInit() not called")
    if tick % (RATE_MAIN_LOOP // POSITION_RATE) == 0:
        pos = [state.position.x, state.position.y, state.position.z]
        vel = [state.velocity.x, state.velocity.y, state.velocity.z]
        tgt = [setpoint.position.x, setpoint.position.y, setpoint.position.z]
        _pid_oracle.position(POSITION_DT, pos, vel, state.attitude.yaw, tgt)
    if tick % (RATE_MAIN_LOOP // ATTITUDE_RATE) == 0:
        rpy_deg = [state.attitude.roll, -state.attitude.pitch,
                   state.attitude.yaw]
        gyro = [sensorData.gyro.x, sensorData.gyro.y, sensorData.gyro.z]
        if setpoint.mode.yaw == modeAbs:
            tgt_yaw = setpoint.attitude.yaw
        elif setpoint.mode.quat == modeAbs:
            tgt_yaw = _quat_yaw_deg(setpoint.attitudeQuaternion)
        else:
            tgt_yaw = state.attitude.yaw
        out = _pid_oracle.attitude(ATTITUDE_DT, rpy_deg, gyro, tgt_yaw)
        control.thrust = float(out[0])
        control.roll = float(out[1])
        control.pitch = float(out[2])
        control.yaw = float(out[3])


def controllerMellinger(control: control_t, setpoint: setpoint_t,
                        sensorData: sensorData_t, state: state_t, tick: int):
    """controller_mellinger.c: single RATE_DO_EXECUTE(ATTITUDE_RATE) gate."""
    if _mellinger_oracle is None:
        raise RuntimeError("controllerMellingerInit() not called")
    if tick % (RATE_MAIN_LOOP // ATTITUDE_RATE) != 0:
        return
    sp_pos = [setpoint.position.x, setpoint.position.y, setpoint.position.z]
    sp_vel = [setpoint.velocity.x, setpoint.velocity.y, setpoint.velocity.z]
    sp_acc = [setpoint.acceleration.x, setpoint.acceleration.y,
              setpoint.acceleration.z]
    sp_rate = [setpoint.attitudeRate.roll, setpoint.attitudeRate.pitch,
               setpoint.attitudeRate.yaw]
    q = setpoint.attitudeQuaternion
    sp_quat = [q.x, q.y, q.z, q.w]
    pos = [state.position.x, state.position.y, state.position.z]
    vel = [state.velocity.x, state.velocity.y, state.velocity.z]
    sq = state.attitudeQuaternion
    quat = [sq.x, sq.y, sq.z, sq.w]
    gyro = [sensorData.gyro.x, sensorData.gyro.y, sensorData.gyro.z]
    out = _mellinger_oracle.tick(sp_pos, sp_vel, sp_acc, sp_rate, sp_quat,
                                 pos, vel, quat, gyro, ATTITUDE_DT)
    control.thrust = float(out[0])
    control.roll = float(out[1])
    control.pitch = float(out[2])
    control.yaw = float(out[3])


# ---------------------------------------------------------------------------
# crtp_commander_high_level.c / planner.c / pptraj.c
# ---------------------------------------------------------------------------
class _Planner:
    """Takeoff/land/goto smooth trajectories (planner.c semantics).

    The firmware plans each maneuver as a degree-7 polynomial in each axis;
    piecewise_plan_7th_order_no_jerk(duration, p0, y0, p1, y1) pins
    position/velocity/acceleration/jerk at both ends, giving the smoothstep
    profile  s(u) = 35u^4 - 84u^5 + 70u^6 - 20u^7  between the endpoints.
    After the end time the setpoint holds the final hover point.
    """

    def __init__(self):
        self.active = False
        self.t0 = 0.0
        self.duration = 0.0
        self.p0 = np.zeros(3)
        self.p1 = np.zeros(3)
        self.y0 = 0.0
        self.y1 = 0.0

    def plan(self, t_now, p0, y0, p1, y1, duration):
        self.active = True
        self.t0 = t_now
        self.duration = float(duration)
        self.p0 = np.asarray(p0, float).copy()
        self.p1 = np.asarray(p1, float).copy()
        self.y0 = float(y0)
        self.y1 = float(y1)

    def eval(self, t):
        u = (t - self.t0) / self.duration if self.duration > 0 else 1.0
        u = min(max(u, 0.0), 1.0)
        s = u**4 * (35.0 - 84.0 * u + 70.0 * u * u - 20.0 * u**3)
        ds = u**3 * (140.0 - 420.0 * u + 420.0 * u * u - 140.0 * u**3)
        d2s = u**2 * (420.0 - 1680.0 * u + 2100.0 * u * u - 840.0 * u**3)
        dp = self.p1 - self.p0
        pos = self.p0 + s * dp
        inv_t = 1.0 / self.duration if self.duration > 0 else 0.0
        vel = ds * dp * inv_t
        acc = d2s * dp * inv_t * inv_t
        yaw = self.y0 + s * (self.y1 - self.y0)
        if u >= 1.0:
            vel = np.zeros(3)
            acc = np.zeros(3)
        return pos, vel, acc, yaw


_planner = _Planner()
_hl_time = 0.0
_hl_pos = np.zeros(3)
_hl_yaw = 0.0


def crtpCommanderHighLevelInit():
    global _planner, _hl_time
    _planner = _Planner()
    _hl_time = 0.0


def crtpCommanderHighLevelTellState(state: state_t):
    global _hl_pos, _hl_yaw
    _hl_pos = np.array([state.position.x, state.position.y,
                        state.position.z], float)
    _hl_yaw = math.radians(state.attitude.yaw)


def crtpCommanderHighLevelUpdateTime(t):
    global _hl_time
    _hl_time = float(t)


def crtpCommanderHighLevelStop():
    _planner.active = False


def crtpCommanderHighLevelIsTrajectoryFinished():
    if not _planner.active:
        return True
    return _hl_time >= _planner.t0 + _planner.duration


def _plan_origin():
    """Maneuver start pose: the active plan's current evaluation
    (planner.c plan_current_goal) or, when idle, the told state."""
    if _planner.active:
        pos, _, _, yaw = _planner.eval(_hl_time)
        return pos, yaw
    return _hl_pos.copy(), _hl_yaw


def crtpCommanderHighLevelTakeoff(height, duration):
    p0, y0 = _plan_origin()
    p1 = np.array([p0[0], p0[1], float(height)])
    _planner.plan(_hl_time, p0, y0, p1, y0, duration)


def crtpCommanderHighLevelTakeoffYaw(height, duration, yaw):
    p0, y0 = _plan_origin()
    p1 = np.array([p0[0], p0[1], float(height)])
    _planner.plan(_hl_time, p0, y0, p1, float(yaw), duration)


def crtpCommanderHighLevelTakeoffWithVelocity(height, vel, relative):
    p0, y0 = _plan_origin()
    h = float(height) + (p0[2] if relative else 0.0)
    duration = max(abs(h - p0[2]) / max(float(vel), 1e-6), 0.2)
    p1 = np.array([p0[0], p0[1], h])
    _planner.plan(_hl_time, p0, y0, p1, y0, duration)


def crtpCommanderHighLevelLand(height, duration):
    p0, y0 = _plan_origin()
    p1 = np.array([p0[0], p0[1], float(height)])
    _planner.plan(_hl_time, p0, y0, p1, y0, duration)


def crtpCommanderHighLevelLandYaw(height, duration, yaw):
    p0, y0 = _plan_origin()
    p1 = np.array([p0[0], p0[1], float(height)])
    _planner.plan(_hl_time, p0, y0, p1, float(yaw), duration)


def crtpCommanderHighLevelLandWithVelocity(height, vel, relative):
    p0, y0 = _plan_origin()
    h = float(height) + (p0[2] if relative else 0.0)
    duration = max(abs(p0[2] - h) / max(float(vel), 1e-6), 0.2)
    p1 = np.array([p0[0], p0[1], h])
    _planner.plan(_hl_time, p0, y0, p1, y0, duration)


def crtpCommanderHighLevelGoTo(x, y, z, yaw, duration, relative):
    p0, y0 = _plan_origin()
    if relative:
        p1 = p0 + np.array([x, y, z], float)
        y1 = y0 + float(yaw)
    else:
        p1 = np.array([x, y, z], float)
        y1 = float(yaw)
    _planner.plan(_hl_time, p0, y0, p1, y1, duration)


def crtpCommanderHighLevelGetSetpoint(setpoint: setpoint_t, state: state_t):
    if _planner.active:
        pos, vel, acc, yaw = _planner.eval(_hl_time)
    else:  # no active plan: hover at the most recently told pose
        pos, vel, acc, yaw = _hl_pos, np.zeros(3), np.zeros(3), _hl_yaw
    setpoint.position.x, setpoint.position.y, setpoint.position.z = pos
    setpoint.velocity.x, setpoint.velocity.y, setpoint.velocity.z = vel
    (setpoint.acceleration.x, setpoint.acceleration.y,
     setpoint.acceleration.z) = acc
    setpoint.attitude.yaw = math.degrees(yaw)
    setpoint.attitudeRate.roll = 0.0
    setpoint.attitudeRate.pitch = 0.0
    setpoint.attitudeRate.yaw = 0.0
    half = yaw / 2.0
    setpoint.attitudeQuaternion.x = 0.0
    setpoint.attitudeQuaternion.y = 0.0
    setpoint.attitudeQuaternion.z = math.sin(half)
    setpoint.attitudeQuaternion.w = math.cos(half)
    setpoint.mode.x = modeAbs
    setpoint.mode.y = modeAbs
    setpoint.mode.z = modeAbs
    setpoint.mode.quat = modeAbs
    setpoint.mode.yaw = modeAbs
    setpoint.mode.roll = modeDisable
    setpoint.mode.pitch = modeDisable
