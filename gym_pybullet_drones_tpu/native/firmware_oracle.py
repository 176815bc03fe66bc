"""ctypes bindings for the C++ Crazyflie firmware oracle.

Plays the role of pycffirmware (not installable offline) for verification:
tests/test_firmware_oracle.py drives control/firmware.py and
control/firmware_pid.py tick-for-tick against these independent C++
implementations (see native/cf_firmware_oracle.cpp) over full
takeoff-goto-land sequences.  Pattern follows native/__init__.py's
dynamics oracle (build with g++ on demand, cache the .so).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libcf_firmware_oracle.so")
_SRC = os.path.join(_DIR, "cf_firmware_oracle.cpp")

_dp = ctypes.POINTER(ctypes.c_double)


class _MellingerState(ctypes.Structure):
    _fields_ = [("i_error_pos", ctypes.c_double * 3),
                ("i_error_m", ctypes.c_double * 3),
                ("prev_omega", ctypes.c_double * 2)]


class _Pid1(ctypes.Structure):
    _fields_ = [("integ", ctypes.c_double), ("prev_e", ctypes.c_double)]


class _FwPidState(ctypes.Structure):
    _fields_ = [("vx", _Pid1), ("vy", _Pid1), ("vz", _Pid1),
                ("att_roll", _Pid1), ("att_pitch", _Pid1), ("att_yaw", _Pid1),
                ("rate_roll", _Pid1), ("rate_pitch", _Pid1),
                ("rate_yaw", _Pid1),
                ("des_roll", ctypes.c_double), ("des_pitch", ctypes.c_double),
                ("thrust", ctypes.c_double)]


class _Lpf2p(ctypes.Structure):
    _fields_ = [("b0", ctypes.c_double), ("b1", ctypes.c_double),
                ("b2", ctypes.c_double), ("a1", ctypes.c_double),
                ("a2", ctypes.c_double), ("d1", ctypes.c_double),
                ("d2", ctypes.c_double)]


_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.lpf2p_init.argtypes = [ctypes.POINTER(_Lpf2p), ctypes.c_double,
                                   ctypes.c_double]
        lib.lpf2p_apply.argtypes = [ctypes.POINTER(_Lpf2p), ctypes.c_double]
        lib.lpf2p_apply.restype = ctypes.c_double
        lib.mellinger_init.argtypes = [ctypes.POINTER(_MellingerState)]
        lib.mellinger_tick.argtypes = [ctypes.POINTER(_MellingerState)] + \
            [_dp] * 9 + [ctypes.c_double, _dp]
        lib.fwpid_init.argtypes = [ctypes.POINTER(_FwPidState)]
        lib.fwpid_position.argtypes = [ctypes.POINTER(_FwPidState),
                                       ctypes.c_double, _dp, _dp,
                                       ctypes.c_double, _dp]
        lib.fwpid_attitude.argtypes = [ctypes.POINTER(_FwPidState),
                                       ctypes.c_double, _dp, _dp,
                                       ctypes.c_double, _dp]
        lib.power_distribution.argtypes = [_dp, ctypes.c_int, _dp]
        _lib = lib
    return _lib


def available() -> bool:
    try:
        _get_lib()
        return True
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return False


def _arr(x):
    return np.ascontiguousarray(x, np.float64)


def _ptr(a):
    return a.ctypes.data_as(_dp)


class Lpf2pOracle:
    def __init__(self, sample_freq: float, cutoff_freq: float):
        self._lib = _get_lib()
        self._st = _Lpf2p()
        self._lib.lpf2p_init(ctypes.byref(self._st), sample_freq, cutoff_freq)

    def apply(self, sample: float) -> float:
        return self._lib.lpf2p_apply(ctypes.byref(self._st), float(sample))


class MellingerOracle:
    """Stateful Mellinger tick (controller_mellinger.c transcription)."""

    def __init__(self):
        self._lib = _get_lib()
        self._st = _MellingerState()
        self._lib.mellinger_init(ctypes.byref(self._st))

    def tick(self, sp_pos, sp_vel, sp_acc, sp_att_rate_deg, sp_quat,
             pos, vel, quat, gyro_deg, dt: float) -> np.ndarray:
        out = np.zeros(4, np.float64)
        args = [_arr(a) for a in (sp_pos, sp_vel, sp_acc, sp_att_rate_deg,
                                  sp_quat, pos, vel, quat, gyro_deg)]
        self._lib.mellinger_tick(
            ctypes.byref(self._st), *[_ptr(a) for a in args],
            ctypes.c_double(dt), _ptr(out))
        return out


class FirmwarePidOracle:
    """Stateful PID-cascade tick (controller_pid.c transcription)."""

    def __init__(self):
        self._lib = _get_lib()
        self._st = _FwPidState()
        self._lib.fwpid_init(ctypes.byref(self._st))

    def position(self, dt, pos, vel, yaw_deg, target_pos):
        self._lib.fwpid_position(
            ctypes.byref(self._st), ctypes.c_double(dt), _ptr(_arr(pos)),
            _ptr(_arr(vel)), ctypes.c_double(yaw_deg),
            _ptr(_arr(target_pos)))

    def attitude(self, dt, rpy_deg, gyro_deg, target_yaw_deg) -> np.ndarray:
        out = np.zeros(4, np.float64)
        self._lib.fwpid_attitude(
            ctypes.byref(self._st), ctypes.c_double(dt), _ptr(_arr(rpy_deg)),
            _ptr(_arr(gyro_deg)), ctypes.c_double(target_yaw_deg), _ptr(out))
        return out


def power_distribution(control, quad_formation_x: bool = True) -> np.ndarray:
    lib = _get_lib()
    out = np.zeros(4, np.float64)
    lib.power_distribution(_ptr(_arr(control)),
                           1 if quad_formation_x else 0, _ptr(out))
    return out
