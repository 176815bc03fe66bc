"""Native (C++) runtime components, bound through ctypes.

The reference's native layer is PyBullet's C++ engine; here the TPU compute
path is JAX/XLA and the native layer provides host-side components:

- dynamics oracle (`dyn_rollout`): an independent C++ double-precision
  implementation of the DYN physics contract for cross-verification of the
  JAX kernels from outside the Python/XLA stack.

The shared library is compiled on demand with g++ on first use and cached
next to the sources.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libdyn_oracle.so")
_SRC = os.path.join(_DIR, "dynamics_oracle.cpp")
_BRIDGE_SO = os.path.join(_DIR, "libsitl_bridge.so")
_BRIDGE_SRC = os.path.join(_DIR, "sitl_bridge.cpp")

_MODEL_CODE = {"cf2x": 0, "cf2p": 1, "racer": 2}


def _build() -> str:
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True, capture_output=True)
    return _SO


_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(_build())
        dp = ctypes.POINTER(ctypes.c_double)
        _lib.dyn_rollout.argtypes = [
            dp, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
            dp, dp, dp, dp, dp, dp, dp]
        _lib.dyn_rollout.restype = None
    return _lib


def available() -> bool:
    """True if the native oracle can be built/loaded on this host."""
    try:
        _get_lib()
        return True
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return False


def dyn_rollout(params, pos, quat, vel, rpy_rates, rpms, dt,
                return_traj: bool = False):
    """Native rollout of the explicit dynamics.

    params: DroneParams; state arrays (B, dim) float64; rpms (T, B, 4).
    Returns dict of final state arrays (+ 'traj' (T, B, 3) if requested).
    """
    lib = _get_lib()
    p = np.ascontiguousarray(
        [params.m, params.l, params.kf, params.km, params.ixx, params.iyy,
         params.izz], dtype=np.float64)
    pos = np.ascontiguousarray(pos, np.float64).copy()
    quat = np.ascontiguousarray(quat, np.float64).copy()
    vel = np.ascontiguousarray(vel, np.float64).copy()
    rates = np.ascontiguousarray(rpy_rates, np.float64).copy()
    rpms = np.ascontiguousarray(rpms, np.float64)
    B = pos.shape[0]
    T = rpms.shape[0]
    ang_v = np.zeros_like(pos)
    traj = np.zeros((T, B, 3)) if return_traj else None

    as_ptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    lib.dyn_rollout(
        as_ptr(p), _MODEL_CODE[params.model.value], B, T,
        ctypes.c_double(dt), as_ptr(pos), as_ptr(quat), as_ptr(vel),
        as_ptr(rates), as_ptr(ang_v),
        as_ptr(rpms), as_ptr(traj) if return_traj else None)
    out = {"pos": pos, "quat": quat, "vel": vel, "rpy_rates": rates,
           "ang_v": ang_v}
    if return_traj:
        out["traj"] = traj
    return out


# ---------------------------------------------------------------------------
# Betaflight SITL UDP bridge shim (sitl_bridge.cpp)
# ---------------------------------------------------------------------------
_bridge_lib = None


def _get_bridge_lib():
    global _bridge_lib
    if _bridge_lib is None:
        if (not os.path.exists(_BRIDGE_SO) or
                os.path.getmtime(_BRIDGE_SO) < os.path.getmtime(_BRIDGE_SRC)):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", _BRIDGE_SO,
                 _BRIDGE_SRC], check=True, capture_output=True)
        lib = ctypes.CDLL(_BRIDGE_SO)
        lib.sitl_bridge_create.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.sitl_bridge_create.restype = ctypes.c_void_p
        lib.sitl_bridge_tick.argtypes = [
            ctypes.c_void_p, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_ushort),
            ctypes.POINTER(ctypes.c_float)]
        lib.sitl_bridge_tick.restype = ctypes.c_int
        lib.sitl_bridge_destroy.argtypes = [ctypes.c_void_p]
        _bridge_lib = lib
    return _bridge_lib


class SitlBridge:
    """Native per-drone UDP bridge to a Betaflight SITL process.

    One `tick()` sends the FDM + RC packets and polls PWMs in a single C
    call — the high-rate alternative to the Python socket loop in
    envs/beta_aviary.py for 500 Hz SITL operation.
    """

    def __init__(self, ip: str = "127.0.0.1", index: int = 0):
        self._lib = _get_bridge_lib()
        self._handle = self._lib.sitl_bridge_create(ip.encode(), index)
        if not self._handle:
            raise OSError("sitl_bridge_create failed (port in use?)")
        self._pwm = np.zeros(4, np.float32)

    def tick(self, t: float, w_body, rc_channels):
        """Send state/RC for time t; returns (fresh: bool, pwm: (4,))."""
        w = np.ascontiguousarray(w_body, np.float64)
        rc = np.ascontiguousarray(rc_channels, np.uint16)
        assert rc.shape == (16,)
        res = self._lib.sitl_bridge_tick(
            self._handle, ctypes.c_double(t),
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            rc.ctypes.data_as(ctypes.POINTER(ctypes.c_ushort)),
            self._pwm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return res == 1, self._pwm.copy()

    def close(self):
        if self._handle:
            self._lib.sitl_bridge_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
