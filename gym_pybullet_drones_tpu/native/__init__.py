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
