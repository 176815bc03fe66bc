"""Harness that executes the ACTUAL reference code as the parity oracle.

Round-1 parity tests bottomed out in `tests/_oracle.py`, a transcription of
the reference equations written by the same author as the kernels under test
(VERDICT.md round 1, "What's missing" #1).  This package closes that loop:
it provides just enough of the `pybullet` C-extension API (plus
`pybullet_data`, `pkg_resources`, and `transforms3d` shims) for the genuine
reference package at /root/reference/gym_pybullet_drones to import and run
VERBATIM — every line of BaseAviary._dynamics/_groundEffect/_drag/_downwash,
DSLPIDControl, CtrlAviary, HoverAviary, etc. is the reference's own Python,
executed unmodified.

What the shim supplies (see shims/pybullet.py for the exact inventory):
- a float64 state store (loadURDF / resetBasePositionAndOrientation /
  getBasePositionAndOrientation / getBaseVelocity / getLinkStates ...) — in
  DYN mode PyBullet is ONLY a state store (reference BaseAviary.py:815-874
  never calls stepSimulation, :369-370 skips it for Physics.DYN), so the DYN
  parity chain contains no shim-authored dynamics at all;
- Bullet's quaternion/Euler/matrix conversions, transcribed from the Bullet
  C sources and independently cross-checked against scipy.spatial.transform
  (tests/test_reference_parity.py::test_shim_quat_matches_scipy);
- a semi-implicit rigid-body stepSimulation that mirrors the documented
  semantics of gym_pybullet_drones_tpu.ops.rigid_body (the PYB*-mode tests
  are therefore *plumbing* parity — force assembly, frames, application
  points, stale-action ordering — not Bullet-integrator parity, which
  SURVEY.md §7.4 scopes out).

Usage:  ref = load_reference()  (idempotent; installs shims on sys.path).
"""
from __future__ import annotations

import os
import sys

SHIMS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "shims")
REFERENCE_DIR = "/root/reference"


def load_reference():
    """Import and return the genuine reference package under the shims.

    Inserts the shim directory at the FRONT of sys.path so `import pybullet`
    inside the reference resolves to the shim (the real extension is not
    installed in this image), and appends /root/reference so the reference
    package itself resolves.  Idempotent.
    """
    if SHIMS_DIR not in sys.path:
        sys.path.insert(0, SHIMS_DIR)
    if REFERENCE_DIR not in sys.path:
        sys.path.append(REFERENCE_DIR)
    import gym_pybullet_drones  # noqa: F401  (the actual reference code)
    return gym_pybullet_drones
