"""Shim of pybullet_data: only getDataPath() is consumed by the reference
(BaseAviary.py:482).  Returns this directory; the pybullet shim resolves the
builtin asset names ("plane.urdf", "duck_vhacd.urdf", ...) from an internal
registry instead of reading files."""
import os


def getDataPath():
    return os.path.dirname(os.path.abspath(__file__))
