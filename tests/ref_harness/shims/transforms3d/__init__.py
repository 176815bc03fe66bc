"""Shim of the transforms3d package (not installed in this image): only the
two quaternion helpers BetaAviary.py:9 imports."""
