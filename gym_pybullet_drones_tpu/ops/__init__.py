"""Compute kernels: quaternion math, explicit dynamics, aero effects, contact."""
from gym_pybullet_drones_tpu.ops import quat, dynamics, aero, rigid_body  # noqa: F401
