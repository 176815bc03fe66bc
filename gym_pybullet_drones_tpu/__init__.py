"""gym-pybullet-drones-tpu: a TPU-native quadrotor environment suite.

A from-scratch JAX/XLA reimplementation of the capabilities of
gym-pybullet-drones (komxun routing fork): batched quadrotor physics,
embedded controllers, RL task environments, an on-device PPO learner, and
pod-scale sharding — replacing the reference's PyBullet/C++ single-env stack
with jit/vmap-fused kernels over thousands of env instances.
"""
__version__ = "0.1.0"

from gym_pybullet_drones_tpu.params import CF2X, CF2P, RACE, get_params  # noqa: F401
from gym_pybullet_drones_tpu.utils.enums import (  # noqa: F401
    ActionType,
    DroneModel,
    ObservationType,
    Physics,
)
