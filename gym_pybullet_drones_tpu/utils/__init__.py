"""Utilities: enums, logger, wall-clock sync helpers."""
from gym_pybullet_drones_tpu.utils.enums import (  # noqa: F401
    ActionType,
    DroneModel,
    ImageType,
    ObservationType,
    Physics,
)
