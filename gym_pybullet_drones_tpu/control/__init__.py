"""Controllers: DSL cascaded PID, CTBR, firmware-style Mellinger/PID."""
from gym_pybullet_drones_tpu.control.dsl_pid import DSLPIDControl, PIDState  # noqa: F401
from gym_pybullet_drones_tpu.control.ctbr import CTBRControl, compute_ctbr  # noqa: F401
from gym_pybullet_drones_tpu.control import firmware  # noqa: F401
from gym_pybullet_drones_tpu.control.commander import HighLevelCommander  # noqa: F401
