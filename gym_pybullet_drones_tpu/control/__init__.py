"""Controllers: DSL cascaded PID, CTBR, firmware-style Mellinger/PID."""
from gym_pybullet_drones_tpu.control.dsl_pid import DSLPIDControl, PIDState  # noqa: F401
