"""Environments: functional core, task layer, Gymnasium adapters."""
from gym_pybullet_drones_tpu.envs.core import (  # noqa: F401
    AviaryConfig,
    EnvState,
    adjacency_matrix,
    next_waypoint,
    reset,
    state_vector,
    step,
    step_autoreset,
)
from gym_pybullet_drones_tpu.envs.tasks import (  # noqa: F401
    CtrlTask,
    HoverTask,
    MultiHoverTask,
    RLTask,
    VelocityTask,
)
from gym_pybullet_drones_tpu.envs.gym_adapter import (  # noqa: F401
    BatchedEnv,
    CtrlAviary,
    FunctionalAviary,
    HoverAviary,
    MultiHoverAviary,
    VelocityAviary,
)
from gym_pybullet_drones_tpu.envs.cf_aviary import CFAviary  # noqa: F401
from gym_pybullet_drones_tpu.envs.beta_aviary import BetaAviary  # noqa: F401
from gym_pybullet_drones_tpu.envs.routing import RoutingTask, make_routing_config  # noqa: F401
