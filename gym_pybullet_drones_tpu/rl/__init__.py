"""On-device reinforcement learning: PPO learner, rollout, evaluation."""
from gym_pybullet_drones_tpu.rl.ppo import (  # noqa: F401
    PPOConfig,
    TrainState,
    Transition,
    make_train,
)
from gym_pybullet_drones_tpu.rl.population import (  # noqa: F401
    make_sharded_population_update,
    make_train_population,
    shard_population,
)
