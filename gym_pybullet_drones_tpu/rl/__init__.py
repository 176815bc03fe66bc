"""On-device reinforcement learning: PPO learner, rollout, evaluation."""
from gym_pybullet_drones_tpu.rl.ppo import (  # noqa: F401
    PPOConfig,
    TrainState,
    Transition,
    make_train,
)
