"""Import smoke test (reference tests/test_build.py parity)."""


def test_imports():
    import gym_pybullet_drones_tpu
    import gym_pybullet_drones_tpu.envs
    import gym_pybullet_drones_tpu.control
    import gym_pybullet_drones_tpu.rl
    import gym_pybullet_drones_tpu.parallel
    import gym_pybullet_drones_tpu.ops
    import gym_pybullet_drones_tpu.utils
    import gym_pybullet_drones_tpu.models
