"""Checkpoint/resume: training resumes bit-exactly from a saved state."""
import numpy as np

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu import params as P
from gym_pybullet_drones_tpu.envs import AviaryConfig, HoverTask
from gym_pybullet_drones_tpu.rl import PPOConfig, make_train
from gym_pybullet_drones_tpu.utils.checkpoint import (
    restore_checkpoint, save_checkpoint)
from gym_pybullet_drones_tpu.utils.enums import ActionType, Physics


def test_checkpoint_roundtrip_resume(tmp_path):
    cfg = AviaryConfig(drone=P.CF2X, num_drones=1, physics=Physics.DYN,
                       pyb_freq=240, ctrl_freq=30)
    task = HoverTask(act=ActionType.RPM)
    ppo = PPOConfig(num_envs=4, rollout_steps=8, num_minibatches=2,
                    update_epochs=1)
    init, update, _, _ = make_train(cfg, task, ppo)
    upd = jax.jit(update)
    ts = init(jax.random.key(0))
    ts, _ = upd(ts)

    path = save_checkpoint(str(tmp_path / "ckpt"), ts)
    target = ts._replace(key=jax.random.key_data(ts.key))
    target = jax.tree.map(np.zeros_like, target)
    target = target._replace(key=jax.random.wrap_key_data(
        jnp.asarray(target.key)))
    restored = restore_checkpoint(path, target)
    a_leaves = jax.tree.leaves(ts._replace(key=jax.random.key_data(ts.key)))
    b_leaves = jax.tree.leaves(
        restored._replace(key=jax.random.key_data(restored.key)))
    for a, b in zip(a_leaves, b_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # continuing from original vs restored is identical
    a1, m1 = upd(ts)
    a2, m2 = upd(restored)
    for x, y in zip(jax.tree.leaves(a1.params), jax.tree.leaves(a2.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert float(m1["mean_reward"]) == float(m2["mean_reward"])
