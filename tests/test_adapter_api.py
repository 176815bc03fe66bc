"""Adapter helper APIs and routing task specifics."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from gym_pybullet_drones_tpu import params as P
from gym_pybullet_drones_tpu.envs import (
    AviaryConfig, CtrlAviary, RoutingTask, core, make_routing_config)
from gym_pybullet_drones_tpu.utils.enums import ActionType, Physics
from gym_pybullet_drones_tpu.utils.utils import str2bool, sync


def test_adjacency_matrix_adapter():
    env = CtrlAviary(num_drones=3, physics=Physics.DYN,
                     neighbourhood_radius=0.5,
                     initial_xyzs=np.array([[0, 0, 1], [0.3, 0, 1],
                                            [5, 5, 1]]))
    env.reset()
    adj = env.getAdjacencyMatrix()
    assert adj.shape == (3, 3)
    assert adj[0, 1] == 1 and adj[1, 0] == 1   # within 0.5 m
    assert adj[0, 2] == 0 and adj[1, 2] == 0   # far away
    assert np.all(np.diag(adj) == 1)


def test_drone_images_and_export(tmp_path):
    from gym_pybullet_drones_tpu.utils.enums import ImageType
    env = CtrlAviary(num_drones=2, physics=Physics.DYN,
                     initial_xyzs=np.array([[0, 0, 0.3], [0.8, 0, 0.3]]))
    env.reset()
    rgb, dep, seg = env.getDroneImages(0)
    assert rgb.shape == (48, 64, 4) and dep.shape == (48, 64)
    assert (seg == 101).any()  # sees drone 1 ahead
    p1 = env.exportImage(rgb, str(tmp_path), 0)
    p2 = env.exportImage(dep, str(tmp_path), 1, ImageType.DEP)
    p3 = env.exportImage(seg, str(tmp_path), 2, ImageType.SEG)
    p4 = env.exportImage(rgb, str(tmp_path), 3, ImageType.BW)
    for p in (p1, p2, p3, p4):
        assert os.path.exists(p)


def test_str2bool_and_sync():
    assert str2bool("yes") and str2bool("1") and str2bool(True)
    assert not str2bool("no") and not str2bool("F")
    with pytest.raises(Exception):
        str2bool("maybe")
    import time
    t0 = time.time()
    sync(10, time.time(), 0.05)  # should sleep toward the schedule
    assert time.time() - t0 < 1.0


def test_routing_task_structure():
    cfg, task = make_routing_config(num_drones=3, physics=Physics.DYN)
    assert task.act == ActionType.PID
    st, obs, _ = core.reset(cfg, task)
    # obs = 12 kin + hist(15*3) + goal(3) + neighbor(3)
    assert obs.shape == (3, 12 + 15 * 3 + 6)
    # goal vector points from pos to destination
    goal = np.asarray(obs[0, -6:-3])
    expect = np.asarray(task.destinations[0]) - np.asarray(st.pos[0])
    np.testing.assert_allclose(goal, expect, atol=1e-5)
    # shaped reward (routing.py): ~0 hovering at spawn (no progress, no
    # hold), strongly positive at the goals (hold bonus), and the plain
    # distance form behind shaped=False keeps its old semantics
    far_reward = float(task.compute_reward(cfg, st))
    st_goal = st._replace(pos=jnp.asarray(task.destinations, jnp.float32))
    near_reward = float(task.compute_reward(cfg, st_goal))
    assert near_reward > far_reward
    assert near_reward >= 3 * task.arrival_hold - 1e-3  # all hold bonuses
    assert bool(task.compute_terminated(cfg, st_goal))
    import dataclasses as _dc
    raw = _dc.replace(task, shaped=False)
    assert float(raw.compute_reward(cfg, st)) < 0
    assert float(raw.compute_reward(cfg, st_goal)) >= 3 * 10.0 - 1e-3
    # collision penalty: stack all drones at one point
    st_crash = st._replace(pos=jnp.zeros((3, 3), jnp.float32)
                           .at[:, 2].set(1.0))
    crash_reward = float(task.compute_reward(cfg, st_crash))
    assert crash_reward < far_reward


def test_routing_step_size_respected():
    cfg, task0 = make_routing_config(num_drones=1, physics=Physics.DYN)
    import dataclasses
    task = dataclasses.replace(task0, step_size=0.25)
    st, obs, _ = core.reset(cfg, task)
    far_target = jnp.asarray([[100.0, 0.0, 0.3]], jnp.float32)
    rpm, st2 = task.preprocess_action(cfg, st, far_target)
    # embedded PID got a waypoint <= 0.25 m away: the commanded attitude is
    # bounded, so rpm stays finite and sane
    assert bool(jnp.all(jnp.isfinite(rpm)))
