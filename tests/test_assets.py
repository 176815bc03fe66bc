"""Asset-completeness tests: obstacle URDFs and the shipped beta trajectory.

Covers the equivalents of the reference assets architrave.urdf / box.urdf
(reference examples/debug.py:19-20) and beta-traj.csv
(reference examples/beta.py:91-104).
"""
import csv
import os

import numpy as np
import pytest

from gym_pybullet_drones_tpu import params as P

ASSETS = os.path.join(os.path.dirname(P.__file__), "assets")


def test_obstacle_urdfs_parse_to_engine_tuples():
    beam = P.load_obstacle_urdf(P.obstacle_asset_path("architrave"),
                                (0.5, 0.0, 1.0))
    assert beam == (0.5, 0.0, 1.0, 0.4, 0.025, 0.025)
    box = P.load_obstacle_urdf(P.obstacle_asset_path("box"), (1.0, 2.0, 0.05))
    assert box == (1.0, 2.0, 0.05, 0.025, 0.025, 0.05)


def test_obstacle_urdf_contact_stops_drone():
    """Flying into the architrave beam stops at its -x face."""
    import jax.numpy as jnp
    from gym_pybullet_drones_tpu.ops.rigid_body import PybState, pyb_step

    params = P.CF2X
    beam = P.load_obstacle_urdf(P.obstacle_asset_path("architrave"),
                                (0.5, 0.0, 1.0))
    s = PybState(pos=jnp.asarray([[0.0, 0.0, 1.0]]),
                 quat=jnp.asarray([[0.0, 0.0, 0.0, 1.0]]),
                 vel=jnp.asarray([[0.5, 0.0, 0.0]]),
                 ang_v=jnp.zeros((1, 3)))
    rpm = jnp.full((1, 4), params.hover_rpm)
    max_x = 0.0
    for _ in range(240):
        s = pyb_step(params, s, rpm, 1 / 240, obstacles=(beam,))
        max_x = max(max_x, float(s.pos[0, 0]))
    # beam -x face at 0.5 - 0.4 = 0.1; drone bounding radius 0.06: the
    # drone reaches the face and never penetrates past it (Baumgarte
    # separation may push it back out after the inelastic impact)
    assert max_x <= 0.1 - params.collision_r + 2e-3
    assert max_x > 0.03  # it did reach the face


def test_beta_traj_csv_schema_and_smoothness():
    path = os.path.join(ASSETS, "beta-traj.csv")
    if not os.path.exists(path):
        pytest.skip("beta-traj.csv not generated")
    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert rows[0].keys() >= {"t", "p_x", "p_y", "p_z", "v_x", "v_y", "v_z",
                              "a_lin_x", "a_lin_y", "a_lin_z", "heading",
                              "heading_rate", "total_vel"}
    t = np.array([float(r["t"]) for r in rows])
    pos = np.array([[float(r["p_x"]), float(r["p_y"]), float(r["p_z"])]
                    for r in rows])
    vel = np.array([[float(r["v_x"]), float(r["v_y"]), float(r["v_z"])]
                    for r in rows])
    dt = np.diff(t)
    assert np.allclose(dt, 0.002, atol=1e-9)          # 500 Hz like the SITL
    # velocity column is consistent with the position column
    fd_vel = np.diff(pos, axis=0) / dt[:, None]
    mid_vel = 0.5 * (vel[1:] + vel[:-1])
    assert np.max(np.abs(fd_vel - mid_vel)) < 5e-3
    # starts on the ground at rest, reaches the 1 m circuit altitude
    assert np.allclose(pos[0], 0.0) and np.allclose(vel[0], 0.0)
    assert abs(pos[-1, 2] - 1.0) < 1e-6
