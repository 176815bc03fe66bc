"""Golden-image camera-geometry tests (VERDICT round-1 item #6).

The REFERENCE's own _getDroneImages code (BaseAviary.py:565-617) runs
verbatim under tests/ref_harness and computes its view/projection matrices
through the shim's gluLookAt / perspective math (the same formulas the real
PyBullet C API uses).  Known landmark centers are projected through those
reference-computed matrices to pixel coordinates; ops/render.py must place
the same objects at the same pixels (segmentation-mask centroid within
~2 px) under the identical camera pose.  This pins eye placement, look-at
direction, up vector, the FOV-60/aspect-1.0 quirk (64x48 image with square
pixels), and the NDC->pixel mapping.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_harness import load_reference  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from gym_pybullet_drones_tpu import params as P  # noqa: E402
from gym_pybullet_drones_tpu.ops import quat as quat_ops  # noqa: E402
from gym_pybullet_drones_tpu.ops import render  # noqa: E402

F64 = jnp.float64


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def _project(view, proj, point):
    """world point -> (u, v) pixel in a 64x48 image via the column-major
    OpenGL matrices PyBullet returns."""
    V = np.array(view).reshape(4, 4).T      # column-major -> row-major
    Pm = np.array(proj).reshape(4, 4).T
    p = np.array([point[0], point[1], point[2], 1.0])
    clip = Pm @ (V @ p)
    ndc = clip[:3] / clip[3]
    u = (ndc[0] + 1) / 2 * 64
    v = (1 - ndc[1]) / 2 * 48
    return u, v


def _reference_camera_matrices(ref, pos, rpy):
    """Drive the reference's own camera-setup code path to the matrices."""
    import pybullet as pb
    from gym_pybullet_drones.envs.BaseRLAviary import BaseRLAviary
    from gym_pybullet_drones.utils.enums import (
        DroneModel, ObservationType, ActionType, Physics)

    env = BaseRLAviary(drone_model=DroneModel.CF2X, num_drones=1,
                       initial_xyzs=np.asarray([pos]),
                       initial_rpys=np.asarray([rpy]),
                       physics=Physics.DYN, pyb_freq=240, ctrl_freq=48,
                       obs=ObservationType.RGB, act=ActionType.RPM)
    env._getDroneImages(0, segmentation=False)  # records (w, h, view, proj)
    client = pb._client(env.CLIENT)
    w, h, view, proj = client.last_camera
    env.close()
    assert (w, h) == (64, 48)
    return view, proj


LANDMARKS = [
    # (world point, my seg id): centers of the reference's 4 RGB landmarks
    # (BaseRLAviary._addObstacles :106-126) as modeled by
    # render.landmark_scene
    (np.array([-1.0, 0.0, 0.1]), 3),   # duck -> sphere
    (np.array([1.0, 0.0, 0.1]), 1),    # block -> box
    (np.array([0.0, -1.0, 0.1]), 4),   # teddy -> sphere
]


@pytest.mark.parametrize("landmark_idx", range(len(LANDMARKS)))
def test_landmark_projection_matches_reference_camera(ref, landmark_idx):
    point, seg_id = LANDMARKS[landmark_idx]
    # place the camera drone 1.2 m from the landmark, facing it
    to_cam = np.array([0.9, 0.35, 0.25])
    pos = point + to_cam
    yaw = np.arctan2(point[1] - pos[1], point[0] - pos[0])
    rpy = np.array([0.0, 0.0, yaw])

    view, proj = _reference_camera_matrices(ref, pos, rpy)
    u_ref, v_ref = _project(view, proj, point)
    assert 2 < u_ref < 62 and 2 < v_ref < 46, "landmark must be in frame"

    quat = quat_ops.rpy_to_quat(jnp.asarray(rpy, F64))
    rot = quat_ops.quat_to_mat(quat)
    rgb, dep, seg = render.render(
        P.CF2X, render.landmark_scene(F64), jnp.asarray(pos, F64), rot,
        width=64, height=48)
    seg = np.asarray(seg)
    mask = seg == seg_id
    assert mask.any(), f"landmark id {seg_id} not rendered (seg ids: " \
        f"{np.unique(seg)})"
    vs, us = np.nonzero(mask)
    u_my, v_my = us.mean() + 0.5, vs.mean() + 0.5
    assert abs(u_my - u_ref) < 2.0 and abs(v_my - v_ref) < 2.0, (
        f"landmark {landmark_idx}: reference projects to "
        f"({u_ref:.2f}, {v_ref:.2f}), renderer centroid at "
        f"({u_my:.2f}, {v_my:.2f})")


def test_depth_at_landmark_matches_projection(ref):
    """The depth-buffer value at the landmark pixel equals the OpenGL
    depth of the landmark surface through the reference projection."""
    point, seg_id = LANDMARKS[0]
    to_cam = np.array([0.9, 0.35, 0.25])
    pos = point + to_cam
    yaw = np.arctan2(point[1] - pos[1], point[0] - pos[0])
    rpy = np.array([0.0, 0.0, yaw])
    view, proj = _reference_camera_matrices(ref, pos, rpy)

    quat = quat_ops.rpy_to_quat(jnp.asarray(rpy, F64))
    rot = quat_ops.quat_to_mat(quat)
    rgb, dep, seg = render.render(
        P.CF2X, render.landmark_scene(F64), jnp.asarray(pos, F64), rot,
        width=64, height=48)
    seg, dep = np.asarray(seg), np.asarray(dep)
    mask = seg == seg_id
    vs, us = np.nonzero(mask)
    v_c, u_c = int(round(vs.mean())), int(round(us.mean()))
    d_buf = dep[v_c, u_c]

    # expected depth: project the NEAREST surface point of the sphere
    radius = 0.08  # landmark_scene duck sphere
    eye = pos + np.array([0.0, 0.0, P.CF2X.l])
    dir_to = (point - eye) / np.linalg.norm(point - eye)
    surface = point - dir_to * radius
    V = np.array(view).reshape(4, 4).T
    Pm = np.array(proj).reshape(4, 4).T
    clip = Pm @ (V @ np.array([*surface, 1.0]))
    d_ref = (clip[2] / clip[3] + 1) / 2  # NDC z -> [0,1] depth buffer
    assert abs(d_buf - d_ref) < 5e-3, (d_buf, d_ref)
