"""Batched analytic ray-tracing camera: RGB / depth / segmentation.

TPU-native replacement of the CPU TinyRenderer camera the reference drives
through `p.getCameraImage` (reference BaseAviary._getDroneImages:565-617):
instead of a host-side C++ rasterizer, the scene is a small set of analytic
primitives (ground plane, landmark boxes/spheres, drone bodies) intersected
in closed form — one fused XLA program renders every pixel of every drone of
every env in parallel, so vision observations stay on device for RL.

Camera parity with the reference: eye at drone pos + [0, 0, L], looking
along the body +x axis (target = pos + R @ [1000, 0, 0]), up [0, 0, 1],
vertical FOV 60 deg, aspect 1.0, near L, far 1000, resolution 64x48
(reference :595-604, IMG_RES at :135).  Depth is returned as an OpenGL-style
normalized depth buffer like PyBullet's; segmentation is an int32 object id
(-1 background, 0 plane, 1.. scene objects, 100+ drones).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from gym_pybullet_drones_tpu.params import DroneParams

FOV_DEG = 60.0
NEAR_FAR = (None, 1000.0)  # near comes from params.l
BIG = 1e9


class Scene(NamedTuple):
    """Static primitive scene (device arrays; leading axis = object index)."""

    sphere_center: jnp.ndarray   # (S, 3)
    sphere_radius: jnp.ndarray   # (S,)
    sphere_color: jnp.ndarray    # (S, 3)
    sphere_id: jnp.ndarray       # (S,) int32
    box_center: jnp.ndarray      # (B, 3)
    box_half: jnp.ndarray        # (B, 3)
    box_color: jnp.ndarray       # (B, 3)
    box_id: jnp.ndarray          # (B,) int32


def landmark_scene(dtype=jnp.float32) -> Scene:
    """The 4-landmark RGB-observation scene (reference BaseRLAviary.py:99-128:
    block @ [1,0,.1], small cube @ [0,1,.1], duck @ [-1,0,.1],
    teddy @ [0,-1,.1] — modeled as colored boxes/spheres)."""
    return Scene(
        sphere_center=jnp.asarray([[-1, 0, 0.1], [0, -1, 0.1]], dtype),
        sphere_radius=jnp.asarray([0.08, 0.1], dtype),
        sphere_color=jnp.asarray([[0.95, 0.8, 0.1], [0.6, 0.4, 0.2]], dtype),
        sphere_id=jnp.asarray([3, 4], jnp.int32),
        box_center=jnp.asarray([[1, 0, 0.1], [0, 1, 0.05]], dtype),
        box_half=jnp.asarray([[0.05, 0.05, 0.1], [0.025, 0.025, 0.05]],
                             dtype),
        box_color=jnp.asarray([[0.8, 0.1, 0.1], [0.1, 0.3, 0.85]], dtype),
        box_id=jnp.asarray([1, 2], jnp.int32),
    )


def empty_scene(dtype=jnp.float32) -> Scene:
    return Scene(
        sphere_center=jnp.zeros((0, 3), dtype),
        sphere_radius=jnp.zeros((0,), dtype),
        sphere_color=jnp.zeros((0, 3), dtype),
        sphere_id=jnp.zeros((0,), jnp.int32),
        box_center=jnp.zeros((0, 3), dtype),
        box_half=jnp.zeros((0, 3), dtype),
        box_color=jnp.zeros((0, 3), dtype),
        box_id=jnp.zeros((0,), jnp.int32),
    )


def _ray_sphere(origin, direction, center, radius):
    """Smallest positive t of |o + t d - c| = r, else BIG.

    origin/direction: (..., 1, 3); center: (S, 3); radius: (S,).
    Returns t (..., S) and unit normals (..., S, 3).
    """
    oc = origin - center                                   # (..., S, 3)
    b = jnp.sum(oc * direction, axis=-1)                   # (..., S)
    c = jnp.sum(oc * oc, axis=-1) - radius * radius
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where(t0 > 1e-4, t0, t1)
    t = jnp.where((disc > 0) & (t > 1e-4), t, BIG)
    hit = origin + t[..., None] * direction - center
    n = hit / jnp.maximum(jnp.linalg.norm(hit, axis=-1, keepdims=True),
                          1e-9)
    return t, n


def _ray_box(origin, direction, center, half):
    """Slab-method AABB intersection; returns (t, normal)."""
    inv = 1.0 / jnp.where(jnp.abs(direction) > 1e-9, direction,
                          jnp.where(direction >= 0, 1e-9, -1e-9))
    lo = (center - half - origin) * inv                    # (..., B, 3)
    hi = (center + half - origin) * inv
    tmin_axis = jnp.minimum(lo, hi)
    tmax_axis = jnp.maximum(lo, hi)
    tmin = jnp.max(tmin_axis, axis=-1)
    tmax = jnp.min(tmax_axis, axis=-1)
    hit = (tmax > jnp.maximum(tmin, 1e-4))
    t = jnp.where(hit, jnp.where(tmin > 1e-4, tmin, tmax), BIG)
    # normal: axis of entry
    entry_axis = jnp.argmax(tmin_axis, axis=-1)            # (..., B)
    sign = -jnp.sign(jnp.take_along_axis(
        direction, entry_axis[..., None], axis=-1))[..., 0]
    n = jnp.eye(3, dtype=origin.dtype)[entry_axis] * sign[..., None]
    return t, n


def render(params: DroneParams, scene: Scene, cam_pos, cam_rot,
           drone_pos=None, width: int = 64, height: int = 48):
    """Render one drone's POV.  Broadcasts over leading batch dims of
    cam_pos (..., 3) / cam_rot (..., 3, 3).

    drone_pos: optional (M, 3) other-drone positions rendered as spheres.
    Returns (rgb (..., H, W, 4) in [0, 255], depth (..., H, W) buffer values,
    seg (..., H, W) int32).
    """
    dtype = cam_pos.dtype
    near = params.l
    far = 1000.0
    eye = cam_pos + jnp.asarray([0.0, 0.0, params.l], dtype)

    # camera basis (lookAt along body +x, world up)
    forward = cam_rot[..., :, 0]
    up_world = jnp.asarray([0.0, 0.0, 1.0], dtype)
    right = jnp.cross(forward, jnp.broadcast_to(up_world, forward.shape))
    right = right / jnp.maximum(
        jnp.linalg.norm(right, axis=-1, keepdims=True), 1e-6)
    cam_up = jnp.cross(right, forward)

    tan_half = math.tan(math.radians(FOV_DEG) / 2)
    xs = (2 * (jnp.arange(width, dtype=dtype) + 0.5) / width - 1) * tan_half
    ys = (1 - 2 * (jnp.arange(height, dtype=dtype) + 0.5) / height) * tan_half
    px, py = jnp.meshgrid(xs, ys)                          # (H, W)
    # directions: (..., H, W, 3)
    d = (forward[..., None, None, :]
         + px[..., :, :, None] * right[..., None, None, :]
         + py[..., :, :, None] * cam_up[..., None, None, :])
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(eye[..., None, None, :], d.shape)

    # collect primitives: scene spheres + drone spheres
    batch = cam_pos.shape[:-1]
    sph_c, sph_r = scene.sphere_center, scene.sphere_radius
    sph_col, sph_id = scene.sphere_color, scene.sphere_id
    if drone_pos is not None:
        # the camera drone must not render its own body: zero the radius of
        # any drone sphere within 3 arm-lengths of this camera (the eye sits
        # at pos + [0,0,L], inside its own 2L sphere).  The radius is
        # per-camera, so all sphere arrays pick up the batch dims here.
        m = drone_pos.shape[-2]
        d_to_cam = jnp.linalg.norm(
            drone_pos - cam_pos[..., None, :], axis=-1)    # batch + (M,)
        drone_r = jnp.where(d_to_cam < 3 * params.l, 0.0, 2 * params.l)
        drone_c = jnp.broadcast_to(drone_pos, batch + (m, 3))
        drone_col = jnp.broadcast_to(
            jnp.asarray([0.35, 0.35, 0.4], dtype), batch + (m, 3))
        drone_id = 100 + jnp.arange(m, dtype=jnp.int32)
        s = scene.sphere_radius.shape[0]
        sph_c = jnp.concatenate(
            [jnp.broadcast_to(sph_c, batch + (s, 3)), drone_c], axis=-2)
        sph_r = jnp.concatenate(
            [jnp.broadcast_to(sph_r, batch + (s,)), drone_r], axis=-1)
        sph_col = jnp.concatenate(
            [jnp.broadcast_to(sph_col, batch + (s, 3)), drone_col], axis=-2)
        sph_id = jnp.concatenate([sph_id, drone_id], axis=0)

    o_ = o[..., None, :]
    d_ = d[..., None, :]

    def bexp(a, trailing):
        """Broadcast primitive array over batch dims + add the pixel axes."""
        a = jnp.broadcast_to(a, batch + a.shape[a.ndim - trailing:])
        return a.reshape(batch + (1, 1) + a.shape[len(batch):])

    t_s, n_s = _ray_sphere(o_, d_, bexp(sph_c, 2),
                           bexp(sph_r, 1))                 # (..., H, W, S)
    t_b, n_b = _ray_box(o_, d_, bexp(scene.box_center, 2),
                        bexp(scene.box_half, 2))

    # ground plane z = 0 (checkerboard)
    dz = d[..., 2]
    t_p = jnp.where(jnp.abs(dz) > 1e-6, -o[..., 2] / dz, BIG)
    t_p = jnp.where(t_p > 1e-4, t_p, BIG)
    hit_p = o + t_p[..., None] * d
    checker = ((jnp.floor(hit_p[..., 0]) + jnp.floor(hit_p[..., 1])) % 2)
    plane_col = jnp.where(checker[..., None] > 0.5,
                          jnp.asarray([0.75, 0.75, 0.75], dtype),
                          jnp.asarray([0.55, 0.55, 0.55], dtype))

    # merge: find closest among [spheres..., boxes..., plane]
    all_t = jnp.concatenate([t_s, t_b, t_p[..., None]], axis=-1)
    n_plane = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], dtype),
                               n_s.shape[:-2] + (1, 3))
    all_n = jnp.concatenate([n_s, n_b, n_plane], axis=-2)
    sphere_cols = jnp.broadcast_to(bexp(sph_col, 2), t_s.shape + (3,))
    box_cols = jnp.broadcast_to(bexp(scene.box_color, 2), t_b.shape + (3,))
    all_col = jnp.concatenate(
        [sphere_cols, box_cols, plane_col[..., None, :]], axis=-2)
    all_id = jnp.concatenate(
        [sph_id, scene.box_id, jnp.zeros((1,), jnp.int32)])

    idx = jnp.argmin(all_t, axis=-1)                       # (..., H, W)
    t_hit = jnp.take_along_axis(all_t, idx[..., None], axis=-1)[..., 0]
    n_hit = jnp.take_along_axis(
        all_n, idx[..., None, None].repeat(3, -1), axis=-2)[..., 0, :]
    col_hit = jnp.take_along_axis(
        all_col, idx[..., None, None].repeat(3, -1), axis=-2)[..., 0, :]
    seg = jnp.where(t_hit < far, all_id[idx], -1)

    # lambertian shading + sky background
    light = jnp.asarray([0.4, 0.3, 0.85], dtype)
    light = light / jnp.linalg.norm(light)
    lam = jnp.maximum(jnp.sum(n_hit * light, axis=-1), 0.0)
    shade = (0.35 + 0.65 * lam)[..., None] * col_hit
    sky = jnp.asarray([0.7, 0.85, 1.0], dtype)
    rgb = jnp.where((t_hit < far)[..., None], shade, sky)
    rgb = jnp.clip(rgb * 255.0, 0, 255)
    alpha = jnp.full(rgb.shape[:-1] + (1,), 255.0, dtype)
    rgba = jnp.concatenate([rgb, alpha], axis=-1)

    # OpenGL-style depth buffer value (what p.getCameraImage returns)
    z = jnp.clip(t_hit, near, far)
    depth = (far / (far - near)) * (1.0 - near / z)
    return rgba, depth, seg
