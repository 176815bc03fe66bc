"""Ray-tracer camera tests: geometry, depth, segmentation, RGB obs path."""
import numpy as np

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu import params as P
from gym_pybullet_drones_tpu.ops import render, quat as quat_ops
from gym_pybullet_drones_tpu.utils.enums import ActionType, ObservationType, Physics


def _cam(pos, rpy):
    rot = quat_ops.quat_to_mat(quat_ops.rpy_to_quat(jnp.asarray(rpy, jnp.float32)))
    return jnp.asarray(pos, jnp.float32), rot


def test_render_shapes_and_background():
    pos, rot = _cam([0, 0, 1.0], [0, 0, 0])
    rgba, dep, seg = render.render(P.CF2X, render.landmark_scene(), pos, rot)
    assert rgba.shape == (48, 64, 4) and dep.shape == (48, 64)
    assert seg.shape == (48, 64)
    # looking horizontally from z=1: upper half mostly sky, lower half floor
    top = np.asarray(seg[:10])
    bottom = np.asarray(seg[-10:])
    assert (top == -1).mean() > 0.8
    assert (bottom == 0).mean() > 0.8
    assert np.all(np.asarray(rgba[..., 3]) == 255)


def test_render_sees_landmark():
    # camera at origin looking +x -> red block landmark at [1, 0, .1]
    pos, rot = _cam([0, 0, 0.1], [0, 0, 0])
    rgba, dep, seg = render.render(P.CF2X, render.landmark_scene(), pos, rot)
    seg = np.asarray(seg)
    assert (seg == 1).any(), "red block (id 1) should be visible"
    # block pixels near image center rows
    ys, xs = np.where(seg == 1)
    assert abs(xs.mean() - 32) < 8
    # its pixels are red-dominant
    px = np.asarray(rgba)[seg == 1]
    assert (px[:, 0] > px[:, 2]).mean() > 0.9


def test_render_depth_monotonic():
    pos, rot = _cam([0, 0, 0.1], [0, 0, 0])
    scene = render.landmark_scene()
    rgba, dep, seg = render.render(P.CF2X, scene, pos, rot)
    dep = np.asarray(dep); seg = np.asarray(seg)
    # landmark closer than the far plane -> depth buffer < 1
    assert dep[seg == 1].max() < 0.99999
    # sky pixels at the far plane
    assert np.allclose(dep[seg == -1], dep[seg == -1].max())


def test_render_sees_other_drones():
    pos, rot = _cam([0, 0, 0.5], [0, 0, 0])
    others = jnp.asarray([[0.5, 0.0, 0.5]], jnp.float32)  # directly ahead
    rgba, dep, seg = render.render(P.CF2X, render.empty_scene(), pos, rot,
                                   drone_pos=others)
    assert (np.asarray(seg) == 100).any()


def test_rgb_observation_env():
    from gym_pybullet_drones_tpu.envs import HoverAviary
    env = HoverAviary(physics=Physics.DYN, obs=ObservationType.RGB,
                      act=ActionType.RPM)
    obs, _ = env.reset()
    assert obs.shape == (1, 48, 64, 4)
    obs2, r, te, tr, _ = env.step(np.zeros((1, 4), np.float32))
    assert obs2.shape == (1, 48, 64, 4)
    assert 0 <= obs2.min() and obs2.max() <= 255


def test_batched_render_under_vmap():
    B = 4
    pos = jnp.tile(jnp.asarray([0, 0, 0.3], jnp.float32), (B, 1))
    rot = jnp.tile(jnp.eye(3, dtype=jnp.float32), (B, 1, 1))
    f = jax.jit(lambda p, r: render.render(
        P.CF2X, render.landmark_scene(), p, r))
    rgba, dep, seg = f(pos, rot)
    assert rgba.shape == (B, 48, 64, 4)


def test_tinyrenderer_shading_per_object_rgb():
    """Per-object RGB vs an independent NumPy shading oracle (VERDICT r3
    next #7): rendered colors must equal
    base_color * (AMBIENT + DIFFUSE * max(0, N.L)) — the TinyRenderer
    fragment model transcribed in ops/render.py — recomputed here from the
    module constants with closed-form normals (no renderer code reused).

    Scope (PARITY.md): the shading MODEL is the transcription target; the
    base palette stands in for pybullet_data's URDF/MTL materials, whose
    asset files do not exist offline.
    """
    scene = render.landmark_scene()
    A, D = render.AMBIENT, render.DIFFUSE
    L = np.asarray(render.LIGHT_DIR, np.float64)
    L = L / np.linalg.norm(L)

    # camera at (0.3, 0, 0.1) looking +x: the red block's -x face fills
    # part of the frame.  Face normal (-1,0,0) => N.L < 0 => pure ambient.
    pos, rot = _cam([0.3, 0.0, 0.1], [0, 0, 0])
    rgba, _, seg = render.render(P.CF2X, scene, pos, rot)
    rgba, seg = np.asarray(rgba), np.asarray(seg)
    block = rgba[seg == 1][:, :3]
    assert block.shape[0] > 20
    expected = np.clip(np.asarray(scene.box_color[0]) * A * 255.0, 0, 255)
    np.testing.assert_allclose(block.mean(axis=0), expected, atol=1.0)
    # every face pixel identical (flat normal => flat shade)
    assert np.ptp(block, axis=0).max() <= 1.0

    # ground plane in the same frame: normal (0,0,1) => lam = L_z exactly;
    # two checker greys 0.75 / 0.55 (ops/render.py)
    ground = rgba[seg == 0][:, 0].astype(np.float64)  # greys: r==g==b
    shade = A + D * L[2]
    exp_hi, exp_lo = 0.75 * shade * 255.0, 0.55 * shade * 255.0
    assert ground.size > 100
    hi = ground[np.abs(ground - exp_hi) < np.abs(ground - exp_lo)]
    lo = ground[np.abs(ground - exp_hi) >= np.abs(ground - exp_lo)]
    assert hi.size and lo.size
    np.testing.assert_allclose(hi, exp_hi, atol=1.0)
    np.testing.assert_allclose(lo, exp_lo, atol=1.0)

    # duck sphere: shading is a scalar, so every pixel must keep the
    # palette's channel RATIOS, with shade inside [A, A + D]
    pos, rot = _cam([-0.7, 0.0, 0.1], [0, 0, np.pi])
    rgba, _, seg = render.render(P.CF2X, scene, pos, rot)
    rgba, seg = np.asarray(rgba), np.asarray(seg)
    duck = rgba[seg == 3][:, :3].astype(np.float64)
    assert duck.shape[0] > 10
    base = np.asarray(scene.sphere_color[0], np.float64)
    shade_per_chan = duck / (base * 255.0)       # (Npix, 3)
    # channel-wise recovered shade agrees (color ratios preserved)...
    assert np.abs(shade_per_chan - shade_per_chan[:, :1]).max() < 0.02
    # ...and lies in the ambient..full-diffuse band
    assert shade_per_chan.min() >= A - 0.02
    assert shade_per_chan.max() <= A + D + 0.02
