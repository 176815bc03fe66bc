"""Generate assets/cf2.dae — an own-authored COLLADA visual mesh of a
Crazyflie-2-class quadrotor.

The reference ships a detailed artist-made `cf2.dae` referenced by its
URDF `<visual>` tags (reference assets/cf2x.urdf:24); that binary-ish
asset cannot be redistributed here, so this script procedurally builds a
geometric stand-in with the airframe's true dimensions (params.py): a
center hub, four arms to the prop positions, and four prop disks.  Units
are meters, Z-up, matching the URDF convention.

Usage: python scripts/gen_cf2_dae.py [out.dae]
"""
from __future__ import annotations

import sys
import math
import os

ARM_XY = 0.028          # prop offset |x| = |y| (params.CF2X.prop_offsets)
PROP_R = 0.02295        # params prop_radius
HUB = 0.015             # hub half-extent xy
HUB_H = 0.01            # hub half-height
ARM_W = 0.004           # arm half-width
PROP_Z = 0.011          # prop plane height above CoM


def _box(cx, cy, cz, hx, hy, hz):
    """8 vertices + 12 triangles of an axis-aligned box."""
    vs = [(cx + sx * hx, cy + sy * hy, cz + sz * hz)
          for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    f = [(0, 1, 3), (0, 3, 2), (4, 6, 7), (4, 7, 5),   # x faces
         (0, 4, 5), (0, 5, 1), (2, 3, 7), (2, 7, 6),   # y faces
         (0, 2, 6), (0, 6, 4), (1, 5, 7), (1, 7, 3)]   # z faces
    return vs, f


def _rotz_box(cx, cy, cz, half_len, hw, hh, angle):
    """Box rotated about z (for the diagonal arms)."""
    c, s = math.cos(angle), math.sin(angle)
    vs = []
    for sx in (-1, 1):
        for sy in (-1, 1):
            for sz in (-1, 1):
                x, y, z = sx * half_len, sy * hw, sz * hh
                vs.append((cx + c * x - s * y, cy + s * x + c * y, cz + z))
    _, f = _box(0, 0, 0, 1, 1, 1)
    return vs, f


def _disk(cx, cy, cz, r, nseg=16):
    """Flat fan disk (prop silhouette)."""
    vs = [(cx, cy, cz)]
    for k in range(nseg):
        a = 2 * math.pi * k / nseg
        vs.append((cx + r * math.cos(a), cy + r * math.sin(a), cz))
    f = [(0, 1 + k, 1 + (k + 1) % nseg) for k in range(nseg)]
    return vs, f


def build_mesh():
    verts, tris = [], []

    def add(vs, fs):
        base = len(verts)
        verts.extend(vs)
        tris.extend([(a + base, b + base, c + base) for a, b, c in fs])

    add(*_box(0, 0, 0, HUB, HUB, HUB_H))                       # hub
    arm_len = math.hypot(ARM_XY, ARM_XY)
    for ang in (math.pi / 4, 3 * math.pi / 4):                 # X arms
        add(*_rotz_box(0, 0, 0.0, arm_len, ARM_W, ARM_W, ang))
    for sx in (1, -1):                                         # prop disks
        for sy in (1, -1):
            add(*_disk(sx * ARM_XY, sy * ARM_XY, PROP_Z, PROP_R))
    return verts, tris


def write_dae(path):
    verts, tris = build_mesh()
    pos = " ".join(f"{c:.6g}" for v in verts for c in v)
    idx = " ".join(str(i) for t in tris for i in t)
    doc = f"""<?xml version="1.0" encoding="utf-8"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
  <asset>
    <contributor><authoring_tool>gen_cf2_dae.py</authoring_tool></contributor>
    <unit name="meter" meter="1"/>
    <up_axis>Z_UP</up_axis>
  </asset>
  <library_geometries>
    <geometry id="cf2-mesh" name="cf2">
      <mesh>
        <source id="cf2-pos">
          <float_array id="cf2-pos-array" count="{3 * len(verts)}">{pos}</float_array>
          <technique_common>
            <accessor source="#cf2-pos-array" count="{len(verts)}" stride="3">
              <param name="X" type="float"/>
              <param name="Y" type="float"/>
              <param name="Z" type="float"/>
            </accessor>
          </technique_common>
        </source>
        <vertices id="cf2-verts"><input semantic="POSITION" source="#cf2-pos"/></vertices>
        <triangles count="{len(tris)}">
          <input semantic="VERTEX" source="#cf2-verts" offset="0"/>
          <p>{idx}</p>
        </triangles>
      </mesh>
    </geometry>
  </library_geometries>
  <library_visual_scenes>
    <visual_scene id="Scene" name="Scene">
      <node id="cf2" name="cf2">
        <instance_geometry url="#cf2-mesh"/>
      </node>
    </visual_scene>
  </library_visual_scenes>
  <scene><instance_visual_scene url="#Scene"/></scene>
</COLLADA>
"""
    with open(path, "w") as fh:
        fh.write(doc)
    return len(verts), len(tris)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "gym_pybullet_drones_tpu",
        "assets", "cf2.dae")
    nv, nt = write_dae(out)
    print(f"wrote {out}: {nv} vertices, {nt} triangles")
