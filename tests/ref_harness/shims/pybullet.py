"""NumPy float64 shim of the `pybullet` C extension — reference-execution oracle.

Implements exactly the API surface the reference package consumes
(/root/reference/gym_pybullet_drones: BaseAviary.py, BaseRLAviary.py,
DSLPIDControl.py, examples/{pid,debug}.py) so the genuine reference code runs
verbatim in this image, where the real pybullet wheel is not installed.

Fidelity notes (what is Bullet-exact vs mirrored):

* Quaternion/Euler/matrix conversions are transcriptions of the Bullet C
  sources: `getQuaternionFromEuler` = btQuaternion::setEulerZYX,
  `getEulerFromQuaternion` = pybullet.c pybullet_internalGetEulerFromQuaternion,
  `getMatrixFromQuaternion` = btMatrix3x3::setRotation (s = 2/|q|^2 form,
  handles unnormalized input), base-orientation round trip =
  btMatrix3x3::setRotation -> btMatrix3x3::getRotation (trace method), i.e.
  resetBasePositionAndOrientation followed by getBasePositionAndOrientation
  re-normalizes the quaternion through the rotation matrix exactly like
  Bullet's btTransform does.  These are independently cross-checked against
  scipy.spatial.transform in tests/test_reference_parity.py.

* In Physics.DYN mode the reference uses PyBullet purely as a state store
  (BaseAviary.py:815-874; stepSimulation skipped at :369-370), so DYN-mode
  parity runs contain NO shim-authored dynamics: every dynamics equation
  executed is the reference's own Python.

* `stepSimulation` (PYB* modes) mirrors the documented semantics of
  gym_pybullet_drones_tpu.ops.rigid_body.pyb_step — semi-implicit Euler,
  Bullet-style velocity damping v *= (1-0.04)**dt, ground-plane contact by
  projection + inelastic normal + tangential slowdown, sphere drone-drone
  contact — NOT Bullet's sequential-impulse solver.  PYB-mode tests are
  therefore *plumbing* parity (force assembly, frames, application points,
  substep ordering), per SURVEY.md §7.4 scope.

* Camera matrices (`computeViewMatrix`, `computeProjectionMatrixFOV`) are the
  standard gluLookAt / perspective forms PyBullet uses; `getCameraImage`
  returns blank buffers but records (w, h, view, proj) on the client so
  golden-image tests can project through the reference-computed matrices.
"""
from __future__ import annotations

import math
import os
import xml.etree.ElementTree as etxml

import numpy as np

# ---------------------------------------------------------------------------
# Constants (values match the real pybullet module where observable)
# ---------------------------------------------------------------------------
DIRECT = 2
GUI = 1
SHARED_MEMORY = 3

WORLD_FRAME = 2
LINK_FRAME = 1

URDF_USE_INERTIA_FROM_FILE = 2

ER_TINY_RENDERER = 65536
ER_BULLET_HARDWARE_OPENGL = 131072
ER_SEGMENTATION_MASK_OBJECT_AND_LINKINDEX = 1
ER_NO_SEGMENTATION_MASK = 4

COV_ENABLE_RGB_BUFFER_PREVIEW = 13
COV_ENABLE_DEPTH_BUFFER_PREVIEW = 14
COV_ENABLE_SEGMENTATION_MARK_PREVIEW = 15
COV_ENABLE_GUI = 1

STATE_LOGGING_VIDEO_MP4 = 3

# PyBullet URDF-body defaults mirrored from ops/rigid_body.py
_LINEAR_DAMPING = 0.04
_ANGULAR_DAMPING = 0.04
_GROUND_FRICTION = 0.5


# ---------------------------------------------------------------------------
# Quaternion / matrix math (Bullet transcriptions; xyzw order)
# ---------------------------------------------------------------------------
def getQuaternionFromEuler(eulerAngles, physicsClientId=0):
    """btQuaternion::setEulerZYX(yaw=e[2], pitch=e[1], roll=e[0])."""
    roll, pitch, yaw = [float(v) for v in eulerAngles]
    halfYaw, halfPitch, halfRoll = yaw * 0.5, pitch * 0.5, roll * 0.5
    cy, sy = math.cos(halfYaw), math.sin(halfYaw)
    cp, sp = math.cos(halfPitch), math.sin(halfPitch)
    cr, sr = math.cos(halfRoll), math.sin(halfRoll)
    return (
        sr * cp * cy - cr * sp * sy,
        cr * sp * cy + sr * cp * sy,
        cr * cp * sy - sr * sp * cy,
        cr * cp * cy + sr * sp * sy,
    )


def getEulerFromQuaternion(quaternion, physicsClientId=0):
    """pybullet.c pybullet_internalGetEulerFromQuaternion (xyzw in)."""
    x, y, z, w = [float(v) for v in quaternion]
    sqx, sqy, sqz, squ = x * x, y * y, z * z, w * w
    sarg = -2.0 * (x * z - w * y)
    if sarg <= -0.99999:
        return (0.0, -0.5 * math.pi, 2.0 * math.atan2(x, -y))
    if sarg >= 0.99999:
        return (0.0, 0.5 * math.pi, 2.0 * math.atan2(-x, y))
    return (
        math.atan2(2.0 * (y * z + w * x), squ - sqx - sqy + sqz),
        math.asin(sarg),
        math.atan2(2.0 * (x * y + w * z), squ + sqx - sqy - sqz),
    )


def _quat_to_matrix(q):
    """btMatrix3x3::setRotation — tolerates unnormalized quaternions."""
    x, y, z, w = [float(v) for v in q]
    d = x * x + y * y + z * z + w * w
    s = 2.0 / d
    xs, ys, zs = x * s, y * s, z * s
    wx, wy, wz = w * xs, w * ys, w * zs
    xx, xy, xz = x * xs, x * ys, x * zs
    yy, yz, zz = y * ys, y * zs, z * zs
    return np.array(
        [
            [1.0 - (yy + zz), xy - wz, xz + wy],
            [xy + wz, 1.0 - (xx + zz), yz - wx],
            [xz - wy, yz + wx, 1.0 - (xx + yy)],
        ],
        dtype=np.float64,
    )


def _matrix_to_quat(m):
    """btMatrix3x3::getRotation (trace method) -> xyzw tuple."""
    trace = m[0, 0] + m[1, 1] + m[2, 2]
    q = np.zeros(4)
    if trace > 0.0:
        s = math.sqrt(trace + 1.0)
        q[3] = s * 0.5
        s = 0.5 / s
        q[0] = (m[2, 1] - m[1, 2]) * s
        q[1] = (m[0, 2] - m[2, 0]) * s
        q[2] = (m[1, 0] - m[0, 1]) * s
    else:
        i = int(np.argmax([m[0, 0], m[1, 1], m[2, 2]]))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = math.sqrt(m[i, i] - m[j, j] - m[k, k] + 1.0)
        q[i] = s * 0.5
        s = 0.5 / s
        q[3] = (m[k, j] - m[j, k]) * s
        q[j] = (m[j, i] + m[i, j]) * s
        q[k] = (m[k, i] + m[i, k]) * s
    return tuple(float(v) for v in q)


def getMatrixFromQuaternion(quaternion, physicsClientId=0):
    """Row-major 9-tuple, btMatrix3x3 built from the (possibly unnormalized)
    quaternion exactly as Bullet does."""
    return tuple(float(v) for v in _quat_to_matrix(quaternion).ravel())


def invertTransform(position, orientation):
    r = _quat_to_matrix(orientation)
    inv_r = r.T
    inv_p = -inv_r @ np.asarray(position, dtype=np.float64)
    return tuple(inv_p), _matrix_to_quat(inv_r)


def multiplyTransforms(positionA, orientationA, positionB, orientationB):
    ra = _quat_to_matrix(orientationA)
    rb = _quat_to_matrix(orientationB)
    pos = np.asarray(positionA, np.float64) + ra @ np.asarray(
        positionB, np.float64)
    return tuple(pos), _matrix_to_quat(ra @ rb)


# ---------------------------------------------------------------------------
# World model
# ---------------------------------------------------------------------------
class _Body:
    __slots__ = (
        "name", "pos", "rot", "lin_vel", "ang_vel", "mass", "inertia_diag",
        "link_offsets", "static", "shape", "force_acc", "torque_acc",
    )

    def __init__(self, name, pos, rot, mass=0.0, inertia_diag=None,
                 link_offsets=(), shape=None):
        self.name = name
        self.pos = np.asarray(pos, dtype=np.float64).copy()
        self.rot = np.asarray(rot, dtype=np.float64).copy()  # (3,3) world<-body
        self.lin_vel = np.zeros(3)
        self.ang_vel = np.zeros(3)  # world frame
        self.mass = float(mass)
        self.inertia_diag = (np.asarray(inertia_diag, np.float64)
                             if inertia_diag is not None else np.ones(3))
        self.link_offsets = [np.asarray(o, np.float64) for o in link_offsets]
        self.static = mass <= 0.0
        # shape: ("plane",) | ("cylinder", radius, length, z_offset)
        #      | ("sphere", radius) | ("box", hx, hy, hz)
        self.shape = shape
        self.force_acc = np.zeros(3)
        self.torque_acc = np.zeros(3)


class _Client:
    def __init__(self, mode):
        self.mode = mode
        self.bodies = {}
        self.next_id = 0
        self.gravity = np.zeros(3)
        self.dt = 1.0 / 240.0
        self.search_paths = []
        self.last_camera = None  # (w, h, viewMatrix, projectionMatrix)
        self.next_param_id = 0

    def add_body(self, body):
        bid = self.next_id
        self.next_id += 1
        self.bodies[bid] = body
        return bid


_CLIENTS: dict[int, _Client] = {}
_NEXT_CLIENT = 0


def _client(physicsClientId=0) -> _Client:
    if physicsClientId not in _CLIENTS:
        raise RuntimeError("Not connected to physics server.")
    return _CLIENTS[physicsClientId]


def connect(mode=DIRECT, options="", physicsClientId=-1):
    global _NEXT_CLIENT
    cid = _NEXT_CLIENT
    _NEXT_CLIENT += 1
    _CLIENTS[cid] = _Client(mode)
    return cid


def disconnect(physicsClientId=0):
    _CLIENTS.pop(physicsClientId, None)


def isConnected(physicsClientId=0):
    return physicsClientId in _CLIENTS


def resetSimulation(physicsClientId=0):
    c = _client(physicsClientId)
    c.bodies.clear()
    c.next_id = 0


def setGravity(gravX, gravY, gravZ, physicsClientId=0):
    _client(physicsClientId).gravity = np.array(
        [gravX, gravY, gravZ], dtype=np.float64)


def setTimeStep(timeStep, physicsClientId=0):
    _client(physicsClientId).dt = float(timeStep)


def setRealTimeSimulation(flag, physicsClientId=0):
    pass


def setPhysicsEngineParameter(physicsClientId=0, **kwargs):
    pass


def setAdditionalSearchPath(path, physicsClientId=0):
    _client(physicsClientId).search_paths.append(str(path))


def changeDynamics(bodyUniqueId, linkIndex, physicsClientId=0, **kwargs):
    pass


def setCollisionFilterPair(bodyUniqueIdA, bodyUniqueIdB, linkIndexA,
                           linkIndexB, enableCollision, physicsClientId=0):
    pass


# Known pybullet_data assets loaded by the reference, modeled as static
# placeholder bodies (positions come from the loadURDF call; shapes are the
# bounding primitives gym_pybullet_drones_tpu's adapter uses for the same
# obstacles, envs/gym_adapter.py).
_BUILTIN_ASSETS = {
    "plane.urdf": ("plane",),
    "samurai.urdf": None,                     # environment mesh: no contact
    "duck_vhacd.urdf": ("sphere", 0.06),
    "teddy_vhacd.urdf": ("sphere", 0.3),
    "cube_no_rotation.urdf": ("box", 0.5, 0.5, 0.5),
    "cube_small.urdf": ("box", 0.025, 0.025, 0.025),
    "block.urdf": ("box", 0.15, 0.025, 0.025),
    "sphere2.urdf": ("sphere", 0.5),
}


def _parse_urdf(path):
    """Minimal URDF reader: base mass/inertia/collision + link CoM offsets.

    Covers the reference's drone files (cf2x/cf2p/racer: base_link + 4 prop
    links + center_of_mass_link, BaseAviary.py:486-491) and simple box bodies
    (assets/box.urdf, architrave.urdf used by examples/debug.py).
    """
    root = etxml.parse(path).getroot()
    links = root.findall("link")
    base = links[0]
    mass = 0.0
    inertia = np.ones(3)
    shape = None
    inertial = base.find("inertial")
    if inertial is not None:
        m_el = inertial.find("mass")
        if m_el is not None:
            mass = float(m_el.attrib["value"])
        i_el = inertial.find("inertia")
        if i_el is not None:
            inertia = np.array([
                float(i_el.attrib.get("ixx", 1.0)),
                float(i_el.attrib.get("iyy", 1.0)),
                float(i_el.attrib.get("izz", 1.0)),
            ])
    collision = base.find("collision")
    if collision is not None:
        geo = collision.find("geometry")
        origin = collision.find("origin")
        z_off = 0.0
        if origin is not None and "xyz" in origin.attrib:
            z_off = float(origin.attrib["xyz"].split()[2])
        cyl = geo.find("cylinder") if geo is not None else None
        box = geo.find("box") if geo is not None else None
        sph = geo.find("sphere") if geo is not None else None
        if cyl is not None:
            shape = ("cylinder", float(cyl.attrib["radius"]),
                     float(cyl.attrib["length"]), z_off)
        elif box is not None:
            hx, hy, hz = [float(s) / 2 for s in box.attrib["size"].split()]
            shape = ("box", hx, hy, hz)
        elif sph is not None:
            shape = ("sphere", float(sph.attrib["radius"]))
    offsets = []
    for link in links[1:]:
        inert = link.find("inertial")
        off = np.zeros(3)
        if inert is not None:
            org = inert.find("origin")
            if org is not None and "xyz" in org.attrib:
                off = np.array([float(s) for s in org.attrib["xyz"].split()])
        offsets.append(off)
    return mass, inertia, shape, offsets


def loadURDF(fileName, basePosition=None, baseOrientation=None,
             useMaximalCoordinates=0, useFixedBase=0, flags=0,
             globalScaling=1.0, physicsClientId=0):
    c = _client(physicsClientId)
    pos = np.zeros(3) if basePosition is None else np.asarray(
        basePosition, np.float64)
    orn = (0.0, 0.0, 0.0, 1.0) if baseOrientation is None else baseOrientation
    rot = _quat_to_matrix(orn)

    name = os.path.basename(str(fileName))
    candidates = [str(fileName)] + [
        os.path.join(p, str(fileName)) for p in c.search_paths]
    path = next((p for p in candidates if os.path.isfile(p)), None)
    if path is not None and name not in _BUILTIN_ASSETS:
        mass, inertia, shape, offsets = _parse_urdf(path)
        body = _Body(name, pos, rot, mass=mass, inertia_diag=inertia,
                     link_offsets=offsets, shape=shape)
    elif name in _BUILTIN_ASSETS:
        body = _Body(name, pos, rot, mass=0.0, shape=_BUILTIN_ASSETS[name])
    else:
        raise FileNotFoundError(f"pybullet shim: cannot resolve URDF "
                                f"'{fileName}'")
    return c.add_body(body)


def getNumBodies(physicsClientId=0):
    return len(_client(physicsClientId).bodies)


def getBodyInfo(bodyUniqueId, physicsClientId=0):
    b = _client(physicsClientId).bodies[bodyUniqueId]
    return (b.name.encode(), b.name.encode())


# ---------------------------------------------------------------------------
# State store (the whole of PyBullet's role in Physics.DYN mode)
# ---------------------------------------------------------------------------
def resetBasePositionAndOrientation(bodyUniqueId, posObj, ornObj,
                                    physicsClientId=0):
    b = _client(physicsClientId).bodies[bodyUniqueId]
    b.pos = np.asarray(posObj, dtype=np.float64).copy()
    b.rot = _quat_to_matrix(ornObj)


def getBasePositionAndOrientation(bodyUniqueId, physicsClientId=0):
    b = _client(physicsClientId).bodies[bodyUniqueId]
    return tuple(float(v) for v in b.pos), _matrix_to_quat(b.rot)


def resetBaseVelocity(bodyUniqueId, linearVelocity=None, angularVelocity=None,
                      physicsClientId=0):
    b = _client(physicsClientId).bodies[bodyUniqueId]
    if linearVelocity is not None:
        b.lin_vel = np.asarray(linearVelocity, dtype=np.float64).copy()
    if angularVelocity is not None:
        b.ang_vel = np.asarray(angularVelocity, dtype=np.float64).copy()


def getBaseVelocity(bodyUniqueId, physicsClientId=0):
    b = _client(physicsClientId).bodies[bodyUniqueId]
    return (tuple(float(v) for v in b.lin_vel),
            tuple(float(v) for v in b.ang_vel))


def getLinkStates(bodyUniqueId, linkIndices, computeLinkVelocity=0,
                  computeForwardKinematics=0, physicsClientId=0):
    """Fixed-joint links: world CoM = base pos + R @ inertial offset
    (reference uses [i][0][2] = prop height, BaseAviary.py:732-739)."""
    b = _client(physicsClientId).bodies[bodyUniqueId]
    out = []
    quat = _matrix_to_quat(b.rot)
    for idx in linkIndices:
        off = b.link_offsets[idx]
        world = b.pos + b.rot @ off
        entry = [tuple(float(v) for v in world), quat,
                 tuple(float(v) for v in off), (0.0, 0.0, 0.0, 1.0),
                 tuple(float(v) for v in world), quat]
        if computeLinkVelocity:
            lin = b.lin_vel + np.cross(b.ang_vel, b.rot @ off)
            entry += [tuple(float(v) for v in lin),
                      tuple(float(v) for v in b.ang_vel)]
        out.append(tuple(entry))
    return out


def getLinkState(bodyUniqueId, linkIndex, computeLinkVelocity=0,
                 computeForwardKinematics=0, physicsClientId=0):
    return getLinkStates(bodyUniqueId, [linkIndex], computeLinkVelocity,
                         computeForwardKinematics, physicsClientId)[0]


# ---------------------------------------------------------------------------
# Forces + integrator (PYB* modes; mirrors ops/rigid_body.pyb_step semantics)
# ---------------------------------------------------------------------------
def applyExternalForce(objectUniqueId, linkIndex, forceObj, posObj, flags,
                       physicsClientId=0):
    b = _client(physicsClientId).bodies[objectUniqueId]
    f = np.asarray(forceObj, dtype=np.float64)
    p_local = np.asarray(posObj, dtype=np.float64)
    if flags == LINK_FRAME:
        off = (b.link_offsets[linkIndex]
               if 0 <= linkIndex < len(b.link_offsets) else np.zeros(3))
        f_world = b.rot @ f
        point_world = b.pos + b.rot @ (off + p_local)
    else:  # WORLD_FRAME
        f_world = f
        point_world = p_local
    b.force_acc += f_world
    b.torque_acc += np.cross(point_world - b.pos, f_world)


def applyExternalTorque(objectUniqueId, linkIndex, torqueObj, flags,
                        physicsClientId=0):
    b = _client(physicsClientId).bodies[objectUniqueId]
    t = np.asarray(torqueObj, dtype=np.float64)
    b.torque_acc += (b.rot @ t) if flags == LINK_FRAME else t


def _integrate_rotation(rot, ang_vel, dt):
    """World-frame exponential map, mirroring quat.integrate_quat_world."""
    norm = float(np.linalg.norm(ang_vel))
    if norm <= 1e-8:
        return rot
    theta = norm * dt / 2.0
    axis = ang_vel / norm
    q = (axis[0] * math.sin(theta), axis[1] * math.sin(theta),
         axis[2] * math.sin(theta), math.cos(theta))
    return _quat_to_matrix(q) @ rot


_CONTACT_ERP = 0.2        # PyBullet contactERP default
_SOLVER_ITERATIONS = 4    # matches ops/rigid_body.SOLVER_ITERATIONS
_CONTACT_SLOP = 0.02      # speculative window (ops/rigid_body.CONTACT_SLOP)


def _contact_manifold(b):
    """Candidate ground-contact points for a body: list of (arm, depth).

    arm = world vector from the CoM to the contact point, depth = signed
    penetration below z=0 (positive = penetrating).  Drone cylinders get
    Bullet's 4-point persistent-manifold treatment (bottom-rim points at
    0/90/180/270 deg in the body frame); spheres/boxes a single support
    point.
    """
    if b.shape is None:
        return []
    kind = b.shape[0]
    if kind == "cylinder":
        radius, length, z_off = b.shape[1], b.shape[2], b.shape[3]
        out = []
        for cx, cy in ((radius, 0.0), (0.0, radius),
                       (-radius, 0.0), (0.0, -radius)):
            local = np.array([cx, cy, z_off - length / 2.0])
            arm = b.rot @ local
            out.append((arm, -(b.pos[2] + arm[2])))
        return out
    if kind == "sphere":
        arm = np.array([0.0, 0.0, -b.shape[1]])
        return [(arm, -(b.pos[2] + arm[2]))]
    if kind == "box":
        # support point: corner of maximal descent
        half = np.array(b.shape[1:4])
        corner = -np.sign(b.rot[2, :]) * half
        arm = b.rot @ corner
        return [(arm, -(b.pos[2] + arm[2]))]
    return []


def _solve_body_contacts(b, manifold, extra, dt):
    """Projected Gauss-Seidel impulse solve (one body vs static geometry).

    Same constraint formulation as ops/rigid_body._solve_contacts: plane
    contacts with Baumgarte separation target ERP/dt * depth, restitution
    0, accumulated normal impulse >= 0, two tangential friction impulses
    clamped to the mu * j_n Coulomb cone; `extra` are centered contacts
    (normal, depth) with no angular arm (bounding-sphere obstacle hits).
    """
    inv_m = 1.0 / b.mass
    i_inv = b.rot @ np.diag(1.0 / b.inertia_diag) @ b.rot.T
    beta = _CONTACT_ERP / dt
    n_vec = np.array([0.0, 0.0, 1.0])
    tangents = (np.array([1.0, 0.0, 0.0]), np.array([0.0, 1.0, 0.0]))
    acc_n = [0.0] * len(manifold)
    acc_t = [[0.0, 0.0] for _ in manifold]
    k_n, k_t = [], []
    for arm, _ in manifold:
        rxn = np.cross(arm, n_vec)
        k_n.append(inv_m + float(np.cross(i_inv @ rxn, arm) @ n_vec))
        k_t.append([inv_m + float(np.cross(i_inv @ np.cross(arm, t), arm) @ t)
                    for t in tangents])
    extra_acc = [0.0] * len(extra)
    extra_t = [0.0] * len(extra)
    inv_dt = 1.0 / dt
    for _ in range(_SOLVER_ITERATIONS):
        for ki, (arm, depth) in enumerate(manifold):
            active = depth > -_CONTACT_SLOP
            v_c = b.lin_vel + np.cross(b.ang_vel, arm)
            target = beta * depth if depth > 0.0 else inv_dt * depth
            dj = (target - v_c[2]) / k_n[ki]
            new_acc = max(acc_n[ki] + dj, 0.0) if active else 0.0
            dj = new_acc - acc_n[ki]
            acc_n[ki] = new_acc
            imp = dj * n_vec
            b.lin_vel = b.lin_vel + inv_m * imp
            b.ang_vel = b.ang_vel + i_inv @ np.cross(arm, imp)
            lim = _GROUND_FRICTION * acc_n[ki]
            for ti, t in enumerate(tangents):
                v_c = b.lin_vel + np.cross(b.ang_vel, arm)
                dj = -(v_c @ t) / k_t[ki][ti]
                new_acc = (min(max(acc_t[ki][ti] + dj, -lim), lim)
                           if active else 0.0)
                dj = new_acc - acc_t[ki][ti]
                acc_t[ki][ti] = new_acc
                imp = dj * t
                b.lin_vel = b.lin_vel + inv_m * imp
                b.ang_vel = b.ang_vel + i_inv @ np.cross(arm, imp)
        for ei, (en, depth) in enumerate(extra):
            active = depth > -_CONTACT_SLOP
            vn = float(b.lin_vel @ en)
            e_target = beta * depth if depth > 0.0 else inv_dt * depth
            dj = (e_target - vn) * b.mass
            new_acc = max(extra_acc[ei] + dj, 0.0) if active else 0.0
            dj = new_acc - extra_acc[ei]
            extra_acc[ei] = new_acc
            b.lin_vel = b.lin_vel + dj * inv_m * en
            # linear Coulomb friction; ACCUMULATED tangential impulse
            # clamped to the cone mu*acc_n (matches ops/rigid_body.py)
            vt = b.lin_vel - float(b.lin_vel @ en) * en
            vt_norm = float(np.linalg.norm(vt))
            if active and vt_norm > 1e-9:
                j_stop = vt_norm * b.mass
                new_t = min(extra_t[ei] + j_stop,
                            _GROUND_FRICTION * new_acc)
                dj_t = max(new_t - extra_t[ei], 0.0)
                extra_t[ei] = new_t
                lim_v = dj_t * inv_m
                scale = max(vt_norm - lim_v, 0.0) / vt_norm
                b.lin_vel = vt * scale + (b.lin_vel - vt)


def _obstacle_contacts(b, statics):
    """Centered bounding-sphere contacts vs static obstacles."""
    body_r = b.shape[1] if b.shape and b.shape[0] in (
        "cylinder", "sphere") else 0.06
    out = []
    for s in statics:
        if s.shape[0] == "sphere":
            delta = b.pos - s.pos
            dist = float(np.linalg.norm(delta))
            if dist > 1e-6:
                out.append((delta / dist, s.shape[1] + body_r - dist))
        elif s.shape[0] == "box":
            half = np.array(s.shape[1:4])
            rel = b.pos - s.pos
            closest = np.clip(rel, -half, half)
            delta = rel - closest
            dist = float(np.linalg.norm(delta))
            if dist > 1e-6:
                out.append((delta / dist, body_r - dist))
            else:
                pen_ax = half + body_r - np.abs(rel)
                ax = int(np.argmin(pen_ax))
                n = np.zeros(3)
                n[ax] = 1.0 if rel[ax] >= 0 else -1.0
                out.append((n, float(pen_ax[ax])))
    return out


def stepSimulation(physicsClientId=0):
    c = _client(physicsClientId)
    dt = c.dt
    dynamic = [b for b in c.bodies.values() if not b.static]
    statics = [b for b in c.bodies.values()
               if b.static and b.shape is not None and b.shape[0] != "plane"]
    for b in dynamic:
        # velocity update: forces, gravity, and the gyroscopic bias term
        # (btMultiBody's Featherstone dynamics: tau_b - w_b x (J w_b))
        acc = b.force_acc / b.mass + c.gravity
        b.lin_vel = b.lin_vel + dt * acc
        w_body = b.rot.T @ b.ang_vel
        tau_body = b.rot.T @ b.torque_acc \
            - np.cross(w_body, b.inertia_diag * w_body)
        dw_body = tau_body / b.inertia_diag
        b.ang_vel = b.ang_vel + dt * (b.rot @ dw_body)
        b.lin_vel = b.lin_vel * (1.0 - _LINEAR_DAMPING) ** dt
        b.ang_vel = b.ang_vel * (1.0 - _ANGULAR_DAMPING) ** dt
        # contact solve on the PRE-step pose (Bullet collision order),
        # then position integration with the corrected velocities
        manifold = _contact_manifold(b)
        extra = _obstacle_contacts(b, statics)
        if manifold or extra:
            _solve_body_contacts(b, manifold, extra, dt)
        b.pos = b.pos + dt * b.lin_vel
        b.rot = _integrate_rotation(b.rot, b.ang_vel, dt)
        b.force_acc[:] = 0.0
        b.torque_acc[:] = 0.0
    # drone-drone cylinder-manifold contact: Jacobi impulse pass on the
    # post-step poses (mirror of ops/rigid_body.resolve_drone_collisions —
    # contact point = midpoint of the two bodies' cylinder-clamped closest
    # points toward the pair midpoint, normal on the center line with
    # Baumgarte separation, Coulomb friction, full angular response)
    if len(dynamic) > 1:
        beta = _CONTACT_ERP / dt
        inv_dt = 1.0 / dt
        snapshot = [(b.pos.copy(), b.rot.copy(), b.lin_vel.copy(),
                     b.ang_vel.copy()) for b in dynamic]

        def _cyl_clamp(idx, point):
            """Clamp `point` into body idx's collision cylinder (world)."""
            pos, rot = snapshot[idx][0], snapshot[idx][1]
            shp = dynamic[idx].shape
            if shp and shp[0] == "cylinder":
                rc, h2, zoff = shp[1], shp[2] / 2.0, shp[3]
            else:
                rc, h2, zoff = (shp[1] if shp else 0.06), 0.0, 0.0
            u = rot.T @ (point - pos)
            ur = float(np.hypot(u[0], u[1]))
            s = min(1.0, rc / max(ur, 1e-9))
            q = np.array([u[0] * s, u[1] * s,
                          min(max(u[2], zoff - h2), zoff + h2)])
            return pos + rot @ q

        dv = [np.zeros(3) for _ in dynamic]
        dw = [np.zeros(3) for _ in dynamic]
        for i in range(len(dynamic)):
            pi, ri, vi, wi = snapshot[i]
            inv_m_i = 1.0 / dynamic[i].mass
            i_inv_i = ri @ np.diag(1.0 / dynamic[i].inertia_diag) @ ri.T
            for j in range(len(dynamic)):
                if i == j:
                    continue
                pj, rj, vj, wj = snapshot[j]
                ra = dynamic[i].shape[1] if dynamic[i].shape else 0.06
                rb = dynamic[j].shape[1] if dynamic[j].shape else 0.06
                diff = pi - pj
                dist = float(np.linalg.norm(diff))
                depth = (ra + rb) - dist
                if dist <= 1e-6 or depth <= -_CONTACT_SLOP:
                    continue
                n = diff / dist
                mid = 0.5 * (pi + pj)
                pc = 0.5 * (_cyl_clamp(i, mid) + _cyl_clamp(j, mid))
                r_i, r_j = pc - pi, pc - pj
                inv_m_j = 1.0 / dynamic[j].mass
                i_inv_j = rj @ np.diag(1.0 / dynamic[j].inertia_diag) @ rj.T
                rel = (vi + np.cross(wi, r_i)) - (vj + np.cross(wj, r_j))
                vn = float(rel @ n)
                target = beta * depth if depth > 0.0 else inv_dt * depth

                def keff(d_vec):
                    return (inv_m_i + inv_m_j
                            + float(np.cross(i_inv_i @ np.cross(r_i, d_vec),
                                             r_i) @ d_vec)
                            + float(np.cross(i_inv_j @ np.cross(r_j, d_vec),
                                             r_j) @ d_vec))

                j_n = max(target - vn, 0.0) / keff(n)
                vt = rel - vn * n
                vt_norm = float(np.linalg.norm(vt))
                t_hat = vt / max(vt_norm, 1e-9)
                j_t = min(vt_norm / keff(t_hat), _GROUND_FRICTION * j_n)
                imp = j_n * n - j_t * t_hat
                dv[i] += inv_m_i * imp
                dw[i] += i_inv_i @ np.cross(r_i, imp)
        for b, d, w_ in zip(dynamic, dv, dw):
            b.lin_vel = b.lin_vel + d
            b.ang_vel = b.ang_vel + w_


# ---------------------------------------------------------------------------
# Cameras (matrix math is the real thing; rasterization returns blanks)
# ---------------------------------------------------------------------------
def computeViewMatrix(cameraEyePosition, cameraTargetPosition, cameraUpVector,
                      physicsClientId=0):
    eye = np.asarray(cameraEyePosition, np.float64)
    target = np.asarray(cameraTargetPosition, np.float64)
    up = np.asarray(cameraUpVector, np.float64)
    f = target - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, up / np.linalg.norm(up))
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    # column-major 16-tuple (OpenGL layout, as the real pybullet returns)
    return (
        float(s[0]), float(u[0]), float(-f[0]), 0.0,
        float(s[1]), float(u[1]), float(-f[1]), 0.0,
        float(s[2]), float(u[2]), float(-f[2]), 0.0,
        float(-s @ eye), float(-u @ eye), float(f @ eye), 1.0,
    )


def computeViewMatrixFromYawPitchRoll(cameraTargetPosition, distance, yaw,
                                      pitch, roll, upAxisIndex,
                                      physicsClientId=0):
    """Camera on a yaw/pitch orbit around the target (degrees), up = Z.

    Used by the reference only to place the PNG-frame recording camera
    (BaseAviary.py:180-187) — visualization-only, not a parity surface.
    """
    yaw_r, pitch_r = math.radians(yaw), math.radians(pitch)
    target = np.asarray(cameraTargetPosition, np.float64)
    offset = distance * np.array([
        math.cos(pitch_r) * math.sin(yaw_r),
        -math.cos(pitch_r) * math.cos(yaw_r),
        -math.sin(pitch_r),
    ])
    return computeViewMatrix(target + offset, target, (0, 0, 1))


def computeProjectionMatrixFOV(fov, aspect, nearVal, farVal,
                               physicsClientId=0):
    f = 1.0 / math.tan(math.radians(fov) * 0.5)
    a, n, fa = float(aspect), float(nearVal), float(farVal)
    return (
        f / a, 0.0, 0.0, 0.0,
        0.0, f, 0.0, 0.0,
        0.0, 0.0, (fa + n) / (n - fa), -1.0,
        0.0, 0.0, 2.0 * fa * n / (n - fa), 0.0,
    )


def getCameraImage(width, height, viewMatrix=None, projectionMatrix=None,
                   shadow=0, flags=0, renderer=0, lightDirection=None,
                   physicsClientId=0):
    c = _client(physicsClientId)
    c.last_camera = (int(width), int(height), viewMatrix, projectionMatrix)
    rgb = np.zeros((height, width, 4), dtype=np.uint8)
    dep = np.ones((height, width), dtype=np.float32)
    seg = -np.ones((height, width), dtype=np.int32)
    return (int(width), int(height), rgb, dep, seg)


# ---------------------------------------------------------------------------
# GUI / debug no-ops (reference only calls these when gui=True)
# ---------------------------------------------------------------------------
def configureDebugVisualizer(flag, enable, physicsClientId=0):
    pass


def resetDebugVisualizerCamera(cameraDistance, cameraYaw, cameraPitch,
                               cameraTargetPosition, physicsClientId=0):
    pass


def getDebugVisualizerCamera(physicsClientId=0):
    ident = tuple(np.eye(4, dtype=np.float64).ravel())
    return (0, 0, ident, ident) + ((0.0,) * 8,)


def addUserDebugParameter(paramName, rangeMin, rangeMax, startValue,
                          physicsClientId=0):
    c = _client(physicsClientId)
    c.next_param_id += 1
    return c.next_param_id


def readUserDebugParameter(itemUniqueId, physicsClientId=0):
    return 0.0


def addUserDebugLine(lineFromXYZ, lineToXYZ, lineColorRGB,
                     physicsClientId=0, **kwargs):
    return 0


def addUserDebugText(text, textPosition, textColorRGB, physicsClientId=0,
                     **kwargs):
    return 0


def startStateLogging(loggingType, fileName, physicsClientId=0, **kwargs):
    return 0


def stopStateLogging(loggingId, physicsClientId=0):
    pass


def loadPlugin(pluginPath, postFix="", physicsClientId=0):
    return -1
