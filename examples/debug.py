"""Raw engine scratchpad: poke the functional core directly.

Counterpart of reference examples/debug.py (a raw PyBullet scratchpad
probing external forces/torques): applies force/torque probes through the
PYB-mode stepper and prints the resulting state — a template for
experimenting with the engine outside any task.
"""
from gym_pybullet_drones_tpu.utils.platform import select_platform

select_platform()

import jax
import jax.numpy as jnp
import numpy as np

from gym_pybullet_drones_tpu import params as P
from gym_pybullet_drones_tpu.ops.rigid_body import PybState, pyb_step

params = P.CF2X
dt = 1 / 240

state = PybState(pos=jnp.asarray([[0.0, 0.0, 1.0]]),
                 quat=jnp.asarray([[0.0, 0.0, 0.0, 1.0]]),
                 vel=jnp.zeros((1, 3)), ang_v=jnp.zeros((1, 3)))
rpm = jnp.full((1, 4), params.hover_rpm)

print("== hover, no external force ==")
s = state
for i in range(240):
    s = pyb_step(params, s, rpm, dt)
print("after 1 s:", np.round(np.asarray(s.pos[0]), 4),
      "vel", np.round(np.asarray(s.vel[0]), 4))

print("== external lateral force probe (0.01 N along +x for 0.5 s) ==")
s = state
f = jnp.asarray([[0.01, 0.0, 0.0]])
for i in range(120):
    s = pyb_step(params, s, rpm, dt, ext_force=f)
print("after 0.5 s:", np.round(np.asarray(s.pos[0]), 4),
      "vel", np.round(np.asarray(s.vel[0]), 4))

print("== external torque probe (1e-5 N m about z) ==")
s = state
tau = jnp.asarray([[0.0, 0.0, 1e-5]])
for i in range(120):
    s = pyb_step(params, s, rpm, dt, ext_torque=tau)
print("ang_v after 0.5 s:", np.round(np.asarray(s.ang_v[0]), 3))

print("== obstacle contact probe (architrave beam + test box URDFs) ==")
# Counterpart of the reference debug.py loading architrave.urdf/box.urdf
# (reference examples/debug.py:19-20): fly into the beam and confirm the
# contact response stops forward motion at its face.
obstacles = (
    P.load_obstacle_urdf(P.obstacle_asset_path("architrave"), (0.5, 0.0, 1.0)),
    P.load_obstacle_urdf(P.obstacle_asset_path("box"), (1.0, 0.0, 0.05)),
)
s = PybState(pos=jnp.asarray([[0.0, 0.0, 1.0]]),
             quat=jnp.asarray([[0.0, 0.0, 0.0, 1.0]]),
             vel=jnp.asarray([[0.5, 0.0, 0.0]]), ang_v=jnp.zeros((1, 3)))
for i in range(240):
    s = pyb_step(params, s, rpm, dt, obstacles=obstacles)
print("after 1 s flying +x into the beam: pos",
      np.round(np.asarray(s.pos[0]), 4),
      "(stopped short of x=0.5)" if float(s.pos[0, 0]) < 0.5 else "")
