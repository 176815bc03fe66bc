"""Generate the shipped Betaflight demo trajectory CSV.

Produces `gym_pybullet_drones_tpu/assets/beta-traj.csv` — the package's
counterpart of the reference asset
`/root/reference/gym_pybullet_drones/assets/beta-traj.csv` (consumed by the
reference examples/beta.py:91-104).  Same column schema (t, position,
velocity, linear acceleration, linear jerk, heading, heading rate, and the
total-magnitude convenience columns), same 500 Hz sampling; the trajectory
itself is authored fresh: a quintic minimum-jerk climb to 1 m followed by a
constant-speed circular circuit with a min-jerk speed ramp-in.

Usage: python scripts/gen_beta_traj.py [out_path]
"""
import csv
import os
import sys

import numpy as np

DT = 0.002           # 500 Hz, matching the SITL loop rate
T_CLIMB = 3.0        # min-jerk climb 0 -> 1 m
T_RAMP = 2.0         # circle angular-speed ramp-in
T_TOTAL = 16.0
Z_TOP = 1.0
R_CIRCLE = 1.0
W_CIRCLE = 2 * np.pi / 6.0   # one lap per 6 s at full speed


def _minjerk(tau):
    """Quintic min-jerk blend s(tau) on [0,1] with s', s'', s'''."""
    tau = np.clip(tau, 0.0, 1.0)
    s = 10 * tau**3 - 15 * tau**4 + 6 * tau**5
    ds = 30 * tau**2 - 60 * tau**3 + 30 * tau**4
    dds = 60 * tau - 180 * tau**2 + 120 * tau**3
    ddds = 60 - 360 * tau + 360 * tau**2
    return s, ds, dds, ddds


def sample(t):
    """Return pos, vel, acc, jerk, heading, heading_rate at time t."""
    if t < T_CLIMB:
        s, ds, dds, ddds = _minjerk(t / T_CLIMB)
        pos = np.array([0.0, 0.0, Z_TOP * s])
        vel = np.array([0.0, 0.0, Z_TOP * ds / T_CLIMB])
        acc = np.array([0.0, 0.0, Z_TOP * dds / T_CLIMB**2])
        jerk = np.array([0.0, 0.0, Z_TOP * ddds / T_CLIMB**3])
        return pos, vel, acc, jerk, 0.0, 0.0
    u = t - T_CLIMB
    # phase with min-jerk ramp of the angular rate over T_RAMP
    if u < T_RAMP:
        s, ds, dds, ddds = _minjerk(u / T_RAMP)
        # integrate w(t) = W*s(u/T) analytically: phase = W*T*int s
        tau = u / T_RAMP
        s_int = 2.5 * tau**4 - 3 * tau**5 + tau**6
        phase = W_CIRCLE * T_RAMP * s_int
        w = W_CIRCLE * s
        dw = W_CIRCLE * ds / T_RAMP
        ddw = W_CIRCLE * dds / T_RAMP**2
    else:
        s_int_full = 2.5 - 3 + 1
        phase = W_CIRCLE * (T_RAMP * s_int_full + (u - T_RAMP))
        w, dw, ddw = W_CIRCLE, 0.0, 0.0
    c, sn = np.cos(phase), np.sin(phase)
    pos = np.array([R_CIRCLE * (c - 1.0), R_CIRCLE * sn, Z_TOP])
    vel = R_CIRCLE * w * np.array([-sn, c, 0.0])
    acc = R_CIRCLE * np.array([-c * w**2 - sn * dw, -sn * w**2 + c * dw, 0.0])
    jerk = R_CIRCLE * np.array(
        [sn * w**3 - 3 * c * w * dw - sn * ddw,
         -c * w**3 - 3 * sn * w * dw + c * ddw, 0.0])
    heading = phase + np.pi / 2            # tangent to the circle
    return pos, vel, acc, jerk, heading, w


HEADER = ["t", "p_x", "p_y", "p_z", "v_x", "v_y", "v_z",
          "a_lin_x", "a_lin_y", "a_lin_z", "j_lin_x", "j_lin_y", "j_lin_z",
          "heading", "heading_rate", "total_vel", "total_acc", "total_jerk",
          "phi"]


def main(out_path):
    n = int(round(T_TOTAL / DT))
    with open(out_path, "w", newline="") as f:
        wtr = csv.writer(f)
        wtr.writerow(HEADER)
        for k in range(n):
            t = k * DT
            pos, vel, acc, jerk, heading, hrate = sample(t)
            wtr.writerow(
                [round(t, 6)] + [repr(float(v)) for v in pos] +
                [repr(float(v)) for v in vel] + [repr(float(v)) for v in acc] +
                [repr(float(v)) for v in jerk] +
                [repr(float(heading)), repr(float(hrate)),
                 repr(float(np.linalg.norm(vel))),
                 repr(float(np.linalg.norm(acc))),
                 repr(float(np.linalg.norm(jerk)))] + [""])
    print(f"wrote {n} rows to {out_path}")


if __name__ == "__main__":
    default = os.path.join(os.path.dirname(__file__), "..",
                           "gym_pybullet_drones_tpu", "assets",
                           "beta-traj.csv")
    main(sys.argv[1] if len(sys.argv) > 1 else default)
