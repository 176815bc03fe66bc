"""transforms3d.quaternions shim — w-first (w, x, y, z) convention, matching
the real package.  Consumed by the reference BetaAviary.py:124
(`rotate_vector(w, qconjugate(q))` to express world rates in the body frame)
and CTBRControl.py."""
import numpy as np


def qconjugate(q):
    q = np.asarray(q, dtype=np.float64)
    return np.array([q[0], -q[1], -q[2], -q[3]])


def qmult(q1, q2):
    w1, x1, y1, z1 = np.asarray(q1, dtype=np.float64)
    w2, x2, y2, z2 = np.asarray(q2, dtype=np.float64)
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def qnorm(q):
    return float(np.sqrt(np.dot(q, q)))


def qinverse(q):
    q = np.asarray(q, dtype=np.float64)
    return qconjugate(q) / np.dot(q, q)


def rotate_vector(v, q, is_normalized=False):
    """Rotate vector v by quaternion q (w-first), as transforms3d does:
    v' = (q * [0, v] * q^-1).vec"""
    v = np.asarray(v, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    if not is_normalized:
        q = q / qnorm(q)
    varr = np.concatenate([[0.0], v])
    return qmult(q, qmult(varr, qconjugate(q)))[1:]
