"""Host-side (pure numpy) SE3 helpers for the tracker/mapper bookkeeping.

The lie ops in ops/lie.py are jax and therefore each call is a device
dispatch — fine inside jitted programs, poisonous for per-frame host
bookkeeping over a high-latency TPU tunnel (a [7]-element se3_inv costs a
round trip). These mirror lie.py's conventions exactly: quaternion (x,y,z,w),
SE3 [t(3), q(4)], x' = R x + t.
"""
from __future__ import annotations

import numpy as np


def quat_conj(q):
    q = np.asarray(q)
    return np.concatenate([-q[..., :3], q[..., 3:4]], -1)


def quat_mul(a, b):
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ], -1)


def quat_rotate(q, p):
    v, w = q[..., :3], q[..., 3:4]
    t = 2.0 * np.cross(v, p)
    return p + w * t + np.cross(v, t)


def se3_mul(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    t = quat_rotate(a[..., 3:7], b[..., :3]) + a[..., :3]
    q = quat_mul(a[..., 3:7], b[..., 3:7])
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    return np.concatenate([t, q], -1)


def se3_inv(T):
    T = np.asarray(T, np.float64)
    qi = quat_conj(T[..., 3:7])
    return np.concatenate([-quat_rotate(qi, T[..., :3]), qi], -1)


def se3_apply(T, p):
    T = np.asarray(T, np.float64)
    return quat_rotate(T[..., 3:7], np.asarray(p, np.float64)) + T[..., :3]


def quat_to_matrix(q):
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return np.stack([
        np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
                  2 * (x * z + y * w)], -1),
        np.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
                  2 * (y * z - x * w)], -1),
        np.stack([2 * (x * z - y * w), 2 * (y * z + x * w),
                  1 - 2 * (x * x + y * y)], -1),
    ], -2)
