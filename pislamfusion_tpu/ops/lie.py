"""Batched Lie-group library: SO3 / SE3 / SIM3 on JAX arrays.

TPU-native replacement for the reference's header C++ types
(GSLAM/GSLAM/core/SO3.h, SE3.h, SIM3.h — see SURVEY.md section 2.1). Unlike the
reference (scalar objects, one pose at a time), every function here is natively
batched: all ops accept arrays with arbitrary leading batch dimensions and are
jit/vmap/grad-compatible with no Python branching on data.

Representations (last-axis layouts):
  SO3  : unit quaternion  [..., 4]  as (x, y, z, w)   — matches the reference's
         memory order (GSLAM SO3 stores x,y,z,w).
  SE3  : [..., 7]  = (tx, ty, tz, qx, qy, qz, qw)
  SIM3 : [..., 8]  = (tx, ty, tz, qx, qy, qz, qw, scale)

All angles in radians. Small-angle branches use jnp.where with Taylor series so
gradients stay finite at theta == 0.

Precision note: these run in whatever dtype the inputs carry. On device we use
float32; the GPS/ECEF boundary is handled host-side in float64 by
`core.gps` (local-ENU world frame), so float64 lie ops are never needed on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# quaternion primitives  (x, y, z, w) layout
# ---------------------------------------------------------------------------

def quat_identity(shape=(), dtype=jnp.float32):
    q = jnp.zeros(shape + (4,), dtype)
    return q.at[..., 3].set(1.0)


def quat_mul(q1, q2):
    """Hamilton product q1*q2, both [..., 4] (x,y,z,w)."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ], axis=-1)


def quat_conj(q):
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], q.dtype)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(_EPS)


def quat_rotate(q, p):
    """Rotate points p [..., 3] by quaternions q [..., 4]."""
    v = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(v, p)
    return p + w * t + jnp.cross(v, t)


def quat_to_matrix(q):
    """[..., 4] -> [..., 3, 3] rotation matrices."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def quat_from_matrix(m):
    """[..., 3, 3] -> [..., 4] (x,y,z,w). Branch-free Shepperd's method."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate quaternions (unnormalized), one per dominant component
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], -1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], -1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], -1)
    # candidates are in (w,x,y,z) order above; reorder to (x,y,z,w)
    def _reorder(c):
        return jnp.stack([c[..., 1], c[..., 2], c[..., 3], c[..., 0]], -1)
    cand = jnp.stack([_reorder(qw), _reorder(qx), _reorder(qy), _reorder(qz)], -2)
    scores = jnp.stack([tr, m00, m11, m22], -1)
    best = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].astype(jnp.int32)
                            .repeat(4, -1), axis=-2)[..., 0, :]
    q = quat_normalize(q)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


# ---------------------------------------------------------------------------
# SO3
# ---------------------------------------------------------------------------

def so3_exp(w):
    """so3 vector [..., 3] -> quaternion [..., 4]."""
    theta2 = jnp.sum(w * w, -1, keepdims=True)
    theta = jnp.sqrt(theta2.clip(_EPS * _EPS))
    small = theta2 < _EPS
    half = 0.5 * theta
    # sin(t/2)/t  with Taylor 1/2 - t^2/48
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    qw = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return jnp.concatenate([w * k, qw], axis=-1)


def so3_log(q):
    """quaternion [..., 4] -> so3 vector [..., 3]."""
    q = q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)  # shortest arc
    v = q[..., :3]
    w = q[..., 3:4].clip(-1.0, 1.0)
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    theta = 2.0 * jnp.arctan2(n, w[..., :])
    small = n < _EPS
    k = jnp.where(small, 2.0 / w.clip(_EPS), theta / n.clip(_EPS))
    return v * k


def so3_hat(w):
    """[..., 3] -> skew matrices [..., 3, 3]."""
    z = jnp.zeros_like(w[..., 0])
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    m = jnp.stack([z, -wz, wy, wz, z, -wx, -wy, wx, z], -1)
    return m.reshape(m.shape[:-1] + (3, 3))


def so3_from_euler(pitch, yaw, roll):
    """Euler (radians) -> quaternion [x, y, z, w], matching the reference's
    SO3::FromEuler component assignments (GSLAM/GSLAM/core/SO3.h:391-412:
    x = sr*cp*cy - cr*sp*sy, y = cr*sp*cy + sr*cp*sy,
    z = cr*cp*sy - sr*sp*cy, w = cr*cp*cy + sr*sp*sy)."""
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    return jnp.stack([
        sr * cp * cy - cr * sp * sy,
        cr * sp * cy + sr * cp * sy,
        cr * cp * sy - sr * sp * cy,
        cr * cp * cy + sr * sp * sy,
    ], axis=-1)


# ---------------------------------------------------------------------------
# SE3  (t, q) — transform acts as  x' = R x + t
# ---------------------------------------------------------------------------

def se3(t, q):
    return jnp.concatenate([t, q], axis=-1)


def se3_identity(shape=(), dtype=jnp.float32):
    return se3(jnp.zeros(shape + (3,), dtype), quat_identity(shape, dtype))


def se3_t(T):
    return T[..., :3]


def se3_q(T):
    return T[..., 3:7]


def se3_apply(T, p):
    """Apply SE3 [..., 7] to points p [..., 3]."""
    return quat_rotate(se3_q(T), p) + se3_t(T)


def se3_mul(T1, T2):
    """Composition: (T1*T2)(x) = T1(T2(x))."""
    q1, q2 = se3_q(T1), se3_q(T2)
    t = quat_rotate(q1, se3_t(T2)) + se3_t(T1)
    return se3(t, quat_normalize(quat_mul(q1, q2)))


def se3_inv(T):
    qi = quat_conj(se3_q(T))
    return se3(-quat_rotate(qi, se3_t(T)), qi)


def se3_matrix(T):
    """[..., 7] -> homogeneous [..., 4, 4]."""
    R = quat_to_matrix(se3_q(T))
    t = se3_t(T)[..., None]
    top = jnp.concatenate([R, t], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_matrix(M):
    return se3(M[..., :3, 3], quat_from_matrix(M[..., :3, :3]))


def _v_matrix(w, theta2):
    """Left-Jacobian V of SO3 for se3 exp: V = I + B*hat + C*hat^2."""
    theta = jnp.sqrt(theta2.clip(_EPS * _EPS))
    small = theta2 < _EPS
    B = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / theta2.clip(_EPS))
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / (theta2 * theta).clip(_EPS))
    H = so3_hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), H.shape)
    return I + B[..., None] * H + C[..., None] * (H @ H)


def se3_exp(xi):
    """twist [..., 6] = (rho, w) -> SE3 [..., 7]."""
    rho, w = xi[..., :3], xi[..., 3:6]
    theta2 = jnp.sum(w * w, -1, keepdims=True)
    q = so3_exp(w)
    V = _v_matrix(w, theta2)
    t = jnp.einsum('...ij,...j->...i', V, rho)
    return se3(t, q)


def se3_log(T):
    """SE3 [..., 7] -> twist [..., 6] = (rho, w)."""
    w = so3_log(se3_q(T))
    theta2 = jnp.sum(w * w, -1, keepdims=True)
    theta = jnp.sqrt(theta2.clip(_EPS * _EPS))
    small = theta2 < _EPS
    # V^{-1} = I - hat/2 + D * hat^2
    D = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0,
                  (1.0 - 0.5 * theta * jnp.cos(0.5 * theta)
                   / jnp.sin(0.5 * theta).clip(_EPS)) / theta2.clip(_EPS))
    H = so3_hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), H.shape)
    Vinv = I - 0.5 * H + D[..., None] * (H @ H)
    rho = jnp.einsum('...ij,...j->...i', Vinv, se3_t(T))
    return jnp.concatenate([rho, w], axis=-1)


# ---------------------------------------------------------------------------
# SIM3 (t, q, s) — x' = s * R x + t
# ---------------------------------------------------------------------------

def sim3(t, q, s):
    if s.ndim == t.ndim - 1:
        s = s[..., None]
    return jnp.concatenate([t, q, s], axis=-1)


def sim3_identity(shape=(), dtype=jnp.float32):
    return sim3(jnp.zeros(shape + (3,), dtype), quat_identity(shape, dtype),
                jnp.ones(shape + (1,), dtype))


def sim3_t(S):
    return S[..., :3]


def sim3_q(S):
    return S[..., 3:7]


def sim3_s(S):
    return S[..., 7:8]


def sim3_apply(S, p):
    return sim3_s(S) * quat_rotate(sim3_q(S), p) + sim3_t(S)


def sim3_mul(S1, S2):
    q1, q2 = sim3_q(S1), sim3_q(S2)
    s1 = sim3_s(S1)
    t = s1 * quat_rotate(q1, sim3_t(S2)) + sim3_t(S1)
    return sim3(t, quat_normalize(quat_mul(q1, q2)), s1 * sim3_s(S2))


def sim3_inv(S):
    qi = quat_conj(sim3_q(S))
    si = 1.0 / sim3_s(S)
    return sim3(-si * quat_rotate(qi, sim3_t(S)), qi, si)


def sim3_from_se3(T, s=None):
    if s is None:
        s = jnp.ones_like(T[..., :1])
    elif s.ndim == T.ndim - 1:
        s = s[..., None]
    return jnp.concatenate([T, s], axis=-1)


def sim3_to_se3(S):
    """Drop scale (keep rotation+translation)."""
    return S[..., :7]


def _sim3_w_coeffs(phi, sigma):
    """The W-matrix coefficients (C, A, B) of Sim3 exp such that
    W = C I + A hat(phi) + B hat(phi)^2 (Strasdat's thesis / Sophus
    sim3.hpp calc_W). All branches handled with where-guards."""
    theta2 = jnp.sum(phi * phi, -1, keepdims=True)
    theta = jnp.sqrt(theta2.clip(_EPS * _EPS))
    s = jnp.exp(sigma)
    sig_small = jnp.abs(sigma) < 1e-5
    th_small = theta2 < _EPS
    sig_safe = jnp.where(sig_small, 1.0, sigma)
    th_safe = jnp.where(th_small, 1.0, theta)
    C = jnp.where(sig_small, 1.0 + sigma / 2.0, (s - 1.0) / sig_safe)
    a = s * jnp.sin(theta)
    b = s * jnp.cos(theta)
    s2t2 = sig_safe * sig_safe + th_safe * th_safe
    # sigma ~ 0 branches (pure rotation):
    A0 = (1.0 - jnp.cos(theta)) / th_safe ** 2
    B0 = (theta - jnp.sin(theta)) / th_safe ** 3
    # general branches:
    A1 = (a * sig_safe + (1.0 - b) * th_safe) / (th_safe * s2t2)
    B1 = (C - ((b - 1.0) * sig_safe + a * th_safe) / s2t2) / th_safe ** 2
    # theta ~ 0, sigma != 0:
    A2 = jnp.where(sig_small, 0.5,
                   ((sig_safe - 1.0) * s + 1.0) / (sig_safe ** 2))
    B2 = jnp.where(
        sig_small, 1.0 / 6.0,
        (s * 0.5 * sig_safe ** 2 + s - 1.0 - sig_safe * s)
        / (sig_safe ** 3))
    A = jnp.where(th_small, A2, jnp.where(sig_small, A0, A1))
    B = jnp.where(th_small, B2, jnp.where(sig_small, B0, B1))
    return C, A, B


def sim3_exp(xi):
    """Sim3 exponential: xi [..., 7] = (rho, phi, sigma) -> SIM3 [..., 8]
    (Sophus sim3.hpp expmap; SIM3.h of the reference)."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6:7]
    C, A, B = _sim3_w_coeffs(phi, sigma)
    H = so3_hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), H.shape)
    W = C[..., None] * I + A[..., None] * H + B[..., None] * (H @ H)
    t = jnp.einsum("...ij,...j->...i", W, rho)
    return sim3(t, so3_exp(phi), jnp.exp(sigma))


def sim3_log(S):
    """Sim3 log: SIM3 [..., 8] -> (rho, phi, sigma) [..., 7]."""
    phi = so3_log(sim3_q(S))
    sigma = jnp.log(sim3_s(S).clip(_EPS))
    C, A, B = _sim3_w_coeffs(phi, sigma)
    H = so3_hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=S.dtype), H.shape)
    W = C[..., None] * I + A[..., None] * H + B[..., None] * (H @ H)
    rho = jnp.linalg.solve(W, sim3_t(S)[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma], axis=-1)


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------

def se3_interpolate(T0, T1, alpha):
    """Geodesic interpolation between two SE3s (for GPS timestamp interp)."""
    d = se3_mul(se3_inv(T0), T1)
    return se3_mul(T0, se3_exp(alpha * se3_log(d)))
