"""Lie group parity tests (reference formulas: GSLAM SO3.h/SE3.h/SIM3.h)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pislamfusion_tpu.ops import lie


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True),
                       jnp.float32)


def test_quat_mul_matches_matrix(rng):
    q1, q2 = random_quats(rng, 16), random_quats(rng, 16)
    R1 = lie.quat_to_matrix(q1)
    R2 = lie.quat_to_matrix(q2)
    R12 = lie.quat_to_matrix(lie.quat_mul(q1, q2))
    np.testing.assert_allclose(R12, R1 @ R2, atol=1e-5)


def test_quat_rotate_matches_matrix(rng):
    q = random_quats(rng, 16)
    p = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    np.testing.assert_allclose(
        lie.quat_rotate(q, p),
        jnp.einsum('...ij,...j->...i', lie.quat_to_matrix(q), p), atol=1e-5)


def test_quat_matrix_roundtrip(rng):
    q = random_quats(rng, 64)
    q = q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    q2 = lie.quat_from_matrix(lie.quat_to_matrix(q))
    np.testing.assert_allclose(q, q2, atol=1e-5)


def test_so3_exp_log_roundtrip(rng):
    # |w| must stay below pi: log returns the shortest-arc rotation
    w = jnp.asarray(rng.uniform(-1.0, 1.0, size=(64, 3)), jnp.float32)
    np.testing.assert_allclose(lie.so3_log(lie.so3_exp(w)), w, atol=1e-4)


def test_so3_exp_small_angle():
    w = jnp.asarray([[1e-9, 0, 0], [0.0, 0, 0]], jnp.float32)
    q = lie.so3_exp(w)
    np.testing.assert_allclose(q[:, 3], 1.0, atol=1e-6)
    assert np.all(np.isfinite(lie.so3_log(q)))


def test_se3_mul_inv(rng):
    t = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    T = lie.se3(t, random_quats(rng, 8))
    I = lie.se3_mul(T, lie.se3_inv(T))
    np.testing.assert_allclose(lie.se3_t(I), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(lie.se3_q(I)[:, 3]), 1.0, atol=1e-5)


def test_se3_apply_matches_matrix(rng):
    T = lie.se3(jnp.asarray(rng.normal(size=(8, 3)), jnp.float32),
                random_quats(rng, 8))
    p = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    M = lie.se3_matrix(T)
    expected = jnp.einsum('...ij,...j->...i', M[..., :3, :3], p) + M[..., :3, 3]
    np.testing.assert_allclose(lie.se3_apply(T, p), expected, atol=1e-5)


def test_se3_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.uniform(-1.0, 1.0, size=(64, 6)), jnp.float32)
    np.testing.assert_allclose(lie.se3_log(lie.se3_exp(xi)), xi, atol=1e-3)


def test_se3_matrix_roundtrip(rng):
    T = lie.se3(jnp.asarray(rng.normal(size=(8, 3)), jnp.float32),
                random_quats(rng, 8))
    T2 = lie.se3_from_matrix(lie.se3_matrix(T))
    np.testing.assert_allclose(lie.se3_matrix(T2), lie.se3_matrix(T), atol=1e-5)


def test_sim3_apply_scale(rng):
    q = random_quats(rng, 4)
    t = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    s = jnp.full((4,), 2.5, jnp.float32)
    S = lie.sim3(t, q, s)
    p = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    expected = 2.5 * lie.quat_rotate(q, p) + t
    np.testing.assert_allclose(lie.sim3_apply(S, p), expected, atol=1e-5)


def test_sim3_mul_inv(rng):
    S = lie.sim3(jnp.asarray(rng.normal(size=(4, 3)), jnp.float32),
                 random_quats(rng, 4),
                 jnp.asarray(rng.uniform(0.5, 2.0, size=(4,)), jnp.float32))
    I = lie.sim3_mul(S, lie.sim3_inv(S))
    np.testing.assert_allclose(lie.sim3_t(I), 0.0, atol=1e-5)
    np.testing.assert_allclose(lie.sim3_s(I)[:, 0], 1.0, atol=1e-5)
    # group action consistency: (S1*S2)(p) == S1(S2(p))
    p = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    S2 = lie.sim3(jnp.asarray(rng.normal(size=(4, 3)), jnp.float32),
                  random_quats(rng, 4),
                  jnp.asarray(rng.uniform(0.5, 2.0, size=(4,)), jnp.float32))
    np.testing.assert_allclose(lie.sim3_apply(lie.sim3_mul(S, S2), p),
                               lie.sim3_apply(S, lie.sim3_apply(S2, p)),
                               atol=1e-4)


def test_se3_interpolate_endpoints(rng):
    T0 = lie.se3(jnp.asarray(rng.normal(size=(3,)), jnp.float32),
                 random_quats(rng, 1)[0])
    T1 = lie.se3(jnp.asarray(rng.normal(size=(3,)), jnp.float32),
                 random_quats(rng, 1)[0])
    np.testing.assert_allclose(lie.se3_matrix(lie.se3_interpolate(T0, T1, 0.0)),
                               lie.se3_matrix(T0), atol=1e-4)
    np.testing.assert_allclose(lie.se3_matrix(lie.se3_interpolate(T0, T1, 1.0)),
                               lie.se3_matrix(T1), atol=1e-4)


def test_so3_from_euler_matches_reference():
    """Component assignments must match SO3::FromEuler (GSLAM SO3.h:391-412).
    Known-angle checks: single-axis rotations land on the documented axes
    (pitch -> y, yaw -> z, roll -> x)."""
    h = 0.3
    s, c = np.sin(h / 2), np.cos(h / 2)
    np.testing.assert_allclose(
        lie.so3_from_euler(h, 0.0, 0.0), [0.0, s, 0.0, c], atol=1e-6)
    np.testing.assert_allclose(
        lie.so3_from_euler(0.0, h, 0.0), [0.0, 0.0, s, c], atol=1e-6)
    np.testing.assert_allclose(
        lie.so3_from_euler(0.0, 0.0, h), [s, 0.0, 0.0, c], atol=1e-6)
    # combined angles: the reference's closed form for (p, y, r)
    p, y, r = 0.2, -0.4, 0.7
    sr, cr = np.sin(r / 2), np.cos(r / 2)
    sp, cp = np.sin(p / 2), np.cos(p / 2)
    sy, cy = np.sin(y / 2), np.cos(y / 2)
    expect = [sr * cp * cy - cr * sp * sy,
              cr * sp * cy + sr * cp * sy,
              cr * cp * sy - sr * sp * cy,
              cr * cp * cy + sr * sp * sy]
    np.testing.assert_allclose(lie.so3_from_euler(p, y, r), expect, atol=1e-6)


def test_host_se3_matches_device(rng):
    """utils/host_se3 numpy helpers must match ops/lie exactly (they feed
    per-frame host bookkeeping to avoid device round trips)."""
    from pislamfusion_tpu.utils import host_se3 as H
    q = np.asarray(random_quats(rng, 8))
    t = rng.normal(size=(8, 3))
    T = np.concatenate([t, q], -1).astype(np.float64)
    T2 = np.asarray(lie.se3(jnp.asarray(rng.normal(size=(8, 3)), jnp.float32),
                            random_quats(rng, 8)))
    np.testing.assert_allclose(
        H.se3_mul(T, T2), np.asarray(lie.se3_mul(
            jnp.asarray(T, jnp.float32), jnp.asarray(T2, jnp.float32))),
        atol=1e-5)
    np.testing.assert_allclose(
        H.se3_inv(T), np.asarray(lie.se3_inv(jnp.asarray(T, jnp.float32))),
        atol=1e-5)
    p = rng.normal(size=(8, 3))
    np.testing.assert_allclose(
        H.se3_apply(T, p), np.asarray(lie.se3_apply(
            jnp.asarray(T, jnp.float32), jnp.asarray(p, jnp.float32))),
        atol=1e-5)
    np.testing.assert_allclose(
        H.quat_to_matrix(q), np.asarray(lie.quat_to_matrix(
            jnp.asarray(q, jnp.float32))), atol=1e-6)
