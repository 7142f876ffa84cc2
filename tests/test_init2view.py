"""Two-view initializer tests (reference: InitializerSVD.cpp)."""
import numpy as np
import jax
import jax.numpy as jnp

from pislamfusion_tpu.ops import init2view, lie


def make_pair(rng, n=300, planar=False, baseline=(1.0, 0.0, 0.0),
              noise=0.001, outlier_frac=0.1):
    if planar:
        X = rng.uniform(-3, 3, size=(n, 3))
        X[:, 2] = 6.0 + 0.2 * X[:, 0] - 0.1 * X[:, 1]  # a tilted plane
    else:
        X = rng.uniform(-3, 3, size=(n, 3))
        X[:, 2] = rng.uniform(4, 10, size=n)
    ang = 0.08
    R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                  [-np.sin(ang), 0, np.cos(ang)]])
    t = np.asarray(baseline, np.float64)
    ra = X[:, :2] / X[:, 2:]
    Xb = X @ R.T + t
    rb = Xb[:, :2] / Xb[:, 2:]
    ra = ra + rng.normal(0, noise, ra.shape)
    rb = rb + rng.normal(0, noise, rb.shape)
    out = rng.random(n) < outlier_frac
    rb[out] += rng.uniform(0.05, 0.2, size=(int(out.sum()), 2))
    return (jnp.asarray(ra, jnp.float32), jnp.asarray(rb, jnp.float32),
            X, R, t, out)


def check_motion(res, R_true, t_true):
    T_w2c = np.asarray(lie.se3_inv(res.T_c2w))
    R_est = np.asarray(lie.quat_to_matrix(jnp.asarray(T_w2c[3:7])))
    t_est = T_w2c[:3]
    t_n = t_true / np.linalg.norm(t_true)
    t_e = t_est / max(np.linalg.norm(t_est), 1e-9)
    assert np.dot(t_n, t_e) > 0.99, (t_n, t_e)
    assert np.abs(R_est - R_true).max() < 0.02


def test_general_scene_uses_f(rng):
    ra, rb, X, R, t, out = make_pair(rng, planar=False)
    res = init2view.initialize_two_view(jax.random.PRNGKey(0), ra, rb,
                                        jnp.ones(ra.shape[0], bool))
    assert bool(res.ok)
    assert not bool(res.used_h), "general scene should pick F"
    check_motion(res, R, t)
    # triangulated structure matches up to the monocular scale
    mask = np.asarray(res.mask)
    assert mask.sum() > 150
    Xe = np.asarray(res.points)[mask]
    Xt = X[mask]
    scale = np.median(Xt[:, 2] / Xe[:, 2])
    assert np.abs(Xe * scale - Xt).max() < 0.6


def test_planar_scene_uses_h(rng):
    ra, rb, X, R, t, out = make_pair(rng, planar=True, outlier_frac=0.05)
    res = init2view.initialize_two_view(jax.random.PRNGKey(1), ra, rb,
                                        jnp.ones(ra.shape[0], bool))
    assert bool(res.ok)
    assert bool(res.used_h), "planar scene should pick H"
    check_motion(res, R, t)


def test_pure_rotation_rejected(rng):
    """No baseline -> no parallax -> initializer must refuse."""
    ra, rb, X, R, t, out = make_pair(rng, baseline=(0.0, 0.0, 0.0),
                                     outlier_frac=0.0)
    res = init2view.initialize_two_view(jax.random.PRNGKey(2), ra, rb,
                                        jnp.ones(ra.shape[0], bool))
    assert not bool(res.ok)


def test_initializer_opt_variant(rng):
    """Initializer?=opt (InitializerOpt.cpp): joint SE3 + inverse-depth
    epipolar LM from identity recovers the same two-view geometry as svd
    on a clean pair (the reference variant ships no RANSAC — Huber only,
    matching its post-matcher-prune usage), and refuses a pure rotation
    via the translation gate (:69-73). Also: every reference
    `Initializer?=` name resolves through the registry."""
    from pislamfusion_tpu.core.svar import Svar
    from pislamfusion_tpu.models.initializers import (
        InitializerOpt, InitializerSVD, create_initializer)
    ra, rb, X, R, t, out = make_pair(rng, outlier_frac=0.0)
    init = InitializerOpt()
    res = init(jax.random.PRNGKey(3), ra, rb, jnp.ones(ra.shape[0], bool))
    assert bool(res.ok)
    check_motion(res, R, t)
    mask = np.asarray(res.mask)
    assert mask.sum() > 150
    Xe = np.asarray(res.points)[mask]
    Xt = X[mask]
    scale = np.median(Xt[:, 2] / Xe[:, 2])
    assert np.abs(Xe * scale - Xt).max() < 0.6
    # pure rotation: the 0.03 translation gate must refuse
    ra0, rb0, *_ = make_pair(rng, baseline=(0.0, 0.0, 0.0),
                             outlier_frac=0.0)
    res0 = init(jax.random.PRNGKey(4), ra0, rb0,
                jnp.ones(ra0.shape[0], bool))
    assert not bool(res0.ok)
    # registry: every reference initializer registration resolves
    cfg = Svar()
    for name, cls in (("svd", InitializerSVD), ("eigen", InitializerSVD),
                      ("svdzm", InitializerSVD), ("opt", InitializerOpt),
                      ("opt_svd", InitializerOpt)):
        cfg.set("Initializer", name)
        assert isinstance(create_initializer(cfg), cls), name
    # Estimator?= seam: LORANSAC flips the initializer's RANSAC to the
    # top-K local-optimization path (EstimatorLORANSAC.cpp)
    from pislamfusion_tpu.models.initializers import estimator_lo_topk
    assert estimator_lo_topk(cfg) == 1
    cfg.set("Estimator", "LORANSAC")
    assert estimator_lo_topk(cfg) == 8
    cfg.set("Initializer", "svd")
    assert create_initializer(cfg).lo_topk == 8
