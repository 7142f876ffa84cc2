"""Two-view initialization: parallel H/F RANSAC scoring, model selection,
motion recovery, initial triangulation.

TPU-native equivalent of the reference's ORB-SLAM-style initializer
(GSLAM-DIYSLAM/src/zhaoyong/InitializerSVD.cpp): H (4-pt DLT) and F (8-pt)
hypothesis batches scored simultaneously (:150-165), score ratio RH > 0.40
selects the homography path (:167-174), ReconstructH = Faugeras 8-motion
decomposition (:649+), ReconstructF = essential-matrix 4-motion cheirality
test (:550+), followed by triangulation with depth/parallax/reprojection
checks (CheckRT :380-520).

Works in *normalized* camera coordinates (unprojected pixels), so F here is
the essential matrix directly. All candidate motions are evaluated in one
batched cheirality pass instead of the reference's sequential loops.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie, ransac


class TwoViewResult(NamedTuple):
    ok: jnp.ndarray            # scalar bool
    T_c2w: jnp.ndarray         # [7] second camera pose (first = identity)
    points: jnp.ndarray        # [N, 3] triangulated (garbage where ~mask)
    mask: jnp.ndarray          # [N] bool triangulated inliers
    used_h: jnp.ndarray        # scalar bool: homography model chosen


def _score(errs, th, gamma):
    """ORB-SLAM CheckHomography/CheckFundamental scoring: sum of
    (gamma - e) over inliers."""
    return jnp.sum(jnp.where(errs < th, gamma - errs, 0.0), -1)


def _decompose_e(E):
    """4 motion candidates (R, t) from an essential matrix."""
    U, S, Vt = jnp.linalg.svd(E)
    # enforce det +1
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _decompose_h(H):
    """Faugeras SVD decomposition of a (normalized-coords) homography into 8
    motion hypotheses (InitializerSVD::ReconstructH)."""
    U, S, Vt = jnp.linalg.svd(H)
    d1, d2, d3 = S[0], S[1], S[2]
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d2c = jnp.maximum(d2, 1e-9)

    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(
        d1 * d1 - d3 * d3, 1e-12), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(
        d1 * d1 - d3 * d3, 1e-12), 0.0))
    x1s = jnp.array([aux1, aux1, -aux1, -aux1])
    x3s = jnp.array([aux3, -aux3, aux3, -aux3])

    # case d' > 0 (n'= d2)
    aux_st = jnp.sqrt(jnp.maximum(
        (d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.maximum(
        (d1 + d3) * d2c, 1e-12)
    ct = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2c, 1e-12)
    st_signs = jnp.array([1.0, -1.0, -1.0, 1.0])
    Rs_pos = []
    ts_pos = []
    for i in range(4):
        st = st_signs[i] * aux_st
        Rp = jnp.array([[ct, 0.0, -st], [0.0, 1.0, 0.0], [st, 0.0, ct]])
        tp = (d1 - d3) * jnp.array([x1s[i], 0.0, -x3s[i]])
        Rs_pos.append(s * U @ Rp @ Vt)
        ts_pos.append((U @ tp))
    # case d' < 0
    aux_sp = jnp.sqrt(jnp.maximum(
        (d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.maximum(
        (d1 - d3) * d2c, 1e-12)
    cp = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2c, 1e-12)
    for i in range(4):
        sp = st_signs[i] * aux_sp
        Rp = jnp.array([[cp, 0.0, sp], [0.0, -1.0, 0.0], [sp, 0.0, -cp]])
        tp = (d1 + d3) * jnp.array([x1s[i], 0.0, x3s[i]])
        Rs_pos.append(s * U @ Rp @ Vt)
        ts_pos.append((U @ tp))
    Rs = jnp.stack(Rs_pos)
    ts = jnp.stack(ts_pos)
    ts = ts / jnp.maximum(jnp.linalg.norm(ts, axis=-1, keepdims=True), 1e-12)
    return Rs, ts


def _check_rt(R, t, ra, rb, valid, reproj_th2: float,
              min_parallax_cos: float = 0.99998):
    """Cheirality + reprojection test for one (R, t) candidate
    (InitializerSVD::CheckRT). ra, rb: [N, 3] normalized rays (z=1).
    Camera a at origin; b pose: x_b = R x_a + t.
    Returns (ngood, good_mask, points, parallax_ok_count)."""
    q = lie.quat_from_matrix(R)
    T_b_w2c = lie.se3(t, q)                   # world (=cam a) -> cam b
    T_a_c2w = lie.se3_identity()
    T_b_c2w = lie.se3_inv(T_b_w2c)
    X, depth_a = ransac.triangulate(T_a_c2w, T_b_c2w, ra, rb)
    pb = lie.se3_apply(T_b_w2c, X)
    depth_b = pb[:, 2]
    # reprojection errors in both views
    ea = jnp.sum((X[:, :2] / jnp.where(jnp.abs(X[:, 2:]) < 1e-9, 1e-9,
                                       X[:, 2:]) - ra[:, :2]) ** 2, -1)
    eb = jnp.sum((pb[:, :2] / jnp.where(jnp.abs(pb[:, 2:]) < 1e-9, 1e-9,
                                        pb[:, 2:]) - rb[:, :2]) ** 2, -1)
    cosp = ransac.parallax_cos(T_a_c2w, T_b_c2w, X)
    finite = jnp.all(jnp.isfinite(X), -1)
    good = (valid & finite & (depth_a > 0) & (depth_b > 0)
            & (ea < reproj_th2) & (eb < reproj_th2)
            & (cosp < min_parallax_cos) & (cosp > 0.0))
    return jnp.sum(good), good, X


@functools.partial(jax.jit, static_argnames=("iters", "lo_topk"))
def initialize_two_view(key, ra_xy, rb_xy, valid, sigma: float = 0.004,
                        iters: int = 256, lo_topk: int = 1):
    """Full two-view bootstrap. ra_xy, rb_xy: [N, 2] normalized coords of
    matched keypoints in frames a/b; sigma: measurement noise in normalized
    units (~1 px / f). Returns TwoViewResult; translation has unit norm
    (monocular scale gauge)."""
    ka, kb = jax.random.split(key)
    # --- H and F hypotheses + ORB-SLAM chi-square scores
    resH = ransac.find_homography(ka, ra_xy, rb_xy, valid,
                                  threshold=2.447 * sigma, iters=iters,
                                  lo_topk=lo_topk)
    resF = ransac.find_fundamental(kb, ra_xy, rb_xy, valid,
                                   threshold=1.96 * sigma, iters=iters,
                                   lo_topk=lo_topk)
    eh = _h_err(resH.model, ra_xy, rb_xy)
    ef = _f_err(resF.model, ra_xy, rb_xy)
    s2 = sigma * sigma
    # ORB-SLAM: thH = 5.99 sigma^2 per-direction; F: 3.84, gamma 5.99
    sh = _score(jnp.where(valid, eh / s2, jnp.inf)[None], 2 * 5.991,
                2 * 5.991)[0]
    sf = _score(jnp.where(valid, ef / s2, jnp.inf)[None], 2 * 3.841,
                2 * 5.991)[0]
    rh = sh / jnp.maximum(sh + sf, 1e-9)
    use_h = rh > 0.40                         # InitializerSVD.cpp:167-174

    # --- candidate motions from both models; evaluate all 12 together
    RsH, tsH = _decompose_h(resH.model)
    RsF, tsF = _decompose_e(resF.model)
    Rs = jnp.concatenate([RsH, RsF], 0)       # [12, 3, 3]
    ts = jnp.concatenate([tsH, tsF], 0)
    from_h = jnp.arange(12) < 8
    cand_ok = jnp.where(use_h, from_h, ~from_h)

    ra = jnp.concatenate([ra_xy, jnp.ones_like(ra_xy[:, :1])], -1)
    rb = jnp.concatenate([rb_xy, jnp.ones_like(rb_xy[:, :1])], -1)
    model_inliers = jnp.where(use_h, resH.inliers, resF.inliers)
    reproj_th2 = 4.0 * s2 * 5.991

    ngood, good, X = jax.vmap(
        lambda R, t: _check_rt(R, t, ra, rb, model_inliers, reproj_th2)
    )(Rs, ts)
    ngood = jnp.where(cand_ok, ngood, -1)
    best = jnp.argmax(ngood)
    n1 = jnp.max(ngood)
    # runner-up must be clearly worse (ORB-SLAM: nsimilar < 1 + 0.7*nGood)
    second = jnp.max(jnp.where(jnp.arange(12) == best, -1, ngood))
    nin = jnp.sum(model_inliers)
    ok = ((n1 >= 8) & (n1 > 0.5 * nin) & (second < 0.8 * n1))

    q = lie.quat_from_matrix(Rs[best])
    T_w2c = lie.se3(ts[best], q)
    return TwoViewResult(ok=ok, T_c2w=lie.se3_inv(T_w2c),
                         points=X[best], mask=good[best], used_h=use_h)


def _h_err(H, pa, pb):
    return ransac._h_transfer_err(H, pa, pb)


def _f_err(F, pa, pb):
    return ransac._f_epipolar_err(F, pa, pb)
