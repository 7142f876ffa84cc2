"""Pluggable two-view initializers behind the INITIALIZERS registry.

The reference selects its bootstrap geometry with `Initializer?=`
(GSLAM-DIYSLAM/src/Initializer.h:22-34): `svd` (InitializerSVD.cpp —
the ORB-SLAM-style parallel H/F RANSAC with model-score selection and
cheirality reconstruction), `opt` (InitializerOpt.cpp — joint SE3 +
per-match inverse-depth epipolar optimization from identity), `eigen`
(InitializerSVDEigen.cpp — the same SVD math through Eigen) and the
`svdzm` student variant. This module mirrors that seam; every entry has
the uniform signature

    initializer(key, rays_a [N,2], rays_b [N,2], valid [N], sigma)
        -> TwoViewResult  (ok, T_c2w of the second camera, points in the
                           first camera's frame, inlier mask)

Selection: `INITIALIZERS.create(cfg.get_string("Initializer", "svd"), cfg)`.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.registry import ESTIMATORS, INITIALIZERS
from ..ops import ba, init2view, lie


# --- Estimator?= seam (GSLAM/core/Estimator.h plugin): the reference picks
# its geometric-estimation backend by name. Here the backends differ only
# in the RANSAC local-optimization policy (the vmapped sweep + refit is
# shared), so a profile resolves to the lo_topk passed to ops.ransac.
ESTIMATORS.register("OpenCV", lambda cfg=None: 1)       # EstimatorOpenCV.cpp
ESTIMATORS.register("opencv", lambda cfg=None: 1)
ESTIMATORS.register(                                     # liuguochen/
    "LORANSAC",                                          # EstimatorLORANSAC.cpp
    lambda cfg=None: cfg.get_int("Estimator.LOTopK", 8) if cfg else 8)
ESTIMATORS.register(
    "loransac",
    lambda cfg=None: cfg.get_int("Estimator.LOTopK", 8) if cfg else 8)


def estimator_lo_topk(cfg) -> int:
    """Resolve `Estimator?=` to the LO-RANSAC top-K (1 = plain best-refit)."""
    name = cfg.get_string("Estimator", "OpenCV") if cfg else "OpenCV"
    try:
        return ESTIMATORS.create(name, cfg)
    except KeyError:
        from ..core.glog import logger
        logger.warning(f"Estimator '{name}' unknown; using OpenCV")
        return 1


@INITIALIZERS.register("svd")
@INITIALIZERS.register("eigen")
@INITIALIZERS.register("svdzm")
class InitializerSVD:
    """InitializerSVD.cpp: parallel H (4pt-DLT) / F (8pt) RANSAC, score
    ratio RH>0.40 model selection, ReconstructH/ReconstructF cheirality —
    `ops/init2view.initialize_two_view` is the one-dispatch TPU program.
    `eigen` (same math via Eigen SVD) and `svdzm` (student re-derivation)
    are numerically this class."""

    def __init__(self, cfg=None):
        self.iters = cfg.get_int("Initializer.RansacIters", 256) \
            if cfg else 256
        self.lo_topk = estimator_lo_topk(cfg)

    def __call__(self, key, ra, rb, valid, sigma: float = 0.004):
        return init2view.initialize_two_view(key, ra, rb, valid,
                                             sigma=sigma, iters=self.iters,
                                             lo_topk=self.lo_topk)


@INITIALIZERS.register("opt")
@INITIALIZERS.register("opt_svd")
class InitializerOpt:
    """InitializerOpt.cpp: no model selection — a single joint SE3 +
    per-match inverse-depth epipolar LM from the identity pose
    (optimizePose / EdgeSE3InvDepth, optimizerG2O/Optimizer.cpp:445-492),
    with the reference's gates: ray disparity > 0.05 for >= 20% of
    matches (:52-60), translation > 0.03 after the solve (:69-73), depth
    in (1/20, 10) with squared reprojection < 1e-5 (:79-88), and a
    >= 50-point / >= 50%-yield acceptance (:90-95). Better than `svd` on
    low-parallax quasi-planar pairs (no H/F ambiguity); weaker when the
    identity start is far from the true motion."""

    def __init__(self, cfg=None):
        self.iters = cfg.get_int("Initializer.OptIters", 24) if cfg else 24

    def __call__(self, key, ra, rb, valid, sigma: float = 0.004):
        ra = jnp.asarray(ra, jnp.float32)
        rb = jnp.asarray(rb, jnp.float32)
        valid = jnp.asarray(valid, bool)
        n_valid = int(jnp.sum(valid))
        disp = jnp.linalg.norm(rb - ra, axis=-1)
        n_base = int(jnp.sum(valid & (disp > 0.05)))
        false_res = init2view.TwoViewResult(
            ok=jnp.asarray(False),
            T_c2w=jnp.array([0, 0, 0, 0, 0, 0, 1.0], jnp.float32),
            points=jnp.zeros((ra.shape[0], 3), jnp.float32),
            mask=jnp.zeros(ra.shape[0], bool),
            used_h=jnp.asarray(False))
        if n_base * 5 < n_valid or n_valid < 8:   # :52-60
            return false_res
        ident = jnp.array([0, 0, 0, 0, 0, 0, 1.0], jnp.float32)
        z1 = jnp.zeros((1, 3), jnp.float32)
        T_w2c, _, idepth, chi2_2d, _ = ba.optimize_pose_invdepth(
            ident, ident, ra, rb, valid.astype(jnp.float32),
            jnp.ones(ra.shape[0], jnp.float32), z1,
            jnp.zeros((1, 2), jnp.float32), jnp.zeros(1, jnp.float32),
            iters=self.iters, huber_delta=3.0 * max(sigma, 1e-4))
        T_c2w = lie.se3_inv(T_w2c)
        if float(jnp.linalg.norm(T_c2w[:3])) < 0.03:   # :69-73
            return false_res
        ray3 = jnp.concatenate([ra, jnp.ones((ra.shape[0], 1))], -1)
        q = jnp.maximum(idepth, 1e-6)
        points = ray3 / q[:, None]
        # :79-88 — idepth in (0.1, 20) i.e. depth in (0.05, 10);
        # normalized squared reprojection below 1e-5. ALSO require the
        # point in front of the SECOND camera: optimize_pose_invdepth
        # zeroes the residual when the reprojected depth is <= 1e-6
        # (ops/ba.py), so chi2_2d == 0 alone would pass behind-camera
        # matches through the gate (the SVD path's db > 0 twin).
        pc2 = lie.se3_apply(T_w2c, points)
        mask = (valid & (idepth > 0.1) & (idepth < 20.0)
                & (chi2_2d < 1e-5) & (pc2[:, 2] > 1e-6))
        n_pts = int(jnp.sum(mask))
        ok = (n_pts > 50) and (2 * n_pts > n_valid)    # :90-95
        return init2view.TwoViewResult(
            ok=jnp.asarray(ok), T_c2w=T_c2w.astype(jnp.float32),
            points=points.astype(jnp.float32), mask=mask,
            used_h=jnp.asarray(False))


def create_initializer(cfg):
    """The tracker-facing factory: `Initializer?=` with a warn-and-default
    fallback for unknown names (the reference LOG(FATAL)s,
    TrackerOpt.cpp:295; a registry miss here should not kill tracking)."""
    name = cfg.get_string("Initializer", "svd") if cfg else "svd"
    try:
        return INITIALIZERS.create(name, cfg)
    except KeyError:
        from ..core.glog import logger
        logger.warning(f"Initializer '{name}' unknown; using svd")
        return InitializerSVD(cfg)
