"""Multi-homography match growth — the reference's default Matcher.

Equivalent of GSLAM-DIYSLAM/src/zhaoyong/MatcherMultiH.cpp:197-450 (and the
multi-H growth stage of MatcherBFMultiH.cpp:414-490): after a cross-checked
brute-force match, fit up to K homographies by RANSAC over the surviving
matches (aerial scenes are piecewise planar), then re-match the still-free
keypoints inside a window around each homography's prediction. This is where
the reference gets its match density on drone imagery.

TPU shape: the BF match is one MXU distance matrix; each homography is one
vmapped fixed-budget RANSAC; the growth pass is ONE more masked match with
the union-of-windows mask — K+2 fixed-shape device programs total.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import matching, ransac


def _apply_h(H, xy):
    """[3,3] x [N,2] -> [N,2] projective transform."""
    d = xy @ H[:, :2].T + H[:, 2]
    return d[:, :2] / jnp.where(jnp.abs(d[:, 2:]) < 1e-9, 1e-9, d[:, 2:])


@functools.partial(jax.jit,
                   static_argnames=("kind", "n_h", "window", "max_dist",
                                    "ransac_iters", "ratio"))
def match_multih(key, desc_a, valid_a, xy_a, desc_b, valid_b, xy_b,
                 kind: str = "orb", n_h: int = 4, window: float = 8.0,
                 max_dist: float | None = None, h_threshold: float = 3.0,
                 ransac_iters: int = 192, ratio: float = 0.8,
                 base_mask=None):
    """Returns (idx [Na] a->b match index, ok [Na], n_planes) — the base
    ratio+cross-checked BF matches grown by up to n_h homography-guided
    window re-matches (MatcherMultiH.cpp:197-450 semantics: the base is a
    conservative matcher; the growth pass inside each homography's window
    uses the absolute threshold alone, findMatchWindow :129-168).

    base_mask [Na, Nb] (optional) restricts the BASE match's candidate
    pairs — e.g. a vocabulary node-equality mask turns this into the
    reference's `bowH` matcher (BoW-bucketed base, MatcherMultiH.cpp's
    default base IS BoW-bucketed when a FeatureVector exists, :197-270);
    the homography growth pass stays unrestricted either way."""
    dist = matching.distance_matrix(desc_a, desc_b, kind)
    if max_dist is None:
        max_dist = 80.0 if kind == "orb" else 0.2
    idx, ok = matching.match(dist, valid_a, valid_b, max_dist, ratio=ratio,
                             window_mask=base_mask)

    pb = xy_b[jnp.where(ok, idx, 0)]
    remaining = ok
    planes = []
    keys = jax.random.split(key, n_h)
    n_planes = jnp.int32(0)
    for k in range(n_h):
        res = ransac.find_homography(keys[k], xy_a, pb, remaining,
                                     threshold=h_threshold,
                                     iters=ransac_iters)
        good = res.ok & (res.score >= 12)
        planes.append((jnp.where(good, 1.0, 0.0), res.model))
        n_planes = n_planes + good.astype(jnp.int32)
        # peel this plane's inliers and fit the next on the rest
        remaining = remaining & ~(res.inliers & good)

    # growth: union of per-plane windows around each H's prediction
    grow_mask = jnp.zeros((xy_a.shape[0], xy_b.shape[0]), bool)
    for w, H in planes:
        pred = _apply_h(H, xy_a)                      # [Na, 2]
        m = matching.window_mask(pred, xy_b, window)
        grow_mask = grow_mask | (m & (w > 0))
    free_a = valid_a & ~ok
    # b keypoints already taken by the base match are excluded
    taken_b = jnp.zeros(xy_b.shape[0], bool).at[
        jnp.where(ok, idx, xy_b.shape[0])].set(True, mode="drop")
    idx2, ok2 = matching.match(dist, free_a, valid_b & ~taken_b,
                               max_dist, window_mask=grow_mask)
    idx_out = jnp.where(ok, idx, idx2)
    ok_out = ok | ok2
    return idx_out, ok_out, n_planes


@functools.partial(jax.jit,
                   static_argnames=("kind", "n_h", "window", "max_dist",
                                    "bins", "keep", "f_threshold",
                                    "h_threshold", "ransac_iters"))
def match_bf_multih(key, desc_a, valid_a, xy_a, angle_a,
                    desc_b, valid_b, xy_b, angle_b,
                    kind: str = "orb", n_h: int = 5, window: float = 8.0,
                    max_dist: float | None = None, bins: int = 30,
                    keep: int = 3, f_threshold: float = 2.0,
                    h_threshold: float = 3.0, ransac_iters: int = 192):
    """The reference's OTHER multi-H matcher, MatcherBFMultiH.cpp:296-490:

      1. cross-checked BF match (no ratio test);
      2. rotation-histogram filter keeping the best circular RUN of `keep`
         of `bins` angle-difference bins (:296-376);
      3. fundamental-matrix RANSAC prune of the survivors (:381-420);
      4. peel up to `n_h` homographies from the F-inliers (:425-455);
      5. guided re-match of still-free keypoints: predict through EACH H,
         keep the prediction with the smallest epipolar distance wrt F,
         gate on that distance, then window-match around it (:456-490).

    Differs from `match_multih` (MatcherMultiH.cpp) in the rotation vote,
    the F gate, and best-H selection (vs union-of-windows growth).
    Returns (idx [Na], ok [Na], n_planes). One fixed-shape device program:
    the BF match is an MXU distance matrix, F + each H a vmapped
    fixed-budget RANSAC, the growth one more masked match.
    """
    dist = matching.distance_matrix(desc_a, desc_b, kind)
    if max_dist is None:
        max_dist = 80.0 if kind == "orb" else 0.2
    idx, ok = matching.match(dist, valid_a, valid_b, max_dist)
    ok = matching.rotation_consistency_mask(angle_a, angle_b, idx, ok,
                                            bins=bins, keep=keep,
                                            consecutive=True)

    pb = xy_b[jnp.where(ok, idx, 0)]
    kf, kh = jax.random.split(key)
    fres = ransac.find_fundamental(kf, xy_a, pb, ok,
                                   threshold=f_threshold,
                                   iters=ransac_iters)
    # prune to F-inliers when F was found (reference: "reduce")
    ok = jnp.where(fres.ok, ok & fres.inliers, ok)

    remaining = ok
    planes = []
    keys = jax.random.split(kh, n_h)
    n_planes = jnp.int32(0)
    for k in range(n_h):
        res = ransac.find_homography(keys[k], xy_a, pb, remaining,
                                     threshold=h_threshold,
                                     iters=ransac_iters)
        good = fres.ok & res.ok & (res.score >= 12)
        planes.append((good, res.model))
        n_planes = n_planes + good.astype(jnp.int32)
        remaining = remaining & ~(res.inliers & good)

    # guided growth: best H per free keypoint by epipolar distance wrt F
    preds = jnp.stack([_apply_h(H, xy_a) for _, H in planes])   # [K, Na, 2]
    errs = jnp.stack([
        jnp.where(good,
                  ransac._f_epipolar_err(fres.model, xy_a, preds[j]),
                  jnp.inf)
        for j, (good, _) in enumerate(planes)])                 # [K, Na]
    best_j = jnp.argmin(errs, axis=0)                           # [Na]
    best_err = jnp.min(errs, axis=0)
    best_pred = jnp.take_along_axis(
        preds, best_j[None, :, None], axis=0)[0]                # [Na, 2]
    # symmetric squared distance gate at 2 * f_threshold^2
    near_f = best_err < 2.0 * f_threshold ** 2
    grow_mask = matching.window_mask(best_pred, xy_b, window) \
        & near_f[:, None]
    free_a = valid_a & ~ok
    taken_b = jnp.zeros(xy_b.shape[0], bool).at[
        jnp.where(ok, idx, xy_b.shape[0])].set(True, mode="drop")
    # best-in-window WITHOUT reverse check (findMatchWindow semantics,
    # MatcherBFMultiH.cpp:129-168: the guided pass takes the best
    # descriptor inside the window; only forward uniqueness is enforced)
    idx2, ok2 = matching.match(dist, free_a, valid_b & ~taken_b,
                               max_dist, window_mask=grow_mask,
                               cross_check=False)
    idx_out = jnp.where(ok, idx, idx2)
    ok_out = ok | ok2
    return idx_out, ok_out, n_planes
