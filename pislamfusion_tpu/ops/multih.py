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
                 ransac_iters: int = 192, ratio: float = 0.8):
    """Returns (idx [Na] a->b match index, ok [Na], n_planes) — the base
    ratio+cross-checked BF matches grown by up to n_h homography-guided
    window re-matches (MatcherMultiH.cpp:197-450 semantics: the base is a
    conservative matcher; the growth pass inside each homography's window
    uses the absolute threshold alone, findMatchWindow :129-168)."""
    dist = matching.distance_matrix(desc_a, desc_b, kind)
    if max_dist is None:
        max_dist = 80.0 if kind == "orb" else 0.2
    idx, ok = matching.match(dist, valid_a, valid_b, max_dist, ratio=ratio)

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
