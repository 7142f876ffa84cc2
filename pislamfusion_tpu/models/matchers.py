"""Pluggable two-view matchers behind the MATCHERS registry.

The reference ships a family of Matcher plugins selected by `Matcher?=`
(GSLAM-DIYSLAM/src/Matcher.h + zhaoyong/MatcherMultiH.cpp,
MatcherBFMultiH.cpp, MatcherBF variants); DIYSLAM's two-view
initialization and relocalization call whichever is configured. This
module mirrors that seam: each entry wraps one ops-level fixed-shape
device program with the uniform signature

    matcher(key, frame_a, frame_b) -> (idx [Na] int32, ok [Na] bool)

where idx maps a-keypoints to b-keypoints. All matchers run as ONE
device dispatch (the ops they wrap are jitted end-to-end).

Selection: `MATCHERS.create(cfg.get_string("Matcher", "multiH"), cfg)`.
Ablate with scripts/batch_evaluate.py.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.registry import MATCHERS
from ..ops import matching, multih


def _arrays(frame):
    return (jnp.asarray(frame.desc), jnp.asarray(frame.valid),
            jnp.asarray(frame.xy), jnp.asarray(frame.angle))


@MATCHERS.register("BF")
class MatcherBF:
    """Plain cross-checked brute-force match + ratio test + rotation
    histogram — the reference's baseline Matcher (MatcherBF variants;
    ratio 0.8 per MatcherBoW.cpp:133-174 thresholds)."""

    def __init__(self, cfg=None):
        self.ratio = cfg.get_double("Matcher.Ratio", 0.8) if cfg else 0.8

    def __call__(self, key, fa, fb):
        desc_a, valid_a, _, ang_a = _arrays(fa)
        desc_b, valid_b, _, ang_b = _arrays(fb)
        idx, ok = matching.match_descriptors(
            desc_a, valid_a, desc_b, valid_b, fa.desc_kind,
            ratio=self.ratio)
        ok = matching.rotation_consistency_mask(ang_a, ang_b, idx, ok)
        return idx, ok


@MATCHERS.register("multiH")
class MatcherMultiH:
    """The reference's DEFAULT matcher: conservative BF base + multi-
    homography window growth (MatcherMultiH.cpp:197-450)."""

    def __init__(self, cfg=None):
        self.n_h = cfg.get_int("Matcher.MaxHomographies", 4) if cfg else 4
        self.window = cfg.get_double("Matcher.Window", 8.0) if cfg else 8.0

    def __call__(self, key, fa, fb):
        desc_a, valid_a, xy_a, ang_a = _arrays(fa)
        desc_b, valid_b, xy_b, ang_b = _arrays(fb)
        idx, ok, _ = multih.match_multih(
            key, desc_a, valid_a, xy_a, desc_b, valid_b, xy_b,
            kind=fa.desc_kind, n_h=self.n_h, window=self.window)
        ok = matching.rotation_consistency_mask(ang_a, ang_b, idx, ok)
        return idx, ok


@MATCHERS.register("BFMultiH")
class MatcherBFMultiH:
    """MatcherBFMultiH.cpp:296-490: cross-check BF, best-run rotation
    vote, F-RANSAC prune, peel <=5 homographies, epipolar-guided window
    re-match. Stricter base than multiH (F gate), denser growth."""

    def __init__(self, cfg=None):
        self.n_h = cfg.get_int("Matcher.MaxHomographies", 5) if cfg else 5
        self.window = cfg.get_double("Matcher.Window", 8.0) if cfg else 8.0

    def __call__(self, key, fa, fb):
        desc_a, valid_a, xy_a, ang_a = _arrays(fa)
        desc_b, valid_b, xy_b, ang_b = _arrays(fb)
        idx, ok, _ = multih.match_bf_multih(
            key, desc_a, valid_a, xy_a, ang_a,
            desc_b, valid_b, xy_b, ang_b,
            kind=fa.desc_kind, n_h=self.n_h,
            window=max(self.window, fa.camera.width / 64.0
                       if fa.camera is not None else self.window))
        return idx, ok
