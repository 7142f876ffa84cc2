"""Fused device-side frame step: the flagship compiled program.

One jit: grayscale frame -> ORB features -> windowed descriptor match
against the previous frame's tracked map points -> pose-only LM. This is
the per-frame hot path of the tracker (SURVEY.md section 3.2) as a single
XLA program with no host round-trips inside.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import ba, lie, matching
from ..ops.features import orb


class FrameStepResult(NamedTuple):
    T_w2c: jnp.ndarray        # [7] refined pose
    n_inliers: jnp.ndarray    # scalar int
    desc: jnp.ndarray         # [N, 256] current frame descriptors
    valid: jnp.ndarray        # [N]
    xy: jnp.ndarray           # [N, 2]
    angle: jnp.ndarray        # [N]


@functools.partial(jax.jit, static_argnames=("params", "fx", "fy", "cx",
                                             "cy", "radius"))
def fused_frame_step(image, prev_desc, prev_valid, prev_p3d, prev_has,
                     T_pred_w2c, params: orb.OrbParams = orb.OrbParams(),
                     fx: float = 260.0, fy: float = 260.0,
                     cx: float = 160.0, cy: float = 120.0,
                     radius: float = 20.0) -> FrameStepResult:
    """image: [H, W] float32. prev_*: previous frame's padded features and
    the world positions of their map points (prev_has marks tracked ones).
    T_pred_w2c: [7] motion-model prediction (world->camera)."""
    feats = orb.orb_detect(image, params)
    # project previous map points with the predicted pose
    pc = lie.se3_apply(T_pred_w2c, prev_p3d)
    z = jnp.maximum(pc[..., 2], 1e-6)
    pix = jnp.stack([fx * pc[..., 0] / z + cx, fy * pc[..., 1] / z + cy], -1)
    infront = pc[..., 2] > 1e-3
    wmask = matching.window_mask(pix, feats["xy"], radius)
    dist = matching.hamming_matrix(prev_desc, feats["desc"])
    idx, ok = matching.match(dist, prev_valid & prev_has & infront,
                             feats["valid"], max_dist=80.0,
                             window_mask=wmask)
    # scatter matched 3D points onto current keypoint slots
    n = feats["xy"].shape[0]
    tgt = jnp.where(ok, idx, n)  # out-of-range rows dropped by scatter mode
    p3d = jnp.zeros((n, 3)).at[tgt].set(prev_p3d, mode="drop")
    w = jnp.zeros((n,)).at[tgt].set(ok.astype(jnp.float32), mode="drop")
    rays_xy = jnp.stack([(feats["xy"][:, 0] - cx) / fx,
                         (feats["xy"][:, 1] - cy) / fy], -1)
    T, cost, chi2 = ba.optimize_pose(T_pred_w2c, p3d, rays_xy, w, iters=10,
                                     huber_delta=2.45 / fx)
    inl = jnp.sum((w > 0) & (chi2 < 5.991 / fx ** 2))
    return FrameStepResult(T, inl, feats["desc"], feats["valid"],
                           feats["xy"], feats["angle"])
