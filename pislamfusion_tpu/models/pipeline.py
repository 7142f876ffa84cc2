"""Fused device-side frame steps: the flagship compiled programs.

The reference's per-frame hot path (SURVEY.md section 3.2 — SIFT/ORB extract,
windowed match vs the last frame, g2o optimizePnP, then trackLocalMap) costs
it dozens of CPU/GPU hops; here it is TWO XLA programs per frame with no host
round-trips inside:

  * `fused_frame_step`  — grayscale frame -> ORB pyramid features ->
    windowed Hamming match against the previous frame's tracked map points
    -> pose-only LM (TrackerOpt::trackLastFrame, :636-793).
  * `fused_localmap_step` — project the padded local map into the refined
    pose, windowed re-match, merged pose-only LM
    (TrackerOpt::trackLocalMap, :1107-1305).

The shipped Tracker (models/tracker.py) runs THESE when the detector is ORB;
bench.py measures the same program — no separate "benchmark-only" path.
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import ba, image as im, lie, matching
from ..ops.features import orb, sift


def _detect(image, params):
    """Static-dispatch extractor: the params TYPE selects the detector
    (OrbParams -> orb_detect, SiftParams -> sift_detect), so the same
    fused programs serve both the reference's Default.cfg SIFT config and
    the ORB fast path — params is a frozen dataclass jit static."""
    if isinstance(params, sift.SiftParams):
        return sift.sift_detect(image, params)
    return orb.orb_detect(image, params)


def _desc_kind(desc) -> str:
    """Descriptor family from the array itself: ORB bit-planes are uint8,
    SIFT 128-vectors are float32 — no extra static to thread through."""
    return "orb" if desc.dtype == jnp.uint8 else "sift"


def _desc_max_dist(kind: str) -> float:
    """Reference absolute thresholds: Hamming 80 (MatcherBoW.cpp:133-174),
    RootSIFT L2 0.2."""
    return 80.0 if kind == "orb" else 0.2


class FrameStepResult(NamedTuple):
    T_w2c: jnp.ndarray        # [7] refined pose (world->camera)
    n_inliers: jnp.ndarray    # scalar int
    idx: jnp.ndarray          # [N] prev-slot -> cur-slot match index
    ok: jnp.ndarray           # [N] prev-slot match validity
    chi2: jnp.ndarray         # [N] per-CUR-slot squared residual (normalized)
    weight: jnp.ndarray       # [N] per-CUR-slot weight used in the LM
    feats: dict               # full orb_detect output for the new frame


@functools.partial(jax.jit, static_argnames=("params",))
def fused_extract(image, params: orb.OrbParams = orb.OrbParams()):
    """Feature extraction alone, dispatchable from the FEED thread before
    the frame enters the tracking queue — the reference's depth-2 overlap
    (DIYSLAM.cpp:346-353): the image upload and the ORB pyramid run while
    the tracking thread is still fetching the previous frame's result.
    image: [H, W] gray or [H, W, 3] RGB, any dtype (gray conversion and
    the float cast happen on device — upload the raw uint8 frame)."""
    image = image.astype(jnp.float32)
    if image.ndim == 3:
        image = im.rgb_to_gray(image)
    return _detect(image, params)


@functools.partial(jax.jit, static_argnames=("params", "fx", "fy", "cx",
                                             "cy", "radius", "chi2_th"))
def fused_frame_step(image, prev_desc, prev_valid, prev_p3d, prev_has,
                     T_pred_w2c, params: orb.OrbParams = orb.OrbParams(),
                     fx: float = 260.0, fy: float = 260.0,
                     cx: float = 160.0, cy: float = 120.0,
                     radius: float = 20.0,
                     chi2_th: float = 5.991) -> FrameStepResult:
    """image: [H, W] gray or [H, W, 3] RGB, any dtype — grayscale
    conversion and the cast to float32 happen ON DEVICE, so the host
    uploads the raw (typically uint8) frame: 4-12x less tunnel traffic
    than staging float32 gray host-side. prev_*: previous frame's padded
    features and the world positions of their map points (prev_has marks
    tracked slots). T_pred_w2c: [7] motion-model prediction
    (world->camera)."""
    image = image.astype(jnp.float32)
    if image.ndim == 3:
        image = im.rgb_to_gray(image)
    feats = _detect(image, params)
    return _frame_step_core(feats, prev_desc, prev_valid, prev_p3d,
                            prev_has, T_pred_w2c, fx, fy, cx, cy, radius,
                            chi2_th)


def _frame_step_core(feats, prev_desc, prev_valid, prev_p3d, prev_has,
                     T_pred_w2c, fx, fy, cx, cy, radius, chi2_th):
    """Match-vs-last + pose LM given already-extracted features (traced)."""
    # project previous map points with the predicted pose
    pc = lie.se3_apply(T_pred_w2c, prev_p3d)
    z = jnp.maximum(pc[..., 2], 1e-6)
    pix = jnp.stack([fx * pc[..., 0] / z + cx, fy * pc[..., 1] / z + cy], -1)
    infront = pc[..., 2] > 1e-3
    wmask = matching.window_mask(pix, feats["xy"], radius)
    kind = _desc_kind(prev_desc)
    dist = matching.distance_matrix(prev_desc, feats["desc"], kind)
    idx, ok = matching.match(dist, prev_valid & prev_has & infront,
                             feats["valid"],
                             max_dist=_desc_max_dist(kind),
                             window_mask=wmask)
    # scatter matched 3D points onto current keypoint slots
    n = feats["xy"].shape[0]
    tgt = jnp.where(ok, idx, n)  # out-of-range rows dropped by scatter mode
    p3d = jnp.zeros((n, 3)).at[tgt].set(prev_p3d, mode="drop")
    w = jnp.zeros((n,)).at[tgt].set(ok.astype(jnp.float32), mode="drop")
    rays_xy = jnp.stack([(feats["xy"][:, 0] - cx) / fx,
                         (feats["xy"][:, 1] - cy) / fy], -1)
    T, cost, chi2 = ba.optimize_pose(
        T_pred_w2c, p3d, rays_xy, w, iters=10,
        huber_delta=math.sqrt(chi2_th) / fx)
    inl = jnp.sum((w > 0) & (chi2 < chi2_th / fx ** 2))
    return FrameStepResult(T, inl, idx, ok, chi2, w, feats)


class LocalMapStepResult(NamedTuple):
    T_w2c: jnp.ndarray        # [7] refined pose
    n_inliers: jnp.ndarray    # scalar int
    idx: jnp.ndarray          # [P] local-point -> cur-slot match index
    ok: jnp.ndarray           # [P]
    chi2: jnp.ndarray         # [N] per-CUR-slot squared residual
    weight: jnp.ndarray       # [N] per-CUR-slot weight (existing + new)


@functools.partial(jax.jit, static_argnames=("params", "fx", "fy", "cx",
                                             "cy", "width", "height",
                                             "radius", "radius_local",
                                             "chi2_th"))
def fused_track_step(image, prev_desc, prev_valid, prev_p3d, prev_has,
                     T_pred_w2c, local_pos, local_desc, local_valid,
                     params: orb.OrbParams = orb.OrbParams(),
                     fx: float = 260.0, fy: float = 260.0,
                     cx: float = 160.0, cy: float = 120.0,
                     width: int = 320, height: int = 240,
                     radius: float = 20.0, radius_local: float = 8.0,
                     chi2_th: float = 5.991):
    """The ENTIRE per-frame tracking hot path as ONE program: extract ->
    match-vs-last -> pose LM -> project local map -> re-match -> merged
    pose LM. One device dispatch per frame instead of two — the current
    keypoint->3D bindings flow between the phases on-chip (the host would
    reconstruct exactly the same scatter). Local-map arrays are staged by
    the tracker after each keyframe (one-frame staleness, same as the
    reference's cross-thread local map)."""
    res = fused_frame_step(image, prev_desc, prev_valid, prev_p3d, prev_has,
                           T_pred_w2c, params=params, fx=fx, fy=fy, cx=cx,
                           cy=cy, radius=radius, chi2_th=chi2_th)
    feats = res.feats
    n = feats["xy"].shape[0]
    # p3d/w bindings the frame step produced (recompute the scatter — XLA
    # CSEs it with the one inside fused_frame_step)
    tgt = jnp.where(res.ok, res.idx, n)
    p3d_cur = jnp.zeros((n, 3)).at[tgt].set(prev_p3d, mode="drop")
    w_cur = jnp.zeros((n,)).at[tgt].set(res.ok.astype(jnp.float32),
                                        mode="drop")
    # drop bindings the first LM rejected
    inl = (w_cur > 0) & (res.chi2 < chi2_th / fx ** 2)
    w_cur = jnp.where(inl, w_cur, 0.0)
    res2 = fused_localmap_step(
        feats["desc"], feats["valid"], feats["xy"], res.T_w2c,
        p3d_cur, w_cur, local_pos, local_desc, local_valid,
        fx=fx, fy=fy, cx=cx, cy=cy, width=width, height=height,
        radius=radius_local, chi2_th=chi2_th)
    return res, res2


@functools.partial(jax.jit, static_argnames=("params", "fx", "fy", "cx",
                                             "cy", "width", "height",
                                             "radius", "radius_local",
                                             "chi2_th"))
def fused_track_packed(image, prev_desc, prev_valid, prev_p3d, prev_has,
                       T_pred_w2c, local_pos, local_desc, local_valid,
                       params: orb.OrbParams = orb.OrbParams(),
                       fx: float = 260.0, fy: float = 260.0,
                       cx: float = 160.0, cy: float = 120.0,
                       width: int = 320, height: int = 240,
                       radius: float = 20.0, radius_local: float = 8.0,
                       chi2_th: float = 5.991):
    """fused_track_step with the per-frame host results PACKED into three
    arrays. Rationale: the host sync (`block_until_ready`/`device_get`)
    costs one backend round trip PER PYTREE LEAF on a tunneled TPU —
    19 leaves measured ~250 ms/frame vs ~0.3 ms of actual device compute.
    Packing shrinks the fetch to 3 leaves (plus the feature dict, which
    stays on device).

    Returns (feats, packed [16 + 6N + 2P] float32):
      packed[:16]          = [T1(7), n_inl1, T2(7), n_inl2]
      packed[16:16+6N]     = [idx1, ok1, chi2_1, w1, chi2_2, w2] (per kp)
      packed[16+6N:]       = [idx2, ok2]            (per local-map point)
    A single output leaf means a single host round trip per frame — each
    extra leaf in the fetched pytree costs a full backend round trip.
    """
    res, res2 = fused_track_step(
        image, prev_desc, prev_valid, prev_p3d, prev_has, T_pred_w2c,
        local_pos, local_desc, local_valid, params=params, fx=fx, fy=fy,
        cx=cx, cy=cy, width=width, height=height, radius=radius,
        radius_local=radius_local, chi2_th=chi2_th)
    f32 = jnp.float32
    packed = jnp.concatenate([
        res.T_w2c, res.n_inliers[None].astype(f32),
        res2.T_w2c, res2.n_inliers[None].astype(f32),
        res.idx.astype(f32), res.ok.astype(f32),
        res.chi2, res.weight, res2.chi2, res2.weight,
        res2.idx.astype(f32), res2.ok.astype(f32)])
    return res.feats, packed


@functools.partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy",
                                             "width", "height", "radius",
                                             "radius_local", "chi2_th"))
def fused_track_packed_feats(feats, prev_desc, prev_valid, aux,
                             local_pos, local_desc, local_valid,
                             fx: float = 260.0, fy: float = 260.0,
                             cx: float = 160.0, cy: float = 120.0,
                             width: int = 320, height: int = 240,
                             radius: float = 20.0, radius_local: float = 8.0,
                             chi2_th: float = 5.991):
    """fused_track_packed for a frame whose features were ALREADY extracted
    on device (predispatched from the feed thread). The small per-frame
    host inputs ride in ONE packed `aux` array — on the tunneled backend
    every separate upload serializes behind a round trip:

      aux [4N + 7] f32 = [prev_p3d.ravel (3N), prev_has (N), T_pred (7)]
    """
    n = prev_desc.shape[0]
    prev_p3d = aux[:3 * n].reshape(n, 3)
    prev_has = aux[3 * n:4 * n] > 0.5
    T_pred_w2c = aux[4 * n:4 * n + 7]
    packed, _, _, _ = _track_core(
        feats, prev_desc, prev_valid, prev_p3d, prev_has, T_pred_w2c,
        local_pos, local_desc, local_valid, fx, fy, cx, cy, width, height,
        radius, radius_local, chi2_th)
    return packed


def _track_core(feats, prev_desc, prev_valid, prev_p3d, prev_has,
                T_pred_w2c, local_pos, local_desc, local_valid,
                fx, fy, cx, cy, width, height, radius, radius_local,
                chi2_th):
    """Traced per-frame track body shared by fused_track_packed_feats and
    the chained variant: match-vs-last + pose LM + local-map re-match +
    merged LM, packed into one row. Also returns the merged per-slot
    (p3d, w) bindings and chi2 — the chain's carry to the next frame."""
    res = _frame_step_core(feats, prev_desc, prev_valid, prev_p3d,
                           prev_has, T_pred_w2c, fx, fy, cx, cy, radius,
                           chi2_th)
    nf = feats["xy"].shape[0]
    tgt = jnp.where(res.ok, res.idx, nf)
    p3d_cur = jnp.zeros((nf, 3)).at[tgt].set(prev_p3d, mode="drop")
    w_cur = jnp.zeros((nf,)).at[tgt].set(res.ok.astype(jnp.float32),
                                         mode="drop")
    inl = (w_cur > 0) & (res.chi2 < chi2_th / fx ** 2)
    w_cur = jnp.where(inl, w_cur, 0.0)
    res2, p3d_m, w_m = _localmap_core(
        feats["desc"], feats["valid"], feats["xy"], res.T_w2c,
        p3d_cur, w_cur, local_pos, local_desc, local_valid,
        fx, fy, cx, cy, width, height, radius_local, chi2_th)
    f32 = jnp.float32
    packed = jnp.concatenate([
        res.T_w2c, res.n_inliers[None].astype(f32),
        res2.T_w2c, res2.n_inliers[None].astype(f32),
        res.idx.astype(f32), res.ok.astype(f32),
        res.chi2, res.weight, res2.chi2, res2.weight,
        res2.idx.astype(f32), res2.ok.astype(f32)])
    return packed, p3d_m, w_m, res2


@functools.partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy",
                                             "width", "height", "radius",
                                             "radius_local", "chi2_th"))
def fused_track_chain(desc_k, valid_k, xy_k, prev_desc, prev_valid, aux,
                      local_pos, local_desc, local_valid,
                      fx: float = 260.0, fy: float = 260.0,
                      cx: float = 160.0, cy: float = 120.0,
                      width: int = 320, height: int = 240,
                      radius: float = 20.0, radius_local: float = 8.0,
                      chi2_th: float = 5.991):
    """Track K consecutive frames in ONE dispatch with the per-frame carry
    kept ON DEVICE (lax.scan), so the host pays ONE packed-result round
    trip per K frames instead of per frame — on the tunneled backend the
    per-frame fetch is the shipped slam.track() loop's dominant cost.

    The reference has no analogue (its GPU work is per-frame inside a CPU
    loop, DIYSLAM.cpp:346-363); this is the TPU-native extension of its
    depth-2 overlap. The local-map stage is FIXED across the chain — the
    same one-stage staleness the online mapper already imposes on the
    per-frame path (keyframe growth lands on the next chain).

    desc_k/valid_k/xy_k: K frames' pre-extracted padded features, stacked
    on the leading axis. aux [4N + 14] f32 =
      [prev_p3d.ravel (3N), prev_has (N),
       pose_est_c2w (7), motion (7)]      — the host tracker's camera-frame
    motion model: pose_pred = pose_est o motion, re-estimated on device
    after each step exactly as Tracker.track does on host
    (motion' = inv(pose_est) o pose_new).

    Returns packed [K, 16 + 6N + 2P] — fused_track_packed_feats rows; the
    host unpacks each row against the previous chain frame. Rows after an
    in-chain tracking failure are garbage (the carry went bad): the host
    detects the failure from the row's own inlier fields and discards the
    tail, exactly like the per-frame path would have.
    """
    n = prev_desc.shape[0]
    prev_p3d = aux[:3 * n].reshape(n, 3)
    prev_has = aux[3 * n:4 * n] > 0.5
    pose_est = aux[4 * n:4 * n + 7]      # c2w
    motion = aux[4 * n + 7:4 * n + 14]   # camera-frame delta

    def step(carry, x):
        p_desc, p_valid, p_p3d, p_has, pose_est, motion = carry
        desc, valid, xy = x
        pose_pred = lie.se3_mul(pose_est, motion)
        T_pred_w2c = lie.se3_inv(pose_pred)
        feats = {"desc": desc, "valid": valid, "xy": xy}
        packed, p3d_m, w_m, res2 = _track_core(
            feats, p_desc, p_valid, p_p3d, p_has, T_pred_w2c,
            local_pos, local_desc, local_valid, fx, fy, cx, cy,
            width, height, radius, radius_local, chi2_th)
        pose_new = lie.se3_inv(res2.T_w2c)
        has_m = (w_m > 0) & (res2.chi2 < chi2_th / fx ** 2)
        motion_new = lie.se3_mul(lie.se3_inv(pose_est), pose_new)
        return ((desc, valid, p3d_m, has_m, pose_new, motion_new),
                packed)

    carry0 = (prev_desc, prev_valid, prev_p3d, prev_has, pose_est, motion)
    _, packed_k = jax.lax.scan(step, carry0, (desc_k, valid_k, xy_k))
    return packed_k


@functools.partial(jax.jit, static_argnames=("params", "fx", "fy", "cx",
                                             "cy", "width", "height",
                                             "radius", "radius_local",
                                             "chi2_th"))
def fused_track_chain_images(images_k, prev_desc, prev_valid, aux,
                             local_pos, local_desc, local_valid,
                             params: orb.OrbParams = orb.OrbParams(),
                             fx: float = 260.0, fy: float = 260.0,
                             cx: float = 160.0, cy: float = 120.0,
                             width: int = 320, height: int = 240,
                             radius: float = 20.0,
                             radius_local: float = 8.0,
                             chi2_th: float = 5.991):
    """fused_track_chain fed RAW stacked frames: extraction runs INSIDE
    the scan, so the host uploads ONE [K, H, W] uint8 array per chain
    instead of dispatching K separate per-frame uploads.

    Why this exists: on the tunneled backend a device_put costs ~40-50 ms
    FIXED plus ~30 MB/s of transfer (measured, see README "Transfer
    ceiling"); round 2's chain still paid the fixed cost per frame via
    the feeder's per-frame predispatch_extract, which is how a chain of
    K=8 measured SLOWER than per-frame tracking (BENCH_r02:
    slam_chain_fps 3.2 vs slam_track_fps 6.9). Batching the upload pays
    the fixed cost once per chain: amortized per-frame transfer drops
    from ~(40 + bytes/30MB/s) to ~(40/K + bytes/30MB/s).

    images_k: [K, H, W] gray or [K, H, W, 3] RGB, any dtype. aux as in
    fused_track_chain. Returns (packed_k [K, rows], feats_k — each
    frame's padded features stacked on axis 0, left on device for the
    host to slice into the Frames it tracked).
    """
    n = prev_desc.shape[0]
    prev_p3d = aux[:3 * n].reshape(n, 3)
    prev_has = aux[3 * n:4 * n] > 0.5
    pose_est = aux[4 * n:4 * n + 7]
    motion = aux[4 * n + 7:4 * n + 14]

    def step(carry, img):
        p_desc, p_valid, p_p3d, p_has, pose_est, motion = carry
        g = img.astype(jnp.float32)
        if g.ndim == 3:
            g = im.rgb_to_gray(g)
        feats = _detect(g, params)
        pose_pred = lie.se3_mul(pose_est, motion)
        T_pred_w2c = lie.se3_inv(pose_pred)
        packed, p3d_m, w_m, res2 = _track_core(
            feats, p_desc, p_valid, p_p3d, p_has, T_pred_w2c,
            local_pos, local_desc, local_valid, fx, fy, cx, cy,
            width, height, radius, radius_local, chi2_th)
        pose_new = lie.se3_inv(res2.T_w2c)
        has_m = (w_m > 0) & (res2.chi2 < chi2_th / fx ** 2)
        motion_new = lie.se3_mul(lie.se3_inv(pose_est), pose_new)
        return ((feats["desc"], feats["valid"], p3d_m, has_m, pose_new,
                 motion_new), (packed, feats))

    carry0 = (prev_desc, prev_valid, prev_p3d, prev_has, pose_est, motion)
    _, (packed_k, feats_k) = jax.lax.scan(step, carry0, images_k)
    return packed_k, feats_k


def _localmap_core(desc, valid, xy, T_w2c, p3d_cur, w_cur,
                   local_pos, local_desc, local_valid,
                   fx, fy, cx, cy, width, height, radius, chi2_th):
    """Traced body of fused_localmap_step that ALSO returns the merged
    per-slot (p3d, w) bindings — the chained tracker carries them to the
    next frame's step on device."""
    pc = lie.se3_apply(T_w2c, local_pos)
    z = jnp.maximum(pc[..., 2], 1e-6)
    pix = jnp.stack([fx * pc[..., 0] / z + cx, fy * pc[..., 1] / z + cy], -1)
    infront = pc[..., 2] > 1e-3
    inview = ((pix[:, 0] >= 0) & (pix[:, 0] < width)
              & (pix[:, 1] >= 0) & (pix[:, 1] < height))
    wmask = matching.window_mask(pix, xy, radius)
    kind = _desc_kind(local_desc)
    dist = matching.distance_matrix(local_desc, desc, kind)
    idx, ok = matching.match(dist, local_valid & infront & inview, valid,
                             max_dist=_desc_max_dist(kind),
                             window_mask=wmask)
    n = xy.shape[0]
    # new bindings only where the slot is still free
    tgt = jnp.where(ok, idx, n)
    p3d_new = jnp.zeros((n, 3)).at[tgt].set(local_pos, mode="drop")
    w_new = jnp.zeros((n,)).at[tgt].set(ok.astype(jnp.float32), mode="drop")
    free = w_cur <= 0
    p3d = jnp.where(free[:, None], p3d_new, p3d_cur)
    w = jnp.where(free, w_new, w_cur)
    rays_xy = jnp.stack([(xy[:, 0] - cx) / fx, (xy[:, 1] - cy) / fy], -1)
    T, cost, chi2 = ba.optimize_pose(
        T_w2c, p3d, rays_xy, w, iters=10,
        huber_delta=math.sqrt(chi2_th) / fx)
    inl = jnp.sum((w > 0) & (chi2 < chi2_th / fx ** 2))
    return LocalMapStepResult(T, inl, idx, ok, chi2, w), p3d, w


@functools.partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy",
                                             "width", "height", "radius",
                                             "chi2_th"))
def fused_localmap_step(desc, valid, xy, T_w2c, p3d_cur, w_cur,
                        local_pos, local_desc, local_valid,
                        fx: float, fy: float, cx: float, cy: float,
                        width: int, height: int, radius: float = 8.0,
                        chi2_th: float = 5.991) -> LocalMapStepResult:
    """desc/valid/xy: current frame's padded features. p3d_cur/w_cur: 3D
    points already bound to current keypoint slots (from the last-frame
    step). local_*: padded local-map point cloud + descriptors."""
    res, _, _ = _localmap_core(desc, valid, xy, T_w2c, p3d_cur, w_cur,
                               local_pos, local_desc, local_valid,
                               fx, fy, cx, cy, width, height, radius,
                               chi2_th)
    return res
