"""Segment-parallel survey processing: FastVO scaled over a device mesh.

The per-frame VO chain is inherently sequential (pose t needs pose t-1),
so single-chip throughput is bounded by the serial step (~130 FPS @1080p
on one v5e after round 2's kernels). Surveys, however, split naturally into SEGMENTS anchored by GPS
or a coarse first pass — and segments are independent: each device runs
the full FastVO scan (extract -> match -> pose LM -> warp -> pyramid ->
composite) on its own segments, and the per-segment canvas pyramids merge
by max weight at the end. Throughput scales linearly with devices
(S segments over D chips: wall-clock ~= ceil(S/D) x segment time + one
merge), which is how the >=300 FPS north star is reached on a v5e-8 slice.

The reference has no analogue (single process, single GPU); this is the
scale-out extension SURVEY.md section 2.9 scopes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import image as im
from ..ops import lie
from ..ops import mosaic as M


def _segment_program(vo, frames_k, anchor):
    """One segment's full track+fuse scan on a FRESH canvas (traced)."""
    first = frames_k[0]
    gray0 = im.rgb_to_gray(first) if first.ndim == 3 else first
    f0 = vo._detect(gray0)
    p3d0 = vo._plane_points(f0["xy"], anchor)
    c_lap, c_w = M.alloc_canvas(vo.canvas_tiles, vo.canvas_tiles, vo.bands)
    c_lap, c_w = vo._feed(anchor, frames_k[0], c_lap, c_w)
    carry = (f0["desc"], f0["valid"], p3d0, anchor, anchor, c_lap, c_w)
    carry, (poses, n_match) = jax.lax.scan(vo._step, carry, frames_k[1:])
    poses = jnp.concatenate([anchor[None], poses], 0)
    n0 = jnp.sum(f0["valid"]).astype(n_match.dtype)
    n_match = jnp.concatenate([n0[None], n_match], 0)
    return poses, n_match, tuple(carry[5]), tuple(carry[6])


def _segment_track(vo, frames_k, anchor):
    """Track-only scan of one segment (no compositing) -> poses, n_match."""
    first = frames_k[0]
    gray0 = im.rgb_to_gray(first) if first.ndim == 3 else first
    f0 = vo._detect(gray0)
    p3d0 = vo._plane_points(f0["xy"], anchor)
    carry = (f0["desc"], f0["valid"], p3d0, anchor, anchor)
    carry, (poses, n_match) = jax.lax.scan(vo._track_step, carry,
                                           frames_k[1:])
    poses = jnp.concatenate([anchor[None], poses], 0)
    n0 = jnp.sum(f0["valid"]).astype(n_match.dtype)
    return poses, jnp.concatenate([n0[None], n_match], 0)


def _segment_feed(vo, frames_k, poses_k):
    """Feed-only scan: composite each frame at the given (corrected) pose
    into a fresh canvas pyramid."""
    c_lap, c_w = M.alloc_canvas(vo.canvas_tiles, vo.canvas_tiles, vo.bands)

    def fstep(carry, inp):
        pose, rgb = inp
        return vo._feed(pose, rgb, carry[0], carry[1]), None

    (c_lap, c_w), _ = jax.lax.scan(fstep, (c_lap, c_w),
                                   (poses_k, frames_k))
    return tuple(c_lap), tuple(c_w)


def _merge_canvases(lap_all, w_all):
    """Max-weight merge of per-segment canvas pyramids: per band, each
    pixel takes the segment with the highest weight."""
    merged_lap, merged_w = [], []
    for li, wi in zip(lap_all, w_all):           # [S, Hb, Wb, C]
        best = jnp.argmax(wi[..., 0], axis=0)     # [Hb, Wb]
        idx = best[None, ..., None]
        merged_lap.append(jnp.take_along_axis(li, idx, axis=0)[0])
        merged_w.append(jnp.take_along_axis(wi, idx, axis=0)[0])
    return merged_lap, merged_w


@functools.partial(jax.jit, static_argnums=(0,))
def _run_survey(vo_static, frames, anchors, valid):
    """Module-level jitted entry (FastVO hashes by id) so the compiled
    multi-segment program is cached across process_survey calls.

    `valid` [S] masks out PADDING segments (added so S shards evenly over
    the mesh): their canvases get zero weight so the max-weight merge
    never picks them, and their poses are sliced off by the caller."""
    poses, n_match, lap_all, w_all = jax.vmap(
        lambda f, a: _segment_program(vo_static, f, a))(frames, anchors)
    vmask = valid[:, None, None, None]
    w_all = tuple(jnp.where(vmask, wi, 0.0) for wi in w_all)
    lap, w = _merge_canvases(lap_all, w_all)
    return poses, n_match, tuple(lap), tuple(w)


@functools.partial(jax.jit, static_argnums=(0, 4))
def _run_survey_corrected(vo_static, frames, anchors, valid, stride):
    """Two-phase survey: track-only scans, endpoint bending onto the NEXT
    segment's GPS anchor, then feed-only scans with corrected poses.

    With overlapped segmentation (segments_from_frames(overlap>=1)),
    segment s's frame at local index `stride` is the same physical frame
    as segment s+1's frame 0, whose true pose is anchors[s+1]. The
    endpoint error err = anchors[s+1] * inv(pose_s[stride]) is distributed
    along the chain in se3 log space (the classic pose-graph endpoint
    relaxation): pose_i' = exp(clip(i/stride, 0, 1) * log(err)) * pose_i.
    Frame 0 keeps its anchor exactly; the shared boundary frame lands on
    the next anchor exactly, so consecutive segment canvases agree at the
    joint instead of disagreeing by the accumulated VO drift."""
    poses, n_match = jax.vmap(
        lambda f, a: _segment_track(vo_static, f, a))(frames, anchors)
    next_anchor = jnp.concatenate([anchors[1:], anchors[-1:]], 0)
    Sa = anchors.shape[0]
    # the last VALID segment has no next anchor (its "next" is either
    # padding or nothing): leave it unbent
    has_next = ((jnp.arange(Sa) < Sa - 1) & valid
                & jnp.roll(valid, -1))
    err = jax.vmap(lambda na, p: lie.se3_mul(na, lie.se3_inv(p)))(
        next_anchor, poses[:, stride])
    xi = jax.vmap(lie.se3_log)(err)
    xi = jnp.where(has_next[:, None], xi, 0.0)
    K = poses.shape[1]
    t = jnp.clip(jnp.arange(K, dtype=jnp.float32) / float(stride), 0.0, 1.0)

    def bend(poses_k, xi_s):
        corr = jax.vmap(lambda ti: lie.se3_exp(ti * xi_s))(t)
        return jax.vmap(lie.se3_mul)(corr, poses_k)

    poses_c = jax.vmap(bend)(poses, xi)
    lap_all, w_all = jax.vmap(
        lambda f, p: _segment_feed(vo_static, f, p))(frames, poses_c)
    vmask = valid[:, None, None, None]
    w_all = tuple(jnp.where(vmask, wi, 0.0) for wi in w_all)
    lap, w = _merge_canvases(lap_all, w_all)
    return poses_c, n_match, tuple(lap), tuple(w)


def process_survey(vo, frames, anchors, mesh: Mesh | None = None,
                   correct_drift: bool = False,
                   anchor_stride: int | None = None):
    """Track+fuse S segments in parallel over the mesh.

    vo: a FastVO configured for the survey's canvas geometry.
    frames: [S, K, H, W(,3)]; anchors: [S, 7] pose of each segment's first
    frame in plane coordinates (GPS-derived or from a coarse pass).
    Returns (poses [S, K, 7], n_match [S, K]) and REPLACES vo's canvas
    with the merged mosaic (so vo.blended()/save() work as usual).

    Ragged S is fine: segments are padded to a multiple of the mesh size
    with copies of segment 0 whose canvases are weight-masked out of the
    merge and whose poses are dropped before returning. Memory is one
    canvas pyramid per in-flight segment.

    correct_drift=True runs the two-phase variant: track-only scans,
    per-segment endpoint bending onto the NEXT segment's anchor (see
    _run_survey_corrected), then feed-only scans with the corrected poses
    — so intra-segment VO drift no longer shows up as misregistration
    between neighboring segment canvases at their joints. Requires
    overlapped segmentation (segments_from_frames(overlap>=1)) and
    anchor_stride = seg_len - overlap (the frame count between anchors).
    Costs ~20% more device time than the fused single pass (extraction is
    shared work either way; the feed pass re-runs compositing only).
    """
    frames = jnp.asarray(frames)
    anchors = jnp.asarray(anchors, jnp.float32)
    S = frames.shape[0]
    if correct_drift:
        if anchor_stride is None or not (0 < anchor_stride
                                         < frames.shape[1]):
            raise ValueError(
                "correct_drift needs anchor_stride = seg_len - overlap in "
                "[1, K): segment s's frame at that index must be segment "
                "s+1's anchored first frame (use segments_from_frames with "
                "overlap >= 1)")

    pad = 0 if mesh is None else (-S) % mesh.devices.size
    if pad:
        frames = jnp.concatenate(
            [frames, jnp.repeat(frames[:1], pad, axis=0)], axis=0)
        anchors = jnp.concatenate(
            [anchors, jnp.repeat(anchors[:1], pad, axis=0)], axis=0)
    valid = jnp.arange(S + pad) < S
    if mesh is not None:
        axes = tuple(mesh.axis_names)
        shard = NamedSharding(mesh, P(axes))
        frames = jax.device_put(frames, shard)
        anchors = jax.device_put(anchors, shard)
        valid = jax.device_put(valid, shard)
    if correct_drift:
        poses, n_match, lap, w = _run_survey_corrected(
            vo, frames, anchors, valid, int(anchor_stride))
    else:
        poses, n_match, lap, w = _run_survey(vo, frames, anchors, valid)
    vo.canvas_lap, vo.canvas_w = list(lap), list(w)
    out = jax.device_get((poses, n_match))
    return out[0][:S], out[1][:S]


def anchors_from_gps(frames_meta, plane_se3=None):
    """Derive segment anchor poses from the DATASET layer's GPS stream.

    frames_meta: iterable of models.frame.Frame (or any object with
    `gps_enu` [3] and optional `pyr` attitude) — the segment's FIRST
    frames. plane_se3: optional ground-plane SE3 [7]; anchors are
    expressed in PLANE coordinates (what FastVO tracks in). Attitude uses
    the drone PYR->rotation chain when present (MapFrame::getPrioryPose,
    GSLAM-DIYSLAM/src/MapFrame.cpp:370-402), else nadir.

    Returns [S, 7] float32 — the `anchors` argument of process_survey, so
    a GPS-tagged dataset scales out with no coarse pass at all:

        segs, metas = segments_from_dataset(ds, seg_len=K)
        anchors = anchors_from_gps([m[0] for m in metas], plane)
        process_survey(vo, segs, anchors, mesh)
    """
    from ..utils import host_se3 as hse3

    out = []
    for fr in frames_meta:
        enu = np.asarray(fr.gps_enu, np.float64)
        pyr = getattr(fr, "pyr", None)
        if pyr is not None:
            from ..core.gps import pyr_to_rotation
            q = pyr_to_rotation(*[float(v) for v in pyr])
        else:
            q = np.array([1.0, 0.0, 0.0, 0.0])   # nadir (x, y, z, w)=(1,0,0,0)
        pose_w = np.concatenate([enu, q])
        if plane_se3 is not None:
            pose_w = hse3.se3_mul(hse3.se3_inv(
                np.asarray(plane_se3, np.float64)), pose_w)
        out.append(pose_w)
    return np.asarray(out, np.float32)


@functools.partial(jax.jit, static_argnums=(0,))
def _track_only(vo_static, frames, anchor):
    return _segment_track(vo_static, frames, anchor)


def anchors_from_coarse(vo, frames, firsts, pose0, scale: int = 4,
                        n_features: int | None = None):
    """GPS-free segment anchors via a coarse first pass (the alternative
    anchor source SURVEY.md section 2.9 scopes alongside GPS).

    Downsamples the whole survey `scale`x (area-average pooling — cheap,
    alias-free, XLA-friendly), runs ONE serial track-only FastVO chain
    over it (~1/scale^2 the extraction cost of a full-res serial pass),
    and reads the segment first frames' estimated poses as the anchors
    for the full-res segment-parallel run. The coarse chain still drifts
    (it is serial VO), but every segment anchor sits ON that one chain,
    so combined with correct_drift=True the full-res segments are
    mutually consistent at their joints — the mosaic is seam-coherent
    even though the absolute trajectory carries the coarse pass's drift.

    vo: the full-res FastVO (plane geometry + camera are read from it).
    frames: [N, H, W(,3)] the WHOLE survey. firsts: [S] segment start
    indices (from segments_from_frames). pose0: [7] plane-coordinate pose
    of frame 0 (the gauge anchor — without GPS the absolute frame must
    come from the caller, e.g. Map2DPrepare semantics).
    Returns (anchors [S, 7] float32, coarse n_match [N]).
    """
    from ..models.fastvo import FastVO

    frames = np.asarray(frames)
    N, H, W = frames.shape[:3]
    H2, W2 = H // scale, W // scale
    # pool per-frame on the host: peak extra memory = the pooled survey
    # (N*H2*W2*4 bytes), never a full-res float32 copy of the whole
    # survey (a 1000-frame 1080p survey would be ~8 GB on-device)
    ch = frames.shape[3:]
    fr = np.empty((N, H2, W2) + ch, np.float32)
    for i in range(N):
        f = frames[i, :H2 * scale, :W2 * scale].astype(np.float32)
        fr[i] = f.reshape((H2, scale, W2, scale) + ch).mean((1, 3))
    fr = jnp.asarray(fr)
    cam_s = vo.cam.scaled(1.0 / scale)
    nf = int(n_features or vo.params.n_features)
    vo_s = FastVO(cam_s, vo.min_xy, 1, vo.length_pixel, bands=1,
                  n_features=nf,
                  n_levels=min(getattr(vo.params, "n_levels", 4), 4),
                  window_radius=max(8.0, vo.window_radius / scale),
                  patch_tiles=1, detector=vo.detector)
    poses, n_match = jax.device_get(_track_only(
        vo_s, fr, jnp.asarray(pose0, jnp.float32)))
    return poses[np.asarray(firsts)], n_match


def segments_from_frames(frames, seg_len: int, overlap: int = 0):
    """Split a [N, H, W(,C)] survey into [S, K] segments (K = seg_len),
    tail-padded by repeating the last frame; consecutive segments can
    OVERLAP by `overlap` frames so the merged mosaic has no coverage gap
    at segment joints. Returns (segments [S, K, ...], first_indices [S])
    — feed first_indices into the dataset's GPS fixes to build anchors."""
    frames = np.asarray(frames)
    N = frames.shape[0]
    step = seg_len - overlap
    assert step > 0
    starts = list(range(0, max(N - overlap, 1), step))
    segs, firsts = [], []
    for s0 in starts:
        seg = frames[s0:s0 + seg_len]
        if seg.shape[0] < seg_len:
            seg = np.concatenate(
                [seg, np.repeat(seg[-1:], seg_len - seg.shape[0], 0)], 0)
        segs.append(seg)
        firsts.append(s0)
    return np.stack(segs), np.asarray(firsts)
