"""FastVO: the fully device-resident survey fast path.

The shipped SLAM (models/slam.py) mirrors the reference's architecture —
host state machine, per-frame device steps — and its throughput is bound by
host<->device latency. This module is the TPU-native alternative the
reference has no analogue for: K frames are staged in HBM and the ENTIRE
track+fuse loop (ORB extract -> windowed Hamming match against the previous
frame's ground-plane points -> pose-only LM -> homography warp -> Laplacian
pyramid -> max-weight composite) runs as ONE compiled lax.scan program —
zero host round trips inside the batch. bench.py measures exactly this
program (timed against a forced device->host fetch; ~130-160 FPS @1080p
on one v5e chip — see README "Measured").

Scope: nadir-ish surveys over a dominant ground plane (the Map2DFusion
regime). Tracking is frame-to-frame VO with plane re-unprojection — no
keyframes, no BA, no loop closing; use the full SLAM when you need them.
Reference anchors: TrackerOpt::trackLastFrame (TrackerOpt.cpp:636-793) for
the match+LM step, MultiBandMap2DCPU::renderFrame (:311-558) for the feed.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ba, image as im, lie, matching
from ..ops import mosaic as M
from ..ops.features import orb

ELE = M.ELE_PIXELS


class FastVO:
    """Batch visual odometry + mosaic over a ground plane.

    Parameters mirror the Map2D/SLAM config surface: camera intrinsics,
    plane-frame canvas geometry, ORB feature budget, multiband count. All
    shapes are static; one compile per (K, H, W) signature.

    Usage:
        vo = FastVO(cam, min_xy, canvas_tiles, length_pixel, bands=5)
        poses, canvas = vo.process(frames_rgb, pose0)   # one device program
        img, covered = vo.blended()
    """

    def __init__(self, camera, min_xy, canvas_tiles: int,
                 length_pixel: float, bands: int = 5,
                 n_features: int = 1000, n_levels: int = 8,
                 window_radius: float = 60.0, patch_tiles: int = 0,
                 fast_warp: bool = True, warp_mode: str = "",
                 detector: str = "orb"):
        self.cam = camera
        self.min_xy = np.asarray(min_xy, np.float64)
        self.canvas_tiles = int(canvas_tiles)
        self.length_pixel = float(length_pixel)
        self.bands = int(bands)
        # detector seam: ORB (Hamming) or SIFT (the reference's default
        # extractor, Default.cfg:2-9; L2 @ 0.2 RootSIFT-style threshold)
        self.detector = detector
        if detector == "sift":
            from ..ops.features import sift as _sift
            self.params = _sift.SiftParams(n_features=n_features)
        else:
            self.params = orb.OrbParams(n_features=n_features,
                                        n_levels=n_levels)
        self.window_radius = float(window_radius)
        # warp_mode "": auto — the Pallas shear kernel on TPU (full-res
        # exact, ~20x the gather's throughput), half-res gather elsewhere
        # (fast_warp) for the CPU test tier
        if not warp_mode:
            from ..ops.shearwarp import default_warp_mode
            warp_mode = default_warp_mode()
        self.warp_mode = warp_mode
        # half-res gather + pyr_up (gather mode only): the gather warp is
        # index-bound and the canvas is ~2x oversampled (Map2D.Scale)
        self.fast_warp = bool(fast_warp)
        if not patch_tiles:
            diag = float(np.hypot(camera.width, camera.height))
            patch_tiles = int(np.ceil(diag * 1.0 / ELE)) + 1
        self.patch_tiles = min(int(patch_tiles), self.canvas_tiles)
        self.canvas_lap, self.canvas_w = M.alloc_canvas(
            self.canvas_tiles, self.canvas_tiles, self.bands)

    # ------------------------------------------------------------------
    def _detect(self, gray):
        if self.detector == "sift":
            from ..ops.features import sift as _sift
            return _sift.sift_detect(gray.astype(jnp.float32), self.params)
        return orb.orb_detect(gray.astype(jnp.float32), self.params)

    # ------------------------------------------------------------------
    def _plane_points(self, xy, pose_c2w):
        """Unproject keypoints through the pose onto the plane z=0."""
        cam = self.cam
        rays = jnp.stack([(xy[:, 0] - cam.cx) / cam.fx,
                          (xy[:, 1] - cam.cy) / cam.fy,
                          jnp.ones(xy.shape[0])], -1)
        Rw = lie.quat_rotate(
            jnp.broadcast_to(pose_c2w[3:7], (xy.shape[0], 4)), rays)
        o = pose_c2w[:3]
        s = o[2] / jnp.where(jnp.abs(Rw[:, 2]) < 1e-6, 1e-6, Rw[:, 2])
        return o[None, :] - Rw * s[:, None]

    def _feed(self, pose_c2w, rgb, c_lap, c_w):
        """Warp + pyramid + max-weight composite of one frame (traced)."""
        cam = self.cam
        fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy
        es = ELE * self.length_pixel
        min_xy = jnp.asarray(self.min_xy, jnp.float32)
        origin_t = jnp.floor((pose_c2w[:2] - min_xy) / es).astype(jnp.int32)
        origin_t = origin_t - self.patch_tiles // 2
        origin_t = jnp.clip(origin_t, 0,
                            self.canvas_tiles - self.patch_tiles)
        origin_xy = min_xy + origin_t.astype(jnp.float32) * es
        Hc2i = M.homography_canvas_to_image(pose_c2w, fx, fy, cx, cy,
                                            origin_xy, self.length_pixel)
        patch_px = self.patch_tiles * ELE
        rgb3 = rgb if rgb.ndim == 3 else jnp.repeat(rgb[..., None], 3, -1)
        p_lap, p_w = M.patch_pyramids(rgb3.astype(jnp.float32), Hc2i,
                                      (patch_px, patch_px), self.bands,
                                      half_res=self.fast_warp,
                                      warp=self.warp_mode)
        oyx = jnp.stack([origin_t[1], origin_t[0]]) * ELE
        return M.composite_patch(c_lap, c_w, p_lap, p_w, oyx)

    def _track_step(self, carry, rgb):
        """One VO step WITHOUT the mosaic feed: extract + match + pose LM.
        carry = (prev_desc, prev_valid, prev_p3d, pose_prev2, pose_est).
        Factored out of _step so the segment-parallel path
        (parallel/dist_vo.py) can run a track-only pass, bend the chains
        onto the GPS anchors, and feed with corrected poses."""
        gray = im.rgb_to_gray(rgb) if rgb.ndim == 3 else rgb
        feats = self._detect(gray)
        return self._track_core(carry, feats)

    def _track_core(self, carry, feats):
        """Match + pose-LM given already-extracted features (the paired
        step extracts two frames in one batched call, then runs this
        serially per frame)."""
        cam, params = self.cam, self.params
        N = params.n_features
        fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy
        prev_desc, prev_valid, prev_p3d, pose_prev2, pose_est = carry
        # constant-velocity prediction (the reference's motion model,
        # TrackerOpt::trackLastFrame): pose_pred = V * pose_{t-1} with
        # V = pose_{t-1} * pose_{t-2}^{-1} in world frame
        pose_pred = lie.se3_mul(
            lie.se3_mul(pose_est, lie.se3_inv(pose_prev2)), pose_est)
        T_pred = lie.se3_inv(pose_pred)
        pc = lie.se3_apply(T_pred, prev_p3d)
        z = jnp.maximum(pc[:, 2], 1e-6)
        pix = jnp.stack([fx * pc[:, 0] / z + cx, fy * pc[:, 1] / z + cy], -1)
        wmask = matching.window_mask(pix, feats["xy"], self.window_radius)
        dist = matching.distance_matrix(prev_desc, feats["desc"],
                                        self.detector)
        idx, ok = matching.match(
            dist, prev_valid, feats["valid"],
            max_dist=80.0 if self.detector == "orb" else 0.2,
            window_mask=wmask)
        tgt = jnp.where(ok, idx, N)
        # scatter-free permutation: TPU scatters serialize on the scalar
        # core; a [N, N] one-hot contraction runs on the MXU instead.
        # onehot[i, j] = 1 iff prev feature i matched new feature j, so
        # p3d = onehot^T @ prev_p3d and wgt = onehot^T @ ok.
        onehot = (tgt[:, None] == jnp.arange(N)[None, :]).astype(
            jnp.float32)
        p3d = jax.lax.dot_general(
            onehot, prev_p3d, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        wgt = jax.lax.dot_general(
            onehot, ok.astype(jnp.float32)[:, None],
            (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)[:, 0]
        rays_xy = jnp.stack([(feats["xy"][:, 0] - cx) / fx,
                             (feats["xy"][:, 1] - cy) / fy], -1)
        import os
        lm_iters = int(os.environ.get("PISLAM_VO_LM_ITERS", "8"))
        T_ref, _, _ = ba.optimize_pose(T_pred, p3d, rays_xy, wgt,
                                       iters=lm_iters,
                                       huber_delta=2.45 / fx)
        pose_new = lie.se3_inv(T_ref)
        new_p3d = self._plane_points(feats["xy"], pose_new)
        n_match = jnp.sum(ok)
        return ((feats["desc"], feats["valid"], new_p3d, pose_est,
                 pose_new), (pose_new, n_match))

    def _step(self, carry, inputs):
        """One sequential step: extract + match + pose LM + mosaic feed.
        (A variant that hoisted extraction into a batched vmap outside the
        scan measured ~12% SLOWER on v5e — streaming one frame at a time
        through the scan keeps intermediates cache-resident.)"""
        rgb = inputs
        if jnp.issubdtype(rgb.dtype, jnp.integer):
            # uint8-staged frames (4x less HBM + tunnel than f32): cast
            # on device, fused into the first consumers
            rgb = rgb.astype(jnp.float32)
        tcarry, (pose_new, n_match) = self._track_step(carry[:5], rgb)
        c_lap, c_w = self._feed(pose_new, rgb, carry[5], carry[6])
        return tcarry + (c_lap, c_w), (pose_new, n_match)

    def _step_group(self, carry, inputs):
        """Grouped step: G frames per scan body. Each frame still runs
        the serial match/LM/feed chain, but the G extractions are
        INDEPENDENT chains inside one program, so the scheduler overlaps
        extract(f_{i+1}) with match/LM/feed(f_i) — the round-4 bench
        measured 165 -> 185 FPS at G=2 @1080p. (The batched-extraction
        variant, PISLAM_PAIR_BATCH=1 / orb_detect_batch, measured 100:
        one batched program has MORE data per op but loses the
        cross-stage overlap.) inputs: [G, H, W(,3)]."""
        import os
        rgbs = inputs
        if jnp.issubdtype(rgbs.dtype, jnp.integer):
            rgbs = rgbs.astype(jnp.float32)
        grays = im.rgb_to_gray(rgbs) if rgbs.ndim == 4 else rgbs
        G = rgbs.shape[0]
        if os.environ.get("PISLAM_PAIR_BATCH", "0") == "1" \
                and self.detector == "orb":
            feats_g = orb.orb_detect_batch(grays, self.params)
        else:
            fs = [self._detect(grays[b]) for b in range(G)]
            feats_g = {k: jnp.stack([f[k] for f in fs]) for k in fs[0]}
        tcarry = carry[:5]
        c_lap, c_w = carry[5], carry[6]
        poses, nms = [], []
        if os.environ.get("PISLAM_GROUP_SPLIT", "0") == "1":
            # split ordering: emit the whole match/LM chain first, then
            # the G feeds. The dataflow is identical to the interleaved
            # loop (feed b depends only on pose b; feeds chain through
            # the canvas) — and so, it turns out, is the schedule:
            # measured on-chip (scripts/probe_group_orders.py, round 5)
            # split is a WASH (5.15 vs 5.13 ms/frame at G=2; G=3/4 split
            # 5.21/5.44). XLA's latency-hiding scheduler already treats
            # the two emission orders identically; kept as an env-gated
            # variant so the negative result stays reproducible.
            for b in range(G):
                feats = {k: v[b] for k, v in feats_g.items()}
                tcarry, (pose_new, n_match) = self._track_core(tcarry,
                                                               feats)
                poses.append(pose_new)
                nms.append(n_match)
            for b in range(G):
                c_lap, c_w = self._feed(poses[b], rgbs[b], c_lap, c_w)
        else:
            for b in range(G):
                feats = {k: v[b] for k, v in feats_g.items()}
                tcarry, (pose_new, n_match) = self._track_core(tcarry,
                                                               feats)
                c_lap, c_w = self._feed(pose_new, rgbs[b], c_lap, c_w)
                poses.append(pose_new)
                nms.append(n_match)
        return (tcarry + (c_lap, c_w),
                (jnp.stack(poses), jnp.stack(nms)))

    def _pair_group(self, frames) -> int:
        """Scan group size: PISLAM_PAIR (default 2 on TPU; 0/1 disable).
        Must divide the batch."""
        import os
        if os.environ.get("PISLAM_PAIR_STEP", "") == "0":
            return 1
        if not (self.detector in ("orb", "sift")
                and frames.shape[0] >= 4 and im.use_tpu_pallas()):
            return 1
        # G=2 measured best @1080p (165/185/175 FPS at G=1/2/4: four live
        # extraction chains start spilling); applies to SIFT identically
        g = int(os.environ.get("PISLAM_PAIR", "2"))
        return g if g > 1 and frames.shape[0] % g == 0 else 1

    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(3, 4))
    def _process(self, frames, pose0, c_lap, c_w):
        first = frames[0].astype(jnp.float32)
        gray0 = im.rgb_to_gray(first) if first.ndim == 3 else first
        f0 = self._detect(gray0)
        p3d0 = self._plane_points(f0["xy"], pose0)
        # motion model starts at rest: prev2 == prev == pose0
        carry = (f0["desc"], f0["valid"], p3d0, pose0, pose0, c_lap, c_w)
        G = self._pair_group(frames)
        if G > 1:
            K = frames.shape[0]
            fp = frames.reshape((K // G, G) + frames.shape[1:])
            carry, (poses, n_match) = jax.lax.scan(self._step_group,
                                                   carry, fp)
            poses = poses.reshape(K, 7)
            n_match = n_match.reshape(K)
        else:
            carry, (poses, n_match) = jax.lax.scan(self._step, carry,
                                                   frames)
        # pack poses + n_match into ONE array: every device_get leaf is a
        # separate ~28 ms tunnel round trip on this backend
        out = jnp.concatenate(
            [poses, n_match.astype(jnp.float32)[:, None]], -1)
        return carry[5], carry[6], out

    # ------------------------------------------------------------------
    def process(self, frames, pose0) -> Tuple[np.ndarray, np.ndarray]:
        """Track+fuse a frame batch. frames: [K, H, W(,3)] array (uint8 or
        float); pose0: [7] SE3 c2w of frame 0 in PLANE coordinates (plane =
        z=0 — use Map2DPrepare semantics to get there). Returns
        (poses [K, 7], n_matches [K]); the mosaic accumulates in place."""
        frames = jnp.asarray(frames)
        pose0 = jnp.asarray(pose0, jnp.float32)
        self.canvas_lap, self.canvas_w, packed = self._process(
            frames, pose0, self.canvas_lap, self.canvas_w)
        out = jax.device_get(packed)          # ONE fetch round trip
        return out[:, :7], out[:, 7].astype(np.int32)

    def blended(self, bg: float = 255.0):
        """Reconstructed mosaic + coverage mask (host numpy)."""
        img, covered = M.reconstruct_canvas(
            list(self.canvas_lap), list(self.canvas_w), bg=bg)
        return np.asarray(img), np.asarray(covered)

    def __hash__(self):   # static self for the jitted method
        return id(self)

    def __eq__(self, other):
        return self is other
