"""Incremental orthomosaic engines (the Map2DFusion half of the reference).

`MultiBandMap2D` is the flagship: the TPU-resident equivalent of
Map2DFusion/MultiBandMap2DCPU.{h,cpp} (and of the CUDA Map2DGPU/UtilGPU.cu
path). `WeightedMap2D` is the single-band running weighted blend matching
Map2DCPU / Map2DGPU semantics (Map2DGPU renderFramesKernel,
UtilGPU.cu:311-381). The factory `create_map2d` mirrors Map2D::create
(Map2D.cpp:51-66): Type 1 = CPU single band, 2 = GPU single band,
3 = multi-band (default), 4 = render.

Host/device split: per-frame geometry (corner projection, bbox, tile-grid
growth, homography assembly) is tiny float64 numpy on host; everything
per-pixel (warp, weights, pyramids, compositing, reconstruction) is one fused
jitted program per frame (`ops.mosaic.composite_frame`). The canvas Laplacian
pyramid lives on device between frames.
"""
from __future__ import annotations

import threading
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import Camera
from ..core.registry import MAP2DS
from ..core.timer import timer
from ..ops import lie
from ..ops import mosaic as M
from ..ops import image as im

ELE = M.ELE_PIXELS


def _se3_inv_mul_np(plane, pose):
    """host float64: plane^{-1} * pose for [7] (t, q) arrays."""
    import numpy as np

    def qconj(q):
        return np.array([-q[0], -q[1], -q[2], q[3]])

    def qmul(a, b):
        x1, y1, z1, w1 = a
        x2, y2, z2, w2 = b
        return np.array([
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ])

    def qrot(q, p):
        v, w = q[:3], q[3]
        t = 2.0 * np.cross(v, p)
        return p + w * t + np.cross(v, t)

    pq = qconj(plane[3:7])
    pt = -qrot(pq, plane[:3])
    t = qrot(pq, pose[:3]) + pt
    q = qmul(pq, pose[3:7])
    q = q / np.linalg.norm(q)
    return np.concatenate([t, q])


class Map2DBase:
    """Common prepare/bbox/tile-grid logic (MultiBandMap2DCPUData::prepare)."""

    def __init__(self, cfg=None):
        from ..core.svar import svar as default_svar
        self.cfg = cfg if cfg is not None else default_svar
        self.camera: Optional[Camera] = None
        self.plane = np.array([0, 0, 0, 0, 0, 0, 1.0])
        self.length_pixel = 0.0
        self.min_xy = np.zeros(2)
        self.w_tiles = 0
        self.h_tiles = 0
        self._lock = threading.Lock()
        self._queue: List = []
        self.frames_rendered = 0
        self.frames_skipped = 0

    # -- geometry ------------------------------------------------------------
    def prepare(self, plane_se3: np.ndarray, camera: Camera,
                frames: Sequence[Tuple[np.ndarray, np.ndarray]]) -> bool:
        """plane_se3: [7] SE3 of the ground plane in world coords; frames:
        (image or None, pose_c2w [7]) pairs used to size the canvas."""
        if camera is None or not camera.is_valid() or len(frames) == 0:
            return False
        self.camera = camera
        self.plane = np.asarray(plane_se3, np.float64)
        poses = [_se3_inv_mul_np(self.plane, np.asarray(p, np.float64))
                 for _, p in frames]
        ts = np.stack([p[:3] for p in poses])
        mn, mx = ts.min(0), ts.max(0)
        if mn[2] * mx[2] <= 0:  # cameras must be on one side of the plane
            return False
        maxh = mx[2] if mx[2] > 0 else -mn[2]
        res = self.cfg.get_double("Map2D.Resolution", 0.0)
        auto_lp, radius = M.auto_resolution(camera, maxh,
                                            self.cfg.get_double("Map2D.Scale", 1.0))
        self.length_pixel = res if res else auto_lp
        # expand bbox by footprint radius, then double around center (:239-243)
        mn2 = mn[:2] - radius
        mx2 = mx[:2] + radius
        center = 0.5 * (mn2 + mx2)
        mn2 = 2 * mn2 - center
        mx2 = 2 * mx2 - center
        ele_size = ELE * self.length_pixel
        self.w_tiles = int(np.ceil((mx2[0] - mn2[0]) / ele_size))
        self.h_tiles = int(np.ceil((mx2[1] - mn2[1]) / ele_size))
        self.min_xy = mn2
        # static patch size: a frame footprint is <= 2*radius across at max
        # height; snap to tiles with +1 for alignment slack
        self.patch_tiles = int(np.ceil(2 * radius / ele_size)) + 1
        # the canvas must hold at least one patch (tiny two-frame scenes
        # otherwise allocate fewer tiles than the static patch spans and
        # every composite dynamic-slice would be out of range)
        self.w_tiles = max(self.w_tiles, self.patch_tiles)
        self.h_tiles = max(self.h_tiles, self.patch_tiles)
        self._alloc()
        self._poses_plane = poses
        return True

    def _alloc(self):
        raise NotImplementedError

    @property
    def ele_size(self):
        return ELE * self.length_pixel

    def _frame_geometry(self, pose_plane: np.ndarray):
        """Compute (origin_tiles, h_patch2img) for one frame; None to skip."""
        pts, ok = M.plane_corners_np(pose_plane, self.camera)
        if not ok:
            return None
        xmin, ymin = pts.min(0)
        xmax, ymax = pts.max(0)
        es = self.ele_size
        # grow canvas when the footprint leaves it (spreadMap, :561-604)
        self._maybe_grow(xmin, ymin, xmax, ymax)
        tx0 = int(np.floor((xmin - self.min_xy[0]) / es))
        ty0 = int(np.floor((ymin - self.min_xy[1]) / es))
        tx1 = int(np.ceil((xmax - self.min_xy[0]) / es))
        ty1 = int(np.ceil((ymax - self.min_xy[1]) / es))
        if tx1 - tx0 > self.patch_tiles:
            # footprint exceeds the static patch (higher than prepare-time
            # max height): center the patch on the footprint so the clipped
            # borders are symmetric instead of silently dropping the
            # right/bottom part
            tx0 = (tx0 + tx1 - self.patch_tiles) // 2
        if ty1 - ty0 > self.patch_tiles:
            ty0 = (ty0 + ty1 - self.patch_tiles) // 2
        tx0 = max(0, min(tx0, self.w_tiles - self.patch_tiles))
        ty0 = max(0, min(ty0, self.h_tiles - self.patch_tiles))
        origin_xy_plane = (self.min_xy[0] + tx0 * es,
                           self.min_xy[1] + ty0 * es)
        H = M.homography_canvas_to_image_np(pose_plane, self.camera,
                                            origin_xy_plane, self.length_pixel)
        return (ty0, tx0), H

    def _maybe_grow(self, xmin, ymin, xmax, ymax):
        es = self.ele_size
        grow_left = int(np.ceil(max(0.0, self.min_xy[0] - xmin) / es))
        grow_top = int(np.ceil(max(0.0, self.min_xy[1] - ymin) / es))
        max_x = self.min_xy[0] + self.w_tiles * es
        max_y = self.min_xy[1] + self.h_tiles * es
        grow_right = int(np.ceil(max(0.0, xmax - max_x) / es))
        grow_bottom = int(np.ceil(max(0.0, ymax - max_y) / es))
        if grow_left or grow_top or grow_right or grow_bottom:
            self._grow(grow_top, grow_bottom, grow_left, grow_right)

    def _grow(self, top, bottom, left, right):
        raise NotImplementedError

    # -- queue-mode API (reference feed queues when threaded, :288-309) ------
    def feed(self, img, pose_c2w: np.ndarray) -> bool:
        pose_plane = _se3_inv_mul_np(self.plane, np.asarray(pose_c2w, np.float64))
        return self.render_frame(img, pose_plane)

    def queue_size(self) -> int:
        return 0

    def render_frame(self, img, pose_plane) -> bool:
        raise NotImplementedError

    # -- pose refresh (VERDICT r3 item 6) ------------------------------------
    def _footprint_px(self, pose_plane: np.ndarray):
        """Frame footprint as a canvas-pixel rect (y0, y1, x0, x1), or
        None when the frame doesn't project onto the plane."""
        pts, ok = M.plane_corners_np(pose_plane, self.camera)
        if not ok:
            return None
        lp = self.length_pixel
        x0 = (pts[:, 0].min() - self.min_xy[0]) / lp
        x1 = (pts[:, 0].max() - self.min_xy[0]) / lp
        y0 = (pts[:, 1].min() - self.min_xy[1]) / lp
        y1 = (pts[:, 1].max() - self.min_xy[1]) / lp
        Hpx, Wpx = self.h_tiles * ELE, self.w_tiles * ELE
        return (max(0, int(np.floor(y0))), min(Hpx, int(np.ceil(y1))),
                max(0, int(np.floor(x0))), min(Wpx, int(np.ceil(x1))))

    def _clear_rect_px(self, y0, y1, x0, x1):
        raise NotImplementedError

    def refresh(self, entries, thresh: Optional[float] = None) -> int:
        """Re-render the canvas regions whose contributing frames MOVED.

        entries: [(img, old_pose_c2w, new_pose_c2w)] — every frame the
        caller still holds (FusionSystem's bounded feed cache), in feed
        order. Frames whose plane-frame camera center moved more than
        `thresh` meters (default 2 * GSD) mark their old+new footprints
        dirty; dirty regions are cleared and every cached frame
        overlapping them is re-fed at its NEW pose. Returns the number
        of frames re-fed.

        The reference's analogue: MultiBandMap2DCPU re-blends on draw
        and the feed re-enters after loop closure (:637-775). Limits:
        contributions from frames already evicted from the cache are
        lost inside cleared regions — size Fusion.RefreshCacheMB to the
        survey's revisit window.
        """
        if self.camera is None:
            return 0
        if thresh is None:
            thresh = 2.0 * self.length_pixel
        # sanity bound: a "correction" larger than half a patch means the
        # entry's old pose lives in a different gauge epoch (e.g. fed
        # before a monocular-scale GPS refit) — re-rendering it would
        # clear valid content and then fail to restore it. Drop such
        # entries instead of destroying the canvas.
        max_move = 0.5 * self.patch_tiles * ELE * self.length_pixel
        with self._lock:
            plane = self.plane
            moved, rects = [], []
            planes_new = []
            for i, (img, old_pose, new_pose) in enumerate(entries):
                po = _se3_inv_mul_np(plane, np.asarray(old_pose,
                                                       np.float64))
                pn = _se3_inv_mul_np(plane, np.asarray(new_pose,
                                                       np.float64))
                planes_new.append(pn)
                d = np.linalg.norm(po[:3] - pn[:3])
                if d > max_move:
                    planes_new[i] = None      # unrefreshable epoch
                    continue
                if d > thresh:
                    fps = [self._footprint_px(p) for p in (po, pn)]
                    if any(f is None for f in fps):
                        planes_new[i] = None  # off-plane: don't touch
                        continue
                    moved.append(i)
                    rects.extend(fps)
            if not moved or not rects:
                return 0

            def overlaps(a, b):
                return (a[0] < b[1] and b[0] < a[1]
                        and a[2] < b[3] and b[2] < a[3])

            # Fixpoint: a re-fed frame contributes its FULL footprint, so
            # that footprint must be cleared too (else its old content
            # outside the moved rects is double-counted — ADVICE r4 low),
            # and clearing it may pull further overlapping frames in.
            fps = [None] * len(entries)
            for i, (img, _old, _new) in enumerate(entries):
                if planes_new[i] is not None:
                    fps[i] = self._footprint_px(planes_new[i])
            refeed = set()
            changed = True
            while changed:
                changed = False
                for i, fp in enumerate(fps):
                    if fp is None or i in refeed:
                        continue
                    if any(overlaps(fp, r) for r in rects):
                        refeed.add(i)
                        rects.append(fp)
                        changed = True
            for r in rects:
                self._clear_rect_px(*r)
            refed = 0
            for i in sorted(refeed):            # feed order preserved
                if self._render_frame_locked(entries[i][0],
                                             planes_new[i]):
                    refed += 1
            return refed


@MAP2DS.register("3")
@MAP2DS.register("multiband")
class MultiBandMap2D(Map2DBase):
    """Tiled Laplacian multi-band max-weight blender (MultiBandMap2DCPU)."""

    def __init__(self, cfg=None):
        super().__init__(cfg)
        self.bands = int(self.cfg.get_int("Map2D.BandNumber", 5))
        self.weight_type = int(self.cfg.get_int("Map2D.WeightType", 0))
        # Map2D.FastWarp: half-res gather + pyr_up (see ops.mosaic)
        self.fast_warp = bool(self.cfg.get_int("Map2D.FastWarp", 0))
        # Map2D.WarpMode: "" = auto (Pallas shear kernel on TPU, gather
        # elsewhere), or explicit "shear"/"gather"
        self.warp_mode = self.cfg.get("Map2D.WarpMode", "")
        if not self.warp_mode:
            from ..ops.shearwarp import default_warp_mode
            self.warp_mode = default_warp_mode()
        self.canvas_lap: List[jnp.ndarray] = []
        self.canvas_w: List[jnp.ndarray] = []

    def _alloc(self):
        # canvas tiles must stay divisible by 2**bands at every band level
        align = max(1, (1 << self.bands) // ELE)
        self.w_tiles = int(-(-self.w_tiles // align) * align)
        self.h_tiles = int(-(-self.h_tiles // align) * align)
        self.canvas_lap, self.canvas_w = M.alloc_canvas(
            self.h_tiles, self.w_tiles, self.bands)

    def _grow(self, top, bottom, left, right):
        self.canvas_lap, self.canvas_w = M.grow_canvas(
            self.canvas_lap, self.canvas_w,
            self.h_tiles + top + bottom, self.w_tiles + left + right,
            (top, left))
        self.h_tiles += top + bottom
        self.w_tiles += left + right
        self.min_xy = self.min_xy - np.array([left, top]) * self.ele_size

    def render_frame(self, img, pose_plane) -> bool:
        # the canvas buffers are DONATED to the jit (zero-copy update) and
        # _grow reallocates them, so a concurrent reader (viz snapshots,
        # the GUI analogue) must never see the half-swapped state —
        # serialize the whole render via the canvas lock
        with self._lock:
            return self._render_frame_locked(img, pose_plane)

    def _render_frame_locked(self, img, pose_plane) -> bool:
        geo = self._frame_geometry(pose_plane)
        if geo is None:
            self.frames_skipped += 1
            return False
        (ty0, tx0), H = geo
        patch_px = self.patch_tiles * ELE
        img32 = jnp.asarray(np.asarray(img), jnp.float32)
        with timer.scope("MultiBandMap2D::renderFrame"):
            self.canvas_lap, self.canvas_w = M.composite_frame(
                self.canvas_lap, self.canvas_w, img32,
                jnp.asarray(H, jnp.float32),
                jnp.asarray([ty0 * ELE, tx0 * ELE], jnp.int32),
                bands=self.bands, patch_hw=(patch_px, patch_px),
                weight_type=self.weight_type, half_res=self.fast_warp,
                warp=self.warp_mode)
        self.frames_rendered += 1
        return True

    def _clear_rect_px(self, y0, y1, x0, x1):
        """Zero lap + weight bands over a pixel rect (rect snapped out to
        the coarsest band's granularity so every level clears the same
        ground area)."""
        g = 1 << self.bands
        y0, x0 = (y0 // g) * g, (x0 // g) * g
        y1 = -(-y1 // g) * g
        x1 = -(-x1 // g) * g
        for b in range(len(self.canvas_lap)):
            s = 1 << b
            sl = (slice(y0 >> b, -(-y1 // s)), slice(x0 >> b, -(-x1 // s)))
            self.canvas_lap[b] = self.canvas_lap[b].at[sl].set(0.0)
            self.canvas_w[b] = self.canvas_w[b].at[sl].set(0.0)

    def blended(self, bg: Optional[float] = None):
        """Full-canvas blended RGB image (float32 0..255) + coverage mask."""
        if bg is None:
            bg = float(self.cfg.get_int("Result.BackGroundColor", 255))
        if not self.canvas_lap:   # prepare() hasn't allocated yet
            return (np.zeros((ELE, ELE, 3), np.float32),
                    np.zeros((ELE, ELE), bool))
        with self._lock:
            out, covered = M.reconstruct_canvas(
                [c for c in self.canvas_lap], [w for w in self.canvas_w],
                bg=bg)
            out = np.asarray(out)
            covered = np.asarray(covered)
        return out, covered

    def save(self, filename: str) -> bool:
        """Crop to touched tiles, reconstruct, write PNG (save:779-847)."""
        out, covered = self.blended()
        ys, xs = np.nonzero(covered)
        if len(ys) == 0:
            return False
        ty0, ty1 = ys.min() // ELE, ys.max() // ELE + 1
        tx0, tx1 = xs.min() // ELE, xs.max() // ELE + 1
        crop = out[ty0 * ELE:ty1 * ELE, tx0 * ELE:tx1 * ELE]
        _write_png(filename, crop.astype(np.uint8))
        return True


@MAP2DS.register("4")
@MAP2DS.register("render")
class RenderMap2D(MultiBandMap2D):
    """Batched multiband compositor — the Map2DRender analogue.

    The reference's Map2DRender (Map2DFusion/Map2DRender.cpp) differs from
    the per-frame engines by rendering queued frames in BATCHES per draw
    call (`renderFrames`), with seams resolved by draw order / optional
    seam finding. Here the batch is ONE compiled lax.scan program
    (ops.mosaic.composite_frames_batch) over Map2D.RenderBatch frames —
    per-dispatch host latency is paid once per batch, which is how
    bench.py's 1080p pipeline reaches its headline throughput. Seams are
    max-weight winner-take-all per band (same rule as MultiBand; the
    GL/graph-cut seam path has no TPU analogue, and max-weight is the
    seam the CUDA engine uses)."""

    def __init__(self, cfg=None):
        super().__init__(cfg)
        self.batch = max(1, int(self.cfg.get_int("Map2D.RenderBatch", 8)))
        # the reference's seam toggle (Map2DRender.cpp `EnableSeam`):
        # within-batch ownership is resolved by a smoothed-argmax seam
        # pass (ops.mosaic.seam_masks_batch) instead of raw max-weight
        self.enable_seam = self.cfg.get_bool("Map2DRender.EnableSeam",
                                             False)
        self.seam_sigma = self.cfg.get_double("Map2DRender.SeamSigma", 3.0)
        self._pending: List = []   # (img_np, pose_plane)

    def render_frame(self, img, pose_plane) -> bool:
        # append under the same lock flush() swaps the list with, so a
        # feed racing a flush from another thread can't interleave
        with self._lock:
            self._pending.append((np.asarray(img), pose_plane))
            full = len(self._pending) >= self.batch
        if full:
            self.flush()
        return True

    def flush(self):
        """Composite every pending frame in one scan program."""
        with self._lock:
            pending, self._pending = self._pending, []
            if not pending:
                return
            # pass 1: union footprint -> grow the canvas once, so every
            # origin below is computed against the settled min_xy
            boxes = []
            for img, pp in pending:
                pts, ok = M.plane_corners_np(pp, self.camera)
                boxes.append(pts if ok else None)
            live = [b for b in boxes if b is not None]
            self.frames_skipped += len(boxes) - len(live)
            if not live:
                return
            allpts = np.concatenate(live, 0)
            self._maybe_grow(allpts[:, 0].min(), allpts[:, 1].min(),
                             allpts[:, 0].max(), allpts[:, 1].max())
            # pass 2: per-frame geometry (growth is now a no-op)
            imgs, hs, origins, won = [], [], [], []
            for (img, pp), box in zip(pending, boxes):
                if box is None:
                    continue
                geo = self._frame_geometry(pp)
                if geo is None:
                    self.frames_skipped += 1
                    continue
                (ty0, tx0), H = geo
                if img.ndim == 2:
                    img = np.repeat(img[..., None], 3, -1)
                imgs.append(img)
                hs.append(H)
                origins.append((ty0 * ELE, tx0 * ELE))
                won.append(1.0)
            if not imgs:
                return
            patch_px = self.patch_tiles * ELE
            # pad to the static batch size so the scan compiles once
            while len(imgs) < self.batch:
                imgs.append(imgs[-1])
                hs.append(hs[-1])
                origins.append(origins[-1])
                won.append(0.0)
            with timer.scope("RenderMap2D::renderFrames"):
                imgs_j = jnp.asarray(np.stack(imgs), jnp.float32)
                hs_j = jnp.asarray(np.stack(hs), jnp.float32)
                org_j = jnp.asarray(np.asarray(origins), jnp.int32)
                won_j = jnp.asarray(won, jnp.float32)
                if self.enable_seam:
                    ih, iw = imgs[0].shape[:2]
                    masks = M.seam_masks_batch(
                        hs_j, org_j, won_j, (ih, iw),
                        (patch_px, patch_px),
                        (self.h_tiles * ELE, self.w_tiles * ELE),
                        weight_type=self.weight_type,
                        smooth_sigma=float(self.seam_sigma))
                    self.canvas_lap, self.canvas_w = \
                        M.composite_frames_batch_seamed(
                            self.canvas_lap, self.canvas_w, imgs_j, hs_j,
                            org_j, won_j, masks, bands=self.bands,
                            patch_hw=(patch_px, patch_px),
                            weight_type=self.weight_type,
                            half_res=self.fast_warp, warp=self.warp_mode)
                else:
                    self.canvas_lap, self.canvas_w = \
                        M.composite_frames_batch(
                            self.canvas_lap, self.canvas_w, imgs_j, hs_j,
                            org_j, won_j, bands=self.bands,
                            patch_hw=(patch_px, patch_px),
                            weight_type=self.weight_type,
                            half_res=self.fast_warp, warp=self.warp_mode)
            self.frames_rendered += int(np.sum(np.asarray(won) > 0))

    def blended(self, bg: Optional[float] = None):
        self.flush()
        return super().blended(bg)


@MAP2DS.register("1")
@MAP2DS.register("weighted")
class WeightedMap2D(Map2DBase):
    """Single-band weighted running blend (Map2DCPU semantics: per-pixel
    accumulate weight*color and weight, display sum/weight). Registered
    for Map2D.Type 1; Type 2 is the Map2DGPU-rule variant below."""

    def __init__(self, cfg=None):
        super().__init__(cfg)
        self.weight_type = int(self.cfg.get_int("Map2D.WeightType", 0))
        self.acc = None   # [H, W, 3] sum of w*I
        self.wsum = None  # [H, W, 1]

    def _alloc(self):
        H, W = self.h_tiles * ELE, self.w_tiles * ELE
        self.acc = jnp.zeros((H, W, 3), jnp.float32)
        self.wsum = jnp.zeros((H, W, 1), jnp.float32)

    def _grow(self, top, bottom, left, right):
        H = (self.h_tiles + top + bottom) * ELE
        W = (self.w_tiles + left + right) * ELE
        o = (top * ELE, left * ELE, 0)
        self.acc = jax.lax.dynamic_update_slice(
            jnp.zeros((H, W, 3), jnp.float32), self.acc, o)
        self.wsum = jax.lax.dynamic_update_slice(
            jnp.zeros((H, W, 1), jnp.float32), self.wsum, o)
        self.h_tiles += top + bottom
        self.w_tiles += left + right
        self.min_xy = self.min_xy - np.array([left, top]) * self.ele_size

    def render_frame(self, img, pose_plane) -> bool:
        with self._lock:   # acc/wsum are donated buffers (see MultiBand)
            return self._render_frame_locked(img, pose_plane)

    def _render_frame_locked(self, img, pose_plane) -> bool:
        geo = self._frame_geometry(pose_plane)
        if geo is None:
            self.frames_skipped += 1
            return False
        (ty0, tx0), H = geo
        patch_px = self.patch_tiles * ELE
        img32 = jnp.asarray(np.asarray(img), jnp.float32)
        self.acc, self.wsum = _weighted_feed(
            self.acc, self.wsum, img32, jnp.asarray(H, jnp.float32),
            jnp.asarray([ty0 * ELE, tx0 * ELE], jnp.int32),
            patch_hw=(patch_px, patch_px), weight_type=self.weight_type)
        self.frames_rendered += 1
        return True

    def _clear_rect_px(self, y0, y1, x0, x1):
        sl = (slice(y0, y1), slice(x0, x1))
        self.acc = self.acc.at[sl].set(0.0)
        self.wsum = self.wsum.at[sl].set(0.0)

    def blended(self, bg: Optional[float] = None):
        if bg is None:
            bg = float(self.cfg.get_int("Result.BackGroundColor", 255))
        if self.acc is None:      # prepare() hasn't allocated yet
            return (np.zeros((ELE, ELE, 3), np.float32),
                    np.zeros((ELE, ELE), bool))
        with self._lock:
            w = np.asarray(self.wsum)
            acc = np.asarray(self.acc)
        covered = w[..., 0] > 0
        out = np.where(covered[..., None], acc / np.maximum(w, 1e-12), bg)
        return np.clip(out, 0, 255), covered

    def save(self, filename: str) -> bool:
        out, covered = self.blended()
        ys, xs = np.nonzero(covered)
        if len(ys) == 0:
            return False
        ty0, ty1 = ys.min() // ELE, ys.max() // ELE + 1
        tx0, tx1 = xs.min() // ELE, xs.max() // ELE + 1
        _write_png(filename, out[ty0 * ELE:ty1 * ELE,
                                 tx0 * ELE:tx1 * ELE].astype(np.uint8))
        return True


import functools


@functools.partial(jax.jit, static_argnames=("patch_hw", "weight_type"),
                   donate_argnums=(0, 1))
def _weighted_feed(acc, wsum, img, h_patch2img, origin_yx,
                   patch_hw, weight_type: int = 0):
    warped, w = M.warp_frame_to_patch(img, h_patch2img, patch_hw, weight_type)
    o = (origin_yx[0], origin_yx[1], 0)
    ph, pw = patch_hw
    cur_a = jax.lax.dynamic_slice(acc, o, (ph, pw, 3))
    cur_w = jax.lax.dynamic_slice(wsum, o, (ph, pw, 1))
    acc = jax.lax.dynamic_update_slice(acc, cur_a + warped * w, o)
    wsum = jax.lax.dynamic_update_slice(wsum, cur_w + w, o)
    return acc, wsum


@MAP2DS.register("2")
@MAP2DS.register("gpu")
class WeightedGPUMap2D(WeightedMap2D):
    """Map2D.Type 2 — the CUDA engine's ACTUAL blend rule
    (Map2DFusion/UtilGPU.cu renderFramesKernel:311-381, as compiled):

      * per-pixel weight is INVERSE-QUADRATIC DISTANCE TO THE FRAME'S
        FOOTPRINT CENTER in canvas pixels, w = 1e5 / (d^2 + 1000) — the
        radial image weight branch is compiled out (`if(0)`, :339-346);
      * blending is a biased OVERWRITE, not a running average: when the
        incoming weight >= the stored one, out = (old*2*w_old + new*w_new)
        / (2*w_old + w_new) and the stored weight becomes w_new; when it
        is lower the pixel is left untouched (:358-373). Each pixel thus
        converges to the most-center-on frame with a soft transition.

    Deliberate divergence: the CUDA kernel samples the source NEAREST-
    neighbor ((int)srcX); this build samples bilinearly everywhere.
    """

    def _alloc(self):
        H, W = self.h_tiles * ELE, self.w_tiles * ELE
        self.acc = jnp.zeros((H, W, 3), jnp.float32)   # stored COLOR
        self.wsum = jnp.zeros((H, W, 1), jnp.float32)  # stored weight

    def render_frame(self, img, pose_plane) -> bool:
        with self._lock:
            return self._render_frame_locked(img, pose_plane)

    def _render_frame_locked(self, img, pose_plane) -> bool:
        # NOT the inherited WeightedMap2D body: acc stores already-blended
        # COLOR here, not sum(w*I) — refresh() re-renders through this
        # hook, so it must use the same _gpu_feed rule as the feed path
        # (ADVICE r4 medium: the inherited hook corrupted refreshed
        # regions on Map2D.Type=2).
        geo = self._frame_geometry(pose_plane)
        if geo is None:
            self.frames_skipped += 1
            return False
        (ty0, tx0), H = geo
        patch_px = self.patch_tiles * ELE
        # frame footprint center in patch coords: image center pixel
        # mapped through H^-1 (H: patch px -> image px)
        cam = self.camera
        ctr_img = np.array([cam.cx, cam.cy, 1.0])
        p = np.linalg.solve(np.asarray(H, np.float64), ctr_img)
        center = (p[:2] / p[2]).astype(np.float32)
        self.acc, self.wsum = _gpu_feed(
            self.acc, self.wsum, jnp.asarray(np.asarray(img),
                                             jnp.float32),
            jnp.asarray(H, jnp.float32),
            jnp.asarray([ty0 * ELE, tx0 * ELE], jnp.int32),
            jnp.asarray(center), patch_hw=(patch_px, patch_px))
        self.frames_rendered += 1
        return True

    def blended(self, bg: Optional[float] = None):
        if bg is None:
            bg = float(self.cfg.get_int("Result.BackGroundColor", 255))
        if self.acc is None:
            return (np.zeros((ELE, ELE, 3), np.float32),
                    np.zeros((ELE, ELE), bool))
        with self._lock:
            w = np.asarray(self.wsum)
            color = np.asarray(self.acc)
        covered = w[..., 0] > 0
        out = np.where(covered[..., None], color, bg)
        return np.clip(out, 0, 255), covered


@functools.partial(jax.jit, static_argnames=("patch_hw",),
                   donate_argnums=(0, 1))
def _gpu_feed(color, wbuf, img, h_patch2img, origin_yx, center_xy,
              patch_hw):
    """One frame through the UtilGPU.cu rule (see WeightedGPUMap2D)."""
    warped, w_valid = M.warp_frame_to_patch(img, h_patch2img, patch_hw, 0)
    ph, pw = patch_hw
    yy = jnp.arange(ph, dtype=jnp.float32)[:, None]
    xx = jnp.arange(pw, dtype=jnp.float32)[None, :]
    d2 = (xx - center_xy[0]) ** 2 + (yy - center_xy[1]) ** 2
    w_new = (1e5 / (d2 + 1000.0))[..., None]
    w_new = jnp.where(w_valid > 0, w_new, 0.0)     # outside source: skip
    o = (origin_yx[0], origin_yx[1], 0)
    cur_c = jax.lax.dynamic_slice(color, o, (ph, pw, 3))
    cur_w = jax.lax.dynamic_slice(wbuf, o, (ph, pw, 1))
    fresh = cur_w <= 0
    take = (cur_w <= w_new) & (w_new > 0)
    denom = jnp.maximum(2.0 * cur_w + w_new, 1e-12)
    mix = (cur_c * 2.0 * cur_w + warped * w_new) / denom
    new_c = jnp.where(fresh & (w_new > 0), warped,
                      jnp.where(take, mix, cur_c))
    new_w = jnp.where(take, w_new, cur_w)
    color = jax.lax.dynamic_update_slice(color, new_c, o)
    wbuf = jax.lax.dynamic_update_slice(wbuf, new_w, o)
    return color, wbuf


def create_map2d(map2d_type, cfg=None):
    """Factory mirroring Map2D::create (Map2D.cpp:51-66)."""
    return MAP2DS.create(str(map2d_type), cfg)


def _write_png(path: str, arr: np.ndarray):
    """PNG writer without OpenCV: native libpng writer first (encode +
    fwrite off-GIL, native/imageio.cpp), then PIL, then pure-python."""
    from ..io import native_io
    if native_io.save_png(path, arr):
        return
    try:
        from PIL import Image
        Image.fromarray(arr).save(path)
        return
    except ImportError:
        pass
    import struct, zlib

    h, w = arr.shape[:2]
    if arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, -1)
    raw = b"".join(b"\x00" + arr[i].tobytes() for i in range(h))

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw, 6))
           + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def read_png(path: str) -> np.ndarray:
    try:
        from PIL import Image
        return np.asarray(Image.open(path).convert("RGB"))
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("PNG reading requires PIL") from e
