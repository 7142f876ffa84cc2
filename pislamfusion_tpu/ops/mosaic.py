"""Orthomosaic device kernels: plane-projection geometry, radial weights,
warp + Laplacian multi-band composite onto a tiled canvas pyramid.

TPU-native re-design of the reference's mosaic hot path
(Map2DFusion/MultiBandMap2DCPU.cpp renderFrame:311-558 and the CUDA variant
UtilGPU.cu:311-461). Differences by design:

  * The reference warps into a per-frame scratch the size of the touched tile
    block, then loops pixel-by-pixel per tile per band compositing by max
    weight. Here the canvas IS a persistent device-resident Laplacian pyramid
    (one array per band); each `composite_frame` call warps the frame into a
    fixed-size tile-aligned patch, builds its pyramid, and max-weight-merges
    the patch into the canvas with dynamic_update_slice — one fused XLA
    program, no host round-trips.
  * The per-frame weight image (renderFrame:396-425) is never materialized or
    warped: the radial weight is evaluated analytically at each warped sample's
    source coordinate.
  * The blended result is reconstructed globally (restore_from_laplacian), so
    there is no per-tile border stitching step (MultiBandMap2DCPU::Ele::blend's
    3x3-neighbor logic exists only because the reference reconstructs per
    tile).

Geometry parity (renderFrame:324-347): a camera at SE3 pose (plane coords,
plane = z=0) sees plane point  p = t - axis * (t.z / axis.z)  along each
pixel ray axis = R * unproject(pixel); a frame is rendered only when all four
corner rays satisfy axis . downlook >= 0.4.
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import image as im
from . import lie
from . import shearwarp

ELE_PIXELS = 256  # canvas tile size, reference Map2D.h:35


# ---------------------------------------------------------------------------
# host-side geometry (numpy, tiny per-frame work)
# ---------------------------------------------------------------------------

def plane_corners_np(pose_c2w: np.ndarray, cam, corners_px=None):
    """Project image corners through a pose onto the plane z=0.

    pose_c2w: [7] (t, q) numpy SE3 in plane coordinates.
    Returns (pts [4, 2] plane xy, ok) — ok False when the down-look check
    fails (renderFrame:330-340).
    """
    t = np.asarray(pose_c2w[:3], np.float64)
    q = np.asarray(pose_c2w[3:7], np.float64)
    if corners_px is None:
        corners_px = np.array([[0, 0], [cam.width, 0],
                               [0, cam.height], [cam.width, cam.height]],
                              np.float64)
    rays = np.stack([(corners_px[:, 0] - cam.cx) / cam.fx,
                     (corners_px[:, 1] - cam.cy) / cam.fy,
                     np.ones(len(corners_px))], -1)
    # rotate by quaternion (host numpy mirror of lie.quat_rotate)
    v, w = q[:3], q[3]
    tt = 2.0 * np.cross(v, rays)
    axis = rays + w * tt + np.cross(v, tt)
    down = -1.0 if t[2] >= 0 else 1.0
    if np.any(axis[:, 2] * down < 0.4):
        return None, False
    pts = t[None, :] - axis * (t[2] / axis[:, 2])[:, None]
    return pts[:, :2], True


def homography_canvas_to_image_np(pose_c2w: np.ndarray, cam,
                                  origin_xy: Tuple[float, float],
                                  length_pixel: float) -> np.ndarray:
    """3x3 H mapping canvas pixel (u, v) -> source image pixel.

    canvas px -> plane point: (x, y) = origin + (u, v) * length_pixel;
    plane point -> image: pinhole projection of R^T (p - t).
    Closed form replaces the reference's 4-point cv::getPerspectiveTransform
    (renderFrame:437-439) — exact instead of DLT-fit.
    """
    t = np.asarray(pose_c2w[:3], np.float64)
    q = np.asarray(pose_c2w[3:7], np.float64)
    x, y, z, w = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    Rt = R.T
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1.0]])
    # plane homogeneous (x, y, 1) -> camera frame: x*Rt[:,0] + y*Rt[:,1] - Rt@t
    Hpi = K @ np.stack([Rt[:, 0], Rt[:, 1], -Rt @ t], axis=1)
    A = np.array([[length_pixel, 0, origin_xy[0]],
                  [0, length_pixel, origin_xy[1]],
                  [0, 0, 1.0]])
    return Hpi @ A


def homography_canvas_to_image(pose_c2w, fx, fy, cx, cy, origin_xy,
                               length_pixel):
    """Device-side (jnp, traced) twin of homography_canvas_to_image_np —
    used by fully device-resident pipelines (bench/scan paths) where the
    pose is a traced array."""
    t = pose_c2w[:3]
    R = lie.quat_to_matrix(pose_c2w[3:7])
    Rt = R.T
    K = jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]])
    Hpi = K @ jnp.stack([Rt[:, 0], Rt[:, 1], -Rt @ t], axis=1)
    A = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    A = A * jnp.array([length_pixel, length_pixel, 1.0])[None, :]
    A = A.at[0, 2].set(origin_xy[0]).at[1, 2].set(origin_xy[1]).at[2, 2].set(1.0)
    return Hpi @ A


def auto_resolution(cam, max_height: float, scale: float) -> float:
    """Ground-sample length per canvas pixel (Data::prepare:222-237)."""
    corner0 = np.array([(0 - cam.cx) / cam.fx, (0 - cam.cy) / cam.fy])
    corner1 = np.array([(cam.width - cam.cx) / cam.fx,
                        (cam.height - cam.cy) / cam.fy])
    line = corner1 - corner0
    radius = 0.5 * max_height * np.hypot(line[0], line[1])
    diag_px = np.hypot(cam.width, cam.height)
    return (2.0 * radius / diag_px) / scale, radius


# ---------------------------------------------------------------------------
# device kernels
# ---------------------------------------------------------------------------

def radial_weight(src_xy, width: int, height: int, valid,
                  weight_type: int = 0):
    """Analytic per-sample weight: 1 - r/r_max at the *source* pixel, clamped
    to 1e-5, squared when weight_type != 0 (renderFrame:396-425); zero where
    the sample fell outside the image (the reference gets the same zero from
    warping the weight image with a constant border)."""
    cx, cy = width / 2.0, height / 2.0
    dmax = jnp.sqrt(cx * cx + cy * cy).astype(jnp.float32)
    d = jnp.hypot(src_xy[..., 0] - cx, src_xy[..., 1] - cy)
    w = 1.0 - d / dmax
    if weight_type != 0:
        w = w * w
    w = jnp.maximum(w, 1e-5)
    return jnp.where(valid, w, 0.0)


def warp_frame_to_patch(img, h_patch2img, patch_hw, weight_type: int = 0):
    """Warp a frame into a canvas patch and produce its analytic weight map.

    img: [H, W, 3] float32; h_patch2img: [3, 3] patch-pixel -> image-pixel.
    Returns (warped [Ph, Pw, 3], weight [Ph, Pw, 1]). For the half-res
    fast path see patch_pyramids(half_res=True), which never materializes
    the full-res warp at all.
    """
    grid = im.homography_grid(h_patch2img, patch_hw)
    warped, valid = im.bilinear_sample(img, grid, border="reflect")
    w = radial_weight(grid, img.shape[1], img.shape[0], valid, weight_type)
    return warped, w[..., None]


def analytic_weight_pyramid(h_patch2img, img_hw, patch_hw, bands: int,
                            weight_type: int = 0, live=None):
    """Radial-weight pyramid EVALUATED per level instead of pyr_down'd.

    The per-frame weight (renderFrame:396-425) is a smooth analytic
    function of the source coordinate; evaluating it at each band's grid
    (homography scaled by 2^i) skips the whole pyr_down chain — less
    traffic, same smooth seams. Slight semantic deviation from the
    reference's blur-decimate chain at the validity boundary (a hard 0
    edge here vs a blurred rolloff there); the max-weight composite only
    compares weights of overlapping frames, both computed the same way.

    live: optional [nty, ntx] bool tile-liveness from the shear warp —
    dead tiles get zero weight so clamped window content never wins.
    """
    H, W = img_hw
    ph, pw = patch_hw
    pyr = []
    scale_mat = np.diag([2.0, 2.0, 1.0]).astype(np.float32)
    h = h_patch2img
    for i in range(bands + 1):
        hw_i = (max(1, ph >> i), max(1, pw >> i))
        grid = im.homography_grid(h, hw_i, offset=(0.0, 0.0))
        valid = ((grid[..., 0] >= 0) & (grid[..., 0] <= W - 1)
                 & (grid[..., 1] >= 0) & (grid[..., 1] <= H - 1))
        w = radial_weight(grid, W, H, valid, weight_type)
        if live is not None and hw_i[0] >= live.shape[0] \
                and hw_i[0] % live.shape[0] == 0:
            # per-tile liveness -> per-pixel via broadcast+reshape (a
            # jnp.repeat here lowers to gathers and costs ~8 ms/frame)
            nty, ntx = live.shape
            ty, tx = hw_i[0] // nty, hw_i[1] // ntx
            lv = jnp.broadcast_to(live[:, None, :, None].astype(w.dtype),
                                  (nty, ty, ntx, tx)).reshape(hw_i)
            w = w * lv
        pyr.append(w[..., None])
        h = h @ jnp.asarray(scale_mat, h.dtype)
    return pyr


def patch_pyramids(img, h_patch2img, patch_hw, bands: int,
                   weight_type: int = 0, half_res: bool = False,
                   warp: str = "gather", w0_mask=None):
    """(patch Laplacian pyramid [bands+1], weight pyramid [bands+1]) for
    one frame — the mosaic feed's per-frame compute.

    warp="shear" routes the content warp through the Pallas shear kernel
    (ops/shearwarp.py: no gathers — log-roll shears + one-hot MXU
    matmuls, ~20x the gather warp's throughput on v5e) and evaluates the
    weight pyramid analytically per level. TPU only. half_res composes:
    the content is shear-warped at half the patch resolution and band 0's
    Laplacian is EXACTLY ZERO by construction — warp and pyramid work
    both drop 4x (same quality semantics as the shipped gather fast
    path).

    half_res=True (gather mode) never materializes a full-res warp at
    all: the content is gathered at half the patch resolution, band 0's
    Laplacian is EXACTLY ZERO by construction (a pyr_up'd image has no
    finest-band detail), and the pyramid chain starts from the half-res
    image — 4x fewer gather indices AND no 1536^2 pyramid level. Weights
    stay exact full-res analytic (no gathers needed), so coverage/seam
    decisions are unchanged."""
    if warp == "shear":
        rgb = img if img.ndim == 3 else img[..., None]
        # the Pallas warp tiles at 128 (warp_patch_pallas default), NOT
        # shearwarp.TILE=256 — gating on 256 silently kicked odd-multiple
        # patch sizes (e.g. 1280 px) onto the 4x full-res path
        half_ok = half_res and (patch_hw[0] // 2) % 128 == 0 \
            and (patch_hw[1] // 2) % 128 == 0
        if half_ok:
            # warp HALF-res patch from a pyrDown'd source: the dst->src
            # scale (and so the kernel's static window provisioning) stays
            # the same as the full-res warp, and the 5-tap low-pass before
            # decimation is proper antialiasing (better than the strided
            # gather the fast path used to take)
            src_half = im.pyr_down(rgb.astype(jnp.float32))
            sh = jnp.asarray(np.diag([0.5, 0.5, 1.0]), h_patch2img.dtype)
            s2 = jnp.asarray(np.diag([2.0, 2.0, 1.0]), h_patch2img.dtype)
            h_hs = sh @ h_patch2img @ s2      # half-patch px -> half-src px
            half_hw = (patch_hw[0] // 2, patch_hw[1] // 2)
            warped, live, _fit = shearwarp.warp_patch_pallas(
                src_half, h_hs, half_hw)
            sub = im.build_laplacian_pyramid(warped, bands - 1) \
                if bands > 1 else [warped]
            p_lap = [jnp.zeros(patch_hw + (rgb.shape[-1],),
                               jnp.float32)] + sub
        else:
            warped, live, _fit = shearwarp.warp_patch_pallas(
                rgb.astype(jnp.float32), h_patch2img, patch_hw)
            p_lap = im.build_laplacian_pyramid(warped, bands)
        # band-0 weight analytic, coarser bands via the pyr_down chain:
        # the blur-decimate rolloff attenuates weights near frame borders
        # exactly where the content pyramid is contaminated by
        # outside-frame padding — per-level analytic evaluation keeps
        # border weights high there and costs ~25 dB on the composite.
        # On the half-res path the analytic eval runs at HALF resolution
        # and band 0 is its pyr_up: band-0 content is exactly zero there,
        # so band-0 weight only arbitrates ownership — the interpolated
        # weight moves seam boundaries by <= 1 px and quarters the cost
        # of the projective grid eval (the single most expensive piece of
        # the weight path at 1536^2). Every frame computes weights the
        # same way, so max-weight comparisons stay consistent.
        if half_ok and w0_mask is None:
            h_half = h_patch2img @ jnp.asarray(
                np.diag([2.0, 2.0, 1.0]), h_patch2img.dtype)
            w_half = analytic_weight_pyramid(
                h_half, (img.shape[0], img.shape[1]),
                (patch_hw[0] // 2, patch_hw[1] // 2),
                0, weight_type, live)[0]
            p_w = [im.pyr_up(w_half, patch_hw)]
        else:
            p_w = analytic_weight_pyramid(h_patch2img,
                                          (img.shape[0], img.shape[1]),
                                          patch_hw, 0, weight_type, live)
            if w0_mask is not None:
                p_w[0] = p_w[0] * w0_mask
        for _ in range(bands):
            p_w.append(im.pyr_down(p_w[-1]))
        return p_lap, p_w
    if not half_res:
        warped, w = warp_frame_to_patch(img, h_patch2img, patch_hw,
                                        weight_type)
        p_lap = im.build_laplacian_pyramid(warped, bands)
        p_w = [w if w0_mask is None else w * w0_mask]
        for _ in range(bands):
            p_w.append(im.pyr_down(p_w[-1]))
        return p_lap, p_w
    h_half = h_patch2img @ jnp.asarray(np.diag([2.0, 2.0, 1.0]),
                                       h_patch2img.dtype)
    half_hw = (patch_hw[0] // 2, patch_hw[1] // 2)
    grid = im.homography_grid(h_half, half_hw)
    warped_h, _ = im.bilinear_sample(img, grid, border="reflect")
    grid_full = im.homography_grid(h_patch2img, patch_hw)
    valid_full = ((grid_full[..., 0] >= 0)
                  & (grid_full[..., 0] <= img.shape[1] - 1)
                  & (grid_full[..., 1] >= 0)
                  & (grid_full[..., 1] <= img.shape[0] - 1))
    w0 = radial_weight(grid_full, img.shape[1], img.shape[0], valid_full,
                       weight_type)[..., None]
    # bands 1.. from the half-res image; band 0 Laplacian is exactly 0
    sub = im.build_laplacian_pyramid(warped_h, bands - 1) if bands > 1 \
        else [warped_h]
    p_lap = [jnp.zeros(patch_hw + (img.shape[-1],), img.dtype)] + sub
    p_w = [w0 if w0_mask is None else w0 * w0_mask]
    for _ in range(bands):
        p_w.append(im.pyr_down(p_w[-1]))
    return p_lap, p_w


def composite_patch(canvas_lap: List[jnp.ndarray],
                    canvas_w: List[jnp.ndarray],
                    patch_lap: List[jnp.ndarray],
                    patch_w: List[jnp.ndarray],
                    origin_yx):
    """Max-weight composite of a patch pyramid into the canvas pyramid.

    origin_yx: [2] int32 patch origin in band-0 canvas pixels (tile aligned,
    so origin >> i stays integral for every band). Matches the reference's
    `if (srcW >= dstW) {dstL = srcL; dstW = srcW;}` per band
    (MultiBandMap2DCPU.cpp:496-553).
    """
    oy, ox = origin_yx[0], origin_yx[1]
    new_lap, new_w = [], []
    for i in range(len(canvas_lap)):
        o = (oy >> i, ox >> i, 0)
        ph, pw = patch_lap[i].shape[0], patch_lap[i].shape[1]
        cur_l = jax.lax.dynamic_slice(canvas_lap[i], o, (ph, pw, 3))
        cur_w = jax.lax.dynamic_slice(canvas_w[i], o, (ph, pw, 1))
        take = patch_w[i] >= cur_w
        out_l = jnp.where(take, patch_lap[i], cur_l)
        out_w = jnp.where(take, patch_w[i], cur_w)
        new_lap.append(jax.lax.dynamic_update_slice(canvas_lap[i], out_l, o))
        new_w.append(jax.lax.dynamic_update_slice(canvas_w[i], out_w, o))
    return new_lap, new_w


@functools.partial(jax.jit, static_argnames=("bands", "patch_hw",
                                              "weight_type", "half_res",
                                              "warp"),
                   donate_argnums=(0, 1))
def composite_frame(canvas_lap, canvas_w, img, h_patch2img, origin_yx,
                    bands: int, patch_hw: Tuple[int, int],
                    weight_type: int = 0, half_res: bool = False,
                    warp: str = "gather"):
    """One fused feed step: warp + pyramid + max-weight composite.

    canvas_lap / canvas_w: lists (len bands+1) of band arrays (donated).
    img: [H, W, 3] float32 (0..255). h_patch2img maps patch pixels (relative
    to origin) to image pixels. origin_yx: int32 [2], tile aligned.
    """
    patch_lap, patch_w = patch_pyramids(img, h_patch2img, patch_hw, bands,
                                        weight_type, half_res, warp)
    return composite_patch(canvas_lap, canvas_w, patch_lap, patch_w, origin_yx)


@functools.partial(jax.jit, static_argnames=("bands", "patch_hw",
                                              "weight_type", "half_res",
                                              "warp"),
                   donate_argnums=(0, 1))
def composite_frames_batch(canvas_lap, canvas_w, imgs, hs, origins_yx,
                           weights_on, bands: int,
                           patch_hw: Tuple[int, int],
                           weight_type: int = 0, half_res: bool = False,
                           warp: str = "gather"):
    """Composite a BATCH of frames in one compiled program (lax.scan).

    The reference's Map2DRender engine renders frames in batches per draw
    call (Map2DRender.cpp renderFrames); this is its TPU analogue and the
    same shape as bench.py's scan pipeline: per-dispatch host latency is
    paid once per batch instead of once per frame.

    imgs: [K, H, W, 3]; hs: [K, 3, 3] patch->image homographies;
    origins_yx: [K, 2] int32 band-0 canvas offsets (tile aligned);
    weights_on: [K] float32 — 0 disables a frame (padding slot).
    """
    def step(carry, inp):
        c_lap, c_w = carry
        img, h, oyx, won = inp
        p_lap, p_w = patch_pyramids(img, h, patch_hw, bands, weight_type,
                                    half_res, warp)
        p_w = [w * won for w in p_w]
        c_lap, c_w = composite_patch(c_lap, c_w, p_lap, p_w, oyx)
        return (c_lap, c_w), 0.0

    (canvas_lap, canvas_w), _ = jax.lax.scan(
        step, (canvas_lap, canvas_w), (imgs, hs, origins_yx, weights_on))
    return canvas_lap, canvas_w


@functools.partial(jax.jit, static_argnames=("img_hw", "patch_hw",
                                              "weight_type", "canvas_hw",
                                              "smooth_sigma"))
def seam_masks_batch(hs, origins_yx, weights_on, img_hw, patch_hw,
                     canvas_hw, weight_type: int = 0,
                     smooth_sigma: float = 3.0):
    """Seam finding for a batch of frames (Map2DRender `EnableSeam`
    analogue, Map2DFusion/Map2DRender.cpp).

    The reference's seam pass resolves within-batch overlap by assigning
    every canvas pixel to ONE source frame with spatially coherent
    boundaries (GL/graph-cut there). TPU re-design: scatter each frame's
    band-0 radial weight onto the canvas and take the per-pixel argmax
    owner, then REGULARIZE ownership with a Gaussian majority vote over
    the one-hot labels — per-pixel argmax alone interleaves owners
    wherever weights tie (exactly the ghost-prone overlap mid-zones),
    while the smoothed vote produces connected regions whose single seam
    sits along the equal-weight ridge, which is where graph-cut's data
    term is cheapest too.

    Returns [K, ph, pw, 1] float32 {0,1} ownership masks (patch-local).
    Multiply into the frames' band-0 weights: the max-weight composite
    then SELECTS by seam region instead of raw radial weight.
    """
    K = hs.shape[0]
    ph, pw = patch_hw
    # working canvas padded by one patch so every (origin >= 0) slice
    # fits even when the allocated canvas is smaller than the patch
    Hc, Wc = canvas_hw[0] + ph, canvas_hw[1] + pw

    def scatter(carry, inp):
        best_w, best_k = carry
        h, oyx, won, k = inp
        w0 = analytic_weight_pyramid(h, img_hw, patch_hw, 0,
                                     weight_type)[0][..., 0] * won
        reg_w = jax.lax.dynamic_slice(best_w, (oyx[0], oyx[1]), (ph, pw))
        reg_k = jax.lax.dynamic_slice(best_k, (oyx[0], oyx[1]), (ph, pw))
        win = w0 > reg_w
        best_w = jax.lax.dynamic_update_slice(
            best_w, jnp.where(win, w0, reg_w), (oyx[0], oyx[1]))
        best_k = jax.lax.dynamic_update_slice(
            best_k, jnp.where(win, k, reg_k), (oyx[0], oyx[1]))
        return (best_w, best_k), 0.0

    best_w = jnp.zeros((Hc, Wc), jnp.float32)
    best_k = jnp.full((Hc, Wc), -1, jnp.int32)
    (best_w, best_k), _ = jax.lax.scan(
        scatter, (best_w, best_k),
        (hs, origins_yx, weights_on, jnp.arange(K, dtype=jnp.int32)))

    # majority smoothing: blur each label's vote and keep the running
    # argmax — a [Hc, Wc, K] one-hot volume would scale HBM with canvas
    # area x batch (a 12k-px canvas with K=8 is >6 GB); the scan holds
    # two canvas-sized buffers regardless of K
    def vote(carry, k):
        best_v, best_lbl = carry
        v = im.gaussian_blur(
            (best_k == k).astype(jnp.float32)[..., None],
            smooth_sigma)[..., 0]
        win = v > best_v
        return (jnp.where(win, v, best_v),
                jnp.where(win, k, best_lbl)), 0.0

    (best_v, labels), _ = jax.lax.scan(
        vote, (jnp.full((Hc, Wc), -1.0), jnp.zeros((Hc, Wc), jnp.int32)),
        jnp.arange(K, dtype=jnp.int32))
    covered = best_w > 0

    def gather(_, inp):
        oyx, k = inp
        lab = jax.lax.dynamic_slice(labels, (oyx[0], oyx[1]), (ph, pw))
        cov = jax.lax.dynamic_slice(covered, (oyx[0], oyx[1]), (ph, pw))
        own = ((lab == k) & cov).astype(jnp.float32)
        return 0, own[..., None]

    _, masks = jax.lax.scan(
        gather, 0, (origins_yx, jnp.arange(K, dtype=jnp.int32)))
    return masks


@functools.partial(jax.jit, static_argnames=("bands", "patch_hw",
                                              "weight_type", "half_res",
                                              "warp"),
                   donate_argnums=(0, 1))
def composite_frames_batch_seamed(canvas_lap, canvas_w, imgs, hs,
                                  origins_yx, weights_on, seam_masks,
                                  bands: int, patch_hw: Tuple[int, int],
                                  weight_type: int = 0,
                                  half_res: bool = False,
                                  warp: str = "gather"):
    """composite_frames_batch with per-frame seam ownership masks
    (seam_masks_batch) multiplied into band 0 before the weight chain —
    the composite's max-weight rule then selects by seam region, with the
    pyr_down rolloff still smoothing coarse-band transitions."""
    def step(carry, inp):
        c_lap, c_w = carry
        img, h, oyx, won, own = inp
        p_lap, p_w = patch_pyramids(img, h, patch_hw, bands, weight_type,
                                    half_res, warp, w0_mask=own * won)
        c_lap, c_w = composite_patch(c_lap, c_w, p_lap, p_w, oyx)
        return (c_lap, c_w), 0.0

    (canvas_lap, canvas_w), _ = jax.lax.scan(
        step, (canvas_lap, canvas_w),
        (imgs, hs, origins_yx, weights_on, seam_masks))
    return canvas_lap, canvas_w


@functools.partial(jax.jit, static_argnames=("bg",))
def reconstruct_canvas(canvas_lap, canvas_w, bg: float = 255.0):
    """Blend result: restore from the Laplacian pyramid, background color where
    nothing was composited (MultiBandMap2DCPU::save:779-847)."""
    img = im.restore_from_laplacian(canvas_lap)
    covered = canvas_w[0] > 0
    out = jnp.where(covered, img, bg)
    return jnp.clip(out, 0, 255), covered[..., 0]


def alloc_canvas(h_tiles: int, w_tiles: int, bands: int, dtype=jnp.float32):
    """Fresh canvas pyramid: band i is [H >> i, W >> i] with H = 256*h_tiles."""
    H, W = h_tiles * ELE_PIXELS, w_tiles * ELE_PIXELS
    lap = [jnp.zeros((H >> i, W >> i, 3), dtype) for i in range(bands + 1)]
    w = [jnp.zeros((H >> i, W >> i, 1), dtype) for i in range(bands + 1)]
    return lap, w


def grow_canvas(canvas_lap, canvas_w, new_h_tiles: int, new_w_tiles: int,
                shift_tiles_yx: Tuple[int, int]):
    """spreadMap equivalent (MultiBandMap2DCPU.cpp:561-604): host-side
    re-allocation of a larger canvas with the old content shifted by whole
    tiles. Triggers one re-jit of composite_frame per new canvas shape."""
    bands = len(canvas_lap) - 1
    new_lap, new_w = alloc_canvas(new_h_tiles, new_w_tiles, bands)
    sy, sx = shift_tiles_yx
    for i in range(bands + 1):
        o = ((sy * ELE_PIXELS) >> i, (sx * ELE_PIXELS) >> i, 0)
        new_lap[i] = jax.lax.dynamic_update_slice(new_lap[i], canvas_lap[i], o)
        new_w[i] = jax.lax.dynamic_update_slice(new_w[i], canvas_w[i], o)
    return new_lap, new_w
