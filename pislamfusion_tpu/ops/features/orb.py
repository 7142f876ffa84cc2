"""ORB feature extraction as fixed-shape XLA array programs.

TPU-native re-design of the reference's ORB-SLAM-style extractor
(GSLAM-DIYSLAM/src/zhaoyong/FeatureDetectorORB.cpp): scale pyramid
(:488-545, 808-851), per-cell adaptive FAST 20->7 (:555-731), intensity
centroid IC_Angle orientation (:155-183, 546-553), 7x7 Gaussian blur then
256-bit BRIEF with the learned bit_pattern_31_ (:186-226, 228-487, 733-740).

Re-design decisions (vs the reference's per-cell scalar loops):
  * FAST scores are computed for EVERY pixel of every level as a dense
    shifted-image reduction (VPU), then 3x3 NMS; the per-cell adaptive
    20->7 threshold becomes per-cell top-k selection over the dense score
    map with the low threshold applied globally — same intent (spatially
    uniform corners, strong ones first) without data-dependent retries.
  * All outputs are padded to a static keypoint capacity with a validity
    mask; downstream matching/BA consume the mask.
  * Descriptors are returned as [N, 256] {0,1} uint8 "bit-planes" — the MXU
    matching path computes Hamming distance via dot products; `pack_bits`
    converts to the reference's 32-byte layout for .gbow / checkpoint compat.

The BRIEF sampling pattern (orb_pattern.npy) is the published ORB pattern
(Rublee et al. / OpenCV), kept bit-identical so descriptors are comparable
with the reference's and with its orb vocabulary.
"""
from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import image as im

PATCH_SIZE = 31        # FeatureDetectorORB.cpp:106
HALF_PATCH = 15        # :107
EDGE_THRESHOLD = 16    # :108
_BLUR_R = 3            # BRIEF's pre-blur radius (7x7, :733-740)
# 18 covers the rotated BRIEF offsets (|p| <= 13*sqrt(2) -> rounded <= 18);
# +_BLUR_R so the gathered RAW patch carries enough context to blur
# in-patch: blur is translation-invariant, so for INTERIOR keypoints
# blurring the gathered patch equals gathering from a blurred level —
# per-level gaussian_blur calls (~0.5 ms/frame of full-resolution
# stencils) collapse into a 7-tap shift-and-add over [N, 43, 43] patches
# (~26 MFLOP). Keypoints 16-21 px from an image edge see edge-clamped
# context where the old level blur used 'reflect' — a boundary-convention
# change in the outermost taps only (the reference's cv::GaussianBlur
# uses BORDER_REFLECT_101; descriptor bits there are border-convention
# noise in every implementation pair)
_GATHER_R = 18 + _BLUR_R
_GATHER = 2 * _GATHER_R + 1

_PATTERN = np.load(os.path.join(os.path.dirname(__file__), "orb_pattern.npy"))

# FAST-16 circle offsets (dx, dy), OpenCV order
_CIRCLE = np.array([
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
], np.int32)


def _umax_mask() -> np.ndarray:
    """Circular patch mask using the reference's umax quantization
    (FeatureDetectorORB.cpp:528-545) so IC_Angle matches exactly."""
    hp = HALF_PATCH
    umax = np.zeros(hp + 1, np.int32)
    vmax = int(np.floor(hp * np.sqrt(2.0) / 2 + 1))
    vmin = int(np.ceil(hp * np.sqrt(2.0) / 2))
    for v in range(vmax + 1):
        umax[v] = int(round(np.sqrt(hp * hp - v * v)))
    v0 = 0
    for v in range(hp, vmin - 1, -1):
        while umax[v0] == umax[v0 + 1]:
            v0 += 1
        umax[v] = v0
        v0 += 1
    mask = np.zeros((PATCH_SIZE, PATCH_SIZE), bool)
    for v in range(-hp, hp + 1):
        u_lim = umax[abs(v)]
        mask[v + hp, hp - u_lim:hp + u_lim + 1] = True
    return mask


_CIRC_MASK = _umax_mask()
_IC_U = (np.arange(PATCH_SIZE) - HALF_PATCH)[None, :] * _CIRC_MASK
_IC_V = (np.arange(PATCH_SIZE) - HALF_PATCH)[:, None] * _CIRC_MASK


@dataclasses.dataclass(frozen=True)
class OrbParams:
    n_features: int = 1000
    n_levels: int = 8          # FeatureDetectorORB defaults
    scale_factor: float = 1.2
    ini_threshold: float = 20.0
    min_threshold: float = 7.0
    cell: int = 32             # selection grid cell (px)
    # BRIEF rotation granularity: angles quantized to `angle_bins` steps so
    # the 512 pattern taps become per-bin one-hot MXU matmuls instead of
    # per-element gathers (~7 ms/frame -> ~0.4 ms on v5e; TPU gathers run
    # at ~10-70M idx/s). 30 bins = 12 degrees, the same granularity as the
    # rotation-consistency histogram (MatcherBFMultiH.cpp:296-376).
    # 0 = continuous angles via the gather path (bit-parity with the
    # reference's round-rotated-offset formula).
    angle_bins: int = 30
    # binned-BRIEF formulation: False = per-bin one-hot matmul + select
    # chain, True = single big-dot variant. Part of the (static, hashed)
    # params so each setting gets its own jit trace — reading the
    # PISLAM_BRIEF_DOT env var happens once per OrbParams construction,
    # never inside a trace.
    brief_dot: bool = dataclasses.field(
        default_factory=lambda: os.environ.get("PISLAM_BRIEF_DOT",
                                               "0") == "1")

    def level_scales(self):
        return [self.scale_factor ** i for i in range(self.n_levels)]

    def features_per_level(self):
        """Geometric allocation (FeatureDetectorORB.cpp:497-516)."""
        inv = 1.0 / self.scale_factor
        n = self.n_features * (1 - inv) / (1 - inv ** self.n_levels)
        out = []
        acc = 0
        for i in range(self.n_levels - 1):
            k = int(round(n * inv ** i))
            out.append(k)
            acc += k
        out.append(max(self.n_features - acc, 0))
        return out


_EXTRACT_ON: bool | None = None
_FLAT_ON: bool | None = None


def _flat_gate() -> bool:
    """Gate for the flat (cross-level fused) extraction front end:
    PISLAM_ORB_FLAT=0/1 overrides; default ON where the MXU stencil path
    runs (TPU). Process-lifetime cache — the decision is baked into jit
    traces like the other extraction gates."""
    global _FLAT_ON
    if _FLAT_ON is None:
        env = os.environ.get("PISLAM_ORB_FLAT", "")
        if env in ("0", "1"):
            _FLAT_ON = env == "1"
        else:
            _FLAT_ON = im._use_mxu_stencil()
    return _FLAT_ON


def _extract_kernels_on() -> bool:
    """Gate for the round-2 extraction kernels (fastselect + pyramid):
    PISLAM_PALLAS_EXTRACT=0/1 overrides; otherwise they turn on once the
    hardware-validation marker exists (written by the TPU recovery
    validator after the kernels compile, run, and beat the baseline on
    the real chip — the interpret-mode tests pin semantics but not the
    Mosaic lowering, and a cold driver bench must never hit an
    unvalidated kernel compile)."""
    global _EXTRACT_ON
    if _EXTRACT_ON is None:
        env = os.environ.get("PISLAM_PALLAS_EXTRACT", "")
        if env in ("0", "1"):
            _EXTRACT_ON = env == "1"
        else:
            _EXTRACT_ON = os.path.isfile(os.path.join(
                os.path.dirname(__file__), "..", "..", "..",
                ".pallas_extract_ok"))
    return _EXTRACT_ON


def fast_score_map(img):
    """Dense FAST-16 corner score (max t such that 9 contiguous circle pixels
    are all brighter/darker than center by t). img: [H, W] float."""
    # per-tap difference images kept as a LIST (never stacked into a
    # [16, H, W] buffer): the 9-length arc minima come from a log-depth
    # tree of pairwise minima, so XLA fuses the whole score into a few
    # elementwise passes instead of materializing 25 full-res planes.
    # On TPU the chain runs in bf16 (the score only RANKS corners against
    # a threshold of 7-20 gray levels; bf16's ~1-level quantization is
    # noise there and halves the VPU traffic of the hottest dense stage)
    if im._use_mxu_stencil():
        img = img.astype(jnp.bfloat16)
    d = [jnp.roll(img, (-dy, -dx), (0, 1)) - img for dx, dy in _CIRCLE]
    d = d + d[:9]                                # wraparound arcs (25)

    def arc_score(ds):
        m2 = [jnp.minimum(ds[i], ds[i + 1]) for i in range(len(ds) - 1)]
        m4 = [jnp.minimum(m2[i], m2[i + 2]) for i in range(len(m2) - 2)]
        m8 = [jnp.minimum(m4[i], m4[i + 4]) for i in range(len(m4) - 4)]
        m9 = [jnp.minimum(m8[i], ds[i + 8]) for i in range(16)]
        out = m9[0]
        for m in m9[1:]:
            out = jnp.maximum(out, m)
        return out

    score = jnp.maximum(arc_score(d), arc_score([-x for x in d]))
    # kill the 3px circle border (rolled values wrap)
    H, W = img.shape
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    edge = ((ys >= 3) & (ys < H - 3) & (xs >= 3) & (xs < W - 3))
    return jnp.where(edge, score, 0.0).astype(jnp.float32)


def _nms3(score):
    """3x3 non-max suppression as 8 shifted maxes (elementwise, fuses into
    the surrounding score chain) — an overlapping 3x3 reduce_window costs a
    separate windowed pass on TPU. `roll` wraps, so opposite borders can
    suppress each other; border pixels are killed by the circle-edge /
    EDGE_THRESHOLD masks both callers apply."""
    m = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            t = jnp.roll(score, (dy, dx), (0, 1))
            m = t if m is None else jnp.maximum(m, t)
    return jnp.where(score >= m, score, 0.0)


def select_keypoints(score, k: int, cell: int, min_threshold: float,
                     border: int = EDGE_THRESHOLD):
    """Per-cell top-k then global top-k selection over a dense score map.

    Returns (xy [k, 2] int32, response [k], valid [k]).
    """
    H, W = score.shape
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    ok = ((ys >= border) & (ys < H - border)
          & (xs >= border) & (xs < W - border))
    s = jnp.where(ok & (score > min_threshold), score, 0.0)
    s = _nms3(s)
    ncy, ncx = -(-H // cell), -(-W // cell)
    pad_h, pad_w = ncy * cell - H, ncx * cell - W
    sp = jnp.pad(s, ((0, pad_h), (0, pad_w)))
    per_cell = _per_cell_quota((H, W), k, cell)
    if per_cell == 1:
        # top-1 per cell WITHOUT the cell reshape-transpose (a full
        # relayout of the score map) and WITHOUT per-row lax.top_k (a
        # per-row sort, ~0.5 ms of the 1080p frame): cell max via a free
        # row-major [ncy, cell, ncx, cell] reshape + axis reductions
        # (cheaper than a strided reduce_window's windowed lowering), the
        # winner's index via a second min-reduce over position-encoded
        # ties (first-in-row-major, same tie order)
        cells4 = sp.reshape(ncy, cell, ncx, cell)
        cv2d = jnp.max(cells4, axis=(1, 3))
        up = jnp.broadcast_to(cv2d[:, None, :, None],
                              (ncy, cell, ncx, cell)).reshape(sp.shape)
        Wp = sp.shape[1]
        lin = (jax.lax.broadcasted_iota(jnp.int32, sp.shape, 0) * Wp
               + jax.lax.broadcasted_iota(jnp.int32, sp.shape, 1))
        big = jnp.int32(ncy * cell * Wp)
        idx2d = jnp.where(sp == up, lin, big)
        ci2d = jnp.min(idx2d.reshape(ncy, cell, ncx, cell), axis=(1, 3))
        flat_v = cv2d.reshape(-1)
        flat_y = (ci2d // Wp).reshape(-1)
        flat_x = (ci2d % Wp).reshape(-1)
    else:
        cells = sp.reshape(ncy, cell, ncx, cell).transpose(0, 2, 1, 3)
        cells = cells.reshape(ncy * ncx, cell * cell)
        cv, ci = jax.lax.top_k(cells, per_cell)  # [ncells, per_cell]
        # cell-local -> global pixel coords
        cyx = jnp.stack([jnp.arange(ncy * ncx) // ncx,
                         jnp.arange(ncy * ncx) % ncx], -1)   # [ncells, 2]
        gy = cyx[:, 0:1] * cell + ci // cell
        gx = cyx[:, 1:2] * cell + ci % cell
        flat_v = cv.reshape(-1)
        flat_y = gy.reshape(-1)
        flat_x = gx.reshape(-1)
    return _topk_flat(flat_v, flat_y, flat_x, k)


def _topk_flat(flat_v, flat_y, flat_x, k: int):
    v, idx = jax.lax.top_k(flat_v, min(k, flat_v.shape[0]))
    y = flat_y[idx]
    x = flat_x[idx]
    valid = v > 0
    if v.shape[0] < k:
        pad = k - v.shape[0]
        v = jnp.pad(v, (0, pad))
        y = jnp.pad(y, (0, pad))
        x = jnp.pad(x, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    return jnp.stack([x, y], -1).astype(jnp.int32), v, valid


def _per_cell_quota(shape, k: int, cell: int) -> int:
    ncy, ncx = -(-shape[0] // cell), -(-shape[1] // cell)
    return max(1, min(cell * cell, int(np.ceil(2.0 * k / (ncy * ncx)))))


# ---------------------------------------------------------------------------
# Flat extraction front end: the whole pyramid + FAST + NMS + selection as
# ONE short cross-level XLA program.
#
# The chained formulation above runs 8 SERIAL resizes (level l waits on
# level l-1) and then 8 per-level score/select op groups — measured
# ~2.5 ms/frame at 1080p dominated by fixed per-op scheduling, not
# arithmetic (BASELINE.md "Single-chip ceiling walk"). Here instead:
#   * every level is computed DIRECTLY from level 0 by one pair of banded
#     matmuls whose matrices are the float64-composed product of the
#     per-step bilinear matrices (mathematically identical to the chain,
#     one bf16 rounding instead of seven) — 7 independent MXU ops with no
#     serial dependency, emitted straight into the packed gather layout
#     (edge-clamp folded into the matrices like pyramid_pallas does);
#   * FAST score + NMS + threshold/border masks + per-cell winners run
#     ONCE over the packed stack (cell-aligned level interiors), so the
#     ~40-op score tree executes once instead of 8 times;
#   * per-level top-k becomes ONE batched lax.top_k over [n_levels, cells]
#     with static quota masks.
# Semantics match select_keypoints' per_cell==1 path (same masks, same
# row-major-first tie order, zero cells index their first pixel); the
# fall-back chain above remains for shapes/params outside this regime.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class _FlatPlan:
    shapes: tuple          # ((lh, lw), ...) per level
    bases: tuple           # packed row base of each level block
    block_rows: tuple      # rows per level block (cell multiples)
    wp: int                # packed lane count (cell multiple)
    cell: int              # selection cell == top row pad
    pad_left: int          # lane pad before each level's interior: 128
    #                        when cell divides 128 (level views slice at
    #                        a lane-tile boundary -> no relayout copy),
    #                        else cell
    total_rows: int


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=16)
def _flat_plan(h: int, w: int, n_levels: int, scale_factor: float,
               cell: int) -> _FlatPlan | None:
    """Packed layout: each level block is [cell + ceil(lh+r, cell), wp]
    with the level's pixels at rows [base+cell, base+cell+lh), lanes
    [cell, cell+lw) — interiors cell-aligned (cell winners reshape in one
    op) AND surrounded by >= _GATHER_R edge-clamped context (the patch
    gatherer reads the same buffer)."""
    if cell < _GATHER_R or cell % 8:
        return None
    shapes = []
    for lvl in range(n_levels):
        s = scale_factor ** lvl
        shapes.append((max(1, int(round(h / s))) if lvl else h,
                       max(1, int(round(w / s))) if lvl else w))
    # block/lane alignment: cell for the winner reshape, 128 when cell
    # divides 128 so the Pallas flat-pyramid kernel's tiles line up
    # (extra rows/lanes are edge-clamped replicas the masks ignore)
    align = 128 if 128 % cell == 0 else cell
    pad_left = 128 if align == 128 else cell
    wp = _ceil_to(pad_left + w + _GATHER_R, align)
    bases, blocks, rows = [], [], 0
    for lh, lw in shapes:
        blocks.append(_ceil_to(cell + lh + _GATHER_R, align))
        bases.append(rows)
        rows += blocks[-1]
    return _FlatPlan(tuple(shapes), tuple(bases), tuple(blocks), wp,
                     cell, pad_left, rows)


@functools.lru_cache(maxsize=16)
def _flat_matrices(h: int, w: int, n_levels: int, scale_factor: float,
                   cell: int):
    """Per-level (row [block_rows_l, h], col [wp, w]) float32 matrices:
    the composed bilinear chain with the block's edge-clamp pad folded
    in. Level 0 is None (a plain edge pad is exact f32). Col rows beyond
    the level's lw + _GATHER_R context are zero."""
    plan = _flat_plan(h, w, n_levels, scale_factor, cell)
    from ..image import _resize_matrix
    rowacc = np.eye(h, dtype=np.float64)
    colacc = np.eye(w, dtype=np.float64)
    mats = [None]
    for lvl in range(1, n_levels):
        (ph, pw), (lh, lw) = plan.shapes[lvl - 1], plan.shapes[lvl]
        rowacc = np.asarray(_resize_matrix(ph, lh), np.float64) @ rowacc
        colacc = np.asarray(_resize_matrix(pw, lw), np.float64) @ colacc
        mr = np.zeros((plan.block_rows[lvl], h), np.float64)
        for t in range(plan.block_rows[lvl]):
            mr[t] = rowacc[min(max(t - cell, 0), lh - 1)]
        mc = np.zeros((plan.wp, w), np.float64)
        for t in range(plan.pad_left + lw + _GATHER_R):
            mc[t] = colacc[min(max(t - plan.pad_left, 0), lw - 1)]
        mats.append((mr.astype(np.float32), mc.astype(np.float32)))
    return tuple(mats)


@functools.lru_cache(maxsize=16)
def _flat_row_tables(h: int, w: int, n_levels: int, scale_factor: float,
                     cell: int):
    """Static per-packed-row vectors for the interior mask: level-local y
    (huge negative outside any interior) and the level's (lh, lw)."""
    plan = _flat_plan(h, w, n_levels, scale_factor, cell)
    y_loc = np.full(plan.total_rows, -(1 << 20), np.int32)
    row_lh = np.zeros(plan.total_rows, np.int32)
    row_lw = np.zeros(plan.total_rows, np.int32)
    for lvl, ((lh, lw), base) in enumerate(zip(plan.shapes, plan.bases)):
        r0 = base + cell
        y_loc[r0:r0 + lh] = np.arange(lh)
        row_lh[r0:r0 + lh] = lh
        row_lw[r0:r0 + lh] = lw
    return y_loc, row_lh, row_lw


def _flat_feasible(h: int, w: int, params: "OrbParams", quotas) -> bool:
    plan = _flat_plan(h, w, params.n_levels, params.scale_factor,
                      params.cell)
    if plan is None:
        return False
    # the packed cell-winner formulation implements per_cell == 1 only
    # (true at production sizes; tiny test shapes fall back to the chain)
    return all(_per_cell_quota(s, max(q, 1), params.cell) == 1
               for s, q in zip(plan.shapes, quotas))


def _detect_flat(img, params: "OrbParams", quotas):
    """Flat front end. Returns (outs dict, packed [R, wp] f32, pxy [N0, 2]
    packed-coordinate patch centers), N0 = sum of level quotas."""
    H, W = img.shape
    n_levels, cell = params.n_levels, params.cell
    plan = _flat_plan(H, W, n_levels, params.scale_factor, cell)
    mats = _flat_matrices(H, W, n_levels, params.scale_factor, cell)
    pl_ = plan.pad_left
    chain_dt = jnp.bfloat16 if im._use_mxu_stencil() else jnp.float32
    src = img.astype(chain_dt)[..., None]
    blocks = [jnp.pad(img, ((cell, plan.block_rows[0] - H - cell),
                            (pl_, plan.wp - W - pl_)), mode="edge")]
    for lvl in range(1, n_levels):
        mr, mc = mats[lvl]
        blk = im._matmul_sep(src, mr, mc)[..., 0]
        blocks.append(blk.astype(jnp.float32))
    packed = jnp.concatenate(blocks, 0)              # [R, wp] f32

    # FAST score once over the stack (global 3px border zeroing + lane
    # wraps all fall inside the per-level 16px masks below)
    score = fast_score_map(packed)
    y_loc, row_lh, row_lw = _flat_row_tables(H, W, n_levels,
                                             params.scale_factor, cell)
    yv = jnp.asarray(y_loc)[:, None]
    lhv = jnp.asarray(row_lh)[:, None]
    lwv = jnp.asarray(row_lw)[:, None]
    b = EDGE_THRESHOLD
    lanes = jax.lax.broadcasted_iota(jnp.int32, score.shape, 1)
    ok = ((yv >= b) & (yv < lhv - b)
          & (lanes >= pl_ + b) & (lanes < pl_ + lwv - b))
    s = jnp.where(ok & (score > params.min_threshold), score, 0.0)
    s = _nms3(s)

    # per-cell (max, first-linear-index) over the whole stack
    R, Wp = s.shape
    nry, ncx_t = R // cell, Wp // cell
    cells4 = s.reshape(nry, cell, ncx_t, cell)
    cv = jnp.max(cells4, axis=(1, 3))                # [nry, ncx_t]
    up = jnp.broadcast_to(cv[:, None, :, None],
                          (nry, cell, ncx_t, cell)).reshape(R, Wp)
    lin = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) * Wp
           + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1))
    big = jnp.int32(R * Wp)
    ci = jnp.min(jnp.where(s == up, lin, big).reshape(
        nry, cell, ncx_t, cell), axis=(1, 3))        # [nry, ncx_t]

    # batched per-level top-k with static quota masks
    ks = [max(q, 1) for q in quotas]
    kmax = max(ks)
    ccounts = [(-(-lh // cell)) * (-(-lw // cell))
               for lh, lw in plan.shapes]
    cmax = max(ccounts)
    vrows, irows = [], []
    cc0 = pl_ // cell
    for lvl, (lh, lw) in enumerate(plan.shapes):
        rc0 = plan.bases[lvl] // cell + 1
        ncy, ncx = -(-lh // cell), -(-lw // cell)
        vs = cv[rc0:rc0 + ncy, cc0:cc0 + ncx].reshape(-1)
        is_ = ci[rc0:rc0 + ncy, cc0:cc0 + ncx].reshape(-1)
        vrows.append(jnp.pad(vs, (0, cmax - vs.shape[0])))
        irows.append(jnp.pad(is_, (0, cmax - is_.shape[0])))
    vall = jnp.stack(vrows)                          # [L, cmax]
    iall = jnp.stack(irows)
    tv, tidx = jax.lax.top_k(vall, kmax)             # [L, kmax]
    tlin = jnp.take_along_axis(iall, tidx, axis=1)

    # static flatten: level-major, slot < quota_l (same order as the
    # chained path's per-level concat)
    sel = np.concatenate([lvl * kmax + np.arange(k)
                          for lvl, k in enumerate(ks)]).astype(np.int32)
    v_flat = jnp.take(tv.reshape(-1), jnp.asarray(sel))
    lin_w = jnp.take(tlin.reshape(-1), jnp.asarray(sel))
    px = lin_w % Wp
    py = lin_w // Wp
    base_v = np.concatenate([np.full(k, plan.bases[lvl], np.int32)
                             for lvl, k in enumerate(ks)])
    scale_v = np.concatenate([np.full(k, params.scale_factor ** lvl,
                                      np.float32)
                              for lvl, k in enumerate(ks)])
    oct_v = np.concatenate([np.full(k, lvl, np.int32)
                            for lvl, k in enumerate(ks)])
    x_loc = px - pl_
    y_loc_w = py - jnp.asarray(base_v) - cell
    sc = jnp.asarray(scale_v)
    outs = {
        "xy": jnp.stack([x_loc, y_loc_w], -1).astype(jnp.float32)
        * sc[:, None],
        "response": v_flat,
        "octave": jnp.asarray(oct_v),
        "size": jnp.asarray(PATCH_SIZE * scale_v.astype(np.float32)),
        "valid": v_flat > 0,
    }
    pxy = jnp.stack([px, py], -1).astype(jnp.int32)
    return outs, packed, pxy


def _gather_patches(img, xy_center, radius: int):
    """Gather (2r+1)^2 patches centered at integer xy. img [H, W].

    With the image padded by r, the patch around center (cx, cy) starts at
    padded[(cy, cx)] — no origin arithmetic or clamping needed.
    """
    r = radius
    padded = jnp.pad(img, r, mode="edge")

    def one(p):
        return jax.lax.dynamic_slice(padded, (p[1], p[0]),
                                     (2 * r + 1, 2 * r + 1))
    return jax.vmap(one)(xy_center)


def ic_angle(patches31):
    """Intensity-centroid orientation over the umax circle
    (FeatureDetectorORB.cpp:155-183). patches31: [N, 31, 31]."""
    m10 = jnp.sum(patches31 * jnp.asarray(_IC_U, patches31.dtype), (-2, -1))
    m01 = jnp.sum(patches31 * jnp.asarray(_IC_V, patches31.dtype), (-2, -1))
    return jnp.arctan2(m01, m10)


def _blur_patches(patches):
    """7-tap separable Gaussian (sigma 2) over gathered patches — the
    in-patch equivalent of the reference's pre-BRIEF level blur
    (FeatureDetectorORB.cpp:733-740). Valid wherever taps stay >=_BLUR_R
    from the patch border, which _GATHER_R guarantees for every BRIEF
    offset. patches: [N, G, G]. Runs in bf16 on TPU: the only consumer
    is BRIEF, which casts to bf16 anyway — blurring in bf16 halves the
    shift-and-add traffic without adding any new quantization stage."""
    if im._use_mxu_stencil():
        patches = patches.astype(jnp.bfloat16)
    taps = [float(v) for v in im.gaussian_kernel1d(2.0, _BLUR_R)]
    g = patches.shape[-1]
    xp = jnp.pad(patches, ((0, 0), (_BLUR_R, _BLUR_R), (0, 0)),
                 mode="edge")
    y = sum(w * jax.lax.slice_in_dim(xp, i, i + g, axis=1)
            for i, w in enumerate(taps))
    xp = jnp.pad(y, ((0, 0), (0, 0), (_BLUR_R, _BLUR_R)), mode="edge")
    return sum(w * jax.lax.slice_in_dim(xp, i, i + g, axis=2)
               for i, w in enumerate(taps))


def brief_descriptors(patches, angles, angle_bins: int = 0,
                      dot: bool = False):
    """Rotated 256-bit BRIEF (computeOrbDescriptor, :186-226).

    patches: [N, G, G] blurred-image patches (G = 2*_GATHER_R+1);
    angles: [N] radians. Returns [N, 256] uint8 in {0, 1}.

    angle_bins > 0 quantizes the rotation to that many steps and computes
    every tap via per-bin one-hot matmuls on the MXU — TPU gathers are
    scalar-core-bound (the continuous path costs ~7 ms/frame at N=1000 vs
    ~0.4 ms binned). The per-bin tap offsets use the REFERENCE'S exact
    round-rotated-offset formula at the bin's angle, so binned TAP
    LOCATIONS equal the continuous path's whenever the angle rounds to
    the same bin; tap VALUES pass through bf16 on the MXU, so a bit can
    flip when a tap pair sits within ~0.4% of each other — near-tie bits
    are descriptor noise either way (fp ordering flips them too).
    """
    if angle_bins:
        return _brief_binned(patches, angles, angle_bins, dot=dot)
    a = jnp.cos(angles)[:, None]
    b = jnp.sin(angles)[:, None]
    px1 = jnp.asarray(_PATTERN[:, 0], jnp.float32)[None]
    py1 = jnp.asarray(_PATTERN[:, 1], jnp.float32)[None]
    px2 = jnp.asarray(_PATTERN[:, 2], jnp.float32)[None]
    py2 = jnp.asarray(_PATTERN[:, 3], jnp.float32)[None]
    # x' = round(px*a - py*b), y' = round(px*b + py*a)
    x1 = jnp.round(px1 * a - py1 * b).astype(jnp.int32) + _GATHER_R
    y1 = jnp.round(px1 * b + py1 * a).astype(jnp.int32) + _GATHER_R
    x2 = jnp.round(px2 * a - py2 * b).astype(jnp.int32) + _GATHER_R
    y2 = jnp.round(px2 * b + py2 * a).astype(jnp.int32) + _GATHER_R
    flat = patches.reshape(patches.shape[0], -1)
    t1 = jnp.take_along_axis(flat, y1 * _GATHER + x1, axis=1)
    t2 = jnp.take_along_axis(flat, y2 * _GATHER + x2, axis=1)
    return (t1 < t2).astype(jnp.uint8)


# max rotated BRIEF tap offset: |pattern| <= 13*sqrt(2) rounds to <= 18
# (the _GATHER_R note above); taps of EVERY bin live in this extent
_TAP_R = 18
_TAP_E = 2 * _TAP_R + 1


@functools.lru_cache(maxsize=8)
def _binned_tap_indices(bins: int) -> np.ndarray:
    """[bins, 512] flat patch indices: the reference's rounded rotated
    pattern offsets evaluated at each bin's center angle."""
    out = np.zeros((bins, 512), np.int32)
    for bi in range(bins):
        th = 2.0 * np.pi * bi / bins
        a, b = np.cos(th), np.sin(th)
        px = np.concatenate([_PATTERN[:, 0], _PATTERN[:, 2]]).astype(
            np.float64)
        py = np.concatenate([_PATTERN[:, 1], _PATTERN[:, 3]]).astype(
            np.float64)
        x = np.round(px * a - py * b).astype(np.int32) + _GATHER_R
        y = np.round(px * b + py * a).astype(np.int32) + _GATHER_R
        out[bi] = y * _GATHER + x
    return out


@functools.lru_cache(maxsize=8)
def _binned_diff_matrix(bins: int) -> np.ndarray:
    """[_TAP_E^2, bins*256] +-1 tap-DIFFERENCE matrix: column (b*256 + j)
    holds +1 at pair j's first tap and -1 at its second, both rotated by
    bin b's center angle (the reference's exact round-rotated-offset
    formula, computeOrbDescriptor FeatureDetectorORB.cpp:186-226). One MXU
    dot of the patch against this matrix yields t1 - t2 for every
    (bin, pair) at once; the descriptor bit is its sign."""
    out = np.zeros((_TAP_E * _TAP_E, bins * 256), np.float32)
    cols = np.arange(256)
    for bi in range(bins):
        th = 2.0 * np.pi * bi / bins
        a, b = np.cos(th), np.sin(th)
        px = np.concatenate([_PATTERN[:, 0], _PATTERN[:, 2]]).astype(
            np.float64)
        py = np.concatenate([_PATTERN[:, 1], _PATTERN[:, 3]]).astype(
            np.float64)
        x = np.round(px * a - py * b).astype(np.int32) + _TAP_R
        y = np.round(px * b + py * a).astype(np.int32) + _TAP_R
        assert (x >= 0).all() and (x < _TAP_E).all() \
            and (y >= 0).all() and (y < _TAP_E).all()
        flat = y * _TAP_E + x
        np.add.at(out, (flat[:256], bi * 256 + cols), 1.0)
        np.add.at(out, (flat[256:], bi * 256 + cols), -1.0)
    return out


def _brief_binned_dot(patches, angles, bins: int):
    """One-dispatch binned BRIEF: slice the blurred patch to the +-_TAP_R
    tap extent, dot it against the static +-1 difference matrix covering
    every bin's 256 pairs, then keep each keypoint's own bin row.

    With f32 accumulation the sign of the dot equals the strict
    (t1 < t2) compare of the bf16 taps EXACTLY (each column has one +1
    and one -1, so the sum is the exact f32 difference of two bf16
    values; coincident rotated taps cancel to 0 -> bit 0, same as the
    strict compare). Replaces the per-bin [N, G^2]x[G^2, 512] matmul +
    select chain: ~2.7x fewer MXU flops (contraction 1849->1369, outputs
    512->256) in ONE matmul dispatch. Bit-equal to _brief_binned_select
    by tests/test_features.py; which one ships is decided by measuring
    both ON THE CHIP (OrbParams.brief_dot, seeded from PISLAM_BRIEF_DOT
    at params-construction time so each setting gets its own trace)."""
    n = patches.shape[0]
    d = _GATHER_R - _TAP_R
    p = patches[:, d:d + _TAP_E, d:d + _TAP_E]
    flat = p.reshape(n, _TAP_E * _TAP_E).astype(jnp.bfloat16)
    D = jnp.asarray(_binned_diff_matrix(bins), jnp.bfloat16)
    diff = jnp.dot(flat, D, preferred_element_type=jnp.float32)
    bits = (diff.reshape(n, bins, 256) < 0).astype(jnp.uint8)
    # bin by nearest center (angles already in [-pi, pi] from arctan2)
    bi = jnp.round(angles * (bins / (2.0 * jnp.pi))).astype(jnp.int32) % bins
    onehot = (bi[:, None] == jnp.arange(bins)[None, :]).astype(jnp.uint8)
    return jnp.sum(bits * onehot[:, :, None], axis=1, dtype=jnp.uint8)


def _brief_binned_select(patches, angles, bins: int):
    """Per-bin one-hot matmuls + select chain (the round-2 formulation —
    kept as the shipping default until the dot variant above proves out
    on hardware; the tunnel was down when it was written)."""
    n = patches.shape[0]
    g2 = _GATHER * _GATHER
    flat = patches.reshape(n, g2).astype(jnp.bfloat16)
    bi = jnp.round(angles * (bins / (2.0 * jnp.pi))).astype(jnp.int32) % bins
    taps_idx = _binned_tap_indices(bins)                 # static [bins, 512]
    cols = jax.lax.broadcasted_iota(jnp.int32, (g2, 512), 0)
    # accumulate in bf16: tap values are raw image intensities that the
    # comparison below already treats as bf16-grade
    acc = jnp.zeros((n, 512), jnp.bfloat16)
    for b in range(bins):
        onehot = (cols == jnp.asarray(taps_idx[b])[None, :]).astype(
            jnp.bfloat16)
        taps = jnp.dot(flat, onehot, preferred_element_type=jnp.bfloat16)
        acc = jnp.where((bi == b)[:, None], taps, acc)
    return (acc[:, :256] < acc[:, 256:]).astype(jnp.uint8)


def _brief_binned(patches, angles, bins: int, dot: bool = False):
    if dot:
        return _brief_binned_dot(patches, angles, bins)
    return _brief_binned_select(patches, angles, bins)


def pack_bits(desc_bits):
    """[N, 256] {0,1} -> [N, 32] uint8, reference byte/bit order
    (bit j of byte i is pattern pair 8*i+j)."""
    n = desc_bits.shape[0]
    b = desc_bits.reshape(n, 32, 8).astype(jnp.uint8)
    weights = (2 ** jnp.arange(8, dtype=jnp.uint32)).astype(jnp.uint8)
    return jnp.sum(b * weights[None, None, :], -1, dtype=jnp.uint8)


def unpack_bits(desc_bytes):
    n = desc_bytes.shape[0]
    bits = (desc_bytes[..., None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
    return bits.reshape(n, 256).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("params",))
def orb_detect(img, params: OrbParams = OrbParams()):
    """Full extractor. img: [H, W] grayscale float32 (0..255).

    Returns dict with static shapes N = params.n_features:
      xy [N, 2] float32 level-0 pixel coords; response [N]; angle [N] rad;
      octave [N] int32; size [N] (PATCH_SIZE * level scale);
      desc [N, 256] uint8 bit-planes; valid [N] bool.
    """
    img = img.astype(jnp.float32)
    H, W = img.shape
    quotas = params.features_per_level()
    r = _GATHER_R
    outs = {k: [] for k in ("xy", "response", "octave", "size", "valid")}
    blocks, block_xy, row_off = [], [], 0
    wmax = W + 2 * r
    # build the pyramid first so selection can run as ONE fused Pallas
    # call over the packed level stack (per-pallas_call overhead on this
    # box is ~0.35 ms — 8 per-level calls would cost more than the op).
    # On TPU the resize chain + edge-pad + packing all happen inside ONE
    # pyramid kernel; level views are cheap slices of its output.
    pyr_plan = None
    flat_plan = None
    if im.use_tpu_pallas() and _flat_gate():
        from . import flatpyr_pallas as fpp
        if fpp.flat_pyramid_available(H, W, params.n_levels,
                                      params.scale_factor, params.cell):
            # parallel flat-pyramid kernel: every level from level 0 via
            # composed matrices, one program launch (vs the 8-step
            # serial chain below). Level views slice at lane-tile
            # boundaries (pad_left=128) — no relayout copies.
            pyr_packed = fpp.build_flat_pyramid(
                img, params.n_levels, params.scale_factor, params.cell)
            flat_plan = _flat_plan(H, W, params.n_levels,
                                   params.scale_factor, params.cell)
    if flat_plan is None and im.use_tpu_pallas() and _extract_kernels_on():
        from . import pyramid_pallas as pp
        if pp.pyramid_available(H, W, params.n_levels,
                                params.scale_factor, r):
            pyr_packed = pp.build_packed_pyramid(
                img, params.n_levels, params.scale_factor, r)
            pyr_plan = pp.pyramid_plan(H, W, params.n_levels,
                                       params.scale_factor, r)
    if flat_plan is not None:
        cl, pl_ = flat_plan.cell, flat_plan.pad_left
        level_imgs = [
            jax.lax.slice(pyr_packed, (b + cl, pl_),
                          (b + cl + lh, pl_ + lw))
            for b, (lh, lw) in zip(flat_plan.bases, flat_plan.shapes)]
    elif pyr_plan is not None:
        level_imgs = [
            jax.lax.slice(pyr_packed, (b + r, r), (b + r + lh, r + lw))
            for b, (lh, lw) in zip(pyr_plan.bases, pyr_plan.shapes)]
    else:
        # on TPU the resize chain runs in bf16 (one MXU pass per banded
        # contraction instead of fp32's three): ~0.5 gray of accumulated
        # quantization over 8 levels, under the FAST min-threshold of 7
        # and the same near-tie descriptor-bit noise the binned-BRIEF
        # path already accepts. Levels cast back to f32 for the packed
        # patch buffer (the Pallas gather kernel is f32).
        chain_dt = jnp.bfloat16 if im._use_mxu_stencil() else jnp.float32
        level_imgs = [img]                 # level 0 stays exact f32
        level_img = img.astype(chain_dt)
        for lvl in range(1, params.n_levels):
            scale = params.scale_factor ** lvl
            lh = max(1, int(round(H / scale)))
            lw = max(1, int(round(W / scale)))
            level_img = im.resize_bilinear(level_img[..., None],
                                           (lh, lw))[..., 0]
            level_imgs.append(level_img.astype(jnp.float32))
    # fused FAST+NMS+select needs every level on the top-1-per-cell path
    # (true at production sizes; tiny test images fall back to XLA)
    fused_ok = (im.use_tpu_pallas() and _extract_kernels_on()
                and params.cell % 8 == 0
                and all(_per_cell_quota(li.shape, max(q, 1), params.cell) == 1
                        for li, q in zip(level_imgs, quotas)))
    if fused_ok:
        from .fastselect import fast_cell_winners
        # fast_cell_winners re-packs the level views into its own
        # cell-aligned stack (~10 us of HBM copies at 1080p) — teaching
        # its plan to read pyr_packed's layout directly would save that,
        # at the cost of coupling the two kernels' layouts
        winners = fast_cell_winners(level_imgs, params.cell,
                                    params.min_threshold, EDGE_THRESHOLD)
    for lvl in range(params.n_levels):
        scale = params.scale_factor ** lvl
        level_img = level_imgs[lvl]
        k = max(quotas[lvl], 1)
        if fused_ok:
            cv2d, ci2d = winners[lvl]
            wp = ci2d.shape[1] * params.cell
            xy, resp, valid = _topk_flat(cv2d.reshape(-1),
                                         (ci2d // wp).reshape(-1),
                                         (ci2d % wp).reshape(-1), k)
        else:
            score = fast_score_map(level_img)
            xy, resp, valid = select_keypoints(score, k, params.cell,
                                               params.min_threshold)
        # edge-pad the RAW level by the gather radius and append to the
        # PACKED pyramid: one tall [sum(lh+2r), W+2r] image lets a single
        # Pallas DMA kernel gather every level's patches in one call
        # (per-call overhead ~0.35 ms would otherwise repeat 8x). IC-angle
        # reads the raw 31x31 center; BRIEF's blurred taps come from
        # blurring the gathered patch itself (see _GATHER_R note above).
        # With the pyramid kernel the packed buffer already exists — only
        # the per-level center offsets are needed.
        if flat_plan is not None:
            # flat layout: level pixel (x, y) sits at packed
            # (x + pad_left, bases[lvl] + cell + y)
            block_xy.append(xy + jnp.asarray(
                [[flat_plan.pad_left, flat_plan.bases[lvl]
                  + flat_plan.cell]], jnp.int32))
        else:
            if pyr_plan is not None:
                row_off = pyr_plan.bases[lvl]
            else:
                blk = jnp.pad(level_img, ((r, r), (r, r)), mode="edge")
                blk = jnp.pad(blk, ((0, 0), (0, wmax - blk.shape[1])))
                blocks.append(blk)
            # packed-image centers: +r for the block's own edge pad (the
            # gather treats centers as origins into an r-padded image)
            block_xy.append(xy + jnp.asarray([[r, row_off + r]],
                                             jnp.int32))
            if pyr_plan is None:
                row_off += blk.shape[0]
        outs["xy"].append(xy.astype(jnp.float32) * scale)
        outs["response"].append(resp)
        outs["octave"].append(jnp.full((k,), lvl, jnp.int32))
        outs["size"].append(jnp.full((k,), PATCH_SIZE * scale, jnp.float32))
        outs["valid"].append(valid)
    feats = {kk: jnp.concatenate(v, 0) for kk, v in outs.items()}
    packed = pyr_packed if (pyr_plan is not None or flat_plan is not None) \
        else jnp.concatenate(blocks, 0)
    pxy = jnp.concatenate(block_xy, 0)
    return _descriptor_tail(feats, packed, pxy, params)


@functools.partial(jax.jit, static_argnames=("params",))
def orb_detect_batch(imgs, params: OrbParams = OrbParams()):
    """Batched extractor: imgs [B, H, W] -> dict of [B, N, ...] arrays.

    The per-frame work is independent, so B frames ride through the SAME
    ops with B* the data — one flat-pyramid kernel launch, one score/
    select chain per level (frames stacked along rows), one batched
    top-k per level, one patch gather, one BRIEF — dividing the fixed
    per-op cost per frame by B. Semantics per frame match orb_detect's
    flat path (winner ties can resolve to a different same-score pixel:
    the stacked winner picks min-lane-then-min-row, the chained path
    min-row-then-min-lane; scores tie across pixels only in degenerate
    synthetic images). Falls back to a per-frame loop off-TPU."""
    imgs = imgs.astype(jnp.float32)
    B, H, W = imgs.shape
    quotas = params.features_per_level()
    plan = _flat_plan(H, W, params.n_levels, params.scale_factor,
                      params.cell)
    flat_ok = False
    if plan is not None and im.use_tpu_pallas() and _flat_gate():
        from . import flatpyr_pallas as fpp
        flat_ok = (fpp.flat_pyramid_available(
            H, W, params.n_levels, params.scale_factor, params.cell)
            and _flat_feasible(H, W, params, quotas))
    if not flat_ok:
        outs = [orb_detect(imgs[b], params) for b in range(B)]
        return {k: jnp.stack([o[k] for o in outs]) for k in outs[0]}

    from . import flatpyr_pallas as fpp
    packed = fpp.build_flat_pyramid(imgs, params.n_levels,
                                    params.scale_factor, params.cell)
    cell, pl_ = plan.cell, plan.pad_left
    R = plan.total_rows
    b_ = EDGE_THRESHOLD
    ks = [max(q, 1) for q in quotas]
    per = {k: [] for k in ("xy", "response", "octave", "size", "valid",
                           "px", "py")}
    for lvl, (lh, lw) in enumerate(plan.shapes):
        nry, ncx = -(-lh // cell), -(-lw // cell)
        RL, LW = nry * cell, ncx * cell
        base = plan.bases[lvl]
        views = [jax.lax.slice(packed,
                               (f * R + base + cell, pl_),
                               (f * R + base + cell + RL, pl_ + LW))
                 for f in range(B)]
        st = jnp.concatenate(views, 0)           # [B*RL, LW]
        score = fast_score_map(st)
        rows_i = jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
        lanes_i = jax.lax.broadcasted_iota(jnp.int32, st.shape, 1)
        y_loc = rows_i % RL
        ok = ((y_loc >= b_) & (y_loc < lh - b_)
              & (lanes_i >= b_) & (lanes_i < lw - b_))
        s = jnp.where(ok & (score > params.min_threshold), score, 0.0)
        s = _nms3(s)
        # hierarchical per-cell winner: rows first (layout-friendly
        # row-split reshape on the big array), lanes on the small result
        rs = s.reshape(B * nry, cell, LW)
        rowmax = jnp.max(rs, axis=1)             # [B*nry, LW]
        ri = jax.lax.broadcasted_iota(jnp.int32, rs.shape, 1)
        rowarg = jnp.min(jnp.where(rs == rowmax[:, None, :], ri,
                                   jnp.int32(cell)), axis=1)
        rm2 = rowmax.reshape(B * nry, ncx, cell)
        cv = jnp.max(rm2, axis=2)                # [B*nry, ncx]
        li = jax.lax.broadcasted_iota(jnp.int32, rm2.shape, 2)
        lane_loc = jnp.min(jnp.where(rm2 == cv[:, :, None], li,
                                     jnp.int32(cell)), axis=2)
        lane_loc = jnp.minimum(lane_loc, cell - 1)
        row_loc = jnp.take_along_axis(
            rowarg.reshape(B * nry, ncx, cell),
            lane_loc[:, :, None], axis=2)[:, :, 0]
        row_loc = jnp.minimum(row_loc, cell - 1)
        # batched per-level top-k
        k = ks[lvl]
        cvb = cv.reshape(B, nry * ncx)
        tv, tidx = jax.lax.top_k(cvb, k)         # [B, k]
        cells_row = tidx // ncx                  # cell row index
        cells_col = tidx % ncx
        flat_lane = jnp.take_along_axis(
            lane_loc.reshape(B, nry * ncx), tidx, axis=1)
        flat_row = jnp.take_along_axis(
            row_loc.reshape(B, nry * ncx), tidx, axis=1)
        x_l = cells_col * cell + flat_lane       # level-local coords
        y_l = cells_row * cell + flat_row
        scale = params.scale_factor ** lvl
        per["xy"].append(jnp.stack([x_l, y_l], -1).astype(jnp.float32)
                         * scale)
        per["response"].append(tv)
        per["octave"].append(jnp.full((B, k), lvl, jnp.int32))
        per["size"].append(jnp.full((B, k), PATCH_SIZE * scale,
                                    jnp.float32))
        per["valid"].append(tv > 0)
        per["px"].append(x_l + pl_)
        fid = jax.lax.broadcasted_iota(jnp.int32, (B, k), 0)
        per["py"].append(y_l + fid * R + base + cell)
    feats = {k: jnp.concatenate(v, 1)
             for k, v in per.items() if k not in ("px", "py")}
    pxy = jnp.stack([jnp.concatenate(per["px"], 1),
                     jnp.concatenate(per["py"], 1)], -1)  # [B, N0, 2]
    N0 = pxy.shape[1]
    r = _GATHER_R
    from .patchgather import gather_patches_pallas
    pat = gather_patches_pallas(packed, pxy.reshape(B * N0, 2), r)
    d = r - HALF_PATCH
    angle = ic_angle(pat[:, d:d + PATCH_SIZE, d:d + PATCH_SIZE])
    desc = brief_descriptors(_blur_patches(pat), angle,
                             params.angle_bins, dot=params.brief_dot)
    feats["angle"] = angle.reshape(B, N0)
    feats["desc"] = desc.reshape(B, N0, 256)
    order = jnp.argsort(jnp.where(feats["valid"], -feats["response"],
                                  jnp.inf), axis=1)
    keep = order[:, :params.n_features]
    out = {}
    for k, v in feats.items():
        idx = keep.reshape(B, -1, *([1] * (v.ndim - 2)))
        out[k] = jnp.take_along_axis(v, jnp.broadcast_to(
            idx, (B, params.n_features) + v.shape[2:]), axis=1)
    return out


def _descriptor_tail(feats, packed, pxy, params: OrbParams):
    """Shared back end: patch gather over the packed pyramid, IC-angle,
    blur + BRIEF, strongest-first truncation to n_features."""
    r = _GATHER_R
    if im.use_tpu_pallas():
        from .patchgather import gather_patches_pallas
        pat = gather_patches_pallas(packed, pxy, r)     # [N, G, G]
    else:
        padded = jnp.pad(packed, r, mode="edge")

        def one(p):
            return jax.lax.dynamic_slice(padded, (p[1], p[0]),
                                         (_GATHER, _GATHER))
        pat = jax.vmap(one)(pxy)
    d = r - HALF_PATCH
    feats["angle"] = ic_angle(pat[:, d:d + PATCH_SIZE,
                                  d:d + PATCH_SIZE])
    # BRIEF once over ALL levels' patches: the binned path runs its
    # angle_bins one-hot matmuls on one [~N, G^2] operand instead of
    # 8 small per-level batches (8x fewer MXU dispatches)
    feats["desc"] = brief_descriptors(_blur_patches(pat), feats["angle"],
                                      params.angle_bins,
                                      dot=params.brief_dot)
    # truncate/pad to exactly n_features, strongest first
    order = jnp.argsort(jnp.where(feats["valid"], -feats["response"], jnp.inf))
    keep = order[:params.n_features]
    return {kk: v[keep] for kk, v in feats.items()}
