"""SIFT feature extraction as fixed-shape XLA array programs.

TPU-native re-design of the vendored SiftGPU
(GSLAM-DIYSLAM/src/zhaoyong/SiftGPU/ProgramCU.cu — DoG pyramid, keypoint
detection, orientation, descriptor — and its wrapper
FeatureDetectorSiftGPU.cpp: 128-float descriptors + (x, y, scale,
orientation) keypoints). The RootSIFT post-process the reference applies in
DIYSLAM.cpp:286-338 is available via `root_sift`.

Re-design notes (vs the CUDA original):
  * Gaussian/DoG pyramids are dense separable-conv chains per octave
    (static shapes per octave, Python-unrolled at trace time).
  * Scale-space extrema: 3x3x3 min/max test + contrast and Hessian edge
    rejection evaluated densely, then per-octave top-k selection into the
    padded keypoint budget.
  * Orientation & descriptor follow the GPU-SIFT pattern: a fixed grid of
    rotated, sigma-scaled sample positions bilinearly reads the octave's
    gradient maps; histograms accumulate with soft binning. This replaces
    the CPU's per-pixel loops with dense [K, S] gathers + one-hot matmuls.

Outputs mirror ops.features.orb.orb_detect: a dict of padded arrays with
`desc` as [N, 128] float32 (L2-normalized), plus `valid`.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import image as im


@dataclasses.dataclass(frozen=True)
class SiftParams:
    n_features: int = 1000
    n_octaves: int = 4
    scales_per_octave: int = 3          # "S": 3 DoG scales are searched
    sigma0: float = 1.6
    contrast_threshold: float = 0.02
    edge_threshold: float = 10.0
    ori_bins: int = 36
    desc_grid: int = 4                  # 4x4 spatial bins
    desc_ori_bins: int = 8


def _gradients(img):
    """Central-difference gradient maps (dx, dy)."""
    dy = 0.5 * (jnp.roll(img, -1, 0) - jnp.roll(img, 1, 0))
    dx = 0.5 * (jnp.roll(img, -1, 1) - jnp.roll(img, 1, 1))
    return dx, dy


def _chain_sigmas(params: SiftParams):
    S = params.scales_per_octave
    k = 2.0 ** (1.0 / S)
    out = []
    sigma_prev = params.sigma0
    for i in range(1, S + 3):
        sigma_total = params.sigma0 * k ** i
        out.append(float(np.sqrt(max(sigma_total ** 2 - sigma_prev ** 2,
                                     1e-6))))
        sigma_prev = sigma_total
    return out


@functools.lru_cache(maxsize=32)
def _stack_matrices(h: int, w: int, params: SiftParams):
    """Composed chain-blur operators per scale: M_i = B_i @ ... @ B_1 in
    float64 — EXACTLY the chained discrete blurs, as one matrix per axis
    per scale (no incremental-vs-direct sigma convention change). Returns
    (mhs, mws) or None when a band doesn't stay narrow."""
    from .. import stencil_pallas as sp
    mhs, mws = [], []
    mh = np.eye(h, dtype=np.float64)
    mw = np.eye(w, dtype=np.float64)
    for s in _chain_sigmas(params):
        taps = tuple(float(v) for v in im.gaussian_kernel1d(s))
        mh = np.asarray(im._blur_matrix(h, taps, "reflect"),
                        np.float64) @ mh
        mw = np.asarray(im._blur_matrix(w, taps, "reflect"),
                        np.float64) @ mw
        mhs.append(mh.astype(np.float32))
        mws.append(mw.astype(np.float32))
    if not sp.stack_fusable(mhs, mws):
        return None
    return tuple(mhs), tuple(mws)


def _octave_stack(img, params: SiftParams):
    """[S+3, H, W] Gaussian stack for one octave.

    On TPU (stencil kernel enabled) the whole stack is ONE Pallas call
    over composed chain matrices — the XLA chain re-reads and re-writes
    the full octave once per scale (S+2 sequential banded ops)."""
    h, w = int(img.shape[0]), int(img.shape[1])
    if im._use_pallas_stack() and min(h, w) >= 2 * 128:
        mats = _stack_matrices(h, w, params)
        if mats is not None:
            from .. import stencil_pallas as sp
            outs = sp.banded_stack_pallas(img, mats[0], mats[1],
                                          cache_key=(h, w, params))
            return jnp.concatenate([img[None], outs], 0)
    imgs = [img]
    for s in _chain_sigmas(params):
        imgs.append(im.gaussian_blur(imgs[-1][..., None], s)[..., 0])
    return jnp.stack(imgs)


def _extrema_response(dog, params: SiftParams):
    """Dense keypoint response per searched scale: |DoG| where the pixel is
    a 3x3x3 extremum passing contrast + edge tests; 0 elsewhere.
    dog: [S+2, H, W] -> [S, H, W]."""
    S = params.scales_per_octave
    H, W = dog.shape[1:]
    # 3x3 spatial max/min of every level ONCE via reduce_window (adjacent
    # scales contribute their full 3x3 incl. center); the same-level ring
    # (8 neighbors, center excluded) via shifted pairwise trees — replaces
    # 26 rolls + a 26-plane stack per searched scale
    m3 = [jax.lax.reduce_window(dog[i], -jnp.inf, jax.lax.max,
                                (3, 3), (1, 1), "SAME")
          for i in range(S + 2)]
    n3 = [jax.lax.reduce_window(dog[i], jnp.inf, jax.lax.min,
                                (3, 3), (1, 1), "SAME")
          for i in range(S + 2)]

    def ring8(img):
        shifts = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1),
                  (1, -1), (1, 0), (1, 1)]
        rmax = rmin = None
        for dy, dx in shifts:
            t = jnp.roll(img, (dy, dx), (0, 1))
            rmax = t if rmax is None else jnp.maximum(rmax, t)
            rmin = t if rmin is None else jnp.minimum(rmin, t)
        return rmax, rmin

    resp = []
    for s in range(1, S + 1):
        c = dog[s]
        r8max, r8min = ring8(c)
        nmax = jnp.maximum(jnp.maximum(m3[s - 1], m3[s + 1]), r8max)
        nmin = jnp.minimum(jnp.minimum(n3[s - 1], n3[s + 1]), r8min)
        is_max = c > nmax
        is_min = c < nmin
        contrast = jnp.abs(c) > params.contrast_threshold
        # 2x2 spatial Hessian edge test (Lowe): tr^2/det < (r+1)^2/r
        dxx = jnp.roll(c, -1, 1) + jnp.roll(c, 1, 1) - 2 * c
        dyy = jnp.roll(c, -1, 0) + jnp.roll(c, 1, 0) - 2 * c
        dxy = 0.25 * (jnp.roll(c, (-1, -1), (0, 1))
                      + jnp.roll(c, (1, 1), (0, 1))
                      - jnp.roll(c, (-1, 1), (0, 1))
                      - jnp.roll(c, (1, -1), (0, 1)))
        tr = dxx + dyy
        det = dxx * dyy - dxy * dxy
        r = params.edge_threshold
        edge_ok = (det > 0) & (tr * tr * r < (r + 1) ** 2 * det)
        ys = jnp.arange(H)[:, None]
        xs = jnp.arange(W)[None, :]
        border = (ys >= 5) & (ys < H - 5) & (xs >= 5) & (xs < W - 5)
        ok = (is_max | is_min) & contrast & edge_ok & border
        resp.append(jnp.where(ok, jnp.abs(c), 0.0))
    return jnp.stack(resp)


def _select_topk(resp, k: int, cell: int = 64):
    """resp [S, H, W] -> (s, y, x, value) of the k strongest responses.

    Two-stage: per-cell top-k over `cell`-px tiles of each scale map, then
    a global top-k over the surviving candidates. A single lax.top_k over
    the flat [S*H*W] response is a full sort of ~6M elements (~14 ms/frame
    measured at 1080p); the extrema response is sparse enough that per-cell
    winners lose nothing."""
    S, H, W = resp.shape
    ncy, ncx = -(-H // cell), -(-W // cell)
    pad_h, pad_w = ncy * cell - H, ncx * cell - W
    sp = jnp.pad(resp, ((0, 0), (0, pad_h), (0, pad_w)))
    per_cell = max(1, min(cell * cell,
                          int(np.ceil(2.0 * k / (ncy * ncx)))))
    if per_cell == 1:
        # top-1 per cell per scale: reduce_window max + min over
        # position-encoded ties — no cell reshape-transpose relayout,
        # no per-row sort (see orb.select_keypoints)
        Wp = sp.shape[2]
        cv = jax.lax.reduce_window(sp, -jnp.inf, jax.lax.max,
                                   (1, cell, cell), (1, cell, cell),
                                   "VALID")                 # [S, ncy, ncx]
        up = jnp.broadcast_to(cv[:, :, None, :, None],
                              (S, ncy, cell, ncx, cell)).reshape(sp.shape)
        lin = (jax.lax.broadcasted_iota(jnp.int32, sp.shape, 1) * Wp
               + jax.lax.broadcasted_iota(jnp.int32, sp.shape, 2))
        big = jnp.int32(ncy * cell * Wp)
        ci = jax.lax.reduce_window(jnp.where(sp == up, lin, big), big,
                                   jax.lax.min, (1, cell, cell),
                                   (1, cell, cell), "VALID")
        flat_v = cv.reshape(-1)
        scales = jnp.broadcast_to(
            jnp.arange(S, dtype=jnp.int32)[:, None, None],
            cv.shape).reshape(-1)
        flat_y = (ci // Wp).reshape(-1)
        flat_x = (ci % Wp).reshape(-1)
        v, idx = jax.lax.top_k(flat_v, min(k, flat_v.shape[0]))
        s = scales[idx]
        y = flat_y[idx]
        x = flat_x[idx]
    else:
        cells = sp.reshape(S, ncy, cell, ncx, cell).transpose(
            0, 1, 3, 2, 4)
        cells = cells.reshape(S * ncy * ncx, cell * cell)
        cv, ci = jax.lax.top_k(cells, per_cell)   # [S*ncells, per_cell]
        cidx = jnp.arange(S * ncy * ncx)
        s_c = (cidx // (ncy * ncx))[:, None]
        cy_c = ((cidx % (ncy * ncx)) // ncx)[:, None]
        cx_c = ((cidx % (ncy * ncx)) % ncx)[:, None]
        gy = cy_c * cell + ci // cell
        gx = cx_c * cell + ci % cell
        flat_v = cv.reshape(-1)
        v, idx = jax.lax.top_k(flat_v, min(k, flat_v.shape[0]))
        s = jnp.broadcast_to(s_c, gy.shape).reshape(-1)[idx]
        y = gy.reshape(-1)[idx]
        x = gx.reshape(-1)[idx]
    if v.shape[0] < k:
        pad = k - v.shape[0]
        v = jnp.pad(v, (0, pad))
        s = jnp.pad(s, (0, pad))
        y = jnp.pad(y, (0, pad))
        x = jnp.pad(x, (0, pad))
    return s, y, x, v


def _sample_grid(dx, dy, cx, cy, angle, sigma, n: int, radius_sigmas: float,
                 bounds=None):
    """Bilinearly sample gradient maps on an n x n rotated grid around each
    keypoint. Returns (gx, gy, u, v): [K, n*n] samples + grid coords in
    rotated keypoint frame (units of the grid half-extent).

    bounds: optional (x_hi, y_lo, y_hi) [K] arrays bounding each
    keypoint's OWN image region inside a packed multi-octave gradient
    image (see sift_detect: all octaves' orientation/descriptor sampling
    rides ONE Pallas call instead of one per octave — per-call overhead
    is ~0.35 ms on this chip). Samples outside the bounds are masked;
    the inter-octave margin rows are zero so slab DMAs never read
    another octave's pixels as in-bounds data."""
    K = cx.shape[0]
    lin = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n * 2.0 - 1.0  # (-1, 1)
    gu, gv = jnp.meshgrid(lin, lin, indexing="xy")
    gu = gu.reshape(-1)[None, :]            # [1, n*n]
    gv = gv.reshape(-1)[None, :]
    rad = (radius_sigmas * sigma)[:, None]  # [K, 1]
    ca = jnp.cos(angle)[:, None]
    sa = jnp.sin(angle)[:, None]
    # rotate grid into image coords
    px = cx[:, None] + rad * (ca * gu - sa * gv)
    py = cy[:, None] + rad * (sa * gu + ca * gv)
    grad = jnp.stack([dx, dy], -1)          # [H, W, 2]
    H, W = dx.shape
    if bounds is not None:
        x_hi, y_lo, y_hi = bounds
        bvalid = ((px >= 0) & (px <= x_hi[:, None])
                  & (py >= y_lo[:, None]) & (py <= y_hi[:, None]))
    else:
        bvalid = ((px >= 0) & (px <= W - 1) & (py >= 0) & (py <= H - 1))
    if im.use_tpu_pallas():
        # Pallas slab sampler: the scattered rotated grids are ~32 ms of
        # scalar-core gathers per frame via XLA; see patchgather.
        # R=16 covers max |offset| = 4.5 * sigma_max(3.2) (+1 bilinear).
        from .patchgather import bilinear_grid_pallas
        centers = jnp.stack([cx, cy], -1).astype(jnp.int32)
        rel = jnp.stack([px - centers[:, 0:1].astype(jnp.float32),
                         py - centers[:, 1:2].astype(jnp.float32)], 1)
        vals = bilinear_grid_pallas(grad, centers, rel, radius=16)
        valid = bvalid
    else:
        xy = jnp.stack([px, py], -1)        # [K, n*n, 2]
        vals, valid = im.bilinear_sample(grad, xy)
        valid = valid & bvalid
    return vals[..., 0], vals[..., 1], gu, gv, valid


def _orientations(dx, dy, cx, cy, sigma, params: SiftParams, bounds=None):
    """Dominant gradient orientation per keypoint (36-bin histogram,
    Gaussian weighted, parabolic peak refinement)."""
    n = 16
    gx, gy, gu, gv, valid = _sample_grid(dx, dy, cx, cy,
                                         jnp.zeros_like(cx), sigma, n, 4.5,
                                         bounds=bounds)
    mag = jnp.hypot(gx, gy) * valid
    w = jnp.exp(-(gu ** 2 + gv ** 2) * 2.0)     # sigma = 0.5 of window
    theta = jnp.arctan2(gy, gx)
    B = params.ori_bins
    b = jnp.mod(theta / (2 * jnp.pi) * B, B)
    b0 = jnp.floor(b)
    fb = b - b0
    b0 = b0.astype(jnp.int32) % B
    b1 = (b0 + 1) % B
    # soft one-hot contraction instead of scatter-add (TPU scatters run
    # on the scalar core; the one-hot product reduces on the VPU)
    bins = jnp.arange(B, dtype=jnp.int32)
    soft = ((b0[..., None] == bins) * (1 - fb)[..., None]
            + (b1[..., None] == bins) * fb[..., None])      # [K, M, B]
    hist = jnp.einsum("km,kmb->kb", mag * w, soft)
    # smooth the circular histogram twice
    for _ in range(2):
        hist = (jnp.roll(hist, 1, -1) + hist + jnp.roll(hist, -1, -1)) / 3.0
    peak = jnp.argmax(hist, -1)
    hp = jnp.take_along_axis(hist, peak[:, None], -1)[:, 0]
    hl = jnp.take_along_axis(hist, ((peak - 1) % B)[:, None], -1)[:, 0]
    hr = jnp.take_along_axis(hist, ((peak + 1) % B)[:, None], -1)[:, 0]
    denom = hl - 2 * hp + hr
    off = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (hl - hr) / denom, 0.0)
    return (peak + off) * (2 * jnp.pi / B)


def _descriptors(dx, dy, cx, cy, angle, sigma, params: SiftParams,
                 bounds=None):
    """128-d descriptors from a 16x16 rotated sample grid with soft 4x4x8
    binning (one-hot matmul accumulation — MXU-friendly)."""
    n = 16
    G = params.desc_grid
    OB = params.desc_ori_bins
    gx, gy, gu, gv, valid = _sample_grid(dx, dy, cx, cy, angle, sigma, n,
                                         1.5 * G / 2.0, bounds=bounds)
    mag = jnp.hypot(gx, gy) * valid
    w = jnp.exp(-(gu ** 2 + gv ** 2) * 1.0)
    theta = jnp.arctan2(gy, gx) - angle[:, None]
    # spatial soft bins: map (-1, 1) -> (0, G)
    ub = (gu + 1.0) * 0.5 * G - 0.5
    vb = (gv + 1.0) * 0.5 * G - 0.5
    ob = jnp.mod(theta / (2 * jnp.pi) * OB, OB)

    def soft(coord, size, wrap):
        c0 = jnp.floor(coord)
        f = coord - c0
        c0i = c0.astype(jnp.int32)
        if wrap:
            return (c0i % size, (c0i + 1) % size, 1 - f, f)
        ok0 = (c0i >= 0) & (c0i < size)
        ok1 = (c0i + 1 >= 0) & (c0i + 1 < size)
        return (jnp.clip(c0i, 0, size - 1), jnp.clip(c0i + 1, 0, size - 1),
                (1 - f) * ok0, f * ok1)

    u0, u1, wu0, wu1 = soft(ub, G, False)
    v0, v1, wv0, wv1 = soft(vb, G, False)
    o0, o1, wo0, wo1 = soft(ob, OB, True)
    K = cx.shape[0]
    base = mag * w
    # trilinear soft binning as SEPARABLE one-hot weights contracted in
    # one einsum — the 8 scatter-add tap combinations run on the TPU's
    # scalar core (~25 ms/frame); this is pure VPU multiply-reduce
    gbins = jnp.arange(G, dtype=jnp.int32)
    obins = jnp.arange(OB, dtype=jnp.int32)
    su = ((u0[..., None] == gbins) * wu0[..., None]
          + (u1[..., None] == gbins) * wu1[..., None])      # [K, M, G]
    sv = ((v0[..., None] == gbins) * wv0[..., None]
          + (v1[..., None] == gbins) * wv1[..., None])
    so = ((o0[..., None] == obins) * wo0[..., None]
          + (o1[..., None] == obins) * wo1[..., None])      # [K, M, OB]
    desc = jnp.einsum("km,kmu,kmv,kmo->kvuo", base, su, sv, so)
    desc = desc.reshape(K, G * G * OB)
    # normalize, clip at 0.2, renormalize (Lowe)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True),
                              1e-9)
    desc = jnp.minimum(desc, 0.2)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True),
                              1e-9)
    return desc


@functools.partial(jax.jit, static_argnames=("params",))
def sift_detect(img, params: SiftParams = SiftParams()):
    """Full extractor. img: [H, W] grayscale float32 (0..255).

    Returns dict (padded to n_features): xy [N, 2] full-res pixels,
    response, angle (rad), octave, size (sigma in full-res pixels),
    desc [N, 128] float32, valid [N]."""
    img = img.astype(jnp.float32) / 255.0
    H, W = img.shape
    S = params.scales_per_octave
    k = 2.0 ** (1.0 / S)
    n_oct = min(params.n_octaves,
                int(np.log2(max(min(H, W) / 16.0, 2.0))))
    # per-octave quotas, strongest octaves (finest) get the most
    quotas = []
    rem = params.n_features
    for o in range(n_oct):
        q = max(16, int(round(params.n_features * 0.5 ** o * 0.55)))
        q = min(q, rem)
        quotas.append(q)
        rem -= q
    quotas[0] += rem

    base = im.gaussian_blur(img[..., None],
                            float(np.sqrt(max(params.sigma0 ** 2 - 0.25,
                                              0.01))))[..., 0]
    outs = {kk: [] for kk in ("xy", "response", "octave", "size", "valid")}
    # orientation/descriptor sampling is DEFERRED: every octave's
    # keypoints sample ONE packed gradient image in ONE Pallas call per
    # stage instead of one per octave per stage. Measured on-chip this
    # is a WASH vs per-octave calls (9.68 vs 9.65 ms/frame whole-detect
    # — the per-call overhead hypothesis did not hold); kept because the
    # single-batch form also serves batched/vmapped callers with one
    # program and no per-octave shape set.
    # > the sampler's worst-case slab reach below a center: slab height
    # WH=48 with origin ya = align8(cy - R), so dy0 = cy - ya is in
    # [16, 23] and the reach below the keypoint is WH-1-dy0 <= 31 rows
    # (patchgather.bilinear_grid_pallas geometry). 48 leaves headroom
    # for a future radius bump instead of clearing 31 by one row.
    MARGIN = 48
    grads_dx, grads_dy, row = [], [], 0
    cx_all, cy_all, sig_all = [], [], []
    xhi_all, ylo_all, yhi_all = [], [], []
    oct_img = base
    for o in range(n_oct):
        stack = _octave_stack(oct_img, params)         # [S+3, h, w]
        dog = stack[1:] - stack[:-1]                   # [S+2, h, w]
        resp = _extrema_response(dog, params)          # [S, h, w]
        kq = quotas[o]
        s_idx, y, x, v = _select_topk(resp, kq)
        valid = v > 0
        sigma_of_s = params.sigma0 * k ** (s_idx.astype(jnp.float32) + 1.0)
        # gradients of the closest Gaussian level (use middle of the octave)
        dxm, dym = _gradients(stack[S // 2 + 1])
        h, w = dxm.shape
        grads_dx.append(jnp.pad(dxm, ((0, MARGIN), (0, W - w))))
        grads_dy.append(jnp.pad(dym, ((0, MARGIN), (0, W - w))))
        cx = x.astype(jnp.float32)
        cy = y.astype(jnp.float32)
        cx_all.append(cx)
        cy_all.append(cy + float(row))
        sig_all.append(sigma_of_s)
        xhi_all.append(jnp.full((kq,), float(w - 1), jnp.float32))
        ylo_all.append(jnp.full((kq,), float(row), jnp.float32))
        yhi_all.append(jnp.full((kq,), float(row + h - 1), jnp.float32))
        row += h + MARGIN
        scale = float(2 ** o)
        outs["xy"].append(jnp.stack([cx, cy], -1) * scale)
        outs["response"].append(v)
        outs["octave"].append(jnp.full((kq,), o, jnp.int32))
        outs["size"].append(sigma_of_s * scale)
        outs["valid"].append(valid)
        # next octave: downsample the 2-sigma image ([::2, ::2] sample
        # selection; the matmul spelling avoids TPU's strided-slice
        # relayout — precision note in im.decimate2)
        oct_img = im.decimate2(stack[S])
    feats = {kk: jnp.concatenate(vv, 0) for kk, vv in outs.items()}
    dxp = jnp.concatenate(grads_dx, 0)
    dyp = jnp.concatenate(grads_dy, 0)
    cxk = jnp.concatenate(cx_all, 0)
    cyk = jnp.concatenate(cy_all, 0)
    sigk = jnp.concatenate(sig_all, 0)
    bounds = (jnp.concatenate(xhi_all, 0), jnp.concatenate(ylo_all, 0),
              jnp.concatenate(yhi_all, 0))
    feats["angle"] = _orientations(dxp, dyp, cxk, cyk, sigk, params,
                                   bounds=bounds)
    feats["desc"] = _descriptors(dxp, dyp, cxk, cyk, feats["angle"], sigk,
                                 params, bounds=bounds)
    order = jnp.argsort(jnp.where(feats["valid"], -feats["response"],
                                  jnp.inf))
    keep = order[:params.n_features]
    out = {kk: vv[keep] for kk, vv in feats.items()}
    # pad if fewer than n_features candidates existed
    n_have = keep.shape[0]
    if n_have < params.n_features:
        padn = params.n_features - n_have
        for kk, vv in out.items():
            pad_shape = (padn,) + vv.shape[1:]
            out[kk] = jnp.concatenate(
                [vv, jnp.zeros(pad_shape, vv.dtype)], 0)
        out["valid"] = out["valid"].at[n_have:].set(False)
    return out


def root_sift(desc):
    """RootSIFT: sqrt of L1-normalized descriptor (DIYSLAM.cpp:286-338)."""
    l1 = jnp.sum(jnp.abs(desc), -1, keepdims=True)
    return jnp.sqrt(desc / jnp.maximum(l1, 1e-9))
