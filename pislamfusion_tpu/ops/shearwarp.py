"""Shear-decomposed homography warp: the TPU-native replacement for the
gather-based mosaic warp.

The mosaic hot path warps each 1080p frame into a tile-aligned canvas patch
(reference: Map2DFusion/MultiBandMap2DCPU.cpp:441-474 cv::warpPerspective;
CUDA variant UtilGPU.cu:97-120). A per-pixel bilinear gather is
index-rate-bound on TPU (~165M idx/s on v5e regardless of layout — the
round-1 profile's 57 ms @1536^2), because XLA lowers gathers through the
scalar core. This module removes the gather entirely:

  1. The destination patch is processed in TxT tiles (T=256). Within a
     tile the homography is approximated by its least-squares affine fit
     through the 4 tile corners; the residual is the projective curvature
     term (p00+p11-p10-p01)/4, sub-pixel for drone-survey homographies
     (returned per call as `max_fit_err` so callers can assert it).
  2. Each tile's affine warp is decomposed Catmull-Smith style into two
     1-D resampling passes, and each pass into
        integer SHEAR   (per-column/row integer shift -> log2 roll+select
                         network, pure VPU, no gather)
      + uniform 3-tap RESAMPLE (one-hot selection matrices -> MXU matmuls).
     The 3-tap weights w0 = max(0, 1-(g+f)), w1 = 1-|g+f-1|,
     w2 = max(0, g+f-1) give exact LINEAR interpolation at the summed
     position within each pass: g is the resample-phase fraction, f the
     shear fraction, and tent(g+f-i) over i in {0,1,2} is a 2-of-3-tap
     linear kernel.

     Interpolation semantics: two-pass warping interpolates ALONG the
     preimage line of each destination row (Catmull-Smith), which differs
     from point-wise separable bilinear by a term proportional to
     (shear slope) x (local second derivative) — sub-gray-level on real
     imagery (measured: max ~1.4/255, mean ~0.05 on smoothed noise at
     10-degree rotation) and zero for axis-aligned maps. This is standard
     hardware-warper behavior, accepted here as the defined semantics;
     mosaic-level PSNR is asserted end-to-end in tests.

  Pass 1 (vertical):   I[v, x] = src[alpha*x + beta*v + gamma, x]
      alpha = a10/a00, beta = det(A)/a00, gamma = ty - alpha*tx
  Pass 2 (horizontal): out[v, u] = I[v, a00*u + a01*v + tx]

  When |a10| > |a00| (closer to a 90-degree rotation than to identity) the
  source is transposed first so pass-1's shear slope stays |alpha| <= 1
  (the classic bottleneck fix).

Everything is static-shape: window sizes are provisioned from a caller
supplied `max_scale` bound on the dst->src scale (src px per patch px).
The default 2.2 covers the reference's Map2D.Scale=0.5 configuration
(canvas 2x COARSER than the source -> scale 2.0) plus tilt margin; tiles
whose actual scale exceeds the provision are marked dead by tile_params'
overflow guard rather than rendering clamped junk. Samples that fall
outside the provisioned window clamp to its edge — callers composite
with an analytic weight map computed from the TRUE homography that is
zero outside the source image, so clamped content never wins a
max-weight composite.

Two implementations share the same math:
  * `warp_patch_xla`    — jnp reference (shear via take_along_axis);
                          runs anywhere, used as the correctness oracle.
  * `warp_patch_pallas` — the fused kernel: per-tile window DMA'd
                          HBM->VMEM, shear + matmuls entirely on-chip.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

TILE = 256


class TileParams(NamedTuple):
    """Per-destination-tile warp parameters (all [nt, ...] arrays)."""
    affine: jnp.ndarray     # [nt, 6] a00, a01, tx, a10, a11, ty (local px)
    window: jnp.ndarray     # [nt, 2] (wy, wx) src window origin, int32
    live: jnp.ndarray       # [nt] bool — tile footprint intersects the src
    max_fit_err: jnp.ndarray  # [] worst corner residual of the affine fit


def _homography_apply(h, uv):
    """uv [..., 2] dst px -> src px under 3x3 h."""
    u, v = uv[..., 0], uv[..., 1]
    qx = h[0, 0] * u + h[0, 1] * v + h[0, 2]
    qy = h[1, 0] * u + h[1, 1] * v + h[1, 2]
    qz = h[2, 0] * u + h[2, 1] * v + h[2, 2]
    qz = jnp.where(jnp.abs(qz) < 1e-12, 1e-12, qz)
    return jnp.stack([qx / qz, qy / qz], -1)


def tile_params(h_patch2img, patch_hw: Tuple[int, int],
                src_hw: Tuple[int, int], win_hw: Tuple[int, int],
                tile: int = TILE, transpose: bool = False,
                align: Tuple[int, int] = (1, 1)) -> TileParams:
    """Fit the per-tile affines and choose source windows (traced, tiny).

    h_patch2img: [3, 3] patch px -> image px. transpose=True computes the
    params for warping from the TRANSPOSED source (x/y swapped), used when
    the rotation is closer to 90 degrees.
    """
    ph, pw = patch_hw
    nty, ntx = ph // tile, pw // tile
    t = float(tile)
    ty, tx = jnp.meshgrid(jnp.arange(nty, dtype=jnp.float32) * t,
                          jnp.arange(ntx, dtype=jnp.float32) * t,
                          indexing="ij")
    org = jnp.stack([tx.reshape(-1), ty.reshape(-1)], -1)       # [nt, 2] uv
    offs = jnp.asarray([[0.0, 0.0], [t, 0.0], [0.0, t], [t, t]])
    corners = org[:, None, :] + offs[None, :, :]                # [nt, 4, 2]
    p = _homography_apply(h_patch2img, corners)                 # [nt, 4, 2]
    if transpose:
        p = p[..., ::-1]
    p00, p10, p01, p11 = p[:, 0], p[:, 1], p[:, 2], p[:, 3]
    a_col = ((p10 - p00) + (p11 - p01)) / (2.0 * t)             # d/du
    a_row = ((p01 - p00) + (p11 - p10)) / (2.0 * t)             # d/dv
    center = 0.25 * (p00 + p10 + p01 + p11)
    trans = center - a_col * (t / 2.0) - a_row * (t / 2.0)
    # corner residual of the LS fit == projective twist term
    twist = 0.25 * (p00 + p11 - p10 - p01)
    max_fit_err = jnp.max(jnp.abs(twist))
    sh, sw = (src_hw[1], src_hw[0]) if transpose else src_hw
    wh, ww = win_hw
    # window origin: cover the tile's src bbox (+1 px interp margin),
    # aligned DOWN to the DMA tiling (8 sublanes x 128 lanes for the
    # Pallas kernel — HBM slices must start on tile boundaries)
    ay, ax = align
    xmin = jnp.min(p[..., 0], axis=1) - 1.0
    ymin = jnp.min(p[..., 1], axis=1) - 1.0
    wx = jnp.clip((jnp.floor(xmin).astype(jnp.int32) // ax) * ax,
                  0, (max(sw - ww, 0) // ax) * ax)
    wy = jnp.clip((jnp.floor(ymin).astype(jnp.int32) // ay) * ay,
                  0, (max(sh - wh, 0) // ay) * ay)
    # live: src bbox intersects the image (with a 1-tile margin)
    xmax = jnp.max(p[..., 0], axis=1)
    ymax = jnp.max(p[..., 1], axis=1)
    live = (xmax >= 0) & (xmin <= sw) & (ymax >= 0) & (ymin <= sh)
    # overflow guard: a tile whose source extent or resample-index range
    # exceeds the provisioned window would select clamped/wrapped content
    # at genuinely-valid destination pixels — mark it dead instead (the
    # caller widens max_scale if this ever fires; see `live` docstring)
    a00, a10 = a_col[:, 0], a_col[:, 1]
    safe = jnp.where(jnp.abs(a00) < 1e-6, 1e-6, a00)
    beta = (a00 * a_row[:, 1] - a_row[:, 0] * a10) / safe
    fits = ((ymax - ymin + 4.0 < wh) & (xmax - xmin + 4.0 < ww)
            & (jnp.abs(beta) * t + 4.0 < wh) & (jnp.abs(a00) * t + 4.0 < ww))
    live = live & fits
    affine = jnp.stack([a_col[:, 0], a_row[:, 0],
                        trans[:, 0] - wx.astype(jnp.float32),
                        a_col[:, 1], a_row[:, 1],
                        trans[:, 1] - wy.astype(jnp.float32)], -1)
    window = jnp.stack([wy, wx], -1)
    return TileParams(affine, window, live, max_fit_err)


def _pass_coeffs(a00, a01, tx, a10, a11, ty):
    """Derived two-pass coefficients (see module docstring)."""
    safe = jnp.where(jnp.abs(a00) < 1e-6, 1e-6, a00)
    alpha = a10 / safe
    beta = (a00 * a11 - a01 * a10) / safe
    gamma = ty - alpha * tx
    return alpha, beta, gamma


def _tap_weights(gf):
    """3-tap tent weights at summed fraction gf in [0, 2)."""
    w0 = jnp.maximum(0.0, 1.0 - gf)
    w1 = 1.0 - jnp.abs(gf - 1.0)
    w2 = jnp.maximum(0.0, gf - 1.0)
    return w0, w1, w2


def _pass_phases(slope_shear, offset_shear, slope_resample, n_out: int,
                 n_axis: int):
    """Shared shear/resample phase arithmetic for one pass.

    Positions along the contracted axis are slope_shear*x + offset_shear
    (per contracted index x) plus slope_resample*v (per output index v).
    Splits into integer shear n(x), resample selector m(v) and fractions,
    with a bias B folded between them so m(v) >= 0 even for negative
    resample slopes (135-degree-style maps).

    Returns (n [n_axis] int32, f [n_axis] f32, m [n_out] int32,
    g [n_out] f32).
    """
    xs = jnp.arange(n_axis, dtype=jnp.float32)
    vs = jnp.arange(n_out, dtype=jnp.float32)
    pv = slope_resample * vs
    bias = jnp.ceil(jnp.maximum(0.0, -jnp.min(pv)))
    m = jnp.floor(pv) + bias
    g = pv - jnp.floor(pv)
    sx = slope_shear * xs + offset_shear - bias
    n = jnp.floor(sx)
    f = sx - n
    return n.astype(jnp.int32), f, m.astype(jnp.int32), g


def _warp_tile_xla(window, aff, tile: int):
    """Oracle: one tile via the two-pass shear math, shears as gathers.

    window: [Wh, Ww] one channel plane. aff: [6]. Returns [tile, tile].
    """
    wh, ww = window.shape
    a00, a01, tx, a10, a11, ty = [aff[i] for i in range(6)]
    alpha, beta, gamma = _pass_coeffs(a00, a01, tx, a10, a11, ty)
    # pass 1: vertical. src row position = alpha*x + gamma + beta*v
    n, f, m, g = _pass_phases(alpha, gamma, beta, tile, ww)
    rows = jnp.arange(wh, dtype=jnp.int32)
    sheared_idx = jnp.clip(rows[:, None] + n[None, :], 0, wh - 1)
    S = jnp.take_along_axis(window, sheared_idx, axis=0)     # [wh, ww]
    gf = g[:, None] + f[None, :]                      # [tile, ww]
    w0, w1, w2 = _tap_weights(gf)
    taps = [jnp.take(S, jnp.clip(m + i, 0, wh - 1), axis=0)
            for i in range(3)]
    I = w0 * taps[0] + w1 * taps[1] + w2 * taps[2]    # [tile, ww]
    # pass 2: horizontal. src col position = a01*v + tx + a00*u
    n2, f2, m2, g2 = _pass_phases(a01, tx, a00, tile, tile)
    cols = jnp.arange(ww, dtype=jnp.int32)
    sh2 = jnp.clip(cols[None, :] + n2[:tile, None], 0, ww - 1)
    S2 = jnp.take_along_axis(I, sh2, axis=1)          # [tile, ww]
    gf2 = f2[:tile, None] + g2[None, :]               # [tile, tile]
    w0, w1, w2 = _tap_weights(gf2)
    taps = [jnp.take(S2, jnp.clip(m2 + i, 0, ww - 1), axis=1)
            for i in range(3)]
    return w0 * taps[0] + w1 * taps[1] + w2 * taps[2]


def _choose_transpose(h):
    """True when the map is closer to a 90-degree rotation (|dy/du| >
    |dx/du| at the patch center) — static-friendly scalar (traced)."""
    return jnp.abs(h[1, 0]) > jnp.abs(h[0, 0])


def _window_hw(max_scale: float, tile: int) -> Tuple[int, int]:
    """Static source-window provisioning for a worst-case 45-degree
    rotation at scale `max_scale` (src px per dst px).

    Pass-2 reads I[v, x] for x in [0, (|a00|+|a01|) tile + 2); pass 1
    fills that whole range for every v, needing |alpha| ww + |beta| tile
    source rows with |alpha| <= 1 (transpose guard) and
    |beta| <= max_scale * sqrt(2).
    """
    ww = int(np.ceil((1.42 * max_scale * tile + 4) / 128.0)) * 128
    wh = int(np.ceil((ww + 1.42 * max_scale * tile + 4) / 128.0)) * 128
    return wh, ww


@functools.partial(jax.jit,
                   static_argnames=("patch_hw", "tile", "max_scale"))
def warp_patch_xla(img, h_patch2img, patch_hw: Tuple[int, int],
                   tile: int = TILE, max_scale: float = 1.6):
    """Reference implementation of the tiled shear warp (oracle).

    img: [H, W, C] float32; h_patch2img: [3, 3] patch->image. Returns
    (patch [ph, pw, C], max_fit_err []). Use warp_patch_pallas on TPU.
    """
    ph, pw = patch_hw
    assert ph % tile == 0 and pw % tile == 0
    win = _window_hw(max_scale, tile)

    def run(src, transpose):
        prm = tile_params(h_patch2img, patch_hw, img.shape[:2], win,
                          tile, transpose)
        wh, ww = win
        srcp = jnp.pad(src, ((0, max(wh - src.shape[0], 0)),
                             (0, max(ww - src.shape[1], 0)), (0, 0)),
                       mode="edge")

        def one_tile(aff, worg, live):
            w = jax.lax.dynamic_slice(
                srcp, (worg[0], worg[1], 0), (wh, ww, src.shape[-1]))
            out = jnp.stack([_warp_tile_xla(w[..., c], aff, tile)
                             for c in range(src.shape[-1])], -1)
            return jnp.where(live, out, 0.0)

        tiles = jax.vmap(one_tile)(prm.affine, prm.window, prm.live)
        nty, ntx = ph // tile, pw // tile
        patch = tiles.reshape(nty, ntx, tile, tile, -1)
        patch = patch.transpose(0, 2, 1, 3, 4).reshape(ph, pw, -1)
        return patch, prm.max_fit_err

    return jax.lax.cond(
        _choose_transpose(h_patch2img),
        lambda: run(jnp.swapaxes(img, 0, 1), True),
        lambda: run(img, False))


# ---------------------------------------------------------------------------
# Pallas kernel: the same two passes fused per tile, window DMA'd into VMEM
# ---------------------------------------------------------------------------

def _phases_traced(slope_shear, offset_shear, slope_resample, n_out: int,
                   n_axis: int, mod: int):
    """Kernel-side twin of _pass_phases (2D iotas, shear shift mod `mod`
    for the circular roll network). Returns (smod [1, n_axis] int32,
    f [1, n_axis] f32, m [n_out, 1] int32, g [n_out, 1] f32)."""
    # int iota then cast: Mosaic's tpu.iota is integer-only
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, n_axis), 1).astype(
        jnp.float32)
    vs = jax.lax.broadcasted_iota(jnp.int32, (n_out, 1), 0).astype(
        jnp.float32)
    pv = slope_resample * vs
    bias = jnp.ceil(jnp.maximum(0.0, -jnp.min(pv)))
    m = jnp.floor(pv) + bias
    g = pv - jnp.floor(pv)
    sx = slope_shear * xs + offset_shear - bias
    n = jnp.floor(sx)
    f = sx - n
    smod = jnp.mod(n.astype(jnp.int32), mod)
    return smod, f, m.astype(jnp.int32), g


def _roll_steps(mod: int):
    return max(1, int(np.ceil(np.log2(mod))))


def _make_warp_kernel(T: int, WH: int, WW: int, C: int, ntx: int,
                      precision):
    """Kernel factory. Grid (nt,); scalar prefetch: window origins [nt, 2]
    i32, affines [nt, 6] f32 (window-local), live [nt] i32. src stays in
    HBM ([C, Hs, Ws]); each tile DMAs its [C, WH, WW] window in ONE copy."""
    from jax.experimental import pallas as pl            # deferred: TPU only
    from jax.experimental.pallas import tpu as pltpu

    bits1 = _roll_steps(WH)
    bits2 = _roll_steps(WW)

    def kernel(org_ref, aff_ref, live_ref, src_ref, out_ref, win_ref,
               inter_ref, sem):
        t = pl.program_id(0)

        @pl.when(live_ref[t] == 0)
        def _dead():
            out_ref[...] = jnp.zeros((C, T, T), jnp.float32)

        @pl.when(live_ref[t] != 0)
        def _live():
            a00 = aff_ref[t, 0]
            a01 = aff_ref[t, 1]
            tx = aff_ref[t, 2]
            a10 = aff_ref[t, 3]
            a11 = aff_ref[t, 4]
            ty = aff_ref[t, 5]
            safe = jnp.where(jnp.abs(a00) < 1e-6, 1e-6, a00)
            alpha = a10 / safe
            beta = (a00 * a11 - a01 * a10) / safe
            gamma = ty - alpha * tx
            # pass-1 phases: src row position = alpha*x + gamma + beta*v
            n1, f1, m1, g1 = _phases_traced(alpha, gamma, beta, T, WW, WH)
            ks = jax.lax.broadcasted_iota(jnp.int32, (T, WH), 1)
            m0 = (ks == jnp.clip(m1, 0, WH - 3)).astype(jnp.float32)
            gf1 = g1 + f1                                     # [T, WW]
            # pass-2 phases: src col position = a01*v + tx + a00*u
            n2, f2, m2, g2 = _phases_traced(a01, tx, a00, T, T, WW)
            # n2/f2 are indexed by the OUTPUT ROW v -> reshape to columns
            n2 = n2.reshape(T, 1)
            js = jax.lax.broadcasted_iota(jnp.int32, (WW, T), 0)
            m2m = (js == jnp.clip(m2.reshape(1, T), 0,
                                  WW - 3)).astype(jnp.float32)
            gf2 = f2.reshape(T, 1) + g2.reshape(1, T)         # [T, T]

            def _dot1(a, b, p):
                return jax.lax.dot_general(
                    a, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=p)

            def dot(a, b, content: str = "r"):
                """a @ b. `content` marks which operand carries image data
                ("l"/"r") — the other is an exact-in-bf16 one-hot matrix.
                precision="split": one bf16 hi/lo split of the content
                operand, two DEFAULT (single-pass) dots — bit-accurate to
                ~16 mantissa bits at 1/3 the MXU cost of HIGHEST."""
                if precision != "split":
                    return _dot1(a, b, precision)
                x = a if content == "l" else b
                hi = x.astype(jnp.bfloat16)
                lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                if content == "l":
                    bb = b.astype(jnp.bfloat16)
                    return (_dot1(hi, bb, None) + _dot1(lo, bb, None))
                aa = a.astype(jnp.bfloat16)
                return (_dot1(aa, hi, None) + _dot1(aa, lo, None))

            def tap_w(gf, i):
                if i == 0:
                    return jnp.maximum(0.0, 1.0 - gf)
                if i == 1:
                    return 1.0 - jnp.abs(gf - 1.0)
                return jnp.maximum(0.0, gf - 1.0)

            wy = pl.multiple_of(org_ref[t, 0], 8)
            wx = pl.multiple_of(org_ref[t, 1], 128)
            # ONE [C, WH, WW] DMA instead of C serial copies (each wait
            # stalls the compute pipeline for the full HBM latency)
            cp = pltpu.make_async_copy(
                src_ref.at[:, pl.ds(wy, WH), pl.ds(wx, WW)], win_ref, sem)
            cp.start()
            cp.wait()
            for c in range(C):
                # integer column shear: roll rows up by n1(x), IN-PLACE
                # through the scratch ref (an SSA chain would keep every
                # step's buffer live and blow the VMEM budget)
                for b in range(bits1):
                    bit = (n1 >> b) & 1                       # [1, WW]
                    # roll UP by 2^b == roll by WH - 2^b (non-neg required)
                    win_ref[c] = jnp.where(
                        bit == 1, pltpu.roll(win_ref[c], WH - (1 << b), 0),
                        win_ref[c])
                # 3 taps via rolling the sheared window up by one row
                # between single-one-hot matmuls (keeps ONE [T, WW] matmul
                # result live instead of a [3T, WW] stack)
                inter_ref[:] = tap_w(gf1, 0) * dot(m0, win_ref[c], "r")
                for i in (1, 2):
                    win_ref[c] = pltpu.roll(win_ref[c], WH - 1, 0)
                    inter_ref[:] = inter_ref[:] + tap_w(gf1, i) * dot(
                        m0, win_ref[c], "r")
                # integer row shear: roll cols left by n2(v), in-place
                for b in range(bits2):
                    bit = (n2 >> b) & 1                       # [T, 1]
                    inter_ref[:] = jnp.where(
                        bit == 1,
                        pltpu.roll(inter_ref[:], WW - (1 << b), 1),
                        inter_ref[:])
                acc = tap_w(gf2, 0) * dot(inter_ref[:], m2m, "l")
                for i in (1, 2):
                    inter_ref[:] = pltpu.roll(inter_ref[:], WW - 1, 1)
                    acc = acc + tap_w(gf2, i) * dot(inter_ref[:], m2m, "l")
                out_ref[c] = acc

    return kernel


def _pallas_window_hw(max_scale: float, tile: int) -> Tuple[int, int]:
    """Tight windows for the kernel: only GENUINE (v, x) pairs are ever
    selected by the one-hot matmuls, so both extents are bounded by the
    tile's own source bbox (sqrt(2)*scale*tile), not the two-pass
    parallelogram. The extra 8/128 covers the DMA-alignment down-shift of
    the window origin."""
    e = 1.42 * max_scale * tile + 6
    wh = int(np.ceil((e + 8) / 8.0)) * 8
    ww = int(np.ceil((e + 128) / 128.0)) * 128
    return wh, ww


@functools.partial(jax.jit,
                   static_argnames=("patch_hw", "tile", "max_scale",
                                    "interpret", "precision"))
def warp_patch_pallas(img, h_patch2img, patch_hw: Tuple[int, int],
                      tile: int = 128, max_scale: float = 2.2,
                      interpret: bool = False, precision: str = "high"):
    """Fused tiled shear warp on TPU.

    img: [H, W, C] float32; h_patch2img: [3, 3] patch px -> image px.
    Returns (patch [ph, pw, C], live [nty, ntx] bool, max_fit_err []).
    Content outside the provisioned per-tile window clamps — composite
    with a weight map that is zero outside the source image (the mosaic's
    radial weight) and zero dead tiles via `live`.

    precision: MXU passes for the one-hot selection matmuls. The one-hot
    matrices are exactly representable in bf16, so "high" (bf16x3) loses
    only the fp32 content bits past ~16 mantissa bits — < 1/256 gray
    level on 0..255 imagery, invisible next to the interpolation itself —
    at HALF the MXU cost of "highest" (bf16x6, the bit-exact option).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Mosaic's dot lowering only knows DEFAULT and HIGHEST; "high" is
    # emulated in the kernel by a bf16 hi/lo split of the CONTENT operand
    # (two DEFAULT dots) — exact to ~16 mantissa bits since the one-hot
    # operand is bf16-exact.
    prec = {"high": "split",
            "highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT}[precision]

    ph, pw = patch_hw
    assert ph % tile == 0 and pw % tile == 0
    nty, ntx = ph // tile, pw // tile
    nt = nty * ntx
    C = img.shape[-1]
    win = _pallas_window_hw(max_scale, tile)
    wh, ww = win

    def run(src_hwc, transpose):
        prm = tile_params(h_patch2img, patch_hw, img.shape[:2], win,
                          tile, transpose, align=(8, 128))
        src = jnp.moveaxis(src_hwc, -1, 0)               # [C, Hs, Ws]
        hs, ws = src.shape[1], src.shape[2]
        src = jnp.pad(src, ((0, 0), (0, max(wh - hs, 0)),
                            (0, max(ww - ws, 0))), mode="edge")
        kernel = _make_warp_kernel(tile, wh, ww, C, ntx, prec)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nt,),
            # src pinned to HBM (ANY lets the compiler pull the whole
            # frame into VMEM and blow the 16M budget); windows are DMA'd
            # manually per tile
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(
                (C, tile, tile),
                lambda t, org, aff, live: (0, t // ntx, t % ntx)),
            scratch_shapes=[pltpu.VMEM((C, wh, ww), jnp.float32),
                            pltpu.VMEM((tile, ww), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((C, ph, pw), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(prm.window, prm.affine, prm.live.astype(jnp.int32), src)
        return (jnp.moveaxis(out, 0, -1),
                prm.live.reshape(nty, ntx), prm.max_fit_err)

    return jax.lax.cond(
        _choose_transpose(h_patch2img),
        lambda: run(jnp.swapaxes(img, 0, 1), True),
        lambda: run(img, False))


def default_warp_mode() -> str:
    """'shear' (the Pallas kernel) on TPU-family backends, 'gather'
    elsewhere — the one place the platform sniff lives."""
    import jax
    plat = jax.devices()[0].platform.lower()
    return "shear" if plat in ("tpu", "axon") else "gather"
