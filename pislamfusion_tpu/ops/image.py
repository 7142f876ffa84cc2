"""Core image ops: separable blur, OpenCV-compatible pyrDown/pyrUp, Laplacian
pyramids, bilinear sampling and homography warps.

TPU-native replacement for the OpenCV calls in the reference's mosaic engine
(Map2DFusion/MultiBandMap2DCPU.cpp:441-474 warpPerspective +
cv::detail::createLaplacePyr / restoreImageFromLaplacePyr, and the CUDA
warp/pyr kernels in Map2DFusion/UtilGPU.cu:29-120) and for the scale pyramids
in feature extraction (FeatureDetectorORB.cpp:488-545, SiftGPU DoG pyramid).

Conventions: images are [..., H, W, C] float32 (C static). All ops are jit
and vmap friendly: static shapes, no data-dependent control flow. Convolutions
lower onto the MXU; `warp_perspective` is a vectorized bilinear gather.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# OpenCV's 5-tap pyramid kernel [1,4,6,4,1]/16
_PYR_K = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0

# ---------------------------------------------------------------------------
# Separable stencils as banded-matrix MXU matmuls (TPU fast path)
#
# On TPU the VPU shift-and-add stencil pays a relayout per strided slice and
# runs ~60x off the HBM roofline (pyr_down @1080p: 2.1 ms measured vs ~40 us
# of traffic). Expressing the same stencil as out = D_h @ img @ D_w^T with
# banded decimation/blur/upsample matrices runs on the MXU instead:
# 0.2-0.6 ms at every hot shape (3.5-8x), independent of tap count (a win
# that GROWS with kernel width — SIFT's sigma~3 blurs are 21+ taps).
# The matrices are np constants cached per (n, taps, mode), folded into the
# compiled program. fp32 accuracy: Precision.HIGHEST is bit-exact to the VPU
# path within 3e-5 (op order); the default HIGH (3-pass) is within 2e-3 on a
# 0..255 scale — invisible at the mosaic's ~50 dB PSNR operating point.
# Override with PISLAM_MXU_STENCIL=0/1 and PISLAM_STENCIL_PRECISION=highest.
#
# The CPU backend (test tier, demos) keeps the slice path: a dense n^2
# matmul is ~100x more FLOPs than the k-tap stencil and the 1-core host
# would eat it.
# ---------------------------------------------------------------------------

_MXU_STENCIL: bool | None = None
_STENCIL_PRECISION = (jax.lax.Precision.HIGHEST
                      if os.environ.get("PISLAM_STENCIL_PRECISION",
                                        "").lower() == "highest"
                      else jax.lax.Precision.HIGH)


def _use_mxu_stencil() -> bool:
    global _MXU_STENCIL
    if _MXU_STENCIL is None:
        env = os.environ.get("PISLAM_MXU_STENCIL", "")
        if env in ("0", "1"):
            _MXU_STENCIL = env == "1"
        else:
            _MXU_STENCIL = jax.default_backend() != "cpu"
    return _MXU_STENCIL


def use_tpu_pallas() -> bool:
    """Gate for the Pallas TPU kernels (patchgather, shearwarp callers):
    pltpu memory spaces / PrefetchScalarGridSpec only lower on TPU-family
    backends — a GPU backend passes the `!= cpu` stencil gate but cannot
    run them."""
    return (_use_mxu_stencil()
            and jax.default_backend().lower() in ("tpu", "axon"))


def _reflect_idx(q: int, n: int, mode: str) -> int:
    """Map an out-of-range index into [0, n) per the pad mode (np.pad
    'reflect' = edge not repeated; 'edge' = clamp)."""
    if mode == "edge" or n == 1:    # n==1 reflect would oscillate forever
        return min(max(q, 0), n - 1)
    while q < 0 or q >= n:
        if q < 0:
            q = -q
        if q >= n:
            q = 2 * (n - 1) - q
    return q


@functools.lru_cache(maxsize=None)
def _blur_matrix(n: int, taps: tuple, mode: str) -> np.ndarray:
    """[n, n] banded matrix: row j = kernel centered at j, borders folded."""
    r = (len(taps) - 1) // 2
    m = np.zeros((n, n), np.float32)
    for j in range(n):
        for i, w in enumerate(taps):
            m[j, _reflect_idx(j + i - r, n, mode)] += w
    return m


@functools.lru_cache(maxsize=None)
def _dec_matrix(n: int, taps: tuple, mode: str) -> np.ndarray:
    """[ceil(n/2), n] banded matrix: row j = kernel centered at 2j —
    the fused blur+decimate of cv::pyrDown."""
    r = (len(taps) - 1) // 2
    on = (n + 1) // 2
    m = np.zeros((on, n), np.float32)
    for j in range(on):
        for i, w in enumerate(taps):
            m[j, _reflect_idx(2 * j + i - r, n, mode)] += w
    return m


@functools.lru_cache(maxsize=None)
def _up_matrix(n: int, oh: int, taps: tuple) -> np.ndarray:
    """[oh, n] banded matrix reproducing cv::pyrUp's zero-stuff + 2x-gain
    blur: row p sums 2*k[i] over stuffed indices q = p+i-r with q even
    (odd slots are the stuffed zeros), reflect-folded on the 2n buffer."""
    r = (len(taps) - 1) // 2
    m = np.zeros((oh, n), np.float32)
    for p in range(oh):
        for i, w in enumerate(taps):
            q = _reflect_idx(p + i - r, 2 * n, "reflect")
            if q % 2 == 0:
                m[p, q // 2] += 2.0 * w
    return m


_BLK = 128  # MXU/lane tile

_BANDED_CACHE: dict = {}


def _banded_blocks(m: np.ndarray):
    """Decompose a banded [On, n] matrix into per-out-block dense blocks.

    Returns (dblk [ni, 128, KB*128], idx [ni, KB] int32) such that
    out_block[i] = dblk[i] @ concat(X_block[idx[i, k]] for k) — only the
    KB column-blocks intersecting the band contribute, so the contraction
    shrinks from n to KB*128 (~3-9x fewer MXU FLOPs at pyramid shapes).
    None when the band is too wide to pay off.
    """
    # full content key: these matrices are small (< a few MB) and built
    # once per shape — a prefix+sum key could collide between matrix kinds
    key = (m.shape, m.tobytes())
    hit = _BANDED_CACHE.get(key)
    if hit is not None:
        return hit
    On, n = m.shape
    ni = -(-On // _BLK)
    nk = -(-n // _BLK)
    mp = np.zeros((ni * _BLK, nk * _BLK), np.float32)
    mp[:On, :n] = m
    first = np.zeros(ni, np.int64)
    kb_need = 1
    for i in range(ni):
        rows = mp[i * _BLK:(i + 1) * _BLK]
        nz = np.nonzero(rows.any(0))[0]
        if nz.size == 0:
            first[i] = 0
            continue
        b0, b1 = nz[0] // _BLK, nz[-1] // _BLK
        first[i] = b0
        kb_need = max(kb_need, int(b1 - b0 + 1))
    KB = kb_need
    if KB * _BLK >= n or KB > 4:     # band too wide: dense is fine
        _BANDED_CACHE[key] = None
        return None
    dblk = np.zeros((ni, _BLK, KB * _BLK), np.float32)
    idx = np.zeros((ni, KB), np.int32)
    for i in range(ni):
        for k in range(KB):
            b = int(first[i]) + k
            if b < nk:
                idx[i, k] = b
                dblk[i, :, k * _BLK:(k + 1) * _BLK] = \
                    mp[i * _BLK:(i + 1) * _BLK, b * _BLK:(b + 1) * _BLK]
            else:
                idx[i, k] = nk - 1   # clipped: weights stay zero
    out = (dblk, idx)
    _BANDED_CACHE[key] = out
    return out


def _banded_left_apply(m: np.ndarray, x, axis: int):
    """out = m @ x along `axis` (negative), exploiting the band: gather
    the KB contributing 128-blocks per output block (static indices) and
    contract with one batched einsum."""
    On, n = m.shape
    blocks = _banded_blocks(m)
    # bf16 inputs run the contraction natively (one MXU pass; the f32
    # matrices cast losslessly for stencil taps' ~8 significant bits) —
    # callers opt in by passing bf16 data (e.g. the ORB pyramid chain)
    mdt = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    if blocks is None:
        mm = jnp.asarray(m, mdt)
        x_moved = jnp.moveaxis(x, axis, -1)
        y = jnp.einsum("on,...n->...o", mm, x_moved,
                       precision=_STENCIL_PRECISION)
        return jnp.moveaxis(y, -1, axis)
    dblk, idx = blocks
    ni, KB = idx.shape
    nk = -(-n // _BLK)
    ax = axis % x.ndim
    pad = [(0, 0)] * x.ndim
    pad[ax] = (0, nk * _BLK - x.shape[ax])
    xp = jnp.pad(x, pad)
    # [..., nk, 128, ...] with the block dims at `ax`
    new_shape = xp.shape[:ax] + (nk, _BLK) + xp.shape[ax + 1:]
    xb = xp.reshape(new_shape)
    b = jnp.take(xb, jnp.asarray(idx.reshape(-1)), axis=ax)
    # [..., ni, KB*128, ...]
    b = b.reshape(xp.shape[:ax] + (ni, KB * _BLK) + xp.shape[ax + 1:])
    # batched contraction over the KB*128 window, batch dim ni
    nlead = ax
    ntrail = x.ndim - ax - 1
    lead = "".join(chr(ord("m") + i) for i in range(nlead))
    trail = "".join(chr(ord("t") + i) for i in range(ntrail))
    eq = f"iak,{lead}ik{trail}->{lead}ia{trail}"
    y = jnp.einsum(eq, jnp.asarray(dblk, mdt), b,
                   precision=_STENCIL_PRECISION)
    y = y.reshape(xp.shape[:ax] + (ni * _BLK,) + xp.shape[ax + 1:])
    sl = [slice(None)] * x.ndim
    sl[ax] = slice(0, On)
    return y[tuple(sl)]


_PALLAS_STENCIL: dict | None = None


def _stencil_gates() -> dict:
    """Per-kernel gates for the stencil-family Pallas kernels, decided on
    real hardware by scripts/validate_pallas.py. The chip's verdicts are
    the IN-REPO defaults (so a fresh clone reproduces the validated
    configuration with no manual step): `stack` (the whole-SIFT-octave
    single Pallas call in features/sift.py) measured 19.7x faster than
    the XLA op chain and defaults ON on TPU; `sandwich` (the fused
    banded-sandwich in _matmul_sep — one HBM pass for both axes) measured
    flat-to-worse vs XLA's own fused einsums at 1080p and defaults OFF.
    A `.pallas_stencil_ok` marker written by a fresh validate_pallas.py
    run overrides the defaults; PISLAM_PALLAS_STENCIL=0/1 force-overrides
    everything."""
    global _PALLAS_STENCIL
    if _PALLAS_STENCIL is None:
        env = os.environ.get("PISLAM_PALLAS_STENCIL", "")
        if env in ("0", "1"):
            gates = {"sandwich": env == "1", "stack": env == "1"}
        else:
            gates = {"sandwich": False, "stack": True}
            marker = os.path.join(os.path.dirname(__file__), "..", "..",
                                  ".pallas_stencil_ok")
            if not os.path.isfile(marker) and use_tpu_pallas():
                # default-ON without an on-chip validation record: the
                # 19.7x win was measured on one chip generation; flag it
                # so a different TPU knows to run validate_pallas.py.
                from ..core.glog import logger
                logger.warning(
                    "Pallas stack kernel enabled from in-repo defaults "
                    "without on-chip validation (.pallas_stencil_ok "
                    "missing) - run scripts/validate_pallas.py once on "
                    "this TPU, or set PISLAM_PALLAS_STENCIL=0 to disable")
            if os.path.isfile(marker):
                try:
                    import json
                    with open(marker) as f:
                        rec = json.load(f)
                    gates["sandwich"] = bool(rec.get("sandwich", True))
                    gates["stack"] = bool(rec.get("stack", True))
                except (OSError, ValueError):
                    gates = {"sandwich": True, "stack": True}
        if not use_tpu_pallas():
            gates = {"sandwich": False, "stack": False}
        _PALLAS_STENCIL = gates
    return _PALLAS_STENCIL


def _use_pallas_stencil() -> bool:
    return _stencil_gates()["sandwich"]


def _use_pallas_stack() -> bool:
    return _stencil_gates()["stack"]


def _matmul_sep(img, mh: np.ndarray, mw: np.ndarray):
    """Apply per-axis banded matrices: out = mh @ img @ mw^T over the
    (-3, -2) axes, channels riding in the minor dim. Large axes route
    through the block-banded contraction (_banded_left_apply); small ones
    stay dense (the banded bookkeeping only pays off past ~4 blocks)."""
    if img.ndim == 3 and _use_pallas_stencil():
        from . import stencil_pallas as sp
        if sp.can_fuse(mh, mw, img.shape[2]):
            return sp.banded_sandwich_pallas(img, mh, mw)
    def one_axis(m, x, axis):
        if m.shape[1] >= 512:
            return _banded_left_apply(m, x, axis)
        mdt = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
        if axis == -3:
            return jnp.einsum("rh,...hwc->...rwc", jnp.asarray(m, mdt), x,
                              precision=_STENCIL_PRECISION)
        return jnp.einsum("sw,...rwc->...rsc", jnp.asarray(m, mdt), x,
                          precision=_STENCIL_PRECISION)

    y = one_axis(mh, img, -3)
    return one_axis(mw, y, -2)


def gaussian_kernel1d(sigma: float, radius: int | None = None) -> np.ndarray:
    if radius is None:
        radius = max(1, int(np.ceil(3.0 * sigma)))
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / k.sum()


def _sep_conv(img, k, border: str = "reflect"):
    """Separable 2D convolution along (-3, -2) with a 1D kernel `k`.

    Implemented as statically-unrolled SHIFT-AND-ADD (slices of one padded
    buffer, multiply-accumulated on the VPU) — NOT as lax.conv. TPU lowers
    few-channel (C=1/3) grouped convolutions onto the MXU with the channel
    dim padded to the systolic width, wasting 125+/128 of the array;
    measured on v5e @1080p: a 7-tap blur via depthwise conv = 287 ms, via
    this stencil < 2 ms. XLA fuses the taps into one pass per axis, and
    everything stays full f32 (no bf16 MXU pass degrading the Laplacian
    reconstruction)."""
    kv = [float(v) for v in np.asarray(k)]   # static taps
    r = (len(kv) - 1) // 2
    H, W = img.shape[-3], img.shape[-2]
    mode = "reflect" if border == "reflect" else "edge"
    if _use_mxu_stencil():
        taps = tuple(kv)
        return _matmul_sep(img, _blur_matrix(H, taps, mode),
                           _blur_matrix(W, taps, mode))
    pad = [(0, 0)] * img.ndim
    pad[-3] = (r, r)
    xp = jnp.pad(img, pad, mode=mode)
    x = None
    for i, w in enumerate(kv):
        t = jax.lax.slice_in_dim(xp, i, i + H, axis=img.ndim - 3) * w
        x = t if x is None else x + t
    pad = [(0, 0)] * img.ndim
    pad[-2] = (r, r)
    xp = jnp.pad(x, pad, mode=mode)
    x = None
    for i, w in enumerate(kv):
        t = jax.lax.slice_in_dim(xp, i, i + W, axis=img.ndim - 2) * w
        x = t if x is None else x + t
    return x


def gaussian_blur(img, sigma: float, radius: int | None = None):
    return _sep_conv(img, gaussian_kernel1d(sigma, radius))


def pyr_down(img):
    """cv::pyrDown: 5-tap blur then decimate by 2 (ceil sizes).

    Decimation is FUSED into the stencil: only even rows/cols are ever
    computed (strided slices of the padded buffer), so the blur does 1/4
    of the work and writes 1/4 of the intermediate traffic vs
    blur-then-slice."""
    kv = [float(v) for v in _PYR_K]
    r = 2
    H, W = img.shape[-3], img.shape[-2]
    oh, ow = (H + 1) // 2, (W + 1) // 2
    if _use_mxu_stencil():
        taps = tuple(kv)
        return _matmul_sep(img, _dec_matrix(H, taps, "reflect"),
                           _dec_matrix(W, taps, "reflect"))
    pad = [(0, 0)] * img.ndim
    pad[-3] = (r, r + 1)   # +1 slack so strided slices stay in range
    xp = jnp.pad(img, pad, mode="reflect")
    x = None
    ax_h, ax_w = img.ndim - 3, img.ndim - 2
    for i, w in enumerate(kv):
        # rows 2j+i for j in [0, oh): strided slice
        t = jax.lax.slice_in_dim(xp, i, i + 2 * oh - 1, stride=2,
                                 axis=ax_h) * w
        x = t if x is None else x + t
    pad = [(0, 0)] * img.ndim
    pad[-2] = (r, r + 1)
    xp = jnp.pad(x, pad, mode="reflect")
    x = None
    for i, w in enumerate(kv):
        t = jax.lax.slice_in_dim(xp, i, i + 2 * ow - 1, stride=2,
                                 axis=ax_w) * w
        x = t if x is None else x + t
    return x


def pyr_up(img, out_hw=None):
    """cv::pyrUp: zero-upsample by 2 then 5-tap blur with 4x gain.

    The zero-stuffing is stack+reshape interleaving — a strided scatter
    (`.at[::2, ::2].set`) costs ~7x more on TPU (measured 27 ms vs 4 ms at
    1536^2x3 on v5e)."""
    lead = img.shape[:-3]
    H, W, C = img.shape[-3:]
    oh, ow = out_hw if out_hw is not None else (2 * H, 2 * W)
    if _use_mxu_stencil():
        taps = tuple(float(v) for v in _PYR_K)
        return _matmul_sep(img, _up_matrix(H, oh, taps),
                           _up_matrix(W, ow, taps))
    x = img.reshape((-1, H, W, C))
    z = jnp.zeros_like(x)
    x = jnp.stack([x, z], 2).reshape(-1, 2 * H, W, C)
    z = jnp.zeros_like(x)
    x = jnp.stack([x, z], 3).reshape(-1, 2 * H, 2 * W, C)
    up = _sep_conv(x, _PYR_K * 2.0)
    return up.reshape(lead + (2 * H, 2 * W, C))[..., :oh, :ow, :]


@functools.lru_cache(maxsize=32)
def _decim_matrix(n: int) -> np.ndarray:
    """[(n+1)//2, n] one-hot rows selecting every other sample — the
    matmul spelling of `x[::2]`."""
    m = np.zeros(((n + 1) // 2, n), np.float32)
    m[np.arange((n + 1) // 2), 2 * np.arange((n + 1) // 2)] = 1.0
    return m


def decimate2(img):
    """2x nearest decimation (`img[::2, ::2]` sample selection) over the
    (-3, -2) axes, spelled as one-hot MXU matmuls on TPU: a raw strided
    slice forces a relayout copy there (measured +6.7 ms/frame across
    SIFT's four octave handoffs @1080p — stride 9.9 ms vs matmul 4.0 ms
    for the whole stack chain). Sample SELECTION is exact; VALUES pass
    through the stencil precision (default Precision.HIGH = bf16_3x,
    ~2^-16 relative — far below the DoG contrast gate that consumes
    them; PISLAM_STENCIL_PRECISION=highest makes them exact). The CPU
    path keeps the bit-exact stride."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    if not _use_mxu_stencil():
        out = img[::2, ::2]
    else:
        out = _matmul_sep(img, _decim_matrix(img.shape[-3]),
                          _decim_matrix(img.shape[-2]))
    return out[..., 0] if squeeze else out


def build_gaussian_pyramid(img, levels: int):
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(pyr_down(pyr[-1]))
    return pyr


def build_laplacian_pyramid(img, bands: int):
    """cv::detail::createLaplacePyr semantics: `bands` difference levels plus
    the residual low-pass — returns a list of length bands+1."""
    pyr = build_gaussian_pyramid(img, bands + 1)
    lap = []
    for i in range(bands):
        hw = pyr[i].shape[-3:-1]
        lap.append(pyr[i] - pyr_up(pyr[i + 1], hw))
    lap.append(pyr[bands])
    return lap


def restore_from_laplacian(lap):
    """cv::detail::restoreImageFromLaplacePyr inverse."""
    img = lap[-1]
    for lvl in reversed(lap[:-1]):
        img = lvl + pyr_up(img, lvl.shape[-3:-1])
    return img


@functools.lru_cache(maxsize=None)
def _resize_matrix(n: int, on: int) -> np.ndarray:
    """[on, n] bilinear interpolation matrix (align_corners=False — the
    same sample points jax.image.resize 'linear' uses: src = (j+0.5)*n/on
    - 0.5, edge-clamped). Two nonzeros per row."""
    m = np.zeros((on, n), np.float32)
    for j in range(on):
        s = (j + 0.5) * n / on - 0.5
        i0 = int(np.floor(s))
        f = s - i0
        m[j, min(max(i0, 0), n - 1)] += 1.0 - f
        m[j, min(max(i0 + 1, 0), n - 1)] += f
    return m


def resize_bilinear(img, out_hw):
    """Bilinear resize (align_corners=False, matches cv::resize INTER_LINEAR).

    TPU: two banded-matrix MXU matmuls (same mechanism as the pyramid
    stencils — jax.image.resize's gather formulation is ~50x off roofline
    at pyramid shapes)."""
    lead = img.shape[:-3]
    H, W, C = img.shape[-3:]
    oh, ow = out_hw
    if _use_mxu_stencil():
        return _matmul_sep(img, _resize_matrix(H, oh), _resize_matrix(W, ow))
    # antialias=False: cv::resize INTER_LINEAR samples the 2-tap lerp
    # directly (no kernel widening on downscale) — and keeps the CPU path
    # equal to the TPU matrix path
    return jax.image.resize(img, lead + (oh, ow, C), method="linear",
                            antialias=False)


def _reflect101(x, n):
    """BORDER_REFLECT_101 fold of float coordinates into [0, n-1]."""
    period = 2.0 * (n - 1.0)
    xm = jnp.mod(jnp.abs(x), period)
    return jnp.minimum(xm, period - xm)


def bilinear_sample(img, xy, fill: float = 0.0, border: str = "constant"):
    """Sample img [H, W, C] at subpixel xy [..., 2].

    border: "constant" (outside -> fill), "replicate" (clamp), or
    "reflect" (BORDER_REFLECT_101, as used by the reference's mosaic warp,
    MultiBandMap2DCPU.cpp:451).
    Returns (values [..., C], valid mask [...]) — valid marks in-image samples
    regardless of border mode.
    """
    H, W, C = img.shape
    x, y = xy[..., 0], xy[..., 1]
    if border == "reflect":
        x = _reflect101(x, W)
        y = _reflect101(y, H)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    valid = ((xy[..., 0] >= 0) & (xy[..., 0] <= W - 1)
             & (xy[..., 1] >= 0) & (xy[..., 1] <= H - 1))
    # single flattened linear index per tap: one [HW, C] gather is ~1.4x
    # faster on TPU than 2-D advanced indexing (fewer gather dims); the
    # (x0, y0) clamp to (W-2, H-2) keeps every +1/+W neighbor in range,
    # and fx/fy adjust so clamped edge taps still interpolate correctly
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 2)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 2)
    fx = jnp.clip(x[..., None] - x0i[..., None], 0.0, 1.0)
    fy = jnp.clip(y[..., None] - y0i[..., None], 0.0, 1.0)
    flat = img.reshape(H * W, C)
    base = y0i * W + x0i
    v00 = jnp.take(flat, base, axis=0)
    v01 = jnp.take(flat, base + 1, axis=0)
    v10 = jnp.take(flat, base + W, axis=0)
    v11 = jnp.take(flat, base + W + 1, axis=0)
    v = (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
         + v10 * (1 - fx) * fy + v11 * fx * fy)
    if border == "constant":
        v = jnp.where(valid[..., None], v, fill)
    return v, valid


def homography_grid(h_mat, out_hw, offset=(0.0, 0.0)):
    """Source-coordinate grid for a dst->src homography warp.

    h_mat maps *destination* pixel (x+ox, y+oy, 1) to source homogeneous
    coords (cv::warpPerspective with WARP_INVERSE_MAP semantics).
    Returns [Ho, Wo, 2] float32 source xy.
    """
    oh, ow = out_hw
    ys, xs = jnp.meshgrid(jnp.arange(oh, dtype=jnp.float32) + offset[1],
                          jnp.arange(ow, dtype=jnp.float32) + offset[0],
                          indexing="ij")
    # explicit broadcast arithmetic (VPU, full f32) instead of an einsum that
    # would hit the MXU in bf16
    h = h_mat
    qx = h[0, 0] * xs + h[0, 1] * ys + h[0, 2]
    qy = h[1, 0] * xs + h[1, 1] * ys + h[1, 2]
    qz = h[2, 0] * xs + h[2, 1] * ys + h[2, 2]
    qz = jnp.where(jnp.abs(qz) < 1e-12, 1e-12, qz)
    return jnp.stack([qx / qz, qy / qz], -1)


def warp_perspective(img, h_dst2src, out_hw, offset=(0.0, 0.0),
                     fill: float = 0.0, border: str = "constant"):
    """Warp img [H, W, C] into an [Ho, Wo, C] canvas.

    `h_dst2src` is the 3x3 homography from destination pixels to source
    pixels (the inverse of cv::warpPerspective's forward matrix). `offset`
    shifts the destination grid origin — used to render directly into a tile
    whose top-left corner is at (ox, oy) in canvas coordinates.
    Returns (warped, valid_mask).
    """
    grid = homography_grid(h_dst2src, out_hw, offset)
    return bilinear_sample(img, grid, fill, border)


def perspective_transform_from_quad(src_quad, dst_quad):
    """3x3 homography mapping the 4 src points onto the 4 dst points
    (cv::getPerspectiveTransform). Solves the 8x8 DLT system.

    src_quad, dst_quad: [4, 2] arrays.
    """
    src = jnp.asarray(src_quad, jnp.float32)
    dst = jnp.asarray(dst_quad, jnp.float32)
    x, y = src[:, 0], src[:, 1]
    u, v = dst[:, 0], dst[:, 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    ax = jnp.stack([x, y, ones, zeros, zeros, zeros, -u * x, -u * y], -1)
    ay = jnp.stack([zeros, zeros, zeros, x, y, ones, -v * x, -v * y], -1)
    A = jnp.concatenate([ax, ay], 0)                         # [8, 8]
    b = jnp.concatenate([u, v], 0)                           # [8]
    h = jnp.linalg.solve(A, b)
    return jnp.concatenate([h, jnp.ones((1,), h.dtype)]).reshape(3, 3)


def rgb_to_gray(img):
    """BT.601 luma, matching cv::cvtColor BGR2GRAY when fed RGB-ordered
    channels as (R, G, B)."""
    w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    return jnp.einsum("...c,c->...", img[..., :3], w)


@functools.partial(jax.jit, static_argnames=("out_hw",))
def warp_perspective_jit(img, h_dst2src, out_hw):
    return warp_perspective(img, h_dst2src, out_hw)


@jax.jit
def remap(img, map_xy):
    """Dense remap (cv::remap / Undistorter::undistortFast equivalent):
    out[y, x] = bilinear(img, map_xy[y, x]) with border replication.
    img: [H, W] or [H, W, C] float; map_xy: [Ho, Wo, 2] source coords."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    out = bilinear_sample(img, map_xy, 0.0, "replicate")[0]
    return out[..., 0] if squeeze else out
