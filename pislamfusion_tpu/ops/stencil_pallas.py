"""Pallas banded-sandwich stencil: out = mh @ x @ mw^T in ONE HBM pass.

ops/image.py expresses every separable stencil (gaussian blur, pyrDown,
pyrUp, bilinear resize) as a pair of banded-matrix contractions on the
MXU (out = D_h @ img @ D_w^T). That XLA path materializes the row-pass
intermediate in HBM and relayouts per einsum — measured 0.2-0.6 ms/op on
v5e against ~0.1 ms of actual MXU+HBM work. This kernel runs both passes
per 128-row output tile inside VMEM:

  * the row matrix's band means each output row tile reads a fixed
    contiguous window of input rows — one aligned slab DMA per tile;
  * row pass: A_i [128, RH] @ slab (MXU); column pass: a static Python
    loop over output lane tiles, each contracting the KB*128-lane window
    of the row result with that tile's dense band block (MXU);
  * channels interleave in lanes: the lane-side band blocks are built on
    the C-expanded indexing (q = w*C + c) without densifying the
    expanded matrix.

Replaces ops/image._matmul_sep on TPU (opt-in via PISLAM_PALLAS_STENCIL
until the measured win is confirmed on hardware). Same matrices, same
semantics — the interpret-mode tests assert equality against the XLA
path at HIGHEST precision. Reference ops being served: cv::pyrDown/Up
and warp pyramids (Map2DFusion/MultiBandMap2DCPU.cpp:441-474), SIFT's
Gaussian chains (SiftGPU ProgramCU.cu), ORB's level resize
(FeatureDetectorORB.cpp:808-851).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BLK = 128


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


class _Side:
    """Static per-output-tile band windows + dense blocks for one axis."""

    def __init__(self, blocks: np.ndarray, w0: np.ndarray, kbl: int):
        self.blocks = blocks          # [nb, 128, kbl] (row) / [nb, kbl, 128]
        self.w0 = w0                  # [nb] int32 window starts (128-mult)
        self.kbl = kbl


def _row_side(m: np.ndarray, max_kb: int = 6) -> _Side | None:
    """Row-axis decomposition: out tile i = blocks[i] @ x[w0[i]:w0[i]+kbl]."""
    On, n = m.shape
    ni = -(-On // _BLK)
    nk = -(-n // _BLK)
    mp = np.zeros((ni * _BLK, nk * _BLK), np.float32)
    mp[:On, :n] = m
    w0 = np.zeros(ni, np.int64)
    kb = 1
    for i in range(ni):
        nz = np.nonzero(mp[i * _BLK:(i + 1) * _BLK].any(0))[0]
        if nz.size:
            w0[i] = (nz[0] // _BLK) * _BLK
            kb = max(kb, -(-int(nz[-1] + 1 - w0[i]) // _BLK))
    if kb > min(max_kb, nk):
        return None
    kbl = kb * _BLK
    w0 = np.minimum(w0, nk * _BLK - kbl)
    blocks = np.stack([mp[i * _BLK:(i + 1) * _BLK, w0[i]:w0[i] + kbl]
                       for i in range(ni)])
    return _Side(blocks, w0.astype(np.int32), kbl)


def _lane_side(m: np.ndarray, c: int, max_kb: int = 6) -> _Side | None:
    """Lane-axis decomposition on the C-expanded indexing (q = w*C + ch):
    out lane tile j = t1[:, w0[j]:w0[j]+kbl] @ blocks[j]."""
    On, n = m.shape
    onl = On * c
    nl = n * c
    nj = -(-onl // _BLK)
    nk = -(-nl // _BLK)
    w0 = np.zeros(nj, np.int64)
    kb = 1
    for j in range(nj):
        p = np.arange(j * _BLK, (j + 1) * _BLK)
        rows = np.unique(np.clip(p, 0, onl - 1) // c)
        nz = np.nonzero(m[rows].any(0))[0]
        if nz.size:
            q0, q1 = nz[0] * c, nz[-1] * c + (c - 1)
            w0[j] = (q0 // _BLK) * _BLK
            kb = max(kb, -(-int(q1 + 1 - w0[j]) // _BLK))
    if kb > min(max_kb, nk):
        return None
    kbl = kb * _BLK
    w0 = np.minimum(w0, nk * _BLK - kbl)
    blocks = np.zeros((nj, kbl, _BLK), np.float32)
    for j in range(nj):
        p = np.arange(j * _BLK, (j + 1) * _BLK)
        q = np.arange(w0[j], w0[j] + kbl)
        pin = p < onl
        qin = q < nl
        blk = np.where((p[None, :] % c == q[:, None] % c) & pin[None, :]
                       & qin[:, None],
                       m[np.minimum(p[None, :], onl - 1) // c,
                         np.minimum(q[:, None], nl - 1) // c], 0.0)
        blocks[j] = blk
    return _Side(blocks, w0.astype(np.int32), kbl)


_DECOMP_CACHE: dict = {}


def _decompose(mh: np.ndarray, mw: np.ndarray, c: int):
    # keyed on identity, not content: the matrices come from ops/image.py's
    # lru_cached builders (stable objects for the process lifetime), and
    # this runs per stencil op in the per-frame hot path — tobytes() of a
    # multi-MB dense matrix per call would cost more than the kernel saves
    key = (id(mh), mh.shape, id(mw), mw.shape, c)
    if key not in _DECOMP_CACHE:
        _DECOMP_CACHE[key] = (_row_side(mh), _lane_side(mw, c))
    return _DECOMP_CACHE[key]


def can_fuse(mh: np.ndarray, mw: np.ndarray, c: int) -> bool:
    """True when both axes decompose into narrow contiguous band windows
    and the working set fits VMEM comfortably."""
    rs, ls = _decompose(mh, mw, c)
    if rs is None or ls is None:
        return False
    wpl = _ceil_to(mw.shape[1] * c, _BLK)
    slab = rs.kbl * wpl * 4
    bts = ls.blocks.size * 4
    out_row = _ceil_to(mw.shape[0] * c, _BLK) * _BLK * 4
    return slab + bts + out_row + rs.blocks[0].size * 4 < 10 * 2 ** 20


@functools.partial(jax.jit, static_argnames=("lane_w0", "interpret"))
def _sandwich_call(x, rowlo, a_blocks, bt_blocks, lane_w0: tuple,
                   interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ni, _, rhl = a_blocks.shape
    nj, kbl, _ = bt_blocks.shape
    wpl = x.shape[1]
    hi = jax.lax.Precision.HIGHEST

    def kernel(rowlo_ref, a_ref, bt_ref, x_ref, out_ref, slab, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            x_ref.at[pl.ds(pl.multiple_of(rowlo_ref[i], _BLK), rhl), :],
            slab, sem)
        cp.start()
        cp.wait()
        t1 = jax.lax.dot_general(
            a_ref[0], slab[:], (((1,), (0,)), ((), ())),
            precision=hi, preferred_element_type=jnp.float32)  # [128, wpl]
        for j in range(nj):                      # static lane windows
            seg = t1[:, lane_w0[j]:lane_w0[j] + kbl]
            out_ref[:, j * _BLK:(j + 1) * _BLK] = jax.lax.dot_general(
                seg, bt_ref[j], (((1,), (0,)), ((), ())),
                precision=hi, preferred_element_type=jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ni,),
        in_specs=[
            pl.BlockSpec((1, _BLK, rhl), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((_BLK, nj * _BLK), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rhl, wpl), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ni * _BLK, nj * _BLK), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(rowlo, a_blocks, bt_blocks, x)


def _row_blocks_fixed(m: np.ndarray, kbl: int):
    """Per-tile [128, kbl] row blocks with a caller-fixed window width."""
    On, n = m.shape
    ni = -(-On // _BLK)
    nk = -(-n // _BLK)
    mp = np.zeros((ni * _BLK, nk * _BLK), np.float32)
    mp[:On, :n] = m
    blocks = np.zeros((ni, _BLK, kbl), np.float32)
    w0 = np.zeros(ni, np.int64)
    for i in range(ni):
        nz = np.nonzero(mp[i * _BLK:(i + 1) * _BLK].any(0))[0]
        if nz.size:
            s = min(max((nz[0] // _BLK) * _BLK, 0), nk * _BLK - kbl)
            if nz[-1] >= s + kbl:
                raise ValueError("row band exceeds the fixed window")
            w0[i] = s
            blocks[i] = mp[i * _BLK:(i + 1) * _BLK, s:s + kbl]
    return blocks, w0.astype(np.int32)


def _lane_blocks_fixed(m: np.ndarray, kbl: int, w0=None):
    """Per-out-lane-tile [kbl, 128] transposed blocks, fixed width, C=1.
    `w0` (optional [nj] int array) pins the window starts — used to share
    ONE static window layout across every pair of a stacked call (Mosaic
    cannot lower a dynamic VMEM slice, so the kernel's lane offsets must
    be compile-time constants common to all grid steps)."""
    On, n = m.shape
    nj = -(-On // _BLK)
    nk = -(-n // _BLK)
    blocks = np.zeros((nj, kbl, _BLK), np.float32)
    if w0 is None:
        w0 = np.zeros(nj, np.int64)
        pinned = False
    else:
        w0 = np.asarray(w0, np.int64).copy()
        pinned = True
    mp = np.zeros((nj * _BLK, nk * _BLK), np.float32)
    mp[:On, :n] = m
    for j in range(nj):
        nz = np.nonzero(mp[j * _BLK:(j + 1) * _BLK].any(0))[0]
        if nz.size:
            if not pinned:
                w0[j] = min(max((nz[0] // _BLK) * _BLK, 0), nk * _BLK - kbl)
            if nz[0] < w0[j] or nz[-1] >= w0[j] + kbl:
                raise ValueError("lane band exceeds the fixed window")
            blocks[j] = mp[j * _BLK:(j + 1) * _BLK, w0[j]:w0[j] + kbl].T
    return blocks, w0.astype(np.int32)


def _lane_union_windows(mws, max_kb: int = 6):
    """Static per-output-lane-tile windows covering EVERY pair's band:
    returns (w0 [nj], kbl) or None when the union stops being narrow."""
    On, n = mws[0].shape
    nj = -(-On // _BLK)
    nk = -(-n // _BLK)
    lo = np.full(nj, n, np.int64)
    hi = np.zeros(nj, np.int64)
    for m in mws:
        mp = np.zeros((nj * _BLK, nk * _BLK), np.float32)
        mp[:On, :n] = m
        for j in range(nj):
            nz = np.nonzero(mp[j * _BLK:(j + 1) * _BLK].any(0))[0]
            if nz.size:
                lo[j] = min(lo[j], nz[0])
                hi[j] = max(hi[j], nz[-1])
    w0 = (np.minimum(lo, nk * _BLK) // _BLK) * _BLK
    kb = 1
    for j in range(nj):
        if hi[j] >= lo[j]:
            kb = max(kb, -(-int(hi[j] + 1 - w0[j]) // _BLK))
    if kb > min(max_kb, nk):
        return None
    kbl = kb * _BLK
    w0 = np.minimum(w0, nk * _BLK - kbl)
    return w0, kbl


def _min_kb(m: np.ndarray) -> int:
    On, n = m.shape
    nb = -(-On // _BLK)
    nk = -(-n // _BLK)
    mp = np.zeros((nb * _BLK, nk * _BLK), np.float32)
    mp[:On, :n] = m
    kb = 1
    for i in range(nb):
        nz = np.nonzero(mp[i * _BLK:(i + 1) * _BLK].any(0))[0]
        if nz.size:
            s = (nz[0] // _BLK) * _BLK
            kb = max(kb, -(-int(nz[-1] + 1 - s) // _BLK))
    return kb


def stack_fusable(mhs, mws, max_kb: int = 4) -> bool:
    """True when every pair's row band fits a narrow fixed window and the
    lane bands fit a narrow STATIC union window shared by all pairs."""
    try:
        kbr = max(_min_kb(m) for m in mhs)
    except ValueError:
        return False
    nkr = -(-mhs[0].shape[1] // _BLK)
    return (kbr <= min(max_kb, nkr)
            and _lane_union_windows(mws, max_kb) is not None)


@functools.partial(jax.jit, static_argnames=("lane_w0", "interpret"))
def _stack_call(x, rowlo, a_blocks, bt_blocks, lane_w0: tuple,
                interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P, ni, _, rhl = a_blocks.shape
    _, nj, kbl, _ = bt_blocks.shape
    wpl = x.shape[1]
    hi = jax.lax.Precision.HIGHEST

    def kernel(rowlo_ref, a_ref, bt_ref, x_ref, out_ref, slab, sem):
        p = pl.program_id(0)
        i = pl.program_id(1)
        cp = pltpu.make_async_copy(
            x_ref.at[pl.ds(pl.multiple_of(rowlo_ref[p * ni + i], _BLK),
                           rhl), :],
            slab, sem)
        cp.start()
        cp.wait()
        t1 = jax.lax.dot_general(
            a_ref[0, 0], slab[:], (((1,), (0,)), ((), ())),
            precision=hi, preferred_element_type=jnp.float32)
        # lane windows are STATIC (shared union across pairs): Mosaic has
        # no dynamic VMEM slice, so per-pair offsets can't come from the
        # scalar-prefetch operand
        for j in range(nj):
            seg = t1[:, lane_w0[j]:lane_w0[j] + kbl]
            out_ref[0, :, j * _BLK:(j + 1) * _BLK] = jax.lax.dot_general(
                seg, bt_ref[0, j], (((1,), (0,)), ((), ())),
                precision=hi, preferred_element_type=jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P, ni),
        in_specs=[
            pl.BlockSpec((1, 1, _BLK, rhl), lambda p, i, *_: (p, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nj, kbl, _BLK), lambda p, i, *_: (p, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, _BLK, nj * _BLK),
                               lambda p, i, *_: (p, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rhl, wpl), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, ni * _BLK, nj * _BLK),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(rowlo, a_blocks, bt_blocks, x)


_STACK_CACHE: dict = {}


def banded_stack_pallas(x, mhs, mws, cache_key=None,
                        interpret: bool = False):
    """P banded sandwiches of the SAME input in one kernel:
    out[p] = mhs[p] @ x @ mws[p]^T. x: [H, W] (C=1); all pairs share one
    output shape. One slab DMA feeds both passes per (pair, row-tile) —
    the chained-blur formulation this replaces re-reads and re-writes the
    full image once per output (SIFT's Gaussian octave stack,
    SiftGPU ProgramCU.cu's per-scale passes).

    cache_key: optional hashable identity for the matrix set (skips
    re-decomposing multi-MB matrices per call)."""
    h, w = x.shape
    ho, wo = mhs[0].shape[0], mws[0].shape[0]
    key = cache_key if cache_key is not None else (
        tuple(id(m) for m in mhs), tuple(id(m) for m in mws))
    tabs = _STACK_CACHE.get(key)
    if tabs is None:
        kbr = max(_min_kb(m) for m in mhs) * _BLK
        lw0, kblw = _lane_union_windows(mws)
        ab, rl, bb = [], [], []
        for mh, mw in zip(mhs, mws):
            a, r = _row_blocks_fixed(mh, kbr)
            b, _ = _lane_blocks_fixed(mw, kblw, w0=lw0)
            ab.append(a)
            rl.append(r)
            bb.append(b)
        # cache HOST arrays only: a jnp.asarray built inside one jit
        # trace is that trace's constant — reusing it from a later trace
        # is a tracer leak (crashes the second program to share a
        # cache_key)
        tabs = (np.stack(ab), np.concatenate(rl),
                np.stack(bb), tuple(int(v) for v in lw0))
        _STACK_CACHE[key] = tabs
    a_np, rowlo, b_np, lane_w0 = tabs
    a_blocks = jnp.asarray(a_np)
    bt_blocks = jnp.asarray(b_np)
    wpl = _ceil_to(w, _BLK)
    hp = _ceil_to(h, _BLK)
    xp = jnp.pad(x.astype(jnp.float32), ((0, hp - h), (0, wpl - w)))
    out = _stack_call(xp, jnp.asarray(rowlo), a_blocks, bt_blocks,
                      lane_w0, interpret)
    return out[:, :ho, :wo]


def banded_sandwich_pallas(x, mh: np.ndarray, mw: np.ndarray,
                           interpret: bool = False):
    """x: [H, W, C] float32; mh: [Ho, H]; mw: [Wo, W] banded numpy
    matrices. Returns [Ho, Wo, C] float32 = mh @ x @ mw^T per channel.
    Caller must have checked can_fuse(mh, mw, C)."""
    h, w, c = x.shape
    ho, wo = mh.shape[0], mw.shape[0]
    rs, ls = _decompose(mh, mw, c)
    wpl = _ceil_to(w * c, _BLK)
    hp = _ceil_to(h, _BLK)
    xp = jnp.pad(x.astype(jnp.float32).reshape(h, w * c),
                 ((0, hp - h), (0, wpl - w * c)))
    out = _sandwich_call(
        xp, jnp.asarray(rs.w0), jnp.asarray(rs.blocks),
        jnp.asarray(ls.blocks), tuple(int(v) for v in ls.w0), interpret)
    return out[:ho, :wo * c].reshape(ho, wo, c)
