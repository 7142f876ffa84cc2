"""Pallas packed-pyramid builder: the whole ORB scale pyramid in ONE call.

orb_detect's XLA path builds the pyramid as a chain of 8 per-level
bilinear resizes (banded MXU matmuls with materialized intermediates,
~0.76 ms @1080p) and then concatenates edge-padded blocks for the patch
gatherer. This kernel produces the final packed layout directly:

  * the packed buffer (one tall [sum levels' padded rows, WpL] image,
    each level edge-padded by the gather radius) is the pallas OUTPUT,
    aliased to an input whose level-0 block the host pre-fills;
  * grid step l-1 builds level l FROM level l-1's block of that same
    buffer (the TPU grid is sequential; every slab read is an explicit
    DMA issued after the previous level's writes completed);
  * each 128-row output tile is one banded sandwich: rows via a per-tile
    [128, 256] matrix that fuses bilinear-resize rows with the edge-pad
    row clamp, lanes via per-level [256, 128] band blocks (same
    decomposition as ops/stencil_pallas.py) — so resize, edge padding,
    and packing happen in one HBM pass per level.

Matrices replicate ops/image.resize_bilinear's chain level-by-level
(_resize_matrix per step, composed exactly with the clamp selectors in
float64), so outputs match the XLA chain to matmul precision.
Serves FeatureDetectorORB.cpp:808-851 (per-level cv::resize) + the
packed-gather staging the reference does with per-level cv::Mat copies.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

_BLK = 128
# band window per output tile: starts are 128-aligned, so the window must
# hold alignment slack + the tile's source span (128 * scale_factor + taps)
# — 384 fits scale factors up to ~1.9; 256 failed exactly at the
# production shape (1080p, sf=1.2: 128 + 156 = 284 > 256)
_RKL = 384
_NJMAX = 16


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass(frozen=True)
class PyrPlan:
    shapes: tuple          # ((lh, lw), ...) per level
    r: int                 # gather radius (edge pad)
    wpl: int               # packed lane count
    bases: tuple           # packed row base per level (128-mult)
    blk_rows: tuple        # padded rows per level block
    total_rows: int
    nj: tuple              # lane tiles per level (levels >= 1)
    ntiles: tuple          # row tiles per level (levels >= 1)


def _level_shapes(h: int, w: int, n_levels: int, scale_factor: float):
    out = []
    for lvl in range(n_levels):
        s = scale_factor ** lvl
        out.append((max(1, int(round(h / s))) if lvl else h,
                    max(1, int(round(w / s))) if lvl else w))
    return tuple(out)


@functools.lru_cache(maxsize=16)
def _make_plan(h: int, w: int, n_levels: int, scale_factor: float,
               r: int) -> PyrPlan | None:
    shapes = _level_shapes(h, w, n_levels, scale_factor)
    wpl = _ceil_to(w + 2 * r, _BLK)
    # windows are _RKL wide: both the padded lane count and the level-0
    # block rows must cover one full window
    if (wpl < _RKL or _ceil_to(h + 2 * r, _BLK) < _RKL
            or scale_factor > 1.9):
        return None
    bases, blk_rows, row = [], [], 0
    for lh, lw in shapes:
        bases.append(row)
        blk_rows.append(_ceil_to(lh + 2 * r, _BLK))
        row += blk_rows[-1]
    nj = tuple(-(-(lw + 2 * r) // _BLK) for lh, lw in shapes[1:])
    ntiles = tuple(blk_rows[i + 1] // _BLK for i in range(n_levels - 1))
    if max(nj) > _NJMAX:
        return None
    # tail slack: the deepest source level's row window ([base, base+_RKL))
    # must stay inside the buffer even when its block is narrower than one
    # window (its matrix columns there are zero — see _tile_blocks)
    row = max(row, bases[n_levels - 2] + _RKL)
    return PyrPlan(shapes, r, wpl, tuple(bases), tuple(blk_rows), row,
                   nj, ntiles)


def _pad_clamp_matrix(resize: np.ndarray, out_len: int, r: int,
                      src_off: int, src_cols: int) -> np.ndarray:
    """[out_rows_padded_block?, src_cols]: out row t -> resize row
    clip(t - r, 0, n-1), source col q -> q + src_off (the source block's
    own edge pad). Rows beyond out_len + 2r are zero."""
    on, n = resize.shape
    assert on == out_len
    rows = out_len + 2 * r
    m = np.zeros((rows, src_cols), np.float64)
    for t in range(rows):
        c = min(max(t - r, 0), out_len - 1)
        m[t, src_off:src_off + n] = resize[c]
    return m


def _tile_blocks(m: np.ndarray, n_blocks: int, src_padded: int):
    """Per-128-row-tile dense [128, _RKL] band blocks + window starts.
    When the source block is narrower than one window, the matrix is
    zero-padded: the slab DMA then reads past the block into the next
    level's region (kept in-bounds by the plan's tail slack) and the
    zero weights ignore it."""
    rows = n_blocks * _BLK
    mp = np.zeros((rows, max(src_padded, _RKL)), np.float64)
    mp[:m.shape[0], :m.shape[1]] = m
    blocks = np.zeros((n_blocks, _BLK, _RKL), np.float32)
    w0 = np.zeros(n_blocks, np.int64)
    for i in range(n_blocks):
        rowsi = mp[i * _BLK:(i + 1) * _BLK]
        nz = np.nonzero(rowsi.any(0))[0]
        if nz.size:
            s = min(max((nz[0] // _BLK) * _BLK, 0),
                    max(src_padded - _RKL, 0))
            if nz[-1] >= s + _RKL:
                raise ValueError("band exceeds the tile window")
            w0[i] = s
            blocks[i] = rowsi[:, s:s + _RKL]
    return blocks, w0.astype(np.int32)


@functools.lru_cache(maxsize=16)
def _tables(h, w, n_levels, scale_factor, r):
    from ..image import _resize_matrix
    plan = _make_plan(h, w, n_levels, scale_factor, r)
    if plan is None:
        return None
    a_blocks, rowlo, atile, dstbase, ntiles = [], [], [], [], []
    bt = np.zeros((n_levels - 1, _NJMAX, _RKL, _BLK), np.float32)
    lw0 = np.zeros((n_levels - 1, _NJMAX), np.int32)
    for l in range(1, n_levels):
        ph, pw = plan.shapes[l - 1]
        lh, lw = plan.shapes[l]
        src_rows = plan.blk_rows[l - 1]
        # every block (incl. level 0) is edge-padded by r — raw row/px q
        # of the source level sits at block row/lane q + r
        mrow = _pad_clamp_matrix(
            np.asarray(_resize_matrix(ph, lh), np.float64), lh, r,
            r, src_rows)
        blocks, w0 = _tile_blocks(mrow, plan.blk_rows[l] // _BLK,
                                  src_rows)
        atile.append(sum(b.shape[0] for b in a_blocks))
        a_blocks.append(blocks)
        rowlo.append(plan.bases[l - 1] + w0)
        dstbase.append(plan.bases[l])
        ntiles.append(blocks.shape[0])
        mlane = _pad_clamp_matrix(
            np.asarray(_resize_matrix(pw, lw), np.float64), lw, r,
            r, plan.wpl)
        lblocks, lw0_l = _tile_blocks(mlane, plan.nj[l - 1], plan.wpl)
        bt[l - 1, :plan.nj[l - 1]] = np.transpose(lblocks, (0, 2, 1))
        lw0[l - 1, :plan.nj[l - 1]] = lw0_l
    atile = np.asarray(atile, np.int32)
    return (plan, np.concatenate(a_blocks, 0),
            np.concatenate(rowlo).astype(np.int32), atile,
            np.asarray(dstbase, np.int32), np.asarray(ntiles, np.int32),
            bt, lw0.reshape(-1), np.asarray(plan.nj, np.int32))


def pyramid_available(h: int, w: int, n_levels: int,
                      scale_factor: float, r: int) -> bool:
    try:
        return _tables(h, w, n_levels, scale_factor, r) is not None
    except ValueError:
        return False


@functools.partial(jax.jit, static_argnames=("n_levels", "scale_factor",
                                              "r", "interpret"))
def build_packed_pyramid(img, n_levels: int, scale_factor: float, r: int,
                         interpret: bool = False):
    """img: [H, W] float32 level-0 image. Returns the packed pyramid
    [plan.total_rows, plan.wpl] float32 (get the layout from
    pyramid_plan()). Caller must have checked pyramid_available()."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = img.shape
    tabs = _tables(h, w, n_levels, scale_factor, r)
    (plan, a_blocks, rowlo, atile, dstbase, ntiles, bt, lw0, njs) = tabs
    wpl = plan.wpl
    njl = min(_NJMAX, wpl // _BLK)      # static lane-tile loop bound
    nj_lanes = njl * _BLK
    # Mosaic lowers only DEFAULT/HIGHEST dot precisions (HIGH fails on hw)
    hi = jax.lax.Precision.HIGHEST

    # host pre-fill: level-0 block edge-padded into the aliased buffer
    blk0 = jnp.pad(img.astype(jnp.float32), r, mode="edge")
    blk0 = jnp.pad(blk0, ((0, plan.blk_rows[0] - blk0.shape[0]),
                          (0, wpl - blk0.shape[1])))
    init = jnp.concatenate(
        [blk0, jnp.zeros((plan.total_rows - plan.blk_rows[0], wpl),
                         jnp.float32)], 0)

    # lane windows must be STATIC (Mosaic has no dynamic VMEM slice):
    # unroll per-level branches, each with its compile-time window starts
    njs_st = tuple(int(v) for v in njs)
    lw0_st = tuple(tuple(int(lw0[l * _NJMAX + j]) for j in range(njs_st[l]))
                   for l in range(n_levels - 1))

    def kernel(ntiles_ref, dstbase_ref, atile_ref, rowlo_ref,
               bt_ref, a_ref, io_ref, out_ref, slab, abuf, obuf, sems):
        li = pl.program_id(0)
        # zero the lane blocks beyond this level's width once per level:
        # the output DMA copies the full obuf, and uninitialized VMEM
        # scratch could hold NaN bits that later levels' zero-weight
        # matmul windows would propagate (0 * NaN = NaN)
        for lvl in range(n_levels - 1):
            if njs_st[lvl] < njl:
                @pl.when(li == lvl)
                def _(lvl=lvl):
                    for j in range(njs_st[lvl], njl):
                        obuf[:, j * _BLK:(j + 1) * _BLK] = jnp.zeros(
                            (_BLK, _BLK), jnp.float32)

        def body(t, _):
            gi = atile_ref[li] + t
            cps = pltpu.make_async_copy(
                out_ref.at[pl.ds(pl.multiple_of(rowlo_ref[gi], _BLK),
                                 _RKL), :],
                slab, sems.at[0])
            cpa = pltpu.make_async_copy(a_ref.at[gi], abuf, sems.at[1])
            cps.start()
            cpa.start()
            cps.wait()
            cpa.wait()
            t1 = jax.lax.dot_general(
                abuf[:], slab[:], (((1,), (0,)), ((), ())),
                precision=hi, preferred_element_type=jnp.float32)
            for lvl in range(n_levels - 1):
                @pl.when(li == lvl)
                def _(lvl=lvl):
                    for j in range(njs_st[lvl]):
                        seg = t1[:, lw0_st[lvl][j]:lw0_st[lvl][j] + _RKL]
                        obuf[:, j * _BLK:(j + 1) * _BLK] = \
                            jax.lax.dot_general(
                                seg, bt_ref[0, j],
                                (((1,), (0,)), ((), ())), precision=hi,
                                preferred_element_type=jnp.float32)
            dst = pl.multiple_of(dstbase_ref[li] + t * _BLK, _BLK)
            cpo = pltpu.make_async_copy(
                obuf, out_ref.at[pl.ds(dst, _BLK), pl.ds(0, nj_lanes)],
                sems.at[2])
            cpo.start()
            cpo.wait()
            return 0

        jax.lax.fori_loop(0, ntiles_ref[li], body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_levels - 1,),
        in_specs=[
            pl.BlockSpec((1, _NJMAX, _RKL, _BLK),
                         lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((_RKL, wpl), jnp.float32),
                        pltpu.VMEM((_BLK, _RKL), jnp.float32),
                        pltpu.VMEM((_BLK, nj_lanes), jnp.float32),
                        pltpu.SemaphoreType.DMA((3,))],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((plan.total_rows, wpl),
                                       jnp.float32),
        grid_spec=grid_spec,
        input_output_aliases={6: 0},    # io input (4 prefetch + 2) -> out
        interpret=interpret,
    )(jnp.asarray(ntiles), jnp.asarray(dstbase), jnp.asarray(atile),
      jnp.asarray(rowlo), jnp.asarray(bt), jnp.asarray(a_blocks), init)


def pyramid_plan(h: int, w: int, n_levels: int, scale_factor: float,
                 r: int) -> PyrPlan:
    return _tables(h, w, n_levels, scale_factor, r)[0]
