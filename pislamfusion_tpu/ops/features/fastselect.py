"""Pallas fused FAST-score + NMS + per-cell winner selection.

The XLA formulation (ops/features/orb.py: fast_score_map -> mask ->
_nms3 -> per-cell reduce_window pair) materializes the dense score map
and its 3x3 max in HBM and re-reads them per stage — measured ~1.3 ms of
the 1080p ORB budget (~10x off the HBM roofline; the image is only 4 MB).
This kernel computes the whole chain per 32-row cell band in VMEM:

  * ONE pallas_call covers every pyramid level: the levels are stacked
    into a packed image (cell-aligned level bases), each grid step DMAs
    one (cell+16)-row slab (double-buffered, 8-row-aligned origins) and
    reduces it to two [1, W] rows — per-lane band maximum and the
    winner's linear index. HBM traffic drops from ~25 dense-plane passes
    to 1.25 image reads + a tiny output;
  * the FAST-16 arc score is the same shifted-difference min/max tree as
    the XLA path (16 cyclic min3 planes per polarity), evaluated on
    lane-rolled slab slices on the VPU, in bf16 on TPU like the XLA path;
  * threshold/border masks, 3x3 NMS, and the per-lane (max, first-index)
    reduction replicate ops/features/orb.py::select_keypoints's
    per_cell==1 semantics bit-for-bit — including row-major-first tie
    order and the zero-cell first-pixel index convention — so the XLA
    tail (per-cell lane reduce + flat top-k) is unchanged.

Replaces the dense stage of the op the reference implements as per-cell
scalar FAST retries (FeatureDetectorORB.cpp:555-731).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

# FAST-16 circle offsets (dx, dy), OpenCV order — keep identical to orb.py
_CIRCLE = np.array([
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
], np.int32)

_BIG_LIN = np.int32(1 << 30)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass(frozen=True)
class _Plan:
    """Static packing plan for a pyramid of level shapes."""
    shapes: tuple            # ((lh, lw), ...) level image shapes
    cell: int
    wmax: int                # packed lane count (128-multiple)
    bases: tuple             # packed row base per level (cell-aligned + 8)
    tiles: tuple             # (level, band_index) per grid step
    total_rows: int          # packed rows incl. top/bottom DMA slack

    @property
    def n_tiles(self) -> int:
        return len(self.tiles)


@functools.lru_cache(maxsize=32)
def _make_plan(shapes: tuple, cell: int) -> _Plan:
    wmax = _ceil_to(max(w for _, w in shapes), 128)
    bases, tiles = [], []
    row = 8                          # top DMA slack (origins reach y0-8)
    for lvl, (lh, lw) in enumerate(shapes):
        bases.append(row)
        ncy = -(-lh // cell)
        tiles.extend((lvl, t) for t in range(ncy))
        row += _ceil_to(lh, max(cell, 8))
    slab = cell + 16
    return _Plan(shapes, cell, wmax, tuple(bases), tuple(tiles), row + slab)


def _fast_score(center_rolls, nsc: int):
    """FAST-16 corner score over `nsc` rows. center_rolls[dx+3] is the
    slab lane-rolled by -dx; row r's circle-center is rolled row r+3."""
    def shifted(dx, dy):
        return jax.lax.slice_in_dim(center_rolls[dx + 3], 3 + dy, 3 + dy + nsc,
                                    axis=0)

    c = shifted(0, 0)
    d = [shifted(int(dx), int(dy)) - c for dx, dy in _CIRCLE]
    score = None
    for sign in (1.0, -1.0):
        ds = d if sign > 0 else [-x for x in d]
        m3 = [jnp.minimum(jnp.minimum(ds[i], ds[(i + 1) % 16]),
                          ds[(i + 2) % 16]) for i in range(16)]
        for i in range(16):
            arc = jnp.minimum(jnp.minimum(m3[i], m3[(i + 3) % 16]),
                              m3[(i + 6) % 16])
            score = arc if score is None else jnp.maximum(score, arc)
    return score.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=(
    "plan", "min_threshold", "border", "use_bf16", "interpret"))
def _winners_kernel_call(packed, oy, y0g, lhv, lwv, wpv, plan: _Plan,
                         min_threshold: float, border: int,
                         use_bf16: bool, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cell, wmax, n_tiles = plan.cell, plan.wmax, plan.n_tiles
    slab_h = cell + 16
    nsc = cell + 2                   # score rows: band rows +-1 for NMS
    compute_dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    thr = float(min_threshold)   # static -> folded into the kernel

    def kernel(oy_ref, y0_ref, lh_ref, lw_ref, wp_ref, src_ref,
               outv_ref, outi_ref, slabs, sem):
        def issue(t, slot):
            o = pl.multiple_of(oy_ref[t], 8)
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(o, slab_h), :], slabs.at[slot],
                sem.at[slot])

        issue(0, 0).start()
        lanes_s = jax.lax.broadcasted_iota(jnp.int32, (nsc, wmax), 1)
        rows_s = jax.lax.broadcasted_iota(jnp.int32, (nsc, wmax), 0)
        rows_b = jax.lax.broadcasted_iota(jnp.int32, (cell, wmax), 0)
        lanes_b = jax.lax.broadcasted_iota(jnp.int32, (cell, wmax), 1)

        def body(t, _):
            slot = jax.lax.rem(t, 2)
            nxt = jax.lax.rem(t + 1, 2)

            @pl.when(t + 1 < n_tiles)
            def _():
                issue(t + 1, nxt).start()

            issue(t, slot).wait()
            # slab rows j <-> level rows y0 - 8 + j; circle-center rows for
            # score row r (level y0 + r - 1) sit at slab row r + 7, so the
            # rolled center window is slab rows [4, 4 + nsc + 6).
            # roll in f32, cast after: Mosaic's tpu.dynamic_rotate only
            # lowers for 32-bit element types (bf16 rotate fails on hw)
            win = slabs[slot][4:4 + nsc + 6]
            rolls = [(win if dx == 0 else
                      pltpu.roll(win, (-dx) % wmax, axis=1))
                     .astype(compute_dtype)
                     for dx in range(-3, 4)]
            score = _fast_score(rolls, nsc)

            y0 = y0_ref[t]
            lh = lh_ref[t]
            lw = lw_ref[t]
            gy = y0 - 1 + rows_s
            ok = ((gy >= border) & (gy < lh - border)
                  & (lanes_s >= border) & (lanes_s < lw - border))
            s = jnp.where(ok & (score > thr), score, 0.0)
            # 3x3 NMS for the cell's rows (score rows 1..cell)
            sv = jnp.maximum(jnp.maximum(s[0:cell], s[1:cell + 1]),
                             s[2:cell + 2])
            m = jnp.maximum(jnp.maximum(sv, pltpu.roll(sv, 1, axis=1)),
                            pltpu.roll(sv, wmax - 1, axis=1))
            sb = s[1:cell + 1]
            nms = jnp.where(sb >= m, sb, 0.0)
            colmax = jnp.max(nms, axis=0, keepdims=True)
            lin = (y0 + rows_b) * wp_ref[t] + lanes_b
            cand = jnp.where(nms == colmax, lin, _BIG_LIN)
            colidx = jnp.min(cand, axis=0, keepdims=True)
            outv_ref[t, :] = colmax[0]
            outi_ref[t, :] = colidx[0]
            return 0

        jax.lax.fori_loop(0, n_tiles, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=(
            pl.BlockSpec((n_tiles, wmax), lambda i, *refs: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, wmax), lambda i, *refs: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((2, slab_h, wmax), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    # f32 score planes push the kernel's stack past the compiler's
    # conservative 16 MB scoped-VMEM default (measured 16.9 MB at 1080p);
    # the physical budget is larger — raise the cap rather than shrink
    # the band
    params = (None if interpret else
              pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024))
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((n_tiles, wmax), jnp.float32),
                   jax.ShapeDtypeStruct((n_tiles, wmax), jnp.int32)),
        grid_spec=grid_spec,
        compiler_params=params,
        interpret=interpret,
    )(oy, y0g, lhv, lwv, wpv, packed)


def fast_cell_winners(levels, cell: int, min_threshold: float,
                      border: int, use_bf16: bool | None = None,
                      interpret: bool = False):
    """Per-cell FAST winners for a whole pyramid in one fused kernel.

    levels: list of [lh, lw] float32 images. Returns a list of
    (cv2d [ncy, ncx] float32, ci2d [ncy, ncx] int32) per level with
    select_keypoints' per_cell==1 semantics (value after threshold/
    border/NMS; linear index into the cell-padded level; row-major-first
    ties; zero cells index their first pixel).

    Requires cell % 8 == 0 (DMA row alignment).
    """
    if cell % 8 != 0:
        raise ValueError("fast_cell_winners requires cell % 8 == 0")
    if use_bf16 is None:
        # f32 by default: the production path runs the XLA chain under
        # jit, where --xla_allow_excess_precision (forced on this box)
        # ELIDES fast_score_map's bf16 casts — jitted XLA scores are full
        # f32. A bf16 kernel matches the EAGER chain bit-for-bit but
        # diverges from the jitted one on ~3% of marginal keypoints;
        # f32 matches the jitted chain exactly (min/max trees are
        # association-exact). Costs ~0.9 MB more VMEM per band slab.
        use_bf16 = False
    shapes = tuple((int(x.shape[0]), int(x.shape[1])) for x in levels)
    plan = _make_plan(shapes, cell)
    wmax = plan.wmax

    blocks = [jnp.zeros((8, wmax), jnp.float32)]
    for (lh, lw), img in zip(shapes, levels):
        blk = jnp.pad(img.astype(jnp.float32),
                      ((0, _ceil_to(lh, max(cell, 8)) - lh),
                       (0, wmax - lw)))
        blocks.append(blk)
    blocks.append(jnp.zeros((plan.total_rows - sum(b.shape[0]
                                                   for b in blocks), wmax),
                            jnp.float32))
    packed = jnp.concatenate(blocks, 0)

    oy = np.empty(plan.n_tiles, np.int32)
    y0g = np.empty(plan.n_tiles, np.int32)
    lhv = np.empty(plan.n_tiles, np.int32)
    lwv = np.empty(plan.n_tiles, np.int32)
    wpv = np.empty(plan.n_tiles, np.int32)
    for i, (lvl, t) in enumerate(plan.tiles):
        lh, lw = shapes[lvl]
        oy[i] = plan.bases[lvl] + t * cell - 8
        y0g[i] = t * cell
        lhv[i] = lh
        lwv[i] = lw
        wpv[i] = _ceil_to(lw, cell)
    outv, outi = _winners_kernel_call(
        packed, jnp.asarray(oy), jnp.asarray(y0g), jnp.asarray(lhv),
        jnp.asarray(lwv), jnp.asarray(wpv), plan,
        float(min_threshold), int(border), bool(use_bf16), interpret)

    # XLA tail: finish the per-cell argmax across lanes (tiny arrays)
    results = []
    row = 0
    for lvl, (lh, lw) in enumerate(shapes):
        ncy = -(-lh // cell)
        ncx = -(-lw // cell)
        wp = ncx * cell
        v = outv[row:row + ncy, :wp]
        idx = outi[row:row + ncy, :wp]
        row += ncy
        cv2d = jax.lax.reduce_window(v, -jnp.inf, jax.lax.max,
                                     (1, cell), (1, cell), "VALID")
        up = jnp.broadcast_to(cv2d[:, :, None],
                              (ncy, ncx, cell)).reshape(ncy, wp)
        big = jnp.int32(ncy * cell * wp)
        cand = jnp.where(v == up, idx, big)
        ci2d = jax.lax.reduce_window(cand, big, jax.lax.min,
                                     (1, cell), (1, cell), "VALID")
        results.append((cv2d, ci2d))
    return results
