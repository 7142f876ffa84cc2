"""Pallas parallel flat-pyramid builder: every ORB level from level 0.

pyramid_pallas.py builds level l FROM level l-1 inside one kernel — the
grid is a SERIAL chain (each level's slab DMA waits on the previous
level's writes), which measured no faster than the XLA chain. Here the
chain is eliminated algebraically: the per-level resize matrices are the
float64-composed product of the per-step bilinear matrices
(orb._flat_matrices), so every 128-row output tile of every level
depends ONLY on a window of the level-0 image. The grid runs one
program per output tile with no cross-tile dependencies:

  * per tile: two MXU contractions  A[128, RK] @ src[RK, WP] -> t1,
    then per 128-lane tile  t1[:, c0:c0+RK] @ B[RK, 128] -> out tile,
    with the gather layout's edge-clamp pad folded into A/B (the same
    trick as pyramid_pallas);
  * src windows DMA from a bf16 copy of the padded level-0 block,
    double-buffered across tiles; col blocks hit VMEM once per level
    (consecutive tiles of one level index the same block, which the
    Pallas pipeline does not re-fetch);
  * level 0 itself stays an exact f32 XLA edge-pad, aliased into the
    output buffer (the kernel writes only levels >= 1).

Output: the packed [plan.total_rows, plan.wp] f32 buffer of
orb._flat_plan — the SAME buffer the patch gatherer and the fused
winner kernel consume. Serves FeatureDetectorORB.cpp:808-851 (per-level
cv::resize) the TPU way: one program launch, MXU-resident resampling.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BLK = 128
_RK = 640          # source window rows/lanes per tile: covers
#                    128 * scale^(L-1) + taps + 128 alignment slack for
#                    scale_factor^(n_levels-1) <= ~3.9 (8 levels @ 1.2)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=16)
def _tables(h: int, w: int, n_levels: int, scale_factor: float,
            cell: int):
    """Static per-tile tables. Returns None when the shape/params fall
    outside the kernel's regime (plan not 128-aligned, window overflow,
    image smaller than one window)."""
    from .orb import _flat_plan, _flat_matrices
    plan = _flat_plan(h, w, n_levels, scale_factor, cell)
    if plan is None or plan.wp % _BLK:
        return None
    if any(b % _BLK for b in plan.block_rows):
        return None
    src_rows = plan.block_rows[0]
    if src_rows < _RK or plan.wp < _RK:
        return None
    mats = _flat_matrices(h, w, n_levels, scale_factor, cell)
    njl = plan.wp // _BLK
    a_blocks, s0s, dsts = [], [], []
    bt = np.zeros((n_levels - 1, njl, _RK, _BLK), np.float32)
    c0s = np.zeros((n_levels - 1, njl), np.int32)
    lvl_of_tile, atile = [], []
    for lvl in range(1, n_levels):
        mr, mc = mats[lvl]
        # mr maps packed-block rows -> level-0 raw rows; the source
        # buffer is the r-padded level-0 block, so raw row q sits at
        # block row q + cell
        nt = plan.block_rows[lvl] // _BLK
        atile.append(len(a_blocks))
        for t in range(nt):
            rows = mr[t * _BLK:(t + 1) * _BLK]           # [128, h]
            nz = np.nonzero(rows.any(0))[0]
            s0 = 0
            if nz.size:
                s0 = min(max(((nz[0] + cell) // _BLK) * _BLK, 0),
                         src_rows - _RK)
                if nz[-1] + cell >= s0 + _RK:
                    return None
            blk = np.zeros((_BLK, _RK), np.float32)
            blk[:, nz + cell - s0] = rows[:, nz]
            a_blocks.append(blk)
            s0s.append(s0)
            dsts.append(plan.bases[lvl] // _BLK + t)
            lvl_of_tile.append(lvl - 1)
        # lane blocks: mc maps packed lanes -> level-0 raw cols; raw col
        # q sits at src lane q + pad_left
        pl_ = plan.pad_left
        for j in range(njl):
            cols = mc[j * _BLK:(j + 1) * _BLK]           # [128, w]
            nz = np.nonzero(cols.any(0))[0]
            c0 = 0
            if nz.size:
                c0 = min(max(((nz[0] + pl_) // _BLK) * _BLK, 0),
                         plan.wp - _RK)
                if nz[-1] + pl_ >= c0 + _RK:
                    return None
            bt[lvl - 1, j, nz + pl_ - c0, :] = cols[:, nz].T
            c0s[lvl - 1, j] = c0
    return (plan, np.stack(a_blocks), np.asarray(s0s, np.int32),
            np.asarray(dsts, np.int32), np.asarray(lvl_of_tile, np.int32),
            bt, c0s)


def flat_pyramid_available(h: int, w: int, n_levels: int,
                           scale_factor: float, cell: int) -> bool:
    try:
        return _tables(h, w, n_levels, scale_factor, cell) is not None
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=("n_levels", "scale_factor",
                                             "cell", "interpret"))
def build_flat_pyramid(img, n_levels: int, scale_factor: float,
                       cell: int, interpret: bool = False):
    """img: [H, W] (or [B, H, W]) float32. Returns the packed
    [B * plan.total_rows, plan.wp] float32 buffer — frame f's blocks at
    row offset f * plan.total_rows (orb._flat_plan layout per frame).
    A batch rides through the SAME kernel with B* the tiles: per-frame
    work is independent, so batching divides the per-launch overhead.
    Check flat_pyramid_available first."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if img.ndim == 2:
        img = img[None]
    B, h, w = img.shape
    plan, a_blocks, s0s, dsts, lvl_of, bt, c0s = _tables(
        h, w, n_levels, scale_factor, cell)
    wp = plan.wp
    njl = wp // _BLK
    n_tiles1 = a_blocks.shape[0]
    if B > 1:
        src_rows = plan.block_rows[0]
        nblk = plan.total_rows // _BLK
        s0s = np.concatenate([s0s + f * src_rows for f in range(B)])
        dsts = np.concatenate([dsts + f * nblk for f in range(B)])
        lvl_of = np.tile(lvl_of, B)
    abidx = np.tile(np.arange(n_tiles1, dtype=np.int32), B)
    n_tiles = n_tiles1 * B
    # bf16 operands: DEFAULT precision (Mosaic rejects the fp32
    # contract annotation on bf16 vectors); accumulation is f32 via
    # preferred_element_type
    hi = jax.lax.Precision.DEFAULT

    # level-0 blocks: exact f32 edge pad, aliased into the output; the
    # bf16 twins are the kernel's matmul source
    blk0 = jnp.pad(img.astype(jnp.float32),
                   ((0, 0), (cell, plan.block_rows[0] - h - cell),
                    (plan.pad_left, wp - w - plan.pad_left)), mode="edge")
    zero_tail = jnp.zeros((plan.total_rows - plan.block_rows[0], wp),
                          jnp.float32)
    init = jnp.concatenate(
        sum(([blk0[f], zero_tail] for f in range(B)), []), 0)
    src16 = blk0.reshape(B * plan.block_rows[0], wp).astype(jnp.bfloat16)

    # static per-level lane-window starts (Mosaic needs static VMEM
    # slices); resolved per tile via the level id scalar
    c0_st = tuple(tuple(int(c0s[l, j]) for j in range(njl))
                  for l in range(n_levels - 1))

    def kernel(s0_ref, dst_ref, lvl_ref, ab_ref, a_ref, bt_ref, src_ref,
               io_ref, out_ref, slab, obuf, sems):
        ti = pl.program_id(0)

        def issue_src(t, slot):
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(pl.multiple_of(s0_ref[t], _BLK), _RK), :],
                slab.at[slot], sems.at[slot])

        @pl.when(ti == 0)
        def _():
            issue_src(0, 0).start()

        slot = jax.lax.rem(ti, 2)

        @pl.when(ti + 1 < n_tiles)
        def _():
            issue_src(ti + 1, jax.lax.rem(ti + 1, 2)).start()

        issue_src(ti, slot).wait()
        t1 = jax.lax.dot_general(
            a_ref[0], slab[slot],
            (((1,), (0,)), ((), ())), precision=hi,
            preferred_element_type=jnp.float32)          # [128, wp]
        t1b = t1.astype(jnp.bfloat16)
        lvl = lvl_ref[ti]
        for l in range(n_levels - 1):
            @pl.when(lvl == l)
            def _(l=l):
                for j in range(njl):
                    seg = t1b[:, c0_st[l][j]:c0_st[l][j] + _RK]
                    obuf[:, j * _BLK:(j + 1) * _BLK] = jax.lax.dot_general(
                        seg, bt_ref[0, j], (((1,), (0,)), ((), ())),
                        precision=hi, preferred_element_type=jnp.float32)
        cpo = pltpu.make_async_copy(
            obuf, out_ref.at[pl.ds(pl.multiple_of(dst_ref[ti] * _BLK,
                                                  _BLK), _BLK), :],
            sems.at[2])
        cpo.start()
        cpo.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, _BLK, _RK),
                         lambda i, s0, dst, lvl, ab: (ab[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, njl, _RK, _BLK),
                         lambda i, s0, dst, lvl, ab: (lvl[i], 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),     # src16
            pl.BlockSpec(memory_space=pltpu.HBM),     # io alias
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((2, _RK, wp), jnp.bfloat16),
                        pltpu.VMEM((_BLK, wp), jnp.float32),
                        pltpu.SemaphoreType.DMA((3,))],
    )
    params = (None if interpret else
              pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B * plan.total_rows, wp),
                                       jnp.float32),
        grid_spec=grid_spec,
        input_output_aliases={7: 0},     # io input (4 prefetch + 3) -> out
        compiler_params=params,
        interpret=interpret,
    )(jnp.asarray(s0s), jnp.asarray(dsts), jnp.asarray(lvl_of),
      jnp.asarray(abidx), jnp.asarray(a_blocks, jnp.bfloat16),
      jnp.asarray(bt, jnp.bfloat16), src16, init)
