"""Pallas patch gather: N fixed-size square patches around keypoints.

The XLA formulation (vmapped dynamic_slice over a padded image) runs on
the scalar core at ~1.3 us/keypoint — ~1.3 ms/frame at N=1000, the
largest single item left in the ORB budget. This kernel streams
DMA-friendly aligned slabs instead:

  * host pre-aligns each keypoint's window origin down to (8, 32): the
    patch then lives inside a [WH=G+8 rows, 128 lanes] slab whose rows
    are 512-byte contiguous HBM reads (perfect DMA granule);
  * one kernel program double-buffers batches of B slab DMAs (sem array
    [2, B]) so DMA latency hides behind the previous batch's extraction;
  * the sub-slab (dy, dx) extraction is two one-hot matmuls on the MXU
    (R[G, WH] @ slab @ C[128, G]) — no cross-lane shuffles.

Replaces the per-keypoint gather in orb.orb_detect (the op the reference
implements as pointer walks in FeatureDetectorORB.cpp:186-226 and SiftGPU
does per CUDA thread). Numerically exact: output equals
img[y-r : y+r+1, x-r : x+r+1] for in-bounds keypoints (callers pre-clamp
via the EDGE_THRESHOLD border, reference :517-526).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("radius", "batch", "interpret"))
def gather_patches_pallas(img, xy, radius: int, batch: int = 8,
                          interpret: bool = False):
    """img: [H, W] or [H, W, C] float32; xy: [N, 2] int32 patch centers.

    Returns [N, G, G(, C)] float32 with G = 2*radius+1, equal to edge-
    padded windows img[y-r:y+r+1, x-r:x+r+1]. C folds into the lane dim
    (slab width scales by C), so C must be small (1 or 2 here).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    H, W, C = img.shape
    N = xy.shape[0]
    G = 2 * radius + 1
    WH = _ceil_to(G + 8, 8)             # rows per slab (y aligned to 8)
    # Mosaic only proves lane-dim HBM slices legal when the offset is a
    # multiple of the 128-lane tile — align the x origin to 128 LANES
    XA = 128 // C                        # x-origin alignment (px)
    WWpx = _ceil_to(XA + G, XA)          # px per slab row
    WW = WWpx * C                        # lanes per slab row (128-mult)
    B = batch
    CH = 8 * B                           # keypoints per grid program: the
    # [CH, C, G, G] output block tiles to ~2.6 MB of VMEM (G pads to the
    # (8, 128) f32 tile) — a full-N output block would tile to 40+ MB
    NP = -(-N // CH) * CH
    NB = CH // B                         # double-buffered batches/program

    # host-side origin alignment; pad keypoints to a full batch multiple.
    # (f32 min tile is (8, 128); the slab is [WH, WW] with WW a multiple
    # of 128 when C*WWpx is — for C=1 WWpx=128 when G<=96.)
    r = radius
    pad_img = jnp.pad(img, ((r, r + WH), (r, r + WWpx), (0, 0)),
                      mode="edge")
    Hp, Wp = pad_img.shape[:2]
    src = pad_img.reshape(Hp, Wp * C)
    xyp = jnp.concatenate(
        [xy.astype(jnp.int32),
         jnp.zeros((NP - N, 2), jnp.int32)], 0)
    y0 = xyp[:, 1]                       # padded-image origin of patch
    x0 = xyp[:, 0]
    ya = (y0 // 8) * 8
    xa = (x0 // XA) * XA
    dy = y0 - ya                         # [0, 8)
    dx = x0 - xa                         # [0, XA)
    # 1-D scalar-prefetch operands: SMEM pads the minor dim to 128, so a
    # [N, 2] layout would burn 512 KB of the 1 MB SMEM per operand
    oy_a = ya
    ox_a = xa * C                        # slab origin lane

    def kernel(oy_ref, ox_ref, dy_ref, dx_ref, src_ref, out_ref, slabs,
               sem):
        chunk = pl.program_id(0)

        def issue(b, s, slot):
            bi = chunk * CH + b * B + s
            oy = pl.multiple_of(oy_ref[bi], 8)
            ox = pl.multiple_of(ox_ref[bi], 128)
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(oy, WH), pl.ds(ox, WW)],
                slabs.at[slot, s], sem.at[slot, s])

        for s in range(B):
            issue(0, s, 0).start()

        rows_i = jax.lax.broadcasted_iota(jnp.int32, (G, WH), 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, (G, WH), 1)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (WW, G), 0)
        sel_i = jax.lax.broadcasted_iota(jnp.int32, (WW, G), 1)

        def body(b, _):
            slot = jax.lax.rem(b, 2)
            nxt = jax.lax.rem(b + 1, 2)

            @pl.when(b + 1 < NB)
            def _():
                for s in range(B):
                    issue(b + 1, s, nxt).start()

            for s in range(B):
                bi = chunk * CH + b * B + s
                lo = b * B + s
                issue(b, s, slot).wait()
                R = (cols_i == rows_i + dy_ref[bi]).astype(jnp.float32)
                slab = slabs[slot, s]                       # [WH, WW]
                rows = jax.lax.dot_general(
                    R, slab, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)     # [G, WW]
                for c in range(C):
                    # channels interleave in lanes: output col j reads
                    # slab lane (j + dx) * C + c
                    Csel = (lane_i == (sel_i + dx_ref[bi]) * C
                            + c).astype(jnp.float32)
                    out_ref[lo, c] = jax.lax.dot_general(
                        rows, Csel, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, NB, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(NP // CH,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (CH, C, G, G), lambda i, *refs: (i, 0, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, B, WH, WW), jnp.float32),
                        pltpu.SemaphoreType.DMA((2, B))],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NP, C, G, G), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(oy_a, ox_a, dy, dx, src)
    out = jnp.moveaxis(out[:N], 1, -1)                      # [N, G, G, C]
    return out[..., 0] if squeeze else out


@functools.partial(jax.jit, static_argnames=("radius", "batch", "interpret"))
def bilinear_grid_pallas(img, centers, rel, radius: int = 16,
                         batch: int = 8, interpret: bool = False):
    """Bilinear-sample img at per-keypoint scattered sub-pixel grids.

    img: [H, W, C] float32; centers: [K, 2] int32 (x, y) in-image points;
    rel: [K, 2, M] float32 sample offsets (dx, dy rows) relative to the
    center, |offset| < radius. Returns [K, M, C] float32 — bilinear taps
    with zero fill outside the image (callers mask with their own
    validity, matching ops.image.bilinear_sample's contract when the
    result is multiplied by `valid`).

    SIFT's orientation/descriptor grids are 256 scattered rotated samples
    per keypoint: as XLA gathers they run on the scalar core (~32 ms/frame
    at K=1000x2 grids). Here each keypoint DMAs ONE aligned slab (the
    patchgather geometry) and evaluates every sample with two SEPARABLE
    weighted one-hot contractions — bilinear interpolation is a rank-1
    row/col weighting, so sample m = w_row(m) @ slab * w_col(m) summed
    over lanes. All MXU/VPU work, no gathers.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W, C = img.shape
    K, _, M = rel.shape
    R = radius
    WH = _ceil_to(2 * R + 2 + 8, 8)
    XA = 128 // C
    WWpx = _ceil_to(XA + 2 * R + 2, XA)
    WW = WWpx * C
    B = batch
    CH = 8 * B
    KP = -(-K // CH) * CH
    NB = CH // B

    # zero-pad (bilinear taps outside the image read 0) + DMA slack
    pad_img = jnp.pad(img, ((R + 2, R + 2 + WH), (R + 2, R + 2 + WWpx),
                            (0, 0)))
    Hp, Wp = pad_img.shape[:2]
    src = pad_img.reshape(Hp, Wp * C)
    cpad = jnp.concatenate(
        [centers.astype(jnp.int32),
         jnp.zeros((KP - K, 2), jnp.int32)], 0)
    rpad = jnp.concatenate(
        [rel.astype(jnp.float32),
         jnp.zeros((KP - K, 2, M), jnp.float32)], 0)
    cy = cpad[:, 1] + (R + 2)            # padded-image center coords
    cx = cpad[:, 0] + (R + 2)
    ya = ((cy - R) // 8) * 8
    xa = ((cx - R) // XA) * XA
    dy0 = cy - ya                        # center row within slab
    dx0 = cx - xa

    def kernel(oy_ref, ox_ref, dy_ref, dx_ref, rel_ref, src_ref, out_ref,
               slabs, sem):
        chunk = pl.program_id(0)

        def issue(b, s, slot):
            bi = chunk * CH + b * B + s
            oy = pl.multiple_of(oy_ref[bi], 8)
            ox = pl.multiple_of(ox_ref[bi], 128)
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(oy, WH), pl.ds(ox, WW)],
                slabs.at[slot, s], sem.at[slot, s])

        for s in range(B):
            issue(0, s, 0).start()

        row_i = jax.lax.broadcasted_iota(jnp.int32, (M, WH), 1)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (M, WW), 1)

        def body(b, _):
            slot = jax.lax.rem(b, 2)
            nxt = jax.lax.rem(b + 1, 2)

            @pl.when(b + 1 < NB)
            def _():
                for s in range(B):
                    issue(b + 1, s, nxt).start()

            for s in range(B):
                bi = chunk * CH + b * B + s
                lo = b * B + s
                issue(b, s, slot).wait()
                slab = slabs[slot, s]                    # [WH, WW]
                ry = rel_ref[lo, 1] + dy_ref[bi].astype(jnp.float32)
                rx = rel_ref[lo, 0] + dx_ref[bi].astype(jnp.float32)
                y0 = jnp.clip(jnp.floor(ry), 0, WH - 2)
                fy = jnp.clip(ry - y0, 0.0, 1.0)
                y0i = y0.astype(jnp.int32)
                Rw = (jnp.where(row_i == y0i[:, None], 1.0 - fy[:, None],
                                0.0)
                      + jnp.where(row_i == y0i[:, None] + 1, fy[:, None],
                                  0.0))                  # [M, WH]
                A = jax.lax.dot_general(
                    Rw, slab, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [M, WW]
                x0 = jnp.clip(jnp.floor(rx), 0, WWpx - 2)
                fx = jnp.clip(rx - x0, 0.0, 1.0)
                x0i = x0.astype(jnp.int32)
                for c in range(C):
                    Cw = (jnp.where(lane_i == x0i[:, None] * C + c,
                                    1.0 - fx[:, None], 0.0)
                          + jnp.where(lane_i == (x0i[:, None] + 1) * C + c,
                                      fx[:, None], 0.0))  # [M, WW]
                    out_ref[lo, c] = jnp.sum(A * Cw, axis=1)
            return 0

        jax.lax.fori_loop(0, NB, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(KP // CH,),
        in_specs=[
            pl.BlockSpec((CH, 2, M), lambda i, *refs: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (CH, C, M), lambda i, *refs: (i, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, B, WH, WW), jnp.float32),
                        pltpu.SemaphoreType.DMA((2, B))],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((KP, C, M), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ya, xa * C, dy0, dx0, rpad, src)
    return jnp.moveaxis(out[:K], 1, -1)                 # [K, M, C]
