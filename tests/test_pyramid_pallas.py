"""Interpret-mode test for the one-call packed-pyramid Pallas kernel:
build_packed_pyramid must reproduce orb_detect's XLA construction (chained
resize_bilinear per level, edge-pad by the gather radius, stack blocks)
to matmul precision, including the edge-pad rows and the zero tails.
"""
import numpy as np
import jax.numpy as jnp

from pislamfusion_tpu.ops import image as im
from pislamfusion_tpu.ops.features.pyramid_pallas import (
    build_packed_pyramid, pyramid_available, pyramid_plan, _level_shapes)


def _reference_packed(img, n_levels, scale, r, plan):
    level = img
    blocks = []
    shapes = _level_shapes(img.shape[0], img.shape[1], n_levels, scale)
    for lvl, (lh, lw) in enumerate(shapes):
        if lvl:
            level = np.asarray(im.resize_bilinear(
                jnp.asarray(level)[..., None], (lh, lw))[..., 0])
        blk = np.pad(level, r, mode="edge")
        blk = np.pad(blk, ((0, plan.blk_rows[lvl] - blk.shape[0]),
                           (0, plan.wpl - blk.shape[1])))
        blocks.append(blk)
    return np.concatenate(blocks, 0)


def test_packed_pyramid_matches_xla_chain():
    rng = np.random.default_rng(0)
    H, W, L, S, r = 240, 320, 4, 1.2, 21
    img = rng.uniform(0, 255, (H, W)).astype(np.float32)
    assert pyramid_available(H, W, L, S, r)
    plan = pyramid_plan(H, W, L, S, r)
    got = np.asarray(build_packed_pyramid(jnp.asarray(img), L, S, r,
                                          interpret=True))
    ref = _reference_packed(img, L, S, r, plan)
    assert got.shape == ref.shape
    # meaningful regions: every level's (lh+2r, lw+2r) block incl. the
    # edge-pad ring; the padded tails may hold stale tile garbage in
    # `got` (never consumed downstream) so compare per-level regions
    for lvl, (lh, lw) in enumerate(plan.shapes):
        b = plan.bases[lvl]
        g = got[b:b + lh + 2 * r, :lw + 2 * r]
        rr = ref[b:b + lh + 2 * r, :lw + 2 * r]
        err = np.abs(g - rr).max()
        assert err < 5e-2, (lvl, err)


def test_pyramid_unavailable_for_tiny_images():
    assert not pyramid_available(100, 120, 4, 1.2, 21)
