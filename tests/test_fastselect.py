"""Interpret-mode tests for the fused Pallas FAST+NMS+select kernel:
fast_cell_winners must reproduce the XLA chain (fast_score_map -> mask ->
NMS -> per-cell winner) bit-for-bit in f32, including tie order and the
zero-cell index convention, so orb_detect's fused path is a drop-in.
"""
import numpy as np
import jax.numpy as jnp

from pislamfusion_tpu.ops.features import orb
from pislamfusion_tpu.ops.features.fastselect import fast_cell_winners


def _xla_reference(img, k, cell, thr):
    score = orb.fast_score_map(jnp.asarray(img))
    return orb.select_keypoints(score, k, cell, thr)


def _fused(levels, quotas, cell, thr):
    winners = fast_cell_winners([jnp.asarray(x) for x in levels], cell,
                                thr, orb.EDGE_THRESHOLD, use_bf16=False,
                                interpret=True)
    out = []
    for (cv2d, ci2d), k in zip(winners, quotas):
        wp = ci2d.shape[1] * cell
        out.append(orb._topk_flat(cv2d.reshape(-1),
                                  (ci2d // wp).reshape(-1),
                                  (ci2d % wp).reshape(-1), k))
    return out


def _assert_same(got, ref):
    xy_g, v_g, ok_g = (np.asarray(a) for a in got)
    xy_r, v_r, ok_r = (np.asarray(a) for a in ref)
    assert (ok_g == ok_r).all()
    assert np.abs(v_g - v_r).max() == 0.0
    assert (xy_g[ok_r] == xy_r[ok_r]).all()


def test_multilevel_matches_xla_chain():
    rng = np.random.default_rng(0)
    levels = [rng.uniform(0, 255, (240, 320)).astype(np.float32),
              rng.uniform(0, 255, (200, 267)).astype(np.float32)]
    quotas = [30, 20]   # keeps every level on the per_cell==1 path
    fused = _fused(levels, quotas, 32, 7.0)
    for lvl, (img, k) in enumerate(zip(levels, quotas)):
        _assert_same(fused[lvl], _xla_reference(img, k, 32, 7.0))


def test_tie_order_with_quantized_image():
    """Integer-quantized pixels force equal-score ties: the winner must be
    the row-major-first pixel exactly like the XLA reduce-window pair."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 24, (160, 224)).astype(np.float32)
    # k=15 keeps select_keypoints on the per_cell==1 path (35 cells) —
    # the same gate orb_detect applies before using the fused kernel
    assert orb._per_cell_quota(img.shape, 15, 32) == 1
    fused = _fused([img], [15], 32, 7.0)
    _assert_same(fused[0], _xla_reference(img, 15, 32, 7.0))


def test_no_corners_all_invalid():
    img = np.full((96, 128), 77.0, np.float32)
    (xy, v, ok), = _fused([img], [10], 32, 7.0)
    assert not np.asarray(ok).any()
    assert np.abs(np.asarray(v)).max() == 0.0


def test_cell16_matches():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, (128, 160)).astype(np.float32)
    fused = _fused([img], [25], 16, 7.0)
    _assert_same(fused[0], _xla_reference(img, 25, 16, 7.0))
