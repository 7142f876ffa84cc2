"""End-to-end interpret-mode test of orb_detect's TPU kernel path:
pyramid_pallas -> fastselect -> patchgather -> binned BRIEF, all forced
through the Pallas interpreter on CPU. Pins the SEMANTICS of the full
fused extractor (the Mosaic lowering itself is validated on hardware by
the recovery validator / bench).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pislamfusion_tpu.ops import image as im
from pislamfusion_tpu.ops.features import orb


def _eligible(shape, params):
    from pislamfusion_tpu.ops.features.pyramid_pallas import (
        pyramid_available, _level_shapes)
    H, W = shape
    shapes = _level_shapes(H, W, params.n_levels, params.scale_factor)
    quotas = params.features_per_level()
    return (pyramid_available(H, W, params.n_levels, params.scale_factor,
                              orb._GATHER_R)
            and all(orb._per_cell_quota(s, max(q, 1), params.cell) == 1
                    for s, q in zip(shapes, quotas)))


def test_fused_tpu_path_interpret(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(3)
    H, W = 288, 416
    # smooth structured image: blobs -> stable corners across tiny
    # pyramid-resampling differences (HIGH-matmul vs jax.image.resize)
    img = np.zeros((H, W), np.float32)
    ys, xs = np.mgrid[:H, :W]
    for _ in range(60):
        cy, cx = rng.uniform(20, H - 20), rng.uniform(20, W - 20)
        s = rng.uniform(3, 9)
        img += rng.uniform(60, 200) * np.exp(
            -((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * s * s))
    img = np.clip(img, 0, 255).astype(np.float32)
    params = orb.OrbParams(n_features=120, n_levels=3)
    assert _eligible((H, W), params)

    ref = {k: np.asarray(v) for k, v in
           orb.orb_detect(jnp.asarray(img), params).items()}

    monkeypatch.setattr(im, "use_tpu_pallas", lambda: True)
    monkeypatch.setattr(orb, "_extract_kernels_on", lambda: True)
    orb.orb_detect.clear_cache()
    try:
        with pltpu.force_tpu_interpret_mode():
            got = {k: np.asarray(v) for k, v in
                   orb.orb_detect(jnp.asarray(img), params).items()}
    finally:
        orb.orb_detect.clear_cache()

    assert got["valid"].sum() > 30
    # the kernel pyramid resamples with HIGH-precision matrices while the
    # CPU chain uses jax.image.resize — scores can differ in the last ulp
    # and flip rank ties, so compare as SETS with high overlap
    ref_set = {tuple(x) for x in ref["xy"][ref["valid"]].round(2)}
    got_set = {tuple(x) for x in got["xy"][got["valid"]].round(2)}
    inter = len(ref_set & got_set)
    assert inter > 0.85 * min(len(ref_set), len(got_set)), (
        inter, len(ref_set), len(got_set))
    # descriptors on the common keypoints must agree almost everywhere
    ref_by_xy = {tuple(x): d for x, d, v in
                 zip(ref["xy"].round(2), ref["desc"], ref["valid"]) if v}
    bad = 0
    for x, d, v in zip(got["xy"].round(2), got["desc"], got["valid"]):
        if v and tuple(x) in ref_by_xy:
            bad += int(np.sum(d != ref_by_xy[tuple(x)]) > 12)
    assert bad <= 2, bad
