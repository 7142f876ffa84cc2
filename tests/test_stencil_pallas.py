"""Interpret-mode tests for the banded-sandwich Pallas stencil kernel:
banded_sandwich_pallas(x, mh, mw) must equal the dense mh @ x @ mw^T for
every matrix family ops/image.py builds (blur, pyrDown decimation, pyrUp
zero-stuff, bilinear resize), for C=1 and C=3.
"""
import numpy as np
import jax.numpy as jnp

from pislamfusion_tpu.ops import image as im
from pislamfusion_tpu.ops.stencil_pallas import (banded_sandwich_pallas,
                                                 can_fuse)


def _dense_ref(x, mh, mw):
    return np.einsum("rh,hwc,sw->rsc", mh, x, mw)


def _check(x, mh, mw, tol=1e-4):
    assert can_fuse(mh, mw, x.shape[2])
    got = np.asarray(banded_sandwich_pallas(jnp.asarray(x), mh, mw,
                                            interpret=True))
    ref = _dense_ref(x, mh, mw)
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(got - ref).max() / scale < tol, (
        np.abs(got - ref).max(), scale)


def test_blur_matrices_c1():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 255, (200, 300, 1)).astype(np.float32)
    taps = tuple(float(v) for v in im.gaussian_kernel1d(2.0, 3))
    mh = im._blur_matrix(200, taps, "reflect")
    mw = im._blur_matrix(300, taps, "reflect")
    _check(x, mh, mw)


def test_pyrdown_matrices_c3():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 255, (180, 260, 3)).astype(np.float32)
    taps = (0.0625, 0.25, 0.375, 0.25, 0.0625)
    mh = im._dec_matrix(180, taps, "reflect")
    mw = im._dec_matrix(260, taps, "reflect")
    _check(x, mh, mw)


def test_pyrup_matrices_c1():
    rng = np.random.default_rng(2)
    x = rng.uniform(-64, 64, (90, 130, 1)).astype(np.float32)
    taps = (0.0625, 0.25, 0.375, 0.25, 0.0625)
    mh = im._up_matrix(90, 180, taps)
    mw = im._up_matrix(130, 260, taps)
    _check(x, mh, mw)


def test_resize_matrices_c1():
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 255, (240, 320, 1)).astype(np.float32)
    mh = im._resize_matrix(240, 200)
    mw = im._resize_matrix(320, 267)
    _check(x, mh, mw)


def test_banded_stack_matches_sift_chain():
    """banded_stack_pallas over the composed chain matrices must equal
    the sequential per-scale blur chain (the SIFT octave stack)."""
    from pislamfusion_tpu.ops.features import sift
    from pislamfusion_tpu.ops.stencil_pallas import banded_stack_pallas
    rng = np.random.default_rng(6)
    h, w = 256, 320
    params = sift.SiftParams()
    mats = sift._stack_matrices(h, w, params)
    assert mats is not None
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    outs = np.asarray(banded_stack_pallas(jnp.asarray(img), list(mats[0]),
                                          list(mats[1]), interpret=True))
    ref = img
    for i, s in enumerate(sift._chain_sigmas(params)):
        ref = np.asarray(im.gaussian_blur(
            jnp.asarray(ref)[..., None], s)[..., 0])
        err = np.abs(outs[i] - ref).max()
        assert err < 5e-2, (i, err)


def test_wide_sift_blur_c1():
    """SIFT-width blur (21+ taps) still decomposes into narrow windows."""
    rng = np.random.default_rng(4)
    x = rng.uniform(0, 255, (160, 240, 1)).astype(np.float32)
    taps = tuple(float(v) for v in im.gaussian_kernel1d(3.2))
    assert len(taps) >= 21
    mh = im._blur_matrix(160, taps, "reflect")
    mw = im._blur_matrix(240, taps, "reflect")
    _check(x, mh, mw)
