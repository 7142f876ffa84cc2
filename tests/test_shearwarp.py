"""Shear-decomposed warp vs the gather-based bilinear oracle.

Two-pass (Catmull-Smith) resampling interpolates along preimage lines, so
it matches point-wise bilinear EXACTLY for axis-aligned maps and to a
(shear x second-derivative) sub-gray-level term under rotation; for the
mildly projective homographies the mosaic feed produces the per-tile
affine fit residual must stay sub-pixel.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pislamfusion_tpu.ops import image as im
from pislamfusion_tpu.ops import shearwarp as sw


def _texture(h, w, seed=0, sigma=2.0):
    """Band-limited texture. The two-pass-vs-bilinear curvature term scales
    with the second derivative: near-white noise (sigma ~1) is pathological
    (no real image looks like that); sigma 2 is still much harsher than
    aerial imagery."""
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
    img = np.asarray(im.gaussian_blur(jnp.asarray(img), sigma))
    return img


def _oracle(img, H, patch_hw):
    grid = im.homography_grid(jnp.asarray(H, jnp.float32), patch_hw)
    vals, valid = im.bilinear_sample(jnp.asarray(img), grid,
                                     border="replicate")
    return np.asarray(vals), np.asarray(valid)


def _interior_mask(img, H, patch_hw, margin=2.0):
    """Destination pixels whose source coords are strictly inside the
    image (edge handling differs by design: oracle replicates globally,
    shear warp clamps per-window)."""
    grid = np.asarray(im.homography_grid(jnp.asarray(H, jnp.float32),
                                         patch_hw))
    h, w = img.shape[:2]
    return ((grid[..., 0] > margin) & (grid[..., 0] < w - 1 - margin)
            & (grid[..., 1] > margin) & (grid[..., 1] < h - 1 - margin))


def test_axis_aligned_exact():
    """No rotation -> zero shear -> two-pass == bilinear to float eps."""
    img = _texture(240, 320)
    H = np.diag([0.8, 1.25, 1.0]).astype(np.float32)
    H[:2, 2] = [40.0, 30.0]
    patch_hw = (256, 256)
    out, err = sw.warp_patch_xla(jnp.asarray(img), jnp.asarray(H), patch_hw,
                                 max_scale=1.6)
    out = np.asarray(out)
    assert float(err) < 1e-3
    ref, _ = _oracle(img, H, patch_hw)
    inside = _interior_mask(img, H, patch_hw)
    assert np.abs(out - ref)[inside].max() < 1e-2


@pytest.mark.parametrize("theta_deg, scale", [
    (10.0, 0.8), (37.0, 1.2), (80.0, 1.0), (135.0, 0.9), (-20.0, 1.3),
])
def test_affine_close(theta_deg, scale):
    img = _texture(240, 320)
    th = np.deg2rad(theta_deg)
    A = scale * np.array([[np.cos(th), -np.sin(th)],
                          [np.sin(th), np.cos(th)]])
    H = np.eye(3, dtype=np.float32)
    H[:2, :2] = A
    H[:2, 2] = [40.0, 30.0]
    patch_hw = (256, 256)
    out, err = sw.warp_patch_xla(jnp.asarray(img), jnp.asarray(H), patch_hw,
                                 max_scale=1.6)
    out = np.asarray(out)
    assert float(err) < 1e-3            # affine: zero projective twist
    ref, _ = _oracle(img, H, patch_hw)
    inside = _interior_mask(img, H, patch_hw)
    diff = np.abs(out - ref)[inside]
    # line-sampled vs point-sampled bilinear differ by a curvature term:
    # exact on linear signals (see test_linear_signal_exact), small and
    # zero-mean on band-limited texture
    assert diff.max() < 3.0, diff.max()
    assert diff.mean() < 0.3, diff.mean()
    assert np.quantile(diff, 0.99) < 1.2, np.quantile(diff, 0.99)


@pytest.mark.parametrize("theta_deg, scale", [(37.0, 1.2), (-62.0, 0.7)])
def test_linear_signal_exact(theta_deg, scale):
    """On a linear ramp (zero second derivative) two-pass == bilinear to
    float eps for ANY affine map — validates the pass math itself."""
    h, w = 240, 320
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    img = (2 * xs + 3 * ys)[..., None].repeat(3, -1)
    th = np.deg2rad(theta_deg)
    A = scale * np.array([[np.cos(th), -np.sin(th)],
                          [np.sin(th), np.cos(th)]])
    H = np.eye(3, dtype=np.float32)
    H[:2, :2] = A
    H[:2, 2] = [40.0, 30.0]
    out, _ = sw.warp_patch_xla(jnp.asarray(img), jnp.asarray(H), (256, 256),
                               max_scale=1.8)
    grid = np.asarray(im.homography_grid(jnp.asarray(H), (256, 256)))
    ref = 2 * grid[..., 0] + 3 * grid[..., 1]
    inside = ((grid[..., 0] > 2) & (grid[..., 0] < w - 3)
              & (grid[..., 1] > 2) & (grid[..., 1] < h - 3))
    d = np.abs(np.asarray(out)[..., 0] - ref)[inside]
    assert d.max() < 2e-3, d.max()


def test_projective_subpixel():
    """A moderately tilted-camera homography: affine fit residual stays
    well sub-pixel per 256-tile and the warp matches the oracle closely."""
    img = _texture(480, 640, seed=3)
    H = np.array([[0.9, 0.15, 20.0],
                  [-0.12, 0.95, 10.0],
                  [1.5e-5, -1e-5, 1.0]], np.float32)
    patch_hw = (512, 512)
    out, err = sw.warp_patch_xla(jnp.asarray(img), jnp.asarray(H), patch_hw,
                                 max_scale=1.6)
    out = np.asarray(out)
    assert float(err) < 0.35, float(err)  # sub-pixel affine fit per tile
    ref, _ = _oracle(img, H, patch_hw)
    inside = _interior_mask(img, H, patch_hw)
    diff = np.abs(out - ref)[inside]
    # sub-pixel warp error x local gradient -> a few gray levels worst case
    assert np.quantile(diff, 0.99) < 2.5, np.quantile(diff, 0.99)
    assert diff.mean() < 0.7, diff.mean()


def test_projective_strong_tilt_small_tile():
    """Strong tilt (the down-look limit allows ~60 degrees): 256-px tiles
    leave ~0.7 px affine residual; 128-px tiles cut it ~4x — the knob for
    parallax-heavy or tilted configurations."""
    img = _texture(480, 640, seed=3)
    H = np.array([[0.9, 0.15, 20.0],
                  [-0.12, 0.95, 10.0],
                  [4e-5, -3e-5, 1.0]], np.float32)
    _, err256 = sw.warp_patch_xla(jnp.asarray(img), jnp.asarray(H),
                                  (512, 512), tile=256, max_scale=1.6)
    out, err128 = sw.warp_patch_xla(jnp.asarray(img), jnp.asarray(H),
                                    (512, 512), tile=128, max_scale=1.6)
    assert float(err128) < 0.3 * float(err256) + 0.05, \
        (float(err128), float(err256))
    ref, _ = _oracle(img, H, (512, 512))
    inside = _interior_mask(img, H, (512, 512))
    diff = np.abs(np.asarray(out) - ref)[inside]
    assert np.quantile(diff, 0.99) < 2.0, np.quantile(diff, 0.99)


def test_outside_content_zeroed_only_when_dead():
    """Tiles whose footprint misses the source entirely come back 0."""
    img = _texture(100, 120, seed=5)
    H = np.eye(3, dtype=np.float32)
    H[:2, 2] = [-600.0, -600.0]     # far off the image
    out, _ = sw.warp_patch_xla(jnp.asarray(img), jnp.asarray(H), (256, 256),
                               max_scale=1.6)
    assert np.all(np.asarray(out) == 0.0)
