"""Interpret-mode tests for the Pallas DMA kernels (patchgather):
aligned-slab patch extraction and the bilinear grid sampler. These run
the REAL kernel logic through the Pallas interpreter on CPU; the TPU
compile path is exercised by bench.py / the mosaic+SLAM demos.
"""
import numpy as np
import jax.numpy as jnp

from pislamfusion_tpu.ops import image as im
from pislamfusion_tpu.ops.features.patchgather import (
    bilinear_grid_pallas, gather_patches_pallas)


def test_gather_patches_exact_1ch():
    rng = np.random.default_rng(0)
    H, W, N, r = 240, 320, 53, 18
    img = rng.uniform(0, 255, (H, W)).astype(np.float32)
    xy = np.stack([rng.integers(0, W, N), rng.integers(0, H, N)],
                  -1).astype(np.int32)
    out = np.asarray(gather_patches_pallas(jnp.asarray(img),
                                           jnp.asarray(xy), r,
                                           interpret=True))
    pad = np.pad(img, r, mode="edge")
    G = 2 * r + 1
    ref = np.stack([pad[y:y + G, x:x + G] for x, y in xy])
    assert out.shape == (N, G, G)
    assert np.abs(out - ref).max() == 0.0


def test_gather_patches_exact_2ch():
    rng = np.random.default_rng(1)
    H, W, N, r = 123, 210, 21, 18
    img = rng.uniform(0, 255, (H, W, 2)).astype(np.float32)
    xy = np.stack([rng.integers(0, W, N), rng.integers(0, H, N)],
                  -1).astype(np.int32)
    out = np.asarray(gather_patches_pallas(jnp.asarray(img),
                                           jnp.asarray(xy), r,
                                           interpret=True))
    pad = np.pad(img, ((r, r), (r, r), (0, 0)), mode="edge")
    G = 2 * r + 1
    ref = np.stack([pad[y:y + G, x:x + G] for x, y in xy])
    assert np.abs(out - ref).max() == 0.0


def test_bilinear_grid_matches_xla_sampler():
    """The slab sampler must equal ops.image.bilinear_sample on every
    in-image sample (out-of-image samples are masked by callers)."""
    rng = np.random.default_rng(2)
    H, W, K, M = 240, 320, 37, 256
    img = rng.uniform(-128, 128, (H, W, 2)).astype(np.float32)
    cx = rng.integers(2, W - 2, K)
    cy = rng.integers(2, H - 2, K)
    centers = np.stack([cx, cy], -1).astype(np.int32)
    rel = rng.uniform(-14.5, 14.5, (K, 2, M)).astype(np.float32)
    out = np.asarray(bilinear_grid_pallas(
        jnp.asarray(img), jnp.asarray(centers), jnp.asarray(rel),
        radius=16, interpret=True))
    px = centers[:, 0:1] + rel[:, 0]
    py = centers[:, 1:2] + rel[:, 1]
    ref, valid = im.bilinear_sample(jnp.asarray(img),
                                    jnp.asarray(np.stack([px, py], -1)))
    ref, valid = np.asarray(ref), np.asarray(valid)
    err = np.abs(out - ref) * valid[..., None]
    assert err.max() < 5e-3, err.max()
    assert np.isfinite(out).all()
