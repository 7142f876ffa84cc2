"""Shared synthetic-survey helpers for e2e tests: textured ground plane,
lawnmower nadir trajectory, homography-rendered views (the same virtual
world examples/pipeline_demo.py uses)."""
import numpy as np
import jax.numpy as jnp

from pislamfusion_tpu.ops import image as im, mosaic as M

GROUND_SCALE = 0.1  # m per ground-texture pixel


def make_ground(rng, n=1024, rects=700):
    """Corner-rich but APERIODIC texture. Flat same-intensity rectangles
    make descriptors repeat across the scene, and wrong-instance matches
    displaced ALONG the flight track sit exactly on the epipolar line —
    they triangulate into geometrically self-consistent ghost layers no
    two-view check can reject. Real aerial imagery has unique micro-
    texture; model that with per-rect gradients + broadband noise."""
    g = np.full((n, n, 3), 120.0, np.float32)
    g += rng.normal(0, 8, (n, n, 3)).astype(np.float32)
    ramp = np.linspace(-14.0, 14.0, 64, dtype=np.float32)
    for _ in range(rects):
        y, x = rng.integers(10, n - 40, 2)
        h, w = rng.integers(6, 36, 2)
        base = rng.uniform(20, 235, 3).astype(np.float32)
        patch = base[None, None, :] + ramp[:h, None, None] \
            * rng.uniform(-1, 1) + ramp[:w][None, :, None] \
            * rng.uniform(-1, 1)
        patch = patch + rng.normal(0, 6, (h, w, 3))
        g[y:y + h, x:x + w] = patch
    return np.clip(g, 0, 255)


def nadir_pose(x, y, z):
    return np.array([x, y, z, 1.0, 0.0, 0.0, 0.0])


def lawnmower(alt=25.0, y0=30.0, y1=54.0, dy=8.0, x0=25.0, x1=61.0, dx=3.0):
    poses = []
    for iy, y in enumerate(np.arange(y0, y1, dy)):
        xs = np.arange(x0, x1, dx)
        for x in (xs if iy % 2 == 0 else xs[::-1]):
            poses.append(nadir_pose(x, y, alt))
    return np.stack(poses)


def render_view(ground, cam, pose):
    H = M.homography_canvas_to_image_np(pose, cam, (0.0, 0.0), GROUND_SCALE)
    img, _ = im.warp_perspective(jnp.asarray(ground),
                                 jnp.asarray(np.linalg.inv(H), jnp.float32),
                                 (cam.height, cam.width), border="replicate")
    return np.asarray(img)
