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


# ---------------------------------------------------------------------------
# 3D world: flat ground + raised horizontal slabs (roofs) at a few height
# levels, per-frame illumination fields, repeated texture. These are the
# failure modes the reference's multi-band blending and multi-homography
# matching exist to handle (MultiBandMap2DCPU.cpp Laplacian compositing;
# MatcherMultiH.cpp plane peeling) and that a flat-ground fixture can never
# expose: parallax makes frames DISAGREE near roof edges, exposure gradients
# make single-band blends seam, repeated stamps bait wrong-instance matches.
# ---------------------------------------------------------------------------


def make_world(rng, n=1024, rects=700, n_slabs=14, heights=(4.0, 8.0),
               stamp_grid=0):
    """Returns dict with the ground texture plus raised-slab layers.

    Each layer is a full-canvas RGBA float32 image holding every slab at one
    height: RGB = corner-rich roof texture, A = footprint mask. Rendering a
    horizontal plane z=h from camera (x, y, z, q) is EXACTLY the z=0
    homography from camera (x, y, z-h, q) — same rotation, world shifted —
    so views composite back-to-front with one warp per height level.

    stamp_grid > 0 additionally stamps a repeated identical texture patch
    on the ground every `stamp_grid` px (repeated-texture bait)."""
    ground = make_ground(rng, n, rects)
    if stamp_grid:
        stamp = make_ground(rng, 128, 30)[:48, :48]
        for y in range(40, n - 88, stamp_grid):
            for x in range(40, n - 88, stamp_grid):
                ground[y:y + 48, x:x + 48] = stamp
    layers = []
    for h in heights:
        rgba = np.zeros((n, n, 4), np.float32)
        layers.append((float(h), rgba))
    for _ in range(n_slabs):
        li = int(rng.integers(0, len(heights)))
        _, rgba = layers[li]
        sy, sx = rng.integers(n // 8, n - n // 4, 2)
        sh, sw = rng.integers(40, 110, 2)
        roof = make_ground(rng, 128, 60)[:sh, :sw]
        # distinct brightness so roofs are visually separable from ground
        roof = np.clip(roof * rng.uniform(0.55, 0.8) + 40.0, 0, 255)
        rgba[sy:sy + sh, sx:sx + sw, :3] = roof
        rgba[sy:sy + sh, sx:sx + sw, 3] = 1.0
    return {"ground": ground, "layers": layers}


def exposure_field(cam, k, strength=0.12):
    """Smooth per-frame illumination gain: a tilted plane + vignette whose
    phase walks with the frame index (models sun angle + lens falloff +
    exposure wobble — low-frequency content a Laplacian blend absorbs and
    a single-band weighted average turns into seams)."""
    h, w = cam.height, cam.width
    yy, xx = np.meshgrid(np.linspace(-1, 1, h, dtype=np.float32),
                         np.linspace(-1, 1, w, dtype=np.float32),
                         indexing="ij")
    ph = 0.9 * k
    tilt = np.cos(ph) * xx + np.sin(ph) * yy
    gain = (1.0 + strength * 0.6 * np.sin(0.7 * k)
            + strength * tilt - 0.5 * strength * (xx * xx + yy * yy))
    return gain[..., None].astype(np.float32)


def render_view_3d(world, cam, pose, k=None, illum=0.0):
    """Render the 3D world from `pose`: ground homography first, then each
    height layer alpha-composited through ITS plane-induced homography
    (pose with altitude reduced by h). Optional illumination gain field."""
    img = render_view(world["ground"], cam, pose)
    for h, rgba in world["layers"]:
        if not rgba[..., 3].any():
            continue
        pose_h = np.asarray(pose, np.float64).copy()
        pose_h[2] -= h
        Hm = M.homography_canvas_to_image_np(pose_h, cam, (0.0, 0.0),
                                             GROUND_SCALE)
        warped, _ = im.warp_perspective(
            jnp.asarray(rgba), jnp.asarray(np.linalg.inv(Hm), jnp.float32),
            (cam.height, cam.width), border="constant")
        warped = np.asarray(warped)
        a = np.clip(warped[..., 3:4], 0.0, 1.0)
        img = img * (1.0 - a) + warped[..., :3] * a
    if illum and k is not None:
        img = img * (1.0 + (exposure_field(cam, k, illum) - 1.0))
    return np.clip(img, 0, 255).astype(np.float32)


def true_ortho(world):
    """Ground-truth orthophoto: slabs pasted at their true footprints (the
    nadir-from-infinity view every mosaic should converge to)."""
    img = world["ground"].copy()
    for _, rgba in world["layers"]:
        a = rgba[..., 3:4]
        img = img * (1.0 - a) + rgba[..., :3] * a
    return img


def degrade_frame(img, rng, blur_px=0.0, noise=0.0, direction=(1.0, 0.0)):
    """Sensor degradations real aerial frames carry that the clean
    renderer lacks: directional MOTION BLUR along the flight direction
    (box filter of blur_px) and additive Gaussian sensor noise."""
    out = np.asarray(img, np.float32)
    n = int(round(blur_px))
    if n >= 2:
        dx, dy = direction
        nrm = max(np.hypot(dx, dy), 1e-9)
        acc = np.zeros_like(out)
        for i in range(n):
            t = (i - (n - 1) / 2.0)
            sx = int(round(t * dx / nrm))
            sy = int(round(t * dy / nrm))
            acc += np.roll(out, (sy, sx), (0, 1))
        out = acc / n
    if noise > 0:
        out = out + rng.normal(0.0, noise, out.shape).astype(np.float32)
    return np.clip(out, 0, 255)
