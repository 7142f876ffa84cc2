"""Mosaic engine end-to-end test on synthetic ground truth.

Mirrors the reference's slice: known poses -> MultiBand warp+blend -> PNG
(SURVEY.md section 7 step 6). A synthetic textured ground plane is imaged by a
virtual nadir camera along a lawnmower path; the blended mosaic must
reconstruct the ground texture with high PSNR over the covered area.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pislamfusion_tpu.core.camera import Camera
from pislamfusion_tpu.core.svar import Svar
from pislamfusion_tpu.models.map2d import (MultiBandMap2D, WeightedMap2D,
                                           create_map2d)
from pislamfusion_tpu.ops import image as im
from pislamfusion_tpu.ops import mosaic as M


def make_ground(rng, n=512):
    """Smooth random texture (so bilinear resampling stays faithful)."""
    g = rng.uniform(0, 255, size=(n, n, 3)).astype(np.float32)
    # blur to ~1 m feature scale so both the 0.1 m ground raster and the
    # ~0.4 m/px canvas resolve the texture without aliasing
    g = np.asarray(im.gaussian_blur(jnp.asarray(g), 10.0))
    g = 96 + (g - g.mean()) * 12.0
    return np.clip(g, 16, 240).astype(np.float32)


GROUND_SCALE = 0.1  # meters per ground-texture pixel


def render_view(ground, cam, pose):
    """Ground-truth renderer: sample the ground plane through the camera."""
    H = M.homography_canvas_to_image_np(pose, cam, (0.0, 0.0), GROUND_SCALE)
    # H maps ground-texture px -> image px; we need image px -> ground px
    Hinv = np.linalg.inv(H)
    img, _ = im.warp_perspective(jnp.asarray(ground), jnp.asarray(Hinv, jnp.float32),
                                 (cam.height, cam.width), border="replicate")
    return np.asarray(img)


def nadir_pose(x, y, z):
    """Camera at (x, y, z) looking straight down (+z camera axis toward
    ground): R maps camera z to world -z — a 180-degree rotation about x."""
    return np.array([x, y, z, 1.0, 0.0, 0.0, 0.0])


def lawnmower_poses(z=20.0):
    poses = []
    for iy, y in enumerate(np.arange(8.0, 44.0, 7.0)):
        xs = np.arange(8.0, 44.0, 5.0)
        for x in (xs if iy % 2 == 0 else xs[::-1]):
            poses.append(nadir_pose(x, y, z))
    return poses


def psnr(a, b, mask=None):
    d = (a.astype(np.float64) - b.astype(np.float64)) ** 2
    if mask is not None:
        d = d[mask]
    mse = d.mean()
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(1)
    ground = make_ground(rng)
    cam = Camera(160, 120, 100.0, 100.0, 80.0, 60.0)
    poses = lawnmower_poses()
    frames = [(render_view(ground, cam, p), p) for p in poses]
    return ground, cam, poses, frames


def _cfg(**kw):
    s = Svar()
    s.set("Map2D.Scale", "0.5")
    for k, v in kw.items():
        s.set(k, str(v))
    return s


def test_prepare_sizes(world):
    ground, cam, poses, frames = world
    m = MultiBandMap2D(_cfg())
    plane = np.array([0, 0, 0, 0, 0, 0, 1.0])
    assert m.prepare(plane, cam, [(None, p) for p in poses])
    assert m.w_tiles > 0 and m.h_tiles > 0 and m.length_pixel > 0
    # auto resolution: 2*radius/diag/scale (Data::prepare:222-237)
    lp, radius = M.auto_resolution(cam, 20.0, 0.5)
    assert abs(m.length_pixel - lp) < 1e-9


def test_multiband_mosaic_psnr(world):
    ground, cam, poses, frames = world
    m = MultiBandMap2D(_cfg())
    plane = np.array([0, 0, 0, 0, 0, 0, 1.0])
    assert m.prepare(plane, cam, [(None, p) for p in poses])
    for img, p in frames:
        assert m.feed(img, p)
    assert m.frames_rendered == len(frames)
    out, covered = m.blended()
    assert covered.sum() > 10000  # ~25k px at the 0.4 m/px auto GSD
    # compare against ground texture resampled at canvas resolution
    ys, xs = np.nonzero(covered)
    gt = _ground_at_canvas(ground, m, ys, xs)
    p = psnr(out[ys, xs], gt)
    assert p > 30.0, f"mosaic PSNR too low: {p:.2f} dB"


def test_weighted_mosaic_psnr(world):
    ground, cam, poses, frames = world
    m = WeightedMap2D(_cfg())
    plane = np.array([0, 0, 0, 0, 0, 0, 1.0])
    assert m.prepare(plane, cam, [(None, p) for p in poses])
    for img, p in frames:
        assert m.feed(img, p)
    out, covered = m.blended()
    ys, xs = np.nonzero(covered)
    gt = _ground_at_canvas(ground, m, ys, xs)
    p = psnr(out[ys, xs], gt)
    assert p > 28.0, f"weighted mosaic PSNR too low: {p:.2f} dB"


def _ground_at_canvas(ground, m, ys, xs):
    """Ground texture value at canvas pixels (ys, xs)."""
    gx = (m.min_xy[0] + xs * m.length_pixel) / GROUND_SCALE
    gy = (m.min_xy[1] + ys * m.length_pixel) / GROUND_SCALE
    xy = jnp.asarray(np.stack([gx, gy], -1), jnp.float32)
    v, _ = im.bilinear_sample(jnp.asarray(ground), xy, border="replicate")
    return np.asarray(v)


def test_downlook_rejection(world):
    """Side-looking frames must be skipped (renderFrame:330-340)."""
    ground, cam, poses, frames = world
    m = MultiBandMap2D(_cfg())
    plane = np.array([0, 0, 0, 0, 0, 0, 1.0])
    assert m.prepare(plane, cam, [(None, p) for p in poses])
    # camera looking sideways: rotate 90 deg about x from nadir
    s, c = np.sin(np.pi / 4), np.cos(np.pi / 4)
    side = np.array([20.0, 20.0, 20.0, c, 0, 0, s])  # 90deg about x
    assert not m.feed(frames[0][0], side)
    assert m.frames_skipped == 1


def test_canvas_growth(world):
    """Frames outside the prepared bbox must trigger spreadMap-style growth."""
    ground, cam, poses, frames = world
    m = MultiBandMap2D(_cfg())
    plane = np.array([0, 0, 0, 0, 0, 0, 1.0])
    assert m.prepare(plane, cam, [(None, poses[0])])  # tiny canvas
    w0, h0 = m.w_tiles, m.h_tiles
    far = nadir_pose(200.0, 200.0, 20.0)
    img = render_view(ground, cam, poses[0])  # content irrelevant
    assert m.feed(img, far)
    assert m.w_tiles > w0 and m.h_tiles > h0


def test_factory():
    assert isinstance(create_map2d(3, _cfg()), MultiBandMap2D)
    assert isinstance(create_map2d(1, _cfg()), WeightedMap2D)
    assert isinstance(create_map2d("multiband", _cfg()), MultiBandMap2D)


def test_save_png(tmp_path, world):
    ground, cam, poses, frames = world
    m = MultiBandMap2D(_cfg())
    plane = np.array([0, 0, 0, 0, 0, 0, 1.0])
    m.prepare(plane, cam, [(None, p) for p in poses])
    for img, p in frames[:4]:
        m.feed(img, p)
    out = tmp_path / "result.png"
    assert m.save(str(out))
    assert out.stat().st_size > 1000


def test_render_batch_equals_multiband(world):
    """RenderMap2D (type 4, lax.scan batch) must produce the SAME canvas as
    the per-frame MultiBandMap2D — the batch is a scheduling change, not a
    blending change (Map2DRender analogue)."""
    from pislamfusion_tpu.models.map2d import RenderMap2D
    ground, cam, poses, frames = world
    plane = np.array([0, 0, 0, 0, 0, 0, 1.0])
    m1 = MultiBandMap2D(_cfg())
    m2 = RenderMap2D(_cfg(**{"Map2D.RenderBatch": 4}))
    assert m1.prepare(plane, cam, [(None, p) for p in poses])
    assert m2.prepare(plane, cam, [(None, p) for p in poses])
    for img, p in frames:
        m1.feed(img, p)
        m2.feed(img, p)
    out1, cov1 = m1.blended()   # RenderMap2D.blended flushes the remainder
    out2, cov2 = m2.blended()
    assert m2.frames_rendered == m1.frames_rendered
    np.testing.assert_array_equal(cov1, cov2)
    np.testing.assert_allclose(out1, out2, atol=1e-3)


def test_render_batch_remainder_flush(world):
    """A partial batch (fewer pending frames than RenderBatch) still
    composites correctly via the padded scan (weight 0 padding rows)."""
    from pislamfusion_tpu.models.map2d import RenderMap2D
    ground, cam, poses, frames = world
    plane = np.array([0, 0, 0, 0, 0, 0, 1.0])
    m = RenderMap2D(_cfg(**{"Map2D.RenderBatch": 8}))   # never auto-flushes
    assert m.prepare(plane, cam, [(None, p) for p in poses])
    for img, p in frames[:3]:
        m.feed(img, p)
    out, covered = m.blended()
    assert m.frames_rendered == 3
    assert covered.sum() > 1000


def test_render_seam_finding(world):
    """Map2DRender.EnableSeam analogue: with two overlapping frames of
    DISAGREEING content, the seam pass must partition the overlap into
    coherent single-owner regions — at most one ownership transition per
    row — instead of per-pixel max-weight interleaving."""
    ground, cam, poses, frames = world
    cfg = _cfg(**{"Map2DRender.EnableSeam": "1", "Map2D.RenderBatch": "2",
                  "Map2D.BandNumber": "1"})
    m = create_map2d("render", cfg)
    plane = np.array([0, 0, 0, 0, 0, 0, 1.0])
    pa = nadir_pose(18.0, 20.0, 20.0)
    pb = nadir_pose(26.0, 20.0, 20.0)
    assert m.prepare(plane, cam, [(None, pa), (None, pb)])
    h, w = cam.height, cam.width
    img_a = np.full((h, w, 3), 50.0, np.float32)
    img_b = np.full((h, w, 3), 200.0, np.float32)
    m.render_frame(img_a, pa)
    m.render_frame(img_b, pb)
    m.flush()
    out, covered = m.blended()
    ys, xs = np.nonzero(covered)
    assert ys.size > 1000
    # rows fully covered between the two frame centers
    mid_rows = [y for y in range(covered.shape[0])
                if covered[y].sum() > 40]
    assert len(mid_rows) > 10
    bad = 0
    for y in mid_rows:
        row = out[y][covered[y]][..., 0]
        own_b = row > 125.0
        transitions = int(np.abs(np.diff(own_b.astype(np.int8))).sum())
        if transitions > 1:
            bad += 1
    # coherent seams: a single A->B transition per covered row
    assert bad <= len(mid_rows) * 0.1, (
        f"{bad}/{len(mid_rows)} rows have fragmented seams")


def test_render_seam_masks_partition(world):
    """seam_masks_batch: masks are disjoint and cover exactly the union
    footprint."""
    import jax.numpy as jnp
    from pislamfusion_tpu.ops import mosaic as MM
    ground, cam, poses, frames = world
    plane_hs = []
    m = MultiBandMap2D(_cfg())
    plane = np.array([0, 0, 0, 0, 0, 0, 1.0])
    pa = nadir_pose(18.0, 20.0, 20.0)
    pb = nadir_pose(24.0, 22.0, 20.0)
    assert m.prepare(plane, cam, [(None, pa), (None, pb)])
    geos = [m._frame_geometry(p) for p in (pa, pb)]
    hs = np.stack([g[1] for g in geos])
    origins = np.asarray([(g[0][0] * 256, g[0][1] * 256) for g in geos],
                         np.int32)
    patch_px = m.patch_tiles * 256
    masks = np.asarray(MM.seam_masks_batch(
        jnp.asarray(hs, jnp.float32), jnp.asarray(origins),
        jnp.ones(2, jnp.float32), (cam.height, cam.width),
        (patch_px, patch_px), (m.h_tiles * 256, m.w_tiles * 256)))
    assert masks.shape[0] == 2
    assert set(np.unique(masks)) <= {0.0, 1.0}
    # disjoint where patches overlap on canvas (same origin region only
    # when origins coincide); check sum over canvas scatter <= 1
    canvas = np.zeros((m.h_tiles * 256, m.w_tiles * 256))
    for k in range(2):
        oy, ox = origins[k]
        canvas[oy:oy + patch_px, ox:ox + patch_px] += masks[k, ..., 0]
    assert canvas.max() <= 1.0 + 1e-6
    assert canvas.sum() > 1000  # union footprint is owned


def test_gpu_rule_mosaic(world):
    """Map2D.Type 2 (UtilGPU.cu renderFramesKernel:311-381 semantics):
    inverse-quadratic center-proximity weighting with biased overwrite —
    each pixel converges to the most-center-on frame. PSNR must hold, and
    ownership must favor frame centers."""
    ground, cam, poses, frames = world
    m = create_map2d("2", _cfg())
    plane = np.array([0, 0, 0, 0, 0, 0, 1.0])
    assert m.prepare(plane, cam, [(None, p) for p in poses])
    for img, p in frames:
        assert m.feed(img, p)
    out, covered = m.blended()
    ys, xs = np.nonzero(covered)
    assert ys.size > 10000
    gt = _ground_at_canvas(ground, m, ys, xs)
    p = psnr(out[ys, xs], gt)
    assert p > 26.0, f"gpu-rule mosaic PSNR too low: {p:.2f} dB"

    # center priority: feed two constant frames with overlapping
    # footprints; in the overlap, pixels nearer B's center show B
    m2 = create_map2d("gpu", _cfg())
    pa = nadir_pose(18.0, 20.0, 20.0)
    pb = nadir_pose(24.0, 20.0, 20.0)
    assert m2.prepare(plane, cam, [(None, pa), (None, pb)])
    m2.feed(np.full((cam.height, cam.width, 3), 50.0, np.float32), pa)
    m2.feed(np.full((cam.height, cam.width, 3), 200.0, np.float32), pb)
    out2, cov2 = m2.blended()
    # canvas x of each frame center
    ca = (np.asarray([18.0, 20.0]) - m2.min_xy) / m2.length_pixel
    cb = (np.asarray([24.0, 20.0]) - m2.min_xy) / m2.length_pixel
    row = int(round(ca[1]))
    line = out2[row, :, 0]
    covl = cov2[row]
    assert covl[int(ca[0])] and covl[int(cb[0])]
    assert line[int(ca[0])] < 80          # near A's center: A's value
    # near B's center the rule mixes (old*2w + new*w_new)/(2w + w_new) —
    # a single pass converges toward but not fully to B (the 2x bias
    # favors the stored frame, UtilGPU.cu:367-371)
    assert line[int(cb[0])] > line[int(ca[0])] + 40
    assert line[int(cb[0])] > 100


def test_half_res_weight_matches_full_analytic():
    """The shear path's band-0 weight (analytic at HALF patch resolution,
    pyr_up'd to full — ops/mosaic.patch_pyramids) must agree with the
    full-resolution analytic weight away from the validity border: the
    interpolation only moves seam decisions near ties, it must not bias
    interior ownership."""
    Hs, Ws = 480, 640
    patch = (512, 512)
    hm = jnp.asarray(np.array([[0.9, 0.08, 30.0],
                               [-0.05, 0.85, 40.0],
                               [1e-5, -2e-5, 1.0]], np.float32))
    w_full = np.asarray(M.analytic_weight_pyramid(
        hm, (Hs, Ws), patch, 0, 0, None)[0])[..., 0]
    s2 = jnp.asarray(np.diag([2.0, 2.0, 1.0]), jnp.float32)
    w_half = M.analytic_weight_pyramid(
        hm @ s2, (Hs, Ws), (patch[0] // 2, patch[1] // 2), 0, 0, None)[0]
    w_up = np.asarray(im.pyr_up(w_half, patch))[..., 0]
    # interior = full-res weight clearly valid AND away from the border
    # rolloff (the pyr_up spreads the hard validity edge by <= 4 px)
    interior = w_full > 0.05 * w_full.max()
    # erode by 6 px via numpy shifts (no scipy dependency)
    er = interior.copy()
    for dy in range(-6, 7, 3):
        for dx in range(-6, 7, 3):
            er &= np.roll(np.roll(interior, dy, 0), dx, 1)
    assert er.sum() > 1000
    d = np.abs(w_up - w_full)[er]
    rel = d.max() / w_full.max()
    assert rel < 0.02, f"half-res weight deviates {rel:.3%} in the interior"
