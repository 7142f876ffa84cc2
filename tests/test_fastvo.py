"""FastVO: the one-program batch track+fuse fast path (models/fastvo.py).

Synthetic nadir survey: frames rendered from a textured plane with known
poses; FastVO must recover the trajectory from frame 1 on (frame 0's pose
is given) and build a coherent mosaic — all in one lax.scan program.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pislamfusion_tpu.core.camera import Camera
from pislamfusion_tpu.models.fastvo import FastVO
from pislamfusion_tpu.ops import mosaic as M

from synth_survey import make_ground, nadir_pose, render_view


@pytest.fixture(scope="module")
def survey():
    rng = np.random.default_rng(3)
    ground = make_ground(rng)
    cam = Camera(320, 240, 260.0, 260.0, 160.0, 120.0)
    poses = [nadir_pose(30.0 + 1.5 * i, 40.0, 25.0) for i in range(10)]
    frames = np.stack([render_view(ground, cam, p) for p in poses])
    return ground, cam, np.stack(poses), frames


def test_fastvo_tracks_and_blends(survey):
    ground, cam, poses, frames = survey
    lp, radius = M.auto_resolution(cam, 25.0, 0.5)
    es = M.ELE_PIXELS * lp
    min_xy = poses[:, :2].min(0) - 3 * es
    span = poses[:, :2].max(0) - min_xy + 3 * es
    tiles = int(np.ceil(span.max() / es)) + 2
    vo = FastVO(cam, min_xy, tiles, lp, bands=3, n_features=512,
                n_levels=4, window_radius=40.0, fast_warp=False)
    est, n_match = vo.process(frames, poses[0])
    assert (n_match[1:] > 50).all(), n_match
    # pose error: frame-to-frame VO on a plane should stay centimetric
    # over this 13.5 m strip at 25 m altitude
    err = np.linalg.norm(est[1:, :3] - poses[1:, :3], axis=1)
    assert err.max() < 0.5, err
    img, covered = vo.blended()
    assert covered.sum() > 5000
    # mosaic sanity: compare covered pixels against the ground texture
    ys, xs = np.nonzero(covered)
    gx = (min_xy[0] + (xs + 0.5) * lp) / 0.1   # GROUND_SCALE = 0.1 m/px
    gy = (min_xy[1] + (ys + 0.5) * lp) / 0.1
    gxi = np.clip(gx.astype(int), 0, ground.shape[1] - 1)
    gyi = np.clip(gy.astype(int), 0, ground.shape[0] - 1)
    d = img[ys, xs].astype(np.float64) - ground[gyi, gxi]
    mse = (d ** 2).mean()
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    assert psnr > 25.0, f"FastVO mosaic PSNR {psnr:.1f} dB"


def test_fastvo_second_batch_continues(survey):
    """process() can be called again — the canvas accumulates and the pose
    chain restarts from the supplied pose (multi-batch surveys)."""
    ground, cam, poses, frames = survey
    lp, _ = M.auto_resolution(cam, 25.0, 0.5)
    es = M.ELE_PIXELS * lp
    min_xy = poses[:, :2].min(0) - 3 * es
    span = poses[:, :2].max(0) - min_xy + 3 * es
    tiles = int(np.ceil(span.max() / es)) + 2
    vo = FastVO(cam, min_xy, tiles, lp, bands=3, n_features=512,
                n_levels=4, window_radius=40.0)
    est1, _ = vo.process(frames[:5], poses[0])
    cov1 = vo.blended()[1].sum()
    # continue with a one-frame overlap: the last processed frame anchors
    # the next batch's pose chain (its re-composite is idempotent under
    # max-weight blending)
    est2, _ = vo.process(frames[4:9], est1[-1])
    cov2 = vo.blended()[1].sum()
    assert cov2 >= cov1
    err = np.linalg.norm(est2[-1, :3] - poses[8, :3])
    assert err < 0.8, err


def test_fastvo_fast_warp_quality(survey):
    """fast_warp=True (half-res gather + pyr_up) trades a bounded softening
    for ~3x warp throughput; the mosaic must stay within ~2 dB of exact."""
    ground, cam, poses, frames = survey
    lp, _ = M.auto_resolution(cam, 25.0, 0.5)
    es = M.ELE_PIXELS * lp
    min_xy = poses[:, :2].min(0) - 3 * es
    span = poses[:, :2].max(0) - min_xy + 3 * es
    tiles = int(np.ceil(span.max() / es)) + 2
    vo = FastVO(cam, min_xy, tiles, lp, bands=3, n_features=512,
                n_levels=4, window_radius=40.0, fast_warp=True)
    est, n_match = vo.process(frames, poses[0])
    assert (n_match[1:] > 50).all()
    img, covered = vo.blended()
    ys, xs = np.nonzero(covered)
    gx = np.clip(((min_xy[0] + (xs + 0.5) * lp) / 0.1).astype(int), 0,
                 ground.shape[1] - 1)
    gy = np.clip(((min_xy[1] + (ys + 0.5) * lp) / 0.1).astype(int), 0,
                 ground.shape[0] - 1)
    d = img[ys, xs].astype(np.float64) - ground[gy, gx]
    psnr = 10 * np.log10(255.0 ** 2 / max((d ** 2).mean(), 1e-12))
    assert psnr > 22.5, f"fast-warp mosaic PSNR {psnr:.1f} dB"
