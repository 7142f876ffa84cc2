"""SIFT extractor tests (reference: SiftGPU + FeatureDetectorSiftGPU.cpp)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pislamfusion_tpu.ops.features import sift
from pislamfusion_tpu.ops import matching


def blob_image(rng, h=256, w=256, n=50):
    img = np.full((h, w), 60.0, np.float32)
    img += rng.normal(0, 2.0, (h, w)).astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(n):
        cy, cx = rng.integers(20, h - 20), rng.integers(20, w - 20)
        s = rng.uniform(2.0, 6.0)
        a = rng.uniform(60, 180) * rng.choice([-1, 1])
        img += a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
    return np.clip(img, 0, 255)


PARAMS = sift.SiftParams(n_features=300)


@pytest.fixture(scope="module")
def img():
    return blob_image(np.random.default_rng(5))


def test_detect_shapes(img):
    f = sift.sift_detect(jnp.asarray(img), PARAMS)
    assert f["xy"].shape == (300, 2)
    assert f["desc"].shape == (300, 128)
    nv = int(np.sum(np.asarray(f["valid"])))
    assert nv > 30, nv
    # descriptors are L2-normalized
    d = np.asarray(f["desc"])[np.asarray(f["valid"])]
    norms = np.linalg.norm(d, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_blobs_detected(img):
    """Detected keypoints should cluster near the planted blobs."""
    f = sift.sift_detect(jnp.asarray(img), PARAMS)
    v = np.asarray(f["valid"])
    xy = np.asarray(f["xy"])[v]
    assert (xy[:, 0] >= 0).all() and (xy[:, 0] < img.shape[1]).all()


def test_shift_matching(img):
    sh = np.roll(img, (0, 6), (0, 1))
    fa = sift.sift_detect(jnp.asarray(img), PARAMS)
    fb = sift.sift_detect(jnp.asarray(sh), PARAMS)
    idx, ok = matching.match_descriptors(fa["desc"], fa["valid"],
                                         fb["desc"], fb["valid"], "sift",
                                         max_dist=0.4, ratio=0.9)
    okn = np.asarray(ok)
    assert okn.sum() > 25, okn.sum()
    xa = np.asarray(fa["xy"])[okn]
    xb = np.asarray(fb["xy"])[np.asarray(idx)[okn]]
    med = np.median(xb - xa, 0)
    assert abs(med[0] - 6.0) < 1.5 and abs(med[1]) < 1.5, med


def test_rotation_matching(img):
    """Descriptors must match under a 90-degree image rotation."""
    rot = np.rot90(img).copy()
    fa = sift.sift_detect(jnp.asarray(img), PARAMS)
    fb = sift.sift_detect(jnp.asarray(rot), PARAMS)
    idx, ok = matching.match_descriptors(fa["desc"], fa["valid"],
                                         fb["desc"], fb["valid"], "sift",
                                         max_dist=0.45, ratio=0.9)
    okn = np.asarray(ok)
    assert okn.sum() > 15, okn.sum()
    # rot90: (x, y) -> (y, H-1-x) for the rotated image coords
    h = img.shape[0]
    xa = np.asarray(fa["xy"])[okn]
    xb = np.asarray(fb["xy"])[np.asarray(idx)[okn]]
    expect = np.stack([xa[:, 1], h - 1 - xa[:, 0]], -1)
    err = np.linalg.norm(xb - expect, axis=1)
    assert np.median(err) < 3.0, np.median(err)


def test_root_sift():
    d = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (4, 128)),
                    jnp.float32)
    r = np.asarray(sift.root_sift(d))
    np.testing.assert_allclose((r ** 2).sum(-1), 1.0, atol=1e-4)


def test_fused_sift_slam_smoke():
    """Fast-tier SIFT e2e: the reference's DEFAULT detector
    (Default.cfg:2-9 FeatureDetector?=Sift) through the fused
    single-dispatch SLAM path on a short strip — initialization +
    steady tracking must work, not just the standalone extractor."""
    from pislamfusion_tpu.core.camera import Camera
    from pislamfusion_tpu.core.svar import Svar
    from pislamfusion_tpu.models.slam import create_slam
    from synth_survey import make_ground, nadir_pose, render_view

    rng = np.random.default_rng(3)
    ground = make_ground(rng, n=768, rects=500)
    cam = Camera(256, 192, 200.0, 200.0, 128.0, 96.0)
    poses = [nadir_pose(28.0 + 2.5 * i, 30.0, 20.0) for i in range(8)]
    cfg = Svar()
    cfg.set("FeatureDetector", "Sift")
    cfg.set("SLAM.nFeature", "300")
    cfg.set("SLAM.LoopClose", "0")
    cfg.set("SLAM.MinInitMatches", "40")
    cfg.set("SLAM.BAFrameCap", "6")
    cfg.set("SLAM.BAPointCap", "512")
    cfg.set("SLAM.BAObsCap", "2048")
    cfg.set("SLAM.LocalBAIters", "6")
    cfg.set("Sift.ContrastThreshold", "0.005")
    slam = create_slam(cfg, cam)
    for i, p in enumerate(poses):
        slam.track(render_view(ground, cam, p), float(i))
    slam.finish()
    assert slam.tracker.use_fused          # SIFT rides the fused path
    assert slam.frames_tracked >= 5, (slam.frames_tracked,
                                      slam.frames_total)
    assert slam.map.point_num() > 50
