"""E2E on REAL aerial texture.

Every other fixture in this suite is procedural. `tests/data/aerial_npu.png`
is a real nadir drone photograph (the campus thumbnail embedded in the
reference's own doc/screenshot-1.png): rows of near-identical apartment
blocks, roads, tree canopy — the repeated-structure layout that baits
wrong-instance matches (the failure mode MatcherMultiH's plane peeling and
the rotation-histogram vote exist for, MatcherBFMultiH.cpp:296-376). The
photo is small (252x142) and 4x-upsampled, so micro-texture is
interpolated — the REAL content here is the structure layout and intensity
statistics, not sensor noise. A full real-sequence validation still needs
the reference datasets (documented in BASELINE.md).
"""
import os

import numpy as np
import pytest
import jax.numpy as jnp

import synth_survey as S
from pislamfusion_tpu.core.camera import Camera
from pislamfusion_tpu.core.svar import Svar

pytestmark = pytest.mark.e2e


def _real_ground(n=1024):
    from PIL import Image
    p = os.path.join(os.path.dirname(__file__), "data", "aerial_npu.png")
    img = Image.open(p).convert("RGB")
    # cover the survey span by mirror-tiling 2x2 before the upscale so the
    # strip never walks off the photo (mirroring keeps edges seamless)
    a = np.asarray(img, np.float32)
    a = np.concatenate([a, a[:, ::-1]], 1)
    a = np.concatenate([a, a[::-1]], 0)
    img = Image.fromarray(a.astype(np.uint8)).resize((n, n),
                                                     Image.LANCZOS)
    return np.asarray(img, np.float32)


def test_slam_strip_on_real_aerial_texture():
    from pislamfusion_tpu.models.slam import create_slam

    ground = _real_ground()
    cam = Camera(320, 240, 260.0, 260.0, 160.0, 120.0)
    xs = np.arange(25.0, 61.0, 3.0)
    poses = [S.nadir_pose(x, 30.0, 25.0) for x in xs]
    cfg = Svar()
    cfg.set("FeatureDetector", "ORB")
    cfg.set("SLAM.nFeature", "600")
    cfg.set("SLAM.LoopClose", "0")
    cfg.set("SLAM.BAFrameCap", "8")
    cfg.set("SLAM.BAPointCap", "1024")
    cfg.set("SLAM.BAObsCap", "4096")
    cfg.set("SLAM.LocalBAIters", "8")
    slam = create_slam(cfg, cam)
    est = []
    for i, p in enumerate(poses):
        fr = slam.track(S.render_view(ground, cam, p), float(i))
        est.append(None if fr is None else fr.pose_c2w[:3].copy())
    slam.finish()
    assert slam.frames_tracked > 0.8 * slam.frames_total, \
        (slam.frames_tracked, slam.frames_total)
    assert slam.map.point_num() > 150
    # monocular gauge: compare the estimated track SHAPE against the
    # straight equally-spaced ground truth via a similarity fit
    pts = np.array([e for e in est if e is not None])
    gt = np.array([[x, 30.0, 25.0] for x, e in zip(xs, est)
                   if e is not None])
    assert len(pts) >= 8
    from pislamfusion_tpu.ops import ransac
    T = np.asarray(ransac.sim3_horn(jnp.asarray(pts.astype(np.float32)),
                                    jnp.asarray(gt.astype(np.float32))))
    from pislamfusion_tpu.utils import host_se3 as hse3
    s, R, t = T[7], hse3.quat_to_matrix(T[3:7]), T[:3]
    aligned = (s * (R @ pts.T)).T + t
    ate = float(np.sqrt(((aligned - gt) ** 2).sum(-1).mean()))
    span = float(np.linalg.norm(gt[-1] - gt[0]))
    assert ate < 0.05 * span, (ate, span)
