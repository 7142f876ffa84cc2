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


def _real_ground(n=1024, unique_speckle=False, seed=5):
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
    out = np.asarray(img, np.float32)
    if unique_speckle:
        # the mirror tiling makes the four quadrants EXACT copies — a
        # wrong-instance loop closure between copies is geometrically
        # self-consistent and no inlier threshold can reject it. Real
        # imagery never aliases exactly: per-pixel micro-texture is
        # unique. Model that with a weak unique speckle field.
        out = out + np.random.default_rng(seed).normal(
            0, 5.0, out.shape).astype(np.float32)
    return np.clip(out, 0, 255)


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


def _circuit_poses(step=2.0):
    """196-m rectangular circuit over the real texture with a 12-m
    revisit tail along the first strip (the mavic-library loop role,
    /root/reference/README.md section 3.5): ~90 frames between the first
    pass and the revisit, so closure must come from recognition, not
    frame-to-frame overlap. Sized to fit inside ONE unique quadrant of
    the mirror-tiled ground (see the aliasing note in
    test_real_texture_circuit_closes_loop)."""
    poses = []
    x0, x1, y0, y1, alt = 25.0, 91.0, 30.0, 62.0, 25.0
    for x in np.arange(x0, x1, step):
        poses.append(S.nadir_pose(x, y0, alt))
    for y in np.arange(y0, y1, step):
        poses.append(S.nadir_pose(x1, y, alt))
    for x in np.arange(x1, x0, -step):
        poses.append(S.nadir_pose(x, y1, alt))
    for y in np.arange(y1, y0, -step):
        poses.append(S.nadir_pose(x0, y, alt))
    for x in np.arange(x0, x0 + 12.0, step):   # revisit the first strip
        poses.append(S.nadir_pose(x, y0, alt))
    return np.stack(poses)


def _run_circuit(ground, cam, poses, frames, loop_close: bool):
    from pislamfusion_tpu.models.slam import create_slam
    cfg = Svar()
    cfg.set("FeatureDetector", "ORB")
    cfg.set("SLAM.nFeature", "600")
    cfg.set("SLAM.LoopClose", "1" if loop_close else "0")
    cfg.set("LoopDetector", "BoW")
    cfg.set("SLAM.MaxOverlap", "0.95")      # denser keyframes on the
    cfg.set("SLAM.LoopMinFrameGap", "25")   # repetitive real texture
    # the reference's default (MapperDemo.cpp mapFrameCulling gate = 0):
    # on a revisit circuit, culling erases the first-pass keyframes as
    # soon as the closing leg re-covers them - BEFORE the loop closer
    # can verify against them
    cfg.set("Mapper.MapFrameCulling", "0")
    # repetitive-structure strictness: raise the word overlap and PnP
    # inlier bars well above the wrong-instance noise floor
    cfg.set("SLAM.LoopMinCommonWords", "30")
    cfg.set("LoopCloser.MinInliers", "60")
    cfg.set("SLAM.BAFrameCap", "8")
    cfg.set("SLAM.BAPointCap", "1024")
    cfg.set("SLAM.BAObsCap", "4096")
    cfg.set("SLAM.LocalBAIters", "8")
    slam = create_slam(cfg, cam)
    for i, img in enumerate(frames):
        slam.track(img, float(i))
    slam.finish()
    return slam


def _kf_ate(slam, poses):
    """Similarity-aligned keyframe ATE vs the ground circuit."""
    from pislamfusion_tpu.ops import ransac
    from pislamfusion_tpu.utils import host_se3 as hse3
    kfs = [f for f in slam.map.keyframes()]
    pts = np.stack([f.pose_c2w[:3] for f in kfs])
    ids = np.asarray([int(round(f.timestamp)) for f in kfs])
    gt = poses[ids][:, :3]
    T = np.asarray(ransac.sim3_horn(jnp.asarray(pts.astype(np.float32)),
                                    jnp.asarray(gt.astype(np.float32))))
    s, R, t = T[7], hse3.quat_to_matrix(T[3:7]), T[:3]
    aligned = (s * (R @ pts.T)).T + t
    return float(np.sqrt(((aligned - gt) ** 2).sum(-1).mean()))


def test_real_texture_circuit_closes_loop():
    """Multi-pass orbit on real aerial texture with exposure drift and a
    60+-frame revisit (VERDICT r3 item 7): loop closure must fire on
    recognition and reduce the similarity-aligned keyframe ATE vs the
    same run without closure."""
    # n=2048 keeps the whole circuit inside ONE unique quadrant of the
    # mirror-tiled photo: with the 1024 tiling the circuit crossed EXACT
    # texture copies 51 m apart, and wrong-instance closures (hundreds
    # of geometrically self-consistent inliers) warped the map to 20+ m
    # ATE - no threshold can reject a perfect alias, only unique
    # micro-texture (the speckle) and non-repeating coverage can
    ground = _real_ground(n=2048, unique_speckle=True)
    cam = Camera(320, 240, 260.0, 260.0, 160.0, 120.0)
    poses = _circuit_poses()
    assert len(poses) >= 90
    # exposure drift around the circuit (illumination changing with time)
    gains = 1.0 + 0.12 * np.sin(np.linspace(0, 2 * np.pi, len(poses)))
    frames = [np.clip(S.render_view(ground, cam, p) * g, 0, 255)
              for p, g in zip(poses, gains)]

    closed = _run_circuit(ground, cam, poses, frames, loop_close=True)
    assert closed.frames_tracked > 0.8 * closed.frames_total
    assert closed.loop_closer.closed_loops >= 1, \
        "no loop closed on the revisit"
    ate_closed = _kf_ate(closed, poses)

    open_ = _run_circuit(ground, cam, poses, frames, loop_close=False)
    assert open_.frames_tracked > 0.8 * open_.frames_total
    ate_open = _kf_ate(open_, poses)
    assert ate_closed < ate_open, (ate_closed, ate_open)
    span = 2 * (91.0 - 25.0) + 2 * (62.0 - 30.0)
    assert ate_closed < 0.03 * span, (ate_closed, span)
