"""Loop-closure e2e: a closed rectangular circuit with LoopClose=1 must
(a) detect+close at least one loop and (b) end with less drift than the
LoopClose=0 run (LoopCloserDemo.cpp:253-420 behavior)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pislamfusion_tpu.core.camera import Camera
from pislamfusion_tpu.core.svar import Svar
from pislamfusion_tpu.models.slam import create_slam
from pislamfusion_tpu.ops import lie, ransac

from synth_survey import make_ground, nadir_pose, render_view

pytestmark = pytest.mark.e2e


def _circuit(alt=25.0, cx=43.0, cy=42.0, hw=16.0, hh=12.0, step=3.0):
    """Rectangular closed loop, revisiting the start corner at the end."""
    poses = []
    x0, x1 = cx - hw, cx + hw
    y0, y1 = cy - hh, cy + hh
    for x in np.arange(x0, x1, step):
        poses.append(nadir_pose(x, y0, alt))
    for y in np.arange(y0, y1, step):
        poses.append(nadir_pose(x1, y, alt))
    for x in np.arange(x1, x0, -step):
        poses.append(nadir_pose(x, y1, alt))
    for y in np.arange(y1, y0 - 2 * step, -step):
        poses.append(nadir_pose(x0, y, alt))
    for x in np.arange(x0, x0 + 4 * step, step):   # overlap the start leg
        poses.append(nadir_pose(x, y0, alt))
    return np.stack(poses)


def _run(loop_close: bool, seed=13):
    rng = np.random.default_rng(seed)
    ground = make_ground(rng)
    cam = Camera(320, 240, 260.0, 260.0, 160.0, 120.0)
    poses = _circuit()
    cfg = Svar()
    cfg.set("FeatureDetector", "ORB")
    cfg.set("SLAM.nFeature", "500")
    cfg.set("SLAM.MaxOverlap", "0.95")
    cfg.set("SLAM.LoopClose", "1" if loop_close else "0")
    cfg.set("SLAM.LoopMinFrameGap", "25")
    cfg.set("SLAM.BAFrameCap", "8")
    cfg.set("SLAM.BAPointCap", "1024")
    cfg.set("SLAM.BAObsCap", "4096")
    cfg.set("SLAM.LocalBAIters", "8")
    slam = create_slam(cfg, cam)
    for i, p in enumerate(poses):
        slam.track(render_view(ground, cam, p), float(i))
    slam.finish()
    frames = [f for f in slam.map.frames()
              if f.n_tracked() > 0 or f.is_keyframe]
    est = np.stack([f.pose_c2w[:3] for f in frames])
    gt = poses[np.asarray([f.id for f in frames])][:, :3]
    S = ransac.sim3_horn(jnp.asarray(est, jnp.float32),
                         jnp.asarray(gt, jnp.float32))
    aligned = np.asarray(lie.sim3_apply(S, jnp.asarray(est, jnp.float32)))
    ate = float(np.sqrt(np.mean(np.sum((aligned - gt) ** 2, -1))))
    return slam, ate


def test_loop_closes_and_reduces_drift():
    slam_on, ate_on = _run(True)
    assert slam_on.frames_tracked > 0.8 * slam_on.frames_total
    assert slam_on.loop_closer.closed_loops >= 1, "no loop was closed"
    slam_off, ate_off = _run(False)
    assert slam_off.loop_closer.closed_loops == 0
    # closing the circuit must not hurt, and should measurably help
    assert ate_on <= ate_off * 1.05, (ate_on, ate_off)
    span = 2 * 16.0
    assert ate_on < 0.03 * span, f"ATE {ate_on:.3f} m after closure"


def test_tracker_test_loop_detector_harness():
    """Tracker?=testLoopDetector (zhaoyong/TrackerTestLoopDetector.cpp):
    the loop-detector evaluation harness walks the closed circuit with no
    pose estimation, promotes keyframes on match decay, and must find at
    least one match-verified loop pair with a real frame gap when the
    circuit closes."""
    from pislamfusion_tpu.models.tracker import TrackerLoopTest
    rng = np.random.default_rng(15)
    ground = make_ground(rng)
    cam = Camera(320, 240, 260.0, 260.0, 160.0, 120.0)
    poses = _circuit()
    cfg = Svar()
    cfg.set("FeatureDetector", "ORB")
    cfg.set("Tracker", "testLoopDetector")
    cfg.set("SLAM.nFeature", "500")
    cfg.set("SLAM.LoopClose", "1")
    cfg.set("LoopDetector", "BoW")
    cfg.set("SLAM.LoopMinFrameGap", "25")
    slam = create_slam(cfg, cam)
    for i, p in enumerate(poses):
        slam.track(render_view(ground, cam, p), float(i))
    slam.finish()
    tr = slam.tracker
    assert isinstance(tr, TrackerLoopTest)
    assert tr.n_keyframes >= 4, tr.n_keyframes
    assert len(tr.loops_found) >= 1, "no verified loop on a closed circuit"
    assert all(f - r >= 25 for r, f in tr.loops_found), tr.loops_found
