"""Long-horizon soak: the full default profile on an 80-frame survey.

Everything on at once — fused ORB tracking, online mapper worker, GPS
fusion with noisy fixes, loop closing, keyframe + map-point culling,
mosaic feed through the DataTrans queues — the closest synthetic analogue
to running the reference binary with Default.cfg on a long sequence
(SURVEY.md section 4: integration testing = datasets end-to-end).

Asserts the long-horizon mechanisms specifically: bounded keyframe count
(culling), bounded map size, geo-registration staying metric to the end,
and a coherent mosaic. ~10 min on the 1-core box; `soak` marker (run explicitly).
"""
import numpy as np
import pytest

from pislamfusion_tpu.core.camera import Camera
from pislamfusion_tpu.core.gps import LocalFrame
from pislamfusion_tpu.core.svar import Svar
from pislamfusion_tpu.models.fusion import FusionSystem
from pislamfusion_tpu.models.slam import create_slam

from synth_survey import make_ground, nadir_pose, render_view

pytestmark = pytest.mark.soak   # own tier: heavier than e2e


def test_long_survey_everything_on():
    rng = np.random.default_rng(21)
    ground = make_ground(rng)
    cam = Camera(320, 240, 260.0, 260.0, 160.0, 120.0)
    poses = []
    for iy, y in enumerate(np.arange(32.0, 56.0, 6.0)):
        xs = np.arange(26.0, 62.0, 1.8)
        for x in (xs if iy % 2 == 0 else xs[::-1]):
            poses.append(nadir_pose(x, y, 25.0))
    poses = np.stack(poses)
    n = len(poses)
    assert n >= 80

    local = LocalFrame(116.0, 40.0, 0.0)
    cfg = Svar()
    for k, v in [("FeatureDetector", "ORB"), ("SLAM.nFeature", "500"),
                 ("SLAM.MaxOverlap", "0.9"), ("SLAM.LoopClose", "1"),
                 ("SLAM.isOnline", "0"), ("SLAM.BAFrameCap", "8"),
                 ("SLAM.BAPointCap", "1024"), ("SLAM.BAObsCap", "4096"),
                 ("SLAM.LocalBAIters", "6"), ("Plane.MinPoints", "400"),
                 ("GPS.MinFrames2Fit", "5")]:
        cfg.set(k, v)
    slam = create_slam(cfg, cam)
    fusion = FusionSystem(cfg, cam).start()

    for i, p in enumerate(poses):
        img = render_view(ground, cam, p)
        noisy = p[:3] + rng.normal(0, 0.4, 3)
        lla = local.local_to_lla(noisy)
        slam.track(img, float(i), gps_lla=lla, gps_acc=0.5)
    slam.finish()
    fusion.finish()

    # tracked ratio on a long run. The scenario runs OFFLINE so the
    # assertions are deterministic: ONLINE mode on this 1-core box
    # starves the mapper (tracker+feeder+mapper+fusion share the core)
    # and the tracked ratio swings 25-60% run-to-run with identical code
    # (round-1 tree measured 24% under the same load) — threading
    # liveness is asserted separately in test_online_liveness below.
    ratio = slam.frames_tracked / slam.frames_total
    assert ratio > 0.85, f"tracked only {ratio * 100:.0f}%"
    assert slam.track_errors == 0, f"{slam.track_errors} thread errors"
    # geo-registration happened and stayed metric: keyframe centers vs
    # the TRUE trajectory, both expressed in the SLAM's OWN ENU frame
    # (anchored at the first received GPS fix — comparing against raw
    # world coords instead was off by exactly |first pose| ~= 48 m)
    assert slam.mapper.gps_fitted
    kfs = slam.map.keyframes()
    ids = np.asarray([f.id for f in kfs])
    est = np.stack([f.pose_c2w[:3] for f in kfs])
    gt = np.stack([
        slam._local_frame.to_local(*local.local_to_lla(poses[i][:3]))
        for i in ids])
    geo_ate = np.sqrt(np.mean(np.sum((est - gt) ** 2, -1)))
    assert geo_ate < 2.0, f"geo-ATE {geo_ate:.2f} m"
    # long-horizon bounds: culling keeps the map sub-linear in frames
    assert len(kfs) < 0.75 * n, f"{len(kfs)} KFs for {n} frames (no culling?)"
    assert slam.map.point_num() < 120 * len(kfs)
    # the fusion consumer built a mosaic from the queues
    assert fusion.frames_fed > 0.5 * n
    out, covered = fusion.map2d.blended()
    assert covered.sum() > 20000


def test_online_liveness():
    """ONLINE threading invariants on a shorter survey: the run COMPLETES
    (the bounded feed queue never deadlocks — it did before the
    loop-closure/keyframe-culling race fix), the tracking thread survives
    every frame (catch-log-continue), and tracking makes real progress.
    Throughput-quality assertions live in the offline soak above: on this
    1-core box online tracked ratio is load-dependent, not code-quality-
    dependent."""
    rng = np.random.default_rng(5)
    ground = make_ground(rng)
    cam = Camera(320, 240, 260.0, 260.0, 160.0, 120.0)
    poses = [nadir_pose(26.0 + 1.8 * i, 36.0, 25.0) for i in range(40)]
    local = LocalFrame(116.0, 40.0, 0.0)
    cfg = Svar()
    for k, v in [("FeatureDetector", "ORB"), ("SLAM.nFeature", "500"),
                 ("SLAM.MaxOverlap", "0.9"), ("SLAM.LoopClose", "1"),
                 ("SLAM.isOnline", "1"), ("SLAM.BAFrameCap", "8"),
                 ("SLAM.BAPointCap", "1024"), ("SLAM.BAObsCap", "4096"),
                 ("SLAM.LocalBAIters", "6"), ("GPS.MinFrames2Fit", "5")]:
        cfg.set(k, v)
    slam = create_slam(cfg, cam)
    for i, p in enumerate(poses):
        img = render_view(ground, cam, p)
        noisy = p[:3] + rng.normal(0, 0.4, 3)
        slam.track(img, float(i), gps_lla=local.local_to_lla(noisy),
                   gps_acc=0.5)
    slam.finish()          # joins the tracking thread: completion IS the
    #                        no-deadlock assertion
    assert slam.track_errors == 0, f"{slam.track_errors} thread errors"
    assert slam.frames_total == len(poses)
    assert slam.frames_tracked > 0.2 * len(poses)


@pytest.mark.parametrize("chain", [1, 3])
def test_online_long_race_hunt(chain):
    """250-frame ONLINE survey with loop closure (BoW), GPS fitting, and
    culling all active — the configuration whose thread interleaving
    crashed round 2's 500-frame stress (unpack of a mapper-invalidated
    _local_stage snapshot, tracker.py). Accuracy is NOT asserted (online
    mode starves on 1 core); the assertion is zero tracking-thread
    exceptions and liveness to the end.

    chain=3 runs the same gauntlet through tracker.track_chain — the
    K-frame chain's locked stage/version snapshot and its chain-tail
    re-feed must hold up against concurrent whole-map rewrites too."""
    rng = np.random.default_rng(31)
    ground = make_ground(rng)
    cam = Camera(320, 240, 260.0, 260.0, 160.0, 120.0)
    poses = []
    for r in range(2):
        for iy, y in enumerate(np.arange(30.0, 56.0, 4.0)):
            xs = np.arange(26.0, 62.0, 1.5)
            for x in (xs if iy % 2 == 0 else xs[::-1]):
                poses.append(nadir_pose(x, y, 25.0))
    poses = np.stack(poses)[:250]
    local = LocalFrame(116.0, 40.0, 0.0)
    cfg = Svar()
    for k, v in [("FeatureDetector", "ORB"), ("SLAM.nFeature", "400"),
                 ("SLAM.MaxOverlap", "0.9"), ("SLAM.LoopClose", "1"),
                 ("LoopDetector", "BoW"), ("SLAM.isOnline", "1"),
                 ("SLAM.BAFrameCap", "8"), ("SLAM.BAPointCap", "1024"),
                 ("SLAM.BAObsCap", "4096"), ("SLAM.LocalBAIters", "6"),
                 ("Plane.MinPoints", "400"), ("GPS.MinFrames2Fit", "5"),
                 ("SLAM.TrackChain", str(chain))]:
        cfg.set(k, v)
    slam = create_slam(cfg, cam)
    fusion = FusionSystem(cfg, cam).start()
    rng2 = np.random.default_rng(32)
    for i, p in enumerate(poses):
        img = render_view(ground, cam, p)
        lla = local.local_to_lla(p[:3] + rng2.normal(0, 0.4, 3))
        slam.track(img, float(i), gps_lla=lla, gps_acc=0.5)
    slam.finish()
    fusion.finish()
    assert slam.track_errors == 0, f"{slam.track_errors} thread errors"
    assert slam.frames_total == len(poses)
    assert slam.map.point_num() > 0
