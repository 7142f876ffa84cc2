"""GPS SIM3 fusion e2e: a synthetic survey with noisy GPS must produce a
GEO-REGISTERED map — positions in meters in the local ENU frame, no
gauge alignment allowed in the assertion.

Mirrors the reference pipeline: DIYSLAM::tryFitGPS map->GPS SIM3
(DIYSLAM.cpp:442-485) + GPS priors in local BA once fitted
(MapperDemo.cpp:1431-1458, getGPSEdge :155-220).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pislamfusion_tpu.core.camera import Camera
from pislamfusion_tpu.core.gps import LocalFrame
from pislamfusion_tpu.core.svar import Svar
from pislamfusion_tpu.models.slam import create_slam
from pislamfusion_tpu.ops import lie, ransac

from synth_survey import make_ground, lawnmower, render_view

pytestmark = pytest.mark.e2e

ORIGIN = (116.35, 39.96, 40.0)   # lon, lat, alt of the ENU anchor
GPS_SIGMA = 0.5                  # meters of synthetic GPS noise


def _base_cfg():
    cfg = Svar()
    cfg.set("FeatureDetector", "ORB")
    cfg.set("SLAM.nFeature", "500")
    cfg.set("SLAM.MaxOverlap", "0.95")
    cfg.set("SLAM.LoopClose", "0")
    cfg.set("SLAM.BAFrameCap", "8")
    cfg.set("SLAM.BAPointCap", "1024")
    cfg.set("SLAM.BAObsCap", "4096")
    cfg.set("SLAM.LocalBAIters", "8")
    return cfg


def _run(with_gps: bool):
    rng = np.random.default_rng(3)
    ground = make_ground(rng)
    cam = Camera(320, 240, 260.0, 260.0, 160.0, 120.0)
    poses = lawnmower()
    local = LocalFrame(*ORIGIN)
    cfg = _base_cfg()
    slam = create_slam(cfg, cam)
    anchor = None   # the SLAM ENU frame is anchored at the FIRST fix
    for i, p in enumerate(poses):
        img = render_view(ground, cam, p)
        gps = None
        if with_gps:
            noisy = p[:3] + rng.normal(0, GPS_SIGMA, 3)
            if anchor is None:
                anchor = noisy
            gps = local.local_to_lla(noisy)   # (lon, lat, alt)
        slam.track(img, float(i), gps_lla=gps, gps_acc=GPS_SIGMA)
    slam.finish()
    frames = [f for f in slam.map.frames()
              if f.n_tracked() > 0 or f.is_keyframe]
    est = np.stack([f.pose_c2w[:3] for f in frames])
    gt = poses[np.asarray([f.id for f in frames])][:, :3]
    if anchor is not None:
        gt = gt - anchor      # express truth in the SLAM ENU frame
    return slam, est, gt


@pytest.fixture(scope="module")
def gps_run():
    return _run(with_gps=True)


def test_gps_fit_happened(gps_run):
    slam, est, gt = gps_run
    assert slam.mapper.gps_fitted, "SIM3 GPS fit never triggered"
    assert slam.cfg.get_bool("GPS.Fitted")


def test_map_is_geo_registered(gps_run):
    """ATE in METERS against the synthetic truth — no SIM3 alignment: the
    map itself must live in the ENU frame after the fit + GPS priors."""
    slam, est, gt = gps_run
    ate = float(np.sqrt(np.mean(np.sum((est - gt) ** 2, -1))))
    assert ate < 4.0 * GPS_SIGMA, f"unaligned ATE {ate:.2f} m"


def test_scale_is_metric(gps_run):
    """Camera altitude above the reconstructed ground must be ~25 m. The
    ground height comes from a robust RANSAC plane fit (the framework's own
    plane product): two-view triangulation noise has an asymmetric depth
    tail that skews raw percentiles of the point cloud."""
    slam, est, gt = gps_run
    plane = slam.mapper.force_plane()   # the mapper's own scale-aware fit
    assert plane is not None
    alt = np.mean(est[:, 2]) - plane[2]
    # tolerance covers the KNOWN two-view triangulation depth bias: at
    # baseline/depth ~0.12 the 1/disparity noise is asymmetric, so the
    # reconstructed ground sits 1-2.5 m deep of truth even with pinned
    # cameras (multi-view BA shrinks but does not remove it)
    assert abs(alt - 25.0) < 3.5, f"altitude {alt:.2f} m (want 25)"


def test_gps_bounds_drift_vs_gps_off(gps_run):
    """The GPS-off run is gauge-free: its unaligned error is unbounded while
    the GPS run is pinned to ENU. Also its SIM3-aligned ATE must not beat
    the GPS run's unaligned ATE by a large factor (GPS priors do not
    degrade local accuracy)."""
    slam_on, est_on, gt_on = gps_run
    slam_off, est_off, gt_off = _run(with_gps=False)
    assert not slam_off.mapper.gps_fitted
    ate_on = float(np.sqrt(np.mean(np.sum((est_on - gt_on) ** 2, -1))))
    ate_off_raw = float(np.sqrt(np.mean(np.sum((est_off - gt_off) ** 2, -1))))
    assert ate_on < ate_off_raw, (ate_on, ate_off_raw)
    S = ransac.sim3_horn(jnp.asarray(est_off, jnp.float32),
                         jnp.asarray(gt_off, jnp.float32))
    aligned = np.asarray(lie.sim3_apply(S, jnp.asarray(est_off, jnp.float32)))
    ate_off = float(np.sqrt(np.mean(np.sum((aligned - gt_off) ** 2, -1))))
    # GPS run (vs noisy fixes!) should stay within a few sigma of the
    # gauge-aligned noise-free-geometry run
    assert ate_on < ate_off + 4.0 * GPS_SIGMA, (ate_on, ate_off)


def test_fit_gps_priory_two_frames():
    """The SIM3WithPYR early fit (TrackerOpt::fitGPS, :388-431): two
    keyframes with GPS+attitude priors geo-register the map with no
    trajectory spread requirement."""
    from pislamfusion_tpu.models.frame import Frame
    from pislamfusion_tpu.models.mapper import Mapper
    from pislamfusion_tpu.models.worldmap import WorldMap
    from pislamfusion_tpu.utils import host_se3 as hse3

    cfg = Svar()
    cam = Camera(320, 240, 260.0, 260.0, 160.0, 120.0)
    wmap = WorldMap(cfg)
    mapper = Mapper(wmap, cfg)
    # true map->ENU similarity: scale 12.5, identity rotation, offset
    scale_true = 12.5
    offset = np.array([100.0, -40.0, 60.0], np.float32)
    for i, t_est in enumerate([np.zeros(3), np.array([1.6, 0.0, 0.0])]):
        fr = Frame(id=i, timestamp=float(i), camera=cam)
        fr.pose_c2w = np.concatenate(
            [t_est, [0, 0, 0, 1]]).astype(np.float32)
        fr.is_keyframe = True
        fr.gps_enu = (offset + scale_true * t_est).astype(np.float32)
        fr.pyr = np.array([-90.0, 0.0, 0.0])
        fr.height_ground = 25.0
        fr.kp2mp = np.zeros(0, np.int64)
        wmap.insert_frame(fr)
    assert mapper.fit_gps_priory()
    assert mapper.gps_fitted
    f0 = wmap.frame(0)
    np.testing.assert_allclose(f0.pose_c2w[:3], offset, atol=1e-3)
    # camera now looks down in ENU (rotation came from the attitude prior)
    view = hse3.quat_rotate(f0.pose_c2w[3:7], np.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(view, [0, 0, -1], atol=1e-4)
