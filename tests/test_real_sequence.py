"""The hardest achievable real-sequence surrogate (VERDICT r4 item 7).

No multi-frame real drone dataset can be fetched in this sandbox (zero
egress), so this builds the closest surrogate the real aerial photo
supports and drives the FULL chain — SLAM (loop closure on) -> RANSAC
plane -> mosaic fusion -> end-of-stream pose refresh — through it:

  * real texture: the campus aerial photograph (see test_real_texture's
    provenance note), mirror-tiled with a unique speckle field so copies
    can't alias as loop-closure candidates;
  * multi-strip crossing coverage: a 5-strip lawnmower (95 frames) plus
    a revisit pass over the first strip after >90 frames — the revisit
    geometry every real survey uses for loop closure;
  * per-strip exposure drift: smooth gain/bias drift frame-to-frame with
    a step at each strip turn (auto-exposure on a real camera re-meters
    when the heading flips) — the photometric nonstationarity the
    multiband blender has to hide;
  * a collinear-strip refresh event: the revisit's closure republishes
    the map mid-survey while the fusion cache holds straight-strip
    (rank-deficient) frame centers — the exact geometry that broke the
    round-4 gauge fit (fusion._maybe_refresh + host_se3 Wahba fit);
  * noisy per-frame GPS (sigma 0.5 m), like every reference dataset: the
    mono->metric SIM3 snap and the periodic refits drive the mosaic's
    rebase + persistent-gauge machinery mid-survey, and a 114-frame
    trajectory stays geo-bounded the way a real survey's does.

Reference role: the real-dataset validation culture of
/root/reference/README.md section 3 (phantom3-village, mavic-library):
track a real survey, close the loop, blend, inspect result.png.
"""
import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

import synth_survey as S
from pislamfusion_tpu.core.camera import Camera
from pislamfusion_tpu.core.messenger import DataTrans
from pislamfusion_tpu.core.svar import Svar
from pislamfusion_tpu.models.fusion import FusionSystem
from pislamfusion_tpu.models.slam import create_slam
from pislamfusion_tpu.ops import lie, ransac

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples"))

pytestmark = pytest.mark.e2e


def _ground(n=1024):
    from test_real_texture import _real_ground
    return _real_ground(n=n, unique_speckle=True, seed=7)


def _trajectory():
    """5-strip lawnmower + revisit of strip 1: revisit starts at frame 95.
    Strips are straight lines (collinear camera centers — the degenerate
    gauge-fit geometry)."""
    poses, strip_id = [], []
    xs = np.arange(25.0, 63.0, 2.0)          # 19 frames per strip
    ys = [30.0, 36.0, 42.0, 48.0, 54.0]
    for iy, y in enumerate(ys):
        row = xs if iy % 2 == 0 else xs[::-1]
        for x in row:
            poses.append(S.nadir_pose(x, y, 25.0))
            strip_id.append(iy)
    for x in xs:                              # revisit strip 1
        poses.append(S.nadir_pose(x, ys[0], 25.0))
        strip_id.append(len(ys))
    return np.stack(poses), np.asarray(strip_id)


def _exposure(k, strip):
    """Smooth per-frame drift + a gain step at each strip turn."""
    gain = 1.0 + 0.05 * np.sin(0.13 * k) + 0.04 * ((strip % 3) - 1)
    bias = 6.0 * np.sin(0.07 * k + 1.0) + 3.0 * (strip % 2)
    return gain, bias


def test_real_sequence_full_chain_revisit_refresh(tmp_path):
    ground = _ground()
    cam = Camera(320, 240, 260.0, 260.0, 160.0, 120.0)
    poses, strips = _trajectory()

    cfg = Svar()
    cfg.set("FeatureDetector", "ORB")
    cfg.set("SLAM.nFeature", "600")
    cfg.set("SLAM.MaxOverlap", "0.95")
    cfg.set("SLAM.LoopClose", "1")
    cfg.set("SLAM.BAFrameCap", "8")
    cfg.set("SLAM.BAPointCap", "1024")
    cfg.set("SLAM.BAObsCap", "4096")
    cfg.set("SLAM.LocalBAIters", "8")
    cfg.set("Plane.MinPoints", "400")
    cfg.set("PrepareFrameNum", "8")
    cfg.set("Map2D.BandNumber", "4")

    trans_q = DataTrans(30)
    plane_q = DataTrans(30)
    slam = create_slam(cfg, cam)
    slam.trans_queue = trans_q
    slam.plane_queue = plane_q
    fusion = FusionSystem(cfg, cam, trans_q=trans_q,
                          plane_q=plane_q).start()

    from pislamfusion_tpu.core.gps import LocalFrame
    local = LocalFrame(108.9, 34.0, 0.0)
    rng = np.random.default_rng(21)
    for i, p in enumerate(poses):
        img = S.render_view(ground, cam, p)
        g, b = _exposure(i, int(strips[i]))
        img = np.clip(img * g + b, 0, 255).astype(np.float32)
        noisy = p[:3] + rng.normal(0, 0.5, 3)
        slam.track(img, float(i), gps_lla=local.local_to_lla(noisy),
                   gps_acc=0.5)
    slam.finish()
    slam.mapper.force_plane()
    assert fusion.finish(), fusion.error

    # --- tracking survived the exposure drift and the strip turns
    ratio = slam.frames_tracked / max(slam.frames_total, 1)
    assert ratio > 0.85, (slam.frames_tracked, slam.frames_total)

    # --- the GPS stream geo-registered the map (reference: every drone
    # dataset carries fixes; tryFitGPS + gpsFitting keep it bounded)
    assert slam.mapper.gps_fitted

    # --- the revisit closed at least one loop (or the closure-equivalent
    # relocalization kept the revisit registered); either way the revisit
    # frames must agree with the first pass geometrically (checked by ATE)
    frames = [f for f in slam.map.frames()
              if f.n_tracked() > 0 or f.is_keyframe]
    est = np.stack([f.pose_c2w[:3] for f in frames])
    ids = np.asarray([f.id for f in frames])
    gt = poses[ids][:, :3]
    Sfit = ransac.sim3_horn(jnp.asarray(est, jnp.float32),
                            jnp.asarray(gt, jnp.float32))
    aligned = np.asarray(lie.sim3_apply(Sfit, jnp.asarray(est,
                                                          jnp.float32)))
    ate = float(np.sqrt(np.mean(np.sum((aligned - gt) ** 2, -1))))
    span = float(np.linalg.norm(gt.max(0) - gt.min(0)))
    # geo-anchored gate, absolute like test_cli's: a GPS-edge pipeline's
    # ATE is bounded by the fix noise (sigma 0.5 m here), not by the
    # trajectory span (measured 1.56 m on this 114-frame fixture)
    assert ate < 2.0, (ate, span)

    # --- the full chain blended a mosaic and the refresh machinery ran
    # on the collinear-strip cache (closure and/or final-pose refresh)
    assert fusion.map2d is not None and slam.plane is not None
    assert fusion.frames_fed >= 60, fusion.frames_fed
    assert fusion.frames_refreshed > 0, \
        "no refresh fired on a 114-frame revisit survey"

    from pipeline_demo import mosaic_psnr_vs_truth
    S_gt2est = ransac.sim3_horn(jnp.asarray(gt, jnp.float32),
                                jnp.asarray(est, jnp.float32))
    psnr, coverage = mosaic_psnr_vs_truth(fusion.map2d, ground,
                                          np.asarray(S_gt2est))
    assert coverage > 0.25, coverage
    # floor context (doc/ABLATION.md v3): GPS-edge pipelines trade mosaic
    # sharpness for geo-registration — the real-texture GPS cells measure
    # 12.5+-0.7 dB (this fixture: 12.7), vs 17.0+-0.8 gauge-free mono and
    # 0.0 (blank) with refresh disabled. The floor asserts end-to-end
    # sanity well above the blank/garbage regime; the v3 grid carries the
    # quality claims.
    assert psnr > 10.5, psnr
    fusion.save(str(tmp_path / "result.png"))
    assert (tmp_path / "result.png").exists()
