"""BoW relocalization e2e: kidnap the tracker mid-survey and recover via
appearance candidates from the EMBEDDED default vocabulary.

Covers: resources/orb_vocab auto-load (FileResource.h analogue), the BoW
inverted file (LoopDetectorBoW.cpp:49-89), and the LOST -> relocalize
path (TrackerOpt.cpp:321-334, 1307-1350) driven by appearance rather than
pose distance.
"""
import numpy as np
import pytest

from pislamfusion_tpu.core.camera import Camera
from pislamfusion_tpu.core.svar import Svar
from pislamfusion_tpu.models.loopclose import LoopDetectorBoW
from pislamfusion_tpu.models.slam import create_slam

from synth_survey import make_ground, nadir_pose, render_view

pytestmark = pytest.mark.e2e


def test_bow_kidnap_recovery():
    rng = np.random.default_rng(7)
    ground = make_ground(rng)
    cam = Camera(320, 240, 260.0, 260.0, 160.0, 120.0)
    cfg = Svar()
    cfg.set("FeatureDetector", "ORB")
    cfg.set("SLAM.nFeature", "500")
    cfg.set("SLAM.LoopClose", "1")          # builds the inverted file
    cfg.set("LoopDetector", "BoW")          # no Vocabulary key -> embedded
    cfg.set("SLAM.LoopMinFrameGap", "10")
    cfg.set("SLAM.BAFrameCap", "8")
    cfg.set("SLAM.BAPointCap", "1024")
    cfg.set("SLAM.BAObsCap", "4096")
    cfg.set("SLAM.LocalBAIters", "8")
    slam = create_slam(cfg, cam)
    poses = np.stack([nadir_pose(30.0 + 2.0 * i, 40.0, 25.0)
                      for i in range(20)])
    for i, p in enumerate(poses):
        slam.track(render_view(ground, cam, p), float(i))
    # modules are created lazily on the first frame; the embedded
    # vocabulary must have loaded (no GPS fallback)
    assert isinstance(slam.tracker.loop_detector, LoopDetectorBoW)
    assert slam.vocabulary is not None and not slam.vocabulary.empty()
    tracked_before = slam.frames_tracked
    assert tracked_before > 14, tracked_before
    # snapshot the map-gauge positions of the early keyframes
    kf_pose = {f.id: f.pose_c2w.copy() for f in slam.map.keyframes()}

    # kidnap: featureless frames force LOST (shorter than SLAM.LostRestart
    # seconds so the tracker relocalizes instead of re-initializing)
    blank = np.full((240, 320), 128.0, np.float32)
    t = float(len(poses))
    for j in range(3):
        slam.track(blank, t + j)

    # reappear over an early, already-mapped stretch
    revisit_ids = [4, 5, 6]
    recovered = []
    for j, fi in enumerate(revisit_ids):
        fr = slam.track(render_view(ground, cam, poses[fi]),
                        t + 3.0 + j)
        recovered.append((fi, fr))
    tracked_after = slam.frames_tracked - tracked_before
    assert tracked_after >= 2, f"relocalization failed ({tracked_after}/3)"

    # the recovered poses must land near the ORIGINAL map-gauge estimates
    # of the revisited area (compare against the nearest early keyframe)
    early = np.stack([kf_pose[k][:3] for k in sorted(kf_pose)
                      if k <= 10]) if kf_pose else None
    assert early is not None and len(early) > 0
    span = np.linalg.norm(poses[-1, :3] - poses[0, :3])
    ok = 0
    for fi, fr in recovered[1:]:
        d = np.min(np.linalg.norm(early - fr.pose_c2w[:3], axis=1))
        if d < 0.2 * span:
            ok += 1
    assert ok >= 1, "recovered pose far from the revisited map region"


def test_sift_default_vocabulary_bow():
    """The reference's DEFAULT detector is SIFT (Default.cfg:2-9) and its
    loop detection is BoW over a shipped vocabulary. The embedded float
    SIFT vocab (resources/sift_vocab, scripts/train_sift_vocab.py) must
    auto-load for SIFT configs — previously they silently degraded to the
    GPS distance detector — and assign words to real SIFT descriptors."""
    import jax.numpy as jnp
    from pislamfusion_tpu.models.slam import _default_vocabulary

    voc = _default_vocabulary("sift")
    assert voc is not None and not voc.empty()
    assert not voc.is_binary and voc.node_desc.shape[1] == 128
    # word assignment on real SIFT descriptors from a textured frame
    rng = np.random.default_rng(8)
    ground = make_ground(rng)
    cam = Camera(320, 240, 260.0, 260.0, 160.0, 120.0)
    img = render_view(ground, cam, nadir_pose(40.0, 40.0, 25.0))
    from pislamfusion_tpu.ops.features import sift
    feats = sift.sift_detect(
        jnp.asarray(np.asarray(img, np.float32).mean(-1)),
        sift.SiftParams(n_features=300, contrast_threshold=0.008))
    wid, w, _ = voc.transform_arrays(feats["desc"], feats["valid"])
    widn = np.asarray(wid)[np.asarray(feats["valid"])]
    assert len(widn) > 20
    assert (widn >= 0).all()
    assert len(np.unique(widn)) > 10    # spreads over the vocabulary
    # the SLAM wiring must pick BoW (not the GPS fallback) for SIFT
    cfg = Svar()
    cfg.set("FeatureDetector", "Sift")
    cfg.set("Sift.ContrastThreshold", "0.008")
    cfg.set("SLAM.nFeature", "300")
    cfg.set("SLAM.LoopClose", "1")
    cfg.set("LoopDetector", "BoW")
    slam = create_slam(cfg, cam)
    slam.track(img, 0.0)
    slam.track(render_view(ground, cam, nadir_pose(42.0, 40.0, 25.0)), 1.0)
    assert isinstance(slam.tracker.loop_detector, LoopDetectorBoW)
    assert slam.vocabulary is not None and not slam.vocabulary.is_binary
