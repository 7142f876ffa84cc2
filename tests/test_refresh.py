"""Mosaic pose-refresh (VERDICT r3 item 6): tiles composited under early
(drifted) poses are re-rendered once better poses exist, instead of the
drift staying baked into the canvas forever. The reference's analogue:
MultiBandMap2DCPU re-blends on draw and re-feeds after loop closure
(:637-775); here WorldMap pose updates drive Map2D.refresh()."""
import numpy as np
import pytest

from pislamfusion_tpu.core.camera import Camera
from pislamfusion_tpu.core.svar import Svar
from pislamfusion_tpu.models.map2d import create_map2d

from synth_survey import make_ground, lawnmower, render_view


def _psnr(img, covered, ground, min_xy, lp):
    ys, xs = np.nonzero(covered)
    gx = np.clip(((min_xy[0] + (xs + 0.5) * lp) / 0.1).astype(int), 0,
                 ground.shape[1] - 1)
    gy = np.clip(((min_xy[1] + (ys + 0.5) * lp) / 0.1).astype(int), 0,
                 ground.shape[0] - 1)
    d = img[ys, xs].astype(np.float64) - ground[gy, gx]
    return 10 * np.log10(255.0 ** 2 / max((d ** 2).mean(), 1e-12))


@pytest.mark.parametrize("map_type", ["multiband", "weighted", "gpu"])
def test_refresh_recovers_drifted_mosaic(map_type, rng):
    ground = make_ground(rng)
    cam = Camera(320, 240, 260.0, 260.0, 160.0, 120.0)
    poses = lawnmower()[:16]
    frames = [render_view(ground, cam, p) for p in poses]
    # drift grows along the track (what uncorrected VO bakes into tiles)
    drift = np.cumsum(rng.normal(0, 0.25, (len(poses), 2)), 0)
    drifted = poses.copy()
    drifted[:, 0] += drift[:, 0]
    drifted[:, 1] += drift[:, 1]

    cfg = Svar()
    cfg.set("Map2D.BandNumber", "3")
    m = create_map2d(map_type, cfg)
    plane = np.array([0, 0, 0, 0, 0, 0, 1.0])
    assert m.prepare(plane, cam, [(None, p) for p in poses])
    for img, p in zip(frames, drifted):
        assert m.feed(img, p)
    img0, cov0 = m.blended()
    psnr_drift = _psnr(img0, cov0, ground, m.min_xy, m.length_pixel)

    # "optimization" recovers the true poses -> refresh re-renders
    entries = [(img, old, new)
               for img, old, new in zip(frames, drifted, poses)]
    refed = m.refresh(entries)
    assert refed > 0
    img1, cov1 = m.blended()
    psnr_fixed = _psnr(img1, cov1, ground, m.min_xy, m.length_pixel)
    assert psnr_fixed > psnr_drift + 3.0, (psnr_drift, psnr_fixed)

    # a refresh with unchanged poses is a no-op
    assert m.refresh([(img, p, p)
                      for img, p in zip(frames, poses)]) == 0


def test_fusion_refresh_wiring(rng):
    """The full event chain: feed through the DataTrans queue with
    (img, pose, meta) triples, publish 'map_transformed' with a map
    whose keyframe moved, and the FusionSystem consumer re-renders."""
    import queue as _q
    import time

    from pislamfusion_tpu.core.messenger import DataTrans, messenger
    from pislamfusion_tpu.models.fusion import FusionSystem
    from types import SimpleNamespace

    ground = make_ground(rng)
    cam = Camera(320, 240, 260.0, 260.0, 160.0, 120.0)
    poses = lawnmower()[:10]
    frames = [render_view(ground, cam, p) for p in poses]
    drifted = poses.copy()
    drifted[:, 0] += 3.0      # rigid 3 m offset the kf delta removes

    class FakeMap:
        def __init__(self):
            self.store = {}

        def frame(self, fid):
            return self.store.get(fid)

    fake = FakeMap()
    # TWO reference keyframes: kf 100 (first half) moved, kf 101 (second
    # half) did not — a PARTIAL deformation like a loop bend. (A rigid
    # all-frames move is a gauge change the fusion consumer now removes
    # before thresholding: map + plane move together, so the
    # plane-relative mosaic needs no re-render.)
    kf_old = drifted[0].copy()          # kf 100 pose at feed time
    fake.store[100] = SimpleNamespace(pose_c2w=poses[0].copy())  # moved
    kf_old2 = drifted[5].copy()
    fake.store[101] = SimpleNamespace(pose_c2w=drifted[5].copy())  # same

    cfg = Svar()
    cfg.set("Map2D.BandNumber", "3")
    cfg.set("Plane", "0 0 0 0 0 0 1")
    cfg.set("PrepareFrameNum", "4")
    cfg.set("Camera.Paraments", "320 240 260 260 160 120")
    tq = DataTrans(capacity=64)
    pq = DataTrans(capacity=2)
    fus = FusionSystem(cfg, cam, trans_q=tq, plane_q=pq).start()
    for i, (img, p) in enumerate(zip(frames, drifted)):
        if i < 5:   # first half rides kf 100 (moved by -3 m in x)
            meta = (1000 + i, 100, kf_old.copy())
        else:       # second half rides kf 101 (unmoved)
            meta = (1000 + i, 101, kf_old2.copy())
        tq.product((img, p.copy(), meta))
    # wait until every frame is fed+cached before the event: an early
    # event would see only the first (rigidly-moved) half, which the
    # gauge removal correctly treats as a no-op
    for _ in range(300):
        if fus.frames_fed >= len(frames):
            break
        time.sleep(0.1)
    messenger.advertise("map_transformed").publish(fake)
    fus.finish()
    assert fus.error is None, fus.error
    assert fus.frames_fed == len(frames)
    assert fus.frames_refreshed > 0


def test_fusion_refresh_rotational_gauge_noop(rng):
    """A global SIM3 refit that ROTATES the map about the (collinear)
    track axis is a pure gauge move: map and plane move together, so the
    plane-relative mosaic is unchanged and refresh must be a clean no-op.
    The round-4 centers-only fit could not see this rotation at all
    (collinear centers); the pose-aware gauge fit removes it exactly.
    (The gauge here is SMALL — under Fusion.RebaseThresh. A LARGE gauge
    move instead re-derives the canvas: test_fusion_rebase_on_plane_move.)
    """
    import time
    from types import SimpleNamespace

    from pislamfusion_tpu.core.messenger import DataTrans, messenger
    from pislamfusion_tpu.models.fusion import FusionSystem
    from pislamfusion_tpu.utils import host_se3 as hse3

    ground = make_ground(rng)
    cam = Camera(320, 240, 260.0, 260.0, 160.0, 120.0)
    poses = lawnmower()[:10]                    # one straight strip
    frames = [render_view(ground, cam, p) for p in poses]

    ang = 0.008                                  # gauge: rot about x + shift
    qg = np.array([np.sin(ang / 2), 0, 0, np.cos(ang / 2)])
    gauge = np.concatenate([[0.3, -0.2, 0.1], qg])
    moved = [hse3.se3_mul(gauge, p) for p in poses]

    class FakeMap:
        def __init__(self):
            self.store = {}

        def frame(self, fid):
            return self.store.get(fid)

    fake = FakeMap()
    for i, m in enumerate(moved):
        fake.store[1000 + i] = SimpleNamespace(pose_c2w=m)

    cfg = Svar()
    cfg.set("Map2D.BandNumber", "3")
    cfg.set("Plane", "0 0 0 0 0 0 1")
    cfg.set("PrepareFrameNum", "4")
    tq = DataTrans(capacity=64)
    pq = DataTrans(capacity=2)
    fus = FusionSystem(cfg, cam, trans_q=tq, plane_q=pq).start()
    for i, (img, p) in enumerate(zip(frames, poses)):
        tq.product((img, p.copy(), (1000 + i, 1000 + i, p.copy())))
    for _ in range(300):
        if fus.frames_fed >= len(frames):
            break
        time.sleep(0.1)
    img0, cov0 = fus.map2d.blended()
    messenger.advertise("map_transformed").publish(fake)
    fus.finish()
    assert fus.error is None, fus.error
    assert fus.frames_refreshed == 0            # gauge removed exactly
    img1, cov1 = fus.map2d.blended()
    assert np.array_equal(cov0, cov1)
    assert np.array_equal(img0, img1)           # canvas untouched


def test_fusion_rebase_on_plane_move(rng):
    """VERDICT r4 missing #1: a LARGE global refit (GPS SIM3 / closure)
    moves the world under the canvas. The old epoch guard refused such
    entries and left the stale plane geometry in place, so every FUTURE
    feed (new-world poses vs old-world plane snapshot) landed
    misregistered. The rebase path re-derives the plane/min_xy and
    re-feeds the cache; frames fed after the refit must composite
    consistently with frames fed before it."""
    import time
    from types import SimpleNamespace

    from pislamfusion_tpu.core.messenger import DataTrans, messenger
    from pislamfusion_tpu.models.fusion import FusionSystem
    from pislamfusion_tpu.utils import host_se3 as hse3

    ground = make_ground(rng)
    cam = Camera(320, 240, 260.0, 260.0, 160.0, 120.0)
    poses = lawnmower()[:16]
    frames = [render_view(ground, cam, p) for p in poses]

    ang = 0.2                                    # yaw about z + 15 m shift
    qg = np.array([0, 0, np.sin(ang / 2), np.cos(ang / 2)])
    gauge = np.concatenate([[15.0, 5.0, 0.0], qg])
    new_world = [hse3.se3_mul(gauge, p) for p in poses]

    class FakeMap:
        def __init__(self):
            self.store = {}

        def frame(self, fid):
            return self.store.get(fid)

    fake = FakeMap()
    for i, m in enumerate(new_world):
        fake.store[1000 + i] = SimpleNamespace(pose_c2w=m)

    cfg = Svar()
    cfg.set("Map2D.BandNumber", "3")
    cfg.set("Plane", "0 0 0 0 0 0 1")
    cfg.set("PrepareFrameNum", "4")
    tq = DataTrans(capacity=64)
    pq = DataTrans(capacity=2)
    fus = FusionSystem(cfg, cam, trans_q=tq, plane_q=pq).start()
    # phase 1: 12 frames in the OLD world frame
    for i in range(12):
        tq.product((frames[i], poses[i].copy(),
                    (1000 + i, 1000 + i, poses[i].copy())))
    for _ in range(300):
        if fus.frames_fed >= 12:
            break
        time.sleep(0.1)
    assert fus.frames_fed == 12
    old_map = fus.map2d
    # the refit: everything (and the implied plane) moved by `gauge`
    messenger.advertise("map_transformed").publish(fake)
    # phase 2: SLAM keeps running in the NEW world frame
    tq.product((frames[12], new_world[12].copy(),
                (1012, 1012, new_world[12].copy())))
    for _ in range(300):
        if fus.frames_refreshed >= 12:
            break
        time.sleep(0.1)
    assert fus.frames_refreshed >= 12        # the whole cache re-fed
    assert fus.map2d is not old_map          # geometry re-derived
    assert not np.allclose(fus.map2d.plane, old_map.plane)
    for i in range(13, 16):
        tq.product((frames[i], new_world[i].copy(),
                    (1000 + i, 1000 + i, new_world[i].copy())))
    fus.finish()
    assert fus.error is None, fus.error
    assert fus.frames_fed == 16
    img, cov = fus.map2d.blended()
    psnr = _psnr(img, cov, ground, fus.map2d.min_xy,
                 fus.map2d.length_pixel)
    # everything consistent again -> near the clean known-pose mosaic
    m_ref = create_map2d("multiband", cfg)
    assert m_ref.prepare(np.array([0, 0, 0, 0, 0, 0, 1.0]), cam,
                         [(None, p) for p in poses])
    for img_i, p in zip(frames, poses):
        m_ref.feed(img_i, p)
    img_r, cov_r = m_ref.blended()
    psnr_ref = _psnr(img_r, cov_r, ground, m_ref.min_xy,
                     m_ref.length_pixel)
    assert psnr > psnr_ref - 2.0, (psnr, psnr_ref)
