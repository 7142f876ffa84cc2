"""Mesh-sharding tests on the virtual 8-device CPU mesh: the distributed
observation-sharded BA must match the single-chip solver."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pislamfusion_tpu.ops import ba, lie
from pislamfusion_tpu.parallel import make_mesh, dist_ba, batch
from pislamfusion_tpu.ops.features.orb import OrbParams


def _make_problem(rng, F=5, P=80, noise=0.02):
    poses_c2w = np.tile(np.array([0, 0, 0, 0, 0, 0, 1.0], np.float32), (F, 1))
    poses_c2w[:, 0] = np.arange(F) * 0.5
    poses_c2w[:, 2] = -5.0
    points = rng.uniform(-2, 2, (P, 3)).astype(np.float32)
    T_w2c = np.asarray(lie.se3_inv(jnp.asarray(poses_c2w)))
    obs_f, obs_p, obs_uv = [], [], []
    for f in range(F):
        pc = np.asarray(lie.se3_apply(jnp.asarray(T_w2c[f]),
                                      jnp.asarray(points)))
        good = pc[:, 2] > 0.5
        uv = pc[:, :2] / pc[:, 2:]
        for p in np.nonzero(good)[0]:
            obs_f.append(f)
            obs_p.append(int(p))
            obs_uv.append(uv[p])
    fixed = np.zeros(F, bool)
    fixed[0] = True
    fixed[1] = True
    pts0 = points + rng.normal(0, noise, points.shape).astype(np.float32)
    pert = np.asarray(lie.se3_exp(jnp.asarray(
        rng.normal(0, 0.01, (F, 6)), jnp.float32)))
    T0 = np.array(lie.se3_mul(jnp.asarray(pert), jnp.asarray(T_w2c)))
    T0[0] = T_w2c[0]
    T0[1] = T_w2c[1]
    return ba.make_problem(
        poses=T0, pose_fixed=fixed, points=pts0,
        point_fixed=np.zeros(P, bool),
        obs_frame=np.asarray(obs_f, np.int32),
        obs_point=np.asarray(obs_p, np.int32),
        obs_uv=np.asarray(obs_uv, np.float32),
        obs_weight=np.ones(len(obs_f), np.float32)), T_w2c, points


def test_mesh_shape():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_dist_ba_matches_single_chip(rng):
    prob, T_true, pts_true = _make_problem(rng)
    mesh = make_mesh()
    p1, x1, c1 = ba.optimize(prob, iters=10)
    p8, x8, c8 = dist_ba.optimize_sharded(prob, mesh, iters=10)
    # both converge to ground truth
    assert float(c8) < 1e-4, float(c8)
    np.testing.assert_allclose(np.asarray(p8), T_true, atol=5e-3)
    np.testing.assert_allclose(np.asarray(x8), pts_true, atol=5e-3)
    # and agree with the single-chip result tightly
    np.testing.assert_allclose(np.asarray(p8), np.asarray(p1), atol=1e-4)


def test_batched_detect_sharded(rng):
    mesh = make_mesh()
    B = mesh.shape["dp"] * 2
    imgs = np.zeros((B, 96, 128), np.float32)
    for b in range(B):
        for _ in range(20):
            y, x = rng.integers(10, 70), rng.integers(10, 100)
            imgs[b, y:y + 12, x:x + 16] = rng.uniform(100, 250)
    params = OrbParams(n_features=128, n_levels=3)
    feats = batch.batched_orb_detect(jnp.asarray(imgs), params, mesh)
    assert feats["desc"].shape == (B, 128, 256)
    assert np.asarray(feats["valid"]).sum(axis=1).min() > 10
    idx, ok = batch.batched_consecutive_match(feats, "orb", mesh=mesh)
    assert idx.shape == (B, 128)


def test_dist_mosaic_matches_single_device(rng):
    """Row-striped canvas compositing over the 8-device mesh must equal the
    single-device result bit-for-bit (same program, GSPMD-partitioned)."""
    import jax.numpy as jnp
    from pislamfusion_tpu.ops import mosaic as M
    from pislamfusion_tpu.parallel import make_mesh, dist_mosaic

    bands = 3
    h_tiles = w_tiles = 8           # 2048px canvas, divisible by 8 devs
    patch_hw = (512, 512)
    K = 4
    imgs = rng.uniform(0, 255, (K, 240, 320, 3)).astype(np.float32)
    h_mats = []
    origins = []
    for k in range(K):
        s = 0.45 + 0.1 * rng.uniform()
        h_mats.append(np.array([[s, 0.0, 5.0 + k], [0.0, s, 3.0 + k],
                                [1e-5 * k, 0.0, 1.0]], np.float32))
        origins.append([256 * (k % 3), 256 * ((k * 2) % 3)])
    h_mats = np.stack(h_mats)
    origins = np.asarray(origins, np.int32)

    lap0, w0 = M.alloc_canvas(h_tiles, w_tiles, bands)
    single_lap, single_w = dist_mosaic.feed_frames(
        lap0, w0, imgs, h_mats, origins, bands, patch_hw, mesh=None)

    mesh = make_mesh(jax.devices()[:8])
    lap1, w1 = M.alloc_canvas(h_tiles, w_tiles, bands)
    shard_lap, shard_w = dist_mosaic.feed_frames(
        lap1, w1, imgs, h_mats, origins, bands, patch_hw, mesh=mesh)
    # result stays distributed between frames
    assert len(shard_lap[0].sharding.device_set) == 8
    for a, b in zip(single_lap, shard_lap):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-5)
    for a, b in zip(single_w, shard_w):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)


def test_dist_ransac_pnp_beats_single_device(rng):
    """Sharded PnP RANSAC: D devices x iters hypotheses, global best via
    all_gather. Must find the true pose on a low-inlier problem and never
    do worse than a single device at the same per-device budget."""
    from pislamfusion_tpu.ops import ransac
    from pislamfusion_tpu.parallel import make_mesh, dist_ransac

    mesh = make_mesh(jax.devices()[:8])
    N = 256
    # ground-truth pose: translation + mild rotation
    T_true = np.array([0.4, -0.2, 0.3, 0.1, 0.05, 0.0, 0.99], np.float32)
    T_true[3:7] /= np.linalg.norm(T_true[3:7])
    pts = rng.uniform(-2, 2, (N, 3)).astype(np.float32)
    pts[:, 2] += 6.0
    pc = np.asarray(lie.se3_apply(jnp.asarray(T_true), jnp.asarray(pts)))
    p2n = (pc[:, :2] / pc[:, 2:]).astype(np.float32)
    # only 30% inliers: the rest get large outlier noise
    out = rng.random(N) > 0.3
    p2n[out] += rng.normal(0, 0.3, (out.sum(), 2)).astype(np.float32)
    valid = np.ones(N, bool)
    key = jax.random.PRNGKey(5)
    r = dist_ransac.find_pnp_sharded(
        key, jnp.asarray(pts), jnp.asarray(p2n), jnp.asarray(valid),
        mesh=mesh, threshold=0.01, iters_per_device=64)
    assert bool(r.ok)
    inl = np.asarray(r.inliers)
    # recovered inlier set is dominated by true inliers
    assert inl[~out].sum() > 0.8 * (~out).sum()
    assert inl[out].sum() < 0.1 * out.sum()
    T = np.asarray(r.model)
    err_t = np.linalg.norm(T[:3] - T_true[:3])
    assert err_t < 0.05, err_t


def test_dist_vo_segments_match_sequential(rng):
    """Segment-parallel FastVO over the mesh: each segment tracked from
    its anchor, canvases max-weight-merged — poses must match ground truth
    and the merged mosaic must cover what sequential processing covers."""
    from pislamfusion_tpu.core.camera import Camera
    from pislamfusion_tpu.models.fastvo import FastVO
    from pislamfusion_tpu.ops import mosaic as M
    from pislamfusion_tpu.parallel import make_mesh, dist_vo
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from synth_survey import make_ground, nadir_pose, render_view

    srng = np.random.default_rng(9)
    ground = make_ground(srng)
    cam = Camera(320, 240, 260.0, 260.0, 160.0, 120.0)
    # 8 segments x 3 frames (one per mesh device)
    poses = []
    for s in range(8):
        y = 36.0 + 2.0 * s
        poses.append([nadir_pose(30.0 + 1.5 * k, y, 25.0) for k in range(3)])
    poses = np.asarray(poses)                      # [8, 3, 7]
    frames = np.stack([
        np.stack([render_view(ground, cam, p) for p in seg])
        for seg in poses])                         # [8, 3, H, W, 3]

    lp, _ = M.auto_resolution(cam, 25.0, 0.5)
    es = M.ELE_PIXELS * lp
    flat = poses.reshape(-1, 7)
    min_xy = flat[:, :2].min(0) - 3 * es
    span = flat[:, :2].max(0) - min_xy + 3 * es
    tiles = int(np.ceil(span.max() / es)) + 2
    mesh = make_mesh(jax.devices()[:8])
    vo = FastVO(cam, min_xy, tiles, lp, bands=3, n_features=512,
                n_levels=4, window_radius=40.0, fast_warp=False)
    est, n_match = dist_vo.process_survey(vo, frames, poses[:, 0], mesh)
    assert est.shape == (8, 3, 7)
    assert (n_match[:, 1:] > 50).all(), n_match
    err = np.linalg.norm(est[..., :3] - poses[..., :3], axis=-1)
    assert err.max() < 0.5, err.max()
    img, covered = vo.blended()
    assert covered.sum() > 8000
    # merged mosaic still matches the ground texture
    ys, xs = np.nonzero(covered)
    gx = np.clip(((min_xy[0] + (xs + 0.5) * lp) / 0.1).astype(int), 0,
                 ground.shape[1] - 1)
    gy = np.clip(((min_xy[1] + (ys + 0.5) * lp) / 0.1).astype(int), 0,
                 ground.shape[0] - 1)
    d = img[ys, xs].astype(np.float64) - ground[gy, gx]
    psnr = 10 * np.log10(255.0 ** 2 / max((d ** 2).mean(), 1e-12))
    assert psnr > 24.0, f"merged mosaic PSNR {psnr:.1f} dB"


def test_dist_vo_drift_correction(rng):
    """correct_drift=True bends each segment's estimated chain onto the
    NEXT segment's GPS anchor (shared boundary frame under overlap=1):
    the bent boundary pose must land on that anchor EXACTLY, the full
    trajectory must not get worse, and the merged mosaic must still
    reconstruct the ground."""
    from pislamfusion_tpu.core.camera import Camera
    from pislamfusion_tpu.models.fastvo import FastVO
    from pislamfusion_tpu.ops import mosaic as M
    from pislamfusion_tpu.parallel import make_mesh, dist_vo
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from synth_survey import make_ground, nadir_pose, render_view, \
        degrade_frame

    srng = np.random.default_rng(11)
    ground = make_ground(srng)
    cam = Camera(320, 240, 260.0, 260.0, 160.0, 120.0)
    N, seg_len, overlap = 10, 4, 1
    stride = seg_len - overlap
    truth = np.asarray([nadir_pose(30.0 + 1.4 * k, 38.0, 25.0)
                        for k in range(N)])          # [N, 7]
    # mild blur+noise induces real VO drift at this resolution
    frames = np.stack([
        degrade_frame(render_view(ground, cam, p), srng,
                      blur_px=1.2, noise=2.5) for p in truth])
    segs, firsts = dist_vo.segments_from_frames(frames, seg_len,
                                                overlap=overlap)
    anchors = truth[firsts]                          # GPS truth anchors
    S = segs.shape[0]
    assert S == 3 and firsts[1] - firsts[0] == stride

    lp, _ = M.auto_resolution(cam, 25.0, 0.5)
    es = M.ELE_PIXELS * lp
    min_xy = truth[:, :2].min(0) - 3 * es
    span = truth[:, :2].max(0) - min_xy + 3 * es
    tiles = int(np.ceil(span.max() / es)) + 2
    mesh = make_mesh(jax.devices()[:8])   # S=3 -> exercises mesh padding
    vo = FastVO(cam, min_xy, tiles, lp, bands=3, n_features=512,
                n_levels=4, window_radius=40.0, fast_warp=False)

    est_u, nm_u = dist_vo.process_survey(vo, segs, anchors, mesh)
    img_u, cov_u = vo.blended()
    est_c, nm_c = dist_vo.process_survey(vo, segs, anchors, mesh,
                                         correct_drift=True,
                                         anchor_stride=stride)
    img_c, cov_c = vo.blended()
    assert (nm_c[:, 1:] > 50).all(), nm_c
    # tracking itself is identical (correction is post-hoc bending)
    assert np.array_equal(nm_u, nm_c)

    # 1) boundary frames land on the next anchor EXACTLY (by construction)
    for s in range(S - 1):
        dp = np.linalg.norm(est_c[s, stride, :3] - anchors[s + 1, :3])
        dq = abs(float(np.dot(est_c[s, stride, 3:], anchors[s + 1, 3:])))
        assert dp < 1e-3, (s, dp)
        assert dq > 1.0 - 1e-5, (s, dq)
    # ... which the uncorrected chains do NOT (drift is real here)
    drift_u = max(np.linalg.norm(est_u[s, stride, :3] - anchors[s + 1, :3])
                  for s in range(S - 1))
    assert drift_u > 1e-3, drift_u

    # 2) whole-trajectory error does not get worse (anchors are truth, so
    # bending toward them can only help up to interpolation error)
    def ate(est):
        err = [np.linalg.norm(est[s, k, :3] - truth[firsts[s] + k, :3])
               for s in range(S) for k in range(seg_len)
               if firsts[s] + k < N]
        return np.mean(err), np.max(err)
    mean_u, max_u = ate(est_u)
    mean_c, max_c = ate(est_c)
    assert mean_c <= mean_u + 1e-4, (mean_c, mean_u)
    assert max_c <= max_u + 1e-4, (max_c, max_u)

    # 3) the corrected merged mosaic still reconstructs the ground plane
    assert cov_c.sum() > 0.9 * cov_u.sum()
    ys, xs = np.nonzero(cov_c)
    gx = np.clip(((min_xy[0] + (xs + 0.5) * lp) / 0.1).astype(int), 0,
                 ground.shape[1] - 1)
    gy = np.clip(((min_xy[1] + (ys + 0.5) * lp) / 0.1).astype(int), 0,
                 ground.shape[0] - 1)
    d = img_c[ys, xs].astype(np.float64) - ground[gy, gx]
    psnr = 10 * np.log10(255.0 ** 2 / max((d ** 2).mean(), 1e-12))
    assert psnr > 22.0, f"corrected merged mosaic PSNR {psnr:.1f} dB"

    # bad stride is rejected up front
    with pytest.raises(ValueError):
        dist_vo.process_survey(vo, segs, anchors, mesh, correct_drift=True)


def test_dist_vo_coarse_pass_anchors(rng):
    """GPS-free scale-out: a coarse (2x-downsampled) serial track-only
    pass produces the segment anchors, and the full-res segment-parallel
    run with correct_drift lands every boundary frame on the coarse
    chain — trajectory within tolerance of truth, merged mosaic
    reconstructs the ground."""
    from pislamfusion_tpu.core.camera import Camera
    from pislamfusion_tpu.models.fastvo import FastVO
    from pislamfusion_tpu.ops import mosaic as M
    from pislamfusion_tpu.parallel import make_mesh, dist_vo
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from synth_survey import make_ground, nadir_pose, render_view

    srng = np.random.default_rng(13)
    ground = make_ground(srng)
    cam = Camera(320, 240, 260.0, 260.0, 160.0, 120.0)
    N, seg_len, overlap = 10, 4, 1
    stride = seg_len - overlap
    truth = np.asarray([nadir_pose(30.0 + 1.4 * k, 44.0, 25.0)
                        for k in range(N)])
    frames = np.stack([render_view(ground, cam, p) for p in truth])
    segs, firsts = dist_vo.segments_from_frames(frames, seg_len,
                                                overlap=overlap)

    lp, _ = M.auto_resolution(cam, 25.0, 0.5)
    es = M.ELE_PIXELS * lp
    min_xy = truth[:, :2].min(0) - 3 * es
    span = truth[:, :2].max(0) - min_xy + 3 * es
    tiles = int(np.ceil(span.max() / es)) + 2
    vo = FastVO(cam, min_xy, tiles, lp, bands=3, n_features=512,
                n_levels=4, window_radius=40.0, fast_warp=False)

    anchors, nm_coarse = dist_vo.anchors_from_coarse(
        vo, frames, firsts, truth[0], scale=2, n_features=384)
    assert anchors.shape == (segs.shape[0], 7)
    assert (nm_coarse[1:] > 40).all(), nm_coarse
    # the coarse chain is serial VO: it drifts (measured ~5% of traverse
    # at half res here) but stays bounded — absolute accuracy without GPS
    # is inherently drift-limited; what the coarse pass buys is JOINT
    # consistency of the parallel segments, asserted below
    coarse_err = np.linalg.norm(anchors[:, :3] - truth[firsts, :3], axis=1)
    assert coarse_err.max() < 1.0, coarse_err

    mesh = make_mesh(jax.devices()[:8])
    est, nm = dist_vo.process_survey(vo, segs, anchors, mesh,
                                     correct_drift=True,
                                     anchor_stride=stride)
    assert (nm[:, 1:] > 50).all()
    S = segs.shape[0]
    # joint consistency: every boundary frame lands on the coarse-chain
    # anchor exactly, so neighboring full-res segments agree there
    for s in range(S - 1):
        dp = np.linalg.norm(est[s, stride, :3] - anchors[s + 1, :3])
        assert dp < 1e-3, (s, dp)
    # absolute error stays in the coarse chain's drift regime (the
    # full-res segments inherit the anchors' drift, not more)
    err = [np.linalg.norm(est[s, k, :3] - truth[firsts[s] + k, :3])
           for s in range(S) for k in range(seg_len)
           if firsts[s] + k < N]
    assert max(err) < coarse_err.max() + 0.3, (max(err), coarse_err.max())
    img, covered = vo.blended()
    assert covered.sum() > 5000
    ys, xs = np.nonzero(covered)
    gx = np.clip(((min_xy[0] + (xs + 0.5) * lp) / 0.1).astype(int), 0,
                 ground.shape[1] - 1)
    gy = np.clip(((min_xy[1] + (ys + 0.5) * lp) / 0.1).astype(int), 0,
                 ground.shape[0] - 1)
    d = img[ys, xs].astype(np.float64) - ground[gy, gx]
    psnr = 10 * np.log10(255.0 ** 2 / max((d ** 2).mean(), 1e-12))
    # vs-truth PSNR carries the absolute drift (the mosaic is smoothly
    # warped by it); the pipeline_demo standard for estimated-pose
    # mosaics is >14 dB
    assert psnr > 14.0, f"coarse-anchored mosaic PSNR {psnr:.1f} dB"


def test_anchors_from_gps_and_segmenter(rng):
    """Dataset-layer anchor production: segments_from_frames splits a flat
    survey (tail-padded, optional overlap) and anchors_from_gps turns the
    first frames' GPS ENU fixes (+ nadir default or PYR attitude) into the
    [S, 7] plane-coordinate anchors process_survey consumes."""
    from types import SimpleNamespace
    from pislamfusion_tpu.parallel import dist_vo

    frames = np.arange(10 * 4 * 6).reshape(10, 4, 6).astype(np.float32)
    segs, firsts = dist_vo.segments_from_frames(frames, seg_len=4,
                                                overlap=1)
    assert segs.shape[1] == 4
    # consecutive segments overlap by one frame
    assert (segs[1][0] == frames[firsts[1]]).all()
    assert firsts[1] - firsts[0] == 3
    # tail padding repeats the last frame
    assert (segs[-1][-1] == frames[-1]).all() or \
        (segs[-1][-1] == segs[-1][-2]).all()

    metas = [SimpleNamespace(gps_enu=np.array([10.0 * s, 5.0, 30.0]),
                             pyr=None) for s in range(segs.shape[0])]
    anchors = dist_vo.anchors_from_gps(metas)
    assert anchors.shape == (segs.shape[0], 7)
    # nadir quaternion, GPS position carried through
    assert np.allclose(anchors[:, 3:], [1, 0, 0, 0])
    assert np.allclose(anchors[2, :3], [20.0, 5.0, 30.0])
    # plane transform applied when given (identity-rotation plane shift)
    plane = np.array([1.0, 2.0, 0.0, 0, 0, 0, 1.0])
    a2 = dist_vo.anchors_from_gps(metas, plane)
    assert np.allclose(a2[0, :3], anchors[0, :3] - [1.0, 2.0, 0.0])
