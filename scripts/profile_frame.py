"""Per-stage attribution of the bench frame budget on the real TPU.

Runs the bench-shaped FastVO scan (24 frames @1080p, N=1000, 5 bands,
patch 1536) with stages ablated, and reports the delta each stage costs.
Timing = wall clock around a device_get of a reduction of every live
output (block_until_ready lies on the tunneled backend).

Usage: python scripts/profile_frame.py [stage ...]
  stages: full track feed warp warp+lap weights nochain nosrcpyr
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pislamfusion_tpu.core.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax                                                     # noqa: E402
import jax.numpy as jnp                                        # noqa: E402

from pislamfusion_tpu.core.camera import Camera                # noqa: E402
from pislamfusion_tpu.models.fastvo import FastVO              # noqa: E402
from pislamfusion_tpu.ops import image as im                   # noqa: E402
from pislamfusion_tpu.ops import mosaic as M                   # noqa: E402
from pislamfusion_tpu.ops import shearwarp                     # noqa: E402

H, W, K, N, BANDS = 1080, 1920, 24, 1000, 5
fx = fy = 1200.0
cx, cy = W / 2.0, H / 2.0
alt = 120.0

rng = np.random.default_rng(0)
frames = jnp.asarray(rng.uniform(0, 255, (K, H, W, 3)).astype(np.float32))
poses = np.stack([
    np.array([90.0 + 4.0 * i, 120.0, alt, 1.0, 0, 0, 0], np.float32)
    for i in range(K)])
lp = (2 * (0.5 * alt * np.hypot(W / fx, H / fy)) / np.hypot(W, H)) / 0.5
ELE = M.ELE_PIXELS
footprint_px = int(np.hypot(W, H) * 0.5 / 1.0)
patch_tiles = int(np.ceil(footprint_px / ELE)) + 1
canvas_tiles = patch_tiles + int(np.ceil(K * 4.0 / (ELE * lp))) + 2
patch_px = patch_tiles * ELE
min_xy = np.array([90.0 - 0.5 * patch_px * lp, 120.0 - 0.5 * patch_px * lp])
cam = Camera(W, H, fx, fy, cx, cy)
vo = FastVO(cam, min_xy, canvas_tiles, lp, bands=BANDS, n_features=N,
            n_levels=8, window_radius=60.0, patch_tiles=patch_tiles)
poses_j = jnp.asarray(poses)
patch_hw = (patch_px, patch_px)


def timed(fn, *args, repeats=3):
    out = fn(*args)                     # compile
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)
    best = 1e9
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        s = float(sum(jnp.sum(jnp.abs(x)) if hasattr(x, "dtype") else 0.0
                      for x in jax.tree_util.tree_leaves(out)))
        dt = time.perf_counter() - t0
        best = min(best, dt)
        assert np.isfinite(s)
    return best


def feed_scan(mode: str):
    """Scan over K frames running only the FEED (fixed poses), with parts
    ablated per `mode`."""
    def step(carry, inp):
        c_lap, c_w = carry
        rgb, pose = inp
        es = ELE * vo.length_pixel
        mxy = jnp.asarray(vo.min_xy, jnp.float32)
        origin_t = jnp.clip(
            jnp.floor((pose[:2] - mxy) / es).astype(jnp.int32)
            - vo.patch_tiles // 2, 0, vo.canvas_tiles - vo.patch_tiles)
        origin_xy = mxy + origin_t.astype(jnp.float32) * es
        Hc2i = M.homography_canvas_to_image(pose, fx, fy, cx, cy,
                                            origin_xy, vo.length_pixel)
        oyx = jnp.stack([origin_t[1], origin_t[0]]) * ELE
        rgbf = rgb.astype(jnp.float32)
        sh = jnp.asarray(np.diag([0.5, 0.5, 1.0]), jnp.float32)
        s2 = jnp.asarray(np.diag([2.0, 2.0, 1.0]), jnp.float32)
        half_hw = (patch_hw[0] // 2, patch_hw[1] // 2)

        if mode == "feed":
            p_lap, p_w = M.patch_pyramids(rgbf, Hc2i, patch_hw, BANDS,
                                          half_res=True, warp="shear")
        elif mode == "warp":
            src_half = im.pyr_down(rgbf)
            warped, live, _ = shearwarp.warp_patch_pallas(
                src_half, sh @ Hc2i @ s2, half_hw)
            p_lap = [jnp.zeros(patch_hw + (3,), jnp.float32)] \
                + [warped] * BANDS
            p_w = [jnp.ones(s.shape[:2] + (1,), jnp.float32)
                   for s in p_lap]
            p_lap = [jax.lax.slice(l, (0, 0, 0), w.shape[:2] + (3,))
                     for l, w in zip(p_lap, p_w)]
        elif mode == "warponly":
            src_half = im.pyr_down(rgbf)
            warped, live, _ = shearwarp.warp_patch_pallas(
                src_half, sh @ Hc2i @ s2, half_hw)
            c_lap = [c_lap[0] + jnp.sum(warped)] + c_lap[1:]
            return (c_lap, c_w), 0.0
        elif mode == "warpnopyr":
            warped, live, _ = shearwarp.warp_patch_pallas(
                rgbf, Hc2i, patch_hw)
            c_lap = [c_lap[0] + jnp.sum(warped)] + c_lap[1:]
            return (c_lap, c_w), 0.0
        elif mode == "srcpyr":
            src_half = im.pyr_down(rgbf)
            c_lap = [c_lap[0] + jnp.sum(src_half)] + c_lap[1:]
            return (c_lap, c_w), 0.0
        elif mode == "warp+lap":
            src_half = im.pyr_down(rgbf)
            warped, live, _ = shearwarp.warp_patch_pallas(
                src_half, sh @ Hc2i @ s2, half_hw)
            sub = im.build_laplacian_pyramid(warped, BANDS - 1)
            tot = sum(jnp.sum(s) for s in sub)
            c_lap = [c_lap[0] + tot] + c_lap[1:]
            return (c_lap, c_w), 0.0
        elif mode == "weights":
            src_half = im.pyr_down(rgbf)
            warped, live, _ = shearwarp.warp_patch_pallas(
                src_half, sh @ Hc2i @ s2, half_hw)
            p_w = M.analytic_weight_pyramid(Hc2i, (H, W), patch_hw, 0,
                                            0, live)
            for _i in range(BANDS):
                p_w.append(im.pyr_down(p_w[-1]))
            tot = sum(jnp.sum(w) for w in p_w)
            c_lap = [c_lap[0] + tot] + c_lap[1:]
            return (c_lap, c_w), 0.0
        elif mode == "nocomp":
            # full feed compute, composite replaced by a sum-reduce: the
            # feed-vs-nocomp delta is the composite's true in-scan cost
            p_lap, p_w = M.patch_pyramids(rgbf, Hc2i, patch_hw, BANDS,
                                          half_res=True, warp="shear")
            tot = (sum(jnp.sum(x) for x in p_lap)
                   + sum(jnp.sum(x) for x in p_w))
            c_lap = [c_lap[0] + tot] + c_lap[1:]
            return (c_lap, c_w), 0.0
        elif mode == "nochain":
            # QUALITY-WRONG variant (per-level analytic) for perf compare
            src_half = im.pyr_down(rgbf)
            warped, live, _ = shearwarp.warp_patch_pallas(
                src_half, sh @ Hc2i @ s2, half_hw)
            sub = im.build_laplacian_pyramid(warped, BANDS - 1)
            p_lap = [jnp.zeros(patch_hw + (3,), jnp.float32)] + sub
            p_w = M.analytic_weight_pyramid(Hc2i, (H, W), patch_hw, BANDS,
                                            0, live)
        else:
            raise ValueError(mode)
        return M.composite_patch(c_lap, c_w, p_lap, p_w, oyx), 0.0

    @jax.jit
    def run(frames, poses, c_lap, c_w):
        (c_lap, c_w), _ = jax.lax.scan(step, (c_lap, c_w), (frames, poses))
        # reduce EVERY band: anything not feeding this is dead code and
        # XLA will delete it from the measurement
        return (sum(jnp.sum(jnp.abs(x)) for x in c_lap)
                + sum(jnp.sum(jnp.abs(x)) for x in c_w))
    return run


def extract_scan(mode: str):
    """Scan running only EXTRACTION stages per frame (no carry deps)."""
    from pislamfusion_tpu.ops.features import orb as _orb

    def step(carry, rgb):
        gray = im.rgb_to_gray(rgb)
        if mode == "ext":
            f = _orb.orb_detect(gray, vo.params)
            # reduce desc too — otherwise XLA dead-codes gather+BRIEF
            return carry + (f["response"][0]
                            + jnp.sum(f["desc"]).astype(jnp.float32)
                            * 1e-6) * 1e-9, 0.0
        # ext_pyr / ext_fast / ext_sel: cumulative extraction stages
        quotas = vo.params.features_per_level()
        chain_dt = jnp.bfloat16 if im._use_mxu_stencil() else jnp.float32
        s = 0.0
        level = gray.astype(chain_dt)
        for lvl in range(vo.params.n_levels):
            if lvl > 0:
                sc = vo.params.scale_factor ** lvl
                lh = max(1, int(round(H / sc)))
                lw = max(1, int(round(W / sc)))
                level = im.resize_bilinear(level[..., None], (lh, lw))[..., 0]
            if mode == "ext_pyr":
                # global sum: a corner read would let XLA slice-propagate
                # and skip computing most of the level
                s = s + jnp.sum(level.astype(jnp.float32)) * 1e-9
                continue
            score = _orb.fast_score_map(level.astype(jnp.float32))
            if mode == "ext_fast":
                s = s + jnp.sum(score) * 1e-9
                continue
            xy, resp, valid = _orb.select_keypoints(
                score, max(quotas[lvl], 1), vo.params.cell,
                vo.params.min_threshold)
            s = s + resp[0]
        return carry + s * 1e-9, 0.0

    @jax.jit
    def run(frames):
        c, _ = jax.lax.scan(step, jnp.float32(0.0), frames)
        return c
    return run


stages = sys.argv[1:] or ["full", "track", "feed", "warp+lap", "warponly",
                          "warpnopyr", "srcpyr", "weights", "nochain"]
results = {}
for st in stages:
    if st == "full":
        @jax.jit
        def full(frames, p0, lap, w):
            lap, w, poses, n_match = vo._process(frames, p0, lap, w)
            return (sum(jnp.sum(jnp.abs(x)) for x in lap)
                    + sum(jnp.sum(jnp.abs(x)) for x in w)
                    + jnp.sum(jnp.abs(poses)))
        lap0, w0 = M.alloc_canvas(vo.canvas_tiles, vo.canvas_tiles, BANDS)
        dt = timed(full, frames, poses_j[0], lap0, w0)
    elif st == "track":
        @jax.jit
        def track_only(frames, p0):
            first = frames[0]
            gray0 = im.rgb_to_gray(first)
            from pislamfusion_tpu.ops.features import orb as _orb
            f0 = _orb.orb_detect(gray0.astype(jnp.float32), vo.params)
            p3d0 = vo._plane_points(f0["xy"], p0)
            carry = (f0["desc"], f0["valid"], p3d0, p0, p0)

            def tstep(c, rgb):
                prev_desc, prev_valid, prev_p3d, pose_prev2, pose_est = c
                from pislamfusion_tpu.ops import ba, lie, matching
                gray = im.rgb_to_gray(rgb)
                feats = _orb.orb_detect(gray.astype(jnp.float32), vo.params)
                pose_pred = lie.se3_mul(
                    lie.se3_mul(pose_est, lie.se3_inv(pose_prev2)), pose_est)
                T_pred = lie.se3_inv(pose_pred)
                pc = lie.se3_apply(T_pred, prev_p3d)
                z = jnp.maximum(pc[:, 2], 1e-6)
                pix = jnp.stack([fx * pc[:, 0] / z + cx,
                                 fy * pc[:, 1] / z + cy], -1)
                wmask = matching.window_mask(pix, feats["xy"],
                                             vo.window_radius)
                dist = matching.hamming_matrix(prev_desc, feats["desc"])
                idx, ok = matching.match(dist, prev_valid, feats["valid"],
                                         max_dist=80.0, window_mask=wmask)
                tgt = jnp.where(ok, idx, N)
                p3d = jnp.zeros((N, 3)).at[tgt].set(prev_p3d, mode="drop")
                wgt = jnp.zeros((N,)).at[tgt].set(ok.astype(jnp.float32),
                                                  mode="drop")
                rays_xy = jnp.stack([(feats["xy"][:, 0] - cx) / fx,
                                     (feats["xy"][:, 1] - cy) / fy], -1)
                T_ref, _, _ = ba.optimize_pose(T_pred, p3d, rays_xy, wgt,
                                               iters=8,
                                               huber_delta=2.45 / fx)
                pose_new = lie.se3_inv(T_ref)
                new_p3d = vo._plane_points(feats["xy"], pose_new)
                return ((feats["desc"], feats["valid"], new_p3d, pose_est,
                         pose_new), pose_new)
            _, out = jax.lax.scan(tstep, carry, frames)
            return out
        dt = timed(track_only, frames, poses_j[0])
    elif st in ("ext", "ext_sel", "ext_pyr", "ext_fast"):
        run = extract_scan(st)
        dt = timed(run, frames)
    else:
        run = feed_scan(st)
        lap0, w0 = M.alloc_canvas(vo.canvas_tiles, vo.canvas_tiles, BANDS)
        dt = timed(run, frames, poses_j, lap0, w0)
    results[st] = dt / K * 1e3
    print(f"{st:>10}: {dt / K * 1e3:7.2f} ms/frame  "
          f"({K / dt:6.1f} fps)", flush=True)

print()
if "full" in results and "track" in results and "feed" in results:
    print(f"track+feed vs full: {results['track'] + results['feed']:.2f} "
          f"vs {results['full']:.2f} ms (scan overlap / composite extra)")
