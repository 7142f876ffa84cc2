"""Device-TRUE per-stage costs, correcting for the tunnel's fixed cost.

Round-3's micro probes timed K-iteration scans and divided by K — but a
single dispatch on this box carries ~25-30 ms of FIXED tunnel cost, so
every per-frame number carried a +fixed/K floor (~1.1 ms at K=24) and
small ops measured as pure floor. Here each stage runs nd times inside
every scan iteration (data-dependent, so XLA can't hoist or batch); the
device cost per stage-run is (T(nd_hi) - T(nd_lo)) / (K * (nd_hi -
nd_lo)), which cancels the fixed cost exactly.

Usage: python scripts/device_budget.py [stage ...]
  stages: orb gray feed match warp lap comp step
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
from pislamfusion_tpu.ops.features import orb                  # noqa: E402

H, W, K, N = 1080, 1920, 12, 1000
params = orb.OrbParams(n_features=N, n_levels=8)
rng = np.random.default_rng(0)
img0 = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
rgb0 = jnp.asarray(rng.uniform(0, 255, (H, W, 3)).astype(np.float32))


def total_time(step, init, reduce_out, nd, repeats=3, k=K):
    @jax.jit
    def run(x0):
        def body(c, _):
            for i in range(nd):
                c = step(c, i)
            return c, 0.0
        c, _ = jax.lax.scan(body, x0, None, length=k)
        return reduce_out(c)
    out = run(init)
    np.asarray(out)
    best = 1e9
    for _ in range(repeats):
        t0 = time.perf_counter()
        s = np.asarray(run(init))
        best = min(best, time.perf_counter() - t0)
        assert np.isfinite(s)
    return best


def device_cost(step, init, reduce_out, lo=1, hi=3):
    tlo = total_time(step, init, reduce_out, lo)
    thi = total_time(step, init, reduce_out, hi)
    return (thi - tlo) / (K * (hi - lo)), tlo / K


def report(name, step, init=None, reduce_out=None):
    if init is None:
        init = img0
    if reduce_out is None:
        reduce_out = lambda c: jnp.sum(c[:2, :2])   # noqa: E731
    dev, percall_lo = device_cost(step, init, reduce_out)
    print(f"{name:>10s}: device {dev*1e3:7.3f} ms/run   "
          f"(nd=1 scan measured {percall_lo*1e3:7.3f} ms/iter)")


which = sys.argv[1:] or ["orb", "feed"]

if "gray" in which:
    def step(c, i):
        g = im.rgb_to_gray(rgb0 + c[0, 0] * 1e-9)
        return c + 1e-9 * g[0, 0]
    report("gray", step)

if "orb" in which:
    def step(c, i):
        f = orb.orb_detect(img0 * (1.0 + c[0, 0] * 1e-12) + i, params)
        return c + 1e-9 * f["response"][0]
    report("orb", step)

if "sift" in which:
    from pislamfusion_tpu.ops.features import sift as _sift
    sp = _sift.SiftParams(n_features=N)

    def step(c, i):
        f = _sift.sift_detect(img0 * (1.0 + c[0, 0] * 1e-12) + i, sp)
        return c + 1e-9 * f["response"][0]
    report("sift", step)

if "feed" in which or "step" in which:
    fx = fy = 1200.0
    alt = 120.0
    lp = (2 * (0.5 * alt * np.hypot(W / fx, H / fy)) / np.hypot(W, H)) / 0.5
    ELE = M.ELE_PIXELS
    fp_px = int(np.hypot(W, H) * 0.5 / 1.0)
    patch_tiles = int(np.ceil(fp_px / ELE)) + 1
    canvas_tiles = patch_tiles + 4
    patch_px = patch_tiles * ELE
    min_xy = np.array([90.0 - 0.5 * patch_px * lp,
                       120.0 - 0.5 * patch_px * lp])
    cam = Camera(W, H, fx, fy, W / 2.0, H / 2.0)
    vo = FastVO(cam, min_xy, canvas_tiles, lp, bands=5, n_features=N,
                n_levels=8, window_radius=60.0, patch_tiles=patch_tiles)
    pose0 = jnp.asarray(np.array([90.0, 120.0, alt, 1, 0, 0, 0],
                                 np.float32))

    if "feed" in which:
        def stepf(carry, i):
            # rgb AND pose must depend on the carry: a constant rgb lets
            # XLA hoist pyr_down/warp out of the scan (the round-4 bug
            # that measured "feed" at 0.1 ms)
            c_lap, c_w, acc = carry
            pose = pose0.at[0].add(acc * 1e-9 + 0.01 * i)
            rgb = rgb0 + acc * 1e-9
            c_lap, c_w = vo._feed(pose, rgb, c_lap, c_w)
            # acc must read the COLOR canvas: a weights-only reduction
            # lets XLA dead-code-eliminate the entire color path (warp,
            # Laplacian, composite) — measured "feed" at 0.08 ms
            return (c_lap, c_w,
                    acc + jnp.sum(c_lap[0][0, :2, :2])
                    + c_w[0][0, 0, 0])
        report("feed", stepf, (vo.canvas_lap, vo.canvas_w,
                               jnp.float32(0.0)),
               lambda c: c[2] + jnp.sum(c[1][0][0, :2, :2]))

    if "step" in which:
        g0 = im.rgb_to_gray(rgb0)
        f0 = orb.orb_detect(g0, params)
        p3d0 = vo._plane_points(f0["xy"], pose0)
        carry0 = (f0["desc"], f0["valid"], p3d0, pose0, pose0,
                  vo.canvas_lap, vo.canvas_w)

        def steps(carry, i):
            # frame must depend on the carry (extraction hoists otherwise)
            carry, (pose, n) = vo._step(carry, rgb0 + i
                                        + carry[4][0] * 1e-9)
            return carry
        report("step", steps, carry0,
               lambda c: jnp.sum(c[4]) + jnp.sum(c[5][0][0, :2, :2])
               + jnp.sum(c[6][0][0, :2, :2]))

if "match" in which:
    from pislamfusion_tpu.ops import ba, lie, matching
    g0 = im.rgb_to_gray(rgb0)
    f0 = orb.orb_detect(g0, params)
    desc0 = f0["desc"]
    valid0 = f0["valid"]
    xy0 = f0["xy"]

    def step(c, i):
        # carry-dependent second descriptor set (see "feed" note)
        d2 = (desc0 + (c[0, 0] * 1e-9).astype(jnp.uint8) + i) % 2
        dist = matching.distance_matrix(desc0, d2, "orb")
        idx, ok = matching.match(dist, valid0, valid0, max_dist=80.0)
        return c + 1e-9 * jnp.sum(idx)
    report("match", step)

if "feedparts" in which:
    from pislamfusion_tpu.ops import shearwarp
    fx = fy = 1200.0
    alt = 120.0
    lp = (2 * (0.5 * alt * np.hypot(W / fx, H / fy)) / np.hypot(W, H)) / 0.5
    ELE = M.ELE_PIXELS
    fp_px = int(np.hypot(W, H) * 0.5 / 1.0)
    patch_tiles = int(np.ceil(fp_px / ELE)) + 1
    patch_px = patch_tiles * ELE
    patch_hw = (patch_px, patch_px)
    half_hw = (patch_px // 2, patch_px // 2)
    min_xy = np.array([90.0 - 0.5 * patch_px * lp,
                       120.0 - 0.5 * patch_px * lp])
    cam_ = Camera(W, H, fx, fy, W / 2.0, H / 2.0)
    pose0 = jnp.asarray(np.array([90.0, 120.0, alt, 1, 0, 0, 0],
                                 np.float32))
    sh = jnp.asarray(np.diag([0.5, 0.5, 1.0]), np.float32)
    s2 = jnp.asarray(np.diag([2.0, 2.0, 1.0]), np.float32)

    def hc2i(acc, i):
        origin_xy = jnp.asarray(min_xy, jnp.float32)
        return M.homography_canvas_to_image(
            pose0.at[0].add(acc * 1e-9 + 0.01 * i), fx, fy,
            W / 2.0, H / 2.0, origin_xy, lp)

    def mkstep(mode):
        def step(c, i):
            rgb = rgb0 + c[0, 0] * 1e-9
            Hm = hc2i(c[0, 0], i)
            if mode == "pyrdown":
                y = im.pyr_down(rgb)
                return c + 1e-9 * y[0, 0, 0]
            src_half = im.pyr_down(rgb)
            warped, live, _ = shearwarp.warp_patch_pallas(
                src_half, sh @ Hm @ s2, half_hw)
            if mode == "pd+warp":
                return c + 1e-9 * warped[0, 0, 0]
            if mode == "pd+warp+lap":
                sub = im.build_laplacian_pyramid(warped, 4)
                return c + 1e-9 * sum(s[0, 0, 0] for s in sub)
            return c
        return step
    for mode in ("pyrdown", "pd+warp", "pd+warp+lap"):
        report(mode, mkstep(mode))

if "lm" in which:
    from pislamfusion_tpu.ops import ba, lie
    g0 = im.rgb_to_gray(rgb0)
    f0 = orb.orb_detect(g0, params)
    xyf = f0["xy"]
    p3 = jnp.concatenate([xyf * 0.1, jnp.ones((N, 1)) * 120.0], -1)
    w0 = f0["valid"].astype(jnp.float32)
    T0 = jnp.asarray(np.array([0, 0, 0, 1, 0, 0, 0], np.float32))

    def step(c, i):
        rays = jnp.stack([(xyf[:, 0] - 960.0) / 1200.0 + c[0, 0] * 1e-9,
                          (xyf[:, 1] - 540.0) / 1200.0], -1)
        T, _, _ = ba.optimize_pose(T0.at[0].add(c[0, 0] * 1e-9 + i * 0.01),
                                   p3, rays, w0, iters=8,
                                   huber_delta=2.45 / 1200.0)
        return c + 1e-9 * jnp.sum(T)
    report("lm", step)

if "planepts" in which:
    from pislamfusion_tpu.ops import lie as _lie
    g0 = im.rgb_to_gray(rgb0)
    f0 = orb.orb_detect(g0, params)
    xyf = f0["xy"]
    pose0_ = jnp.asarray(np.array([90.0, 120.0, 120.0, 1, 0, 0, 0],
                                  np.float32))
    camx = Camera(W, H, 1200.0, 1200.0, W / 2.0, H / 2.0)

    def step(c, i):
        vo_like_rays = jnp.stack(
            [(xyf[:, 0] - camx.cx) / camx.fx + c[0, 0] * 1e-9,
             (xyf[:, 1] - camx.cy) / camx.fy,
             jnp.ones(N)], -1)
        Rw = _lie.quat_rotate(jnp.broadcast_to(pose0_[3:7], (N, 4)),
                              vo_like_rays)
        o = pose0_[:3]
        s = o[2] / jnp.where(jnp.abs(Rw[:, 2]) < 1e-6, 1e-6, Rw[:, 2])
        pts = o[None, :] - Rw * s[:, None]
        return c + 1e-9 * jnp.sum(pts) + i * 0.0
    report("planepts", step)

if "orb2" in which:
    def step(c, i):
        imgs = jnp.stack([img0 * (1.0 + c[0, 0] * 1e-12) + i,
                          img0 * (1.002 + c[0, 0] * 1e-12) + i])
        f = orb.orb_detect_batch(imgs, params)
        return c + 1e-9 * jnp.sum(f["response"][:, 0])
    report("orb2", step)

if "step2" in which:
    fx = fy = 1200.0
    alt = 120.0
    lp = (2 * (0.5 * alt * np.hypot(W / fx, H / fy)) / np.hypot(W, H)) / 0.5
    ELE = M.ELE_PIXELS
    fp_px = int(np.hypot(W, H) * 0.5 / 1.0)
    patch_tiles = int(np.ceil(fp_px / ELE)) + 1
    canvas_tiles = patch_tiles + 4
    patch_px = patch_tiles * ELE
    min_xy = np.array([90.0 - 0.5 * patch_px * lp,
                       120.0 - 0.5 * patch_px * lp])
    cam2 = Camera(W, H, fx, fy, W / 2.0, H / 2.0)
    vo2 = FastVO(cam2, min_xy, canvas_tiles, lp, bands=5, n_features=N,
                 n_levels=8, window_radius=60.0, patch_tiles=patch_tiles)
    pose0 = jnp.asarray(np.array([90.0, 120.0, alt, 1, 0, 0, 0],
                                 np.float32))
    g0 = im.rgb_to_gray(rgb0)
    f0 = orb.orb_detect(g0, params)
    p3d0 = vo2._plane_points(f0["xy"], pose0)
    carry0 = (f0["desc"], f0["valid"], p3d0, pose0, pose0,
              vo2.canvas_lap, vo2.canvas_w)

    def steps2(carry, i):
        rgb2 = jnp.stack([rgb0 + i + carry[4][0] * 1e-9,
                          rgb0 * 1.001 + i + carry[4][0] * 1e-9])
        carry, (poses, n) = vo2._step2(carry, rgb2)
        return carry
    report("step2", steps2, carry0,
           lambda c: jnp.sum(c[4]) + jnp.sum(c[5][0][0, :2, :2])
           + jnp.sum(c[6][0][0, :2, :2]))
