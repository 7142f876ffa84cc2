"""Micro-timing of individual hot ops via K-iteration data-dependent scans.

Each op runs inside a lax.scan whose carry feeds the next iteration (so XLA
cannot batch or eliminate iterations); timing = wall clock around a forced
fetch of a scalar reduction. Per-frame cost = total / K.

Usage: python scripts/micro_ops.py [op ...]
  ops: orb gray resize8 fast8 select8 gather brief match lm pyrdown1080
       warp768 lap768 wchain comp sift
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

from pislamfusion_tpu.ops import ba, image as im, lie, matching  # noqa: E402
from pislamfusion_tpu.ops import mosaic as M                   # noqa: E402
from pislamfusion_tpu.ops import shearwarp                     # noqa: E402
from pislamfusion_tpu.ops.features import orb                  # noqa: E402

H, W, K, N = 1080, 1920, 24, 1000
params = orb.OrbParams(n_features=N, n_levels=8)
rng = np.random.default_rng(0)
img0 = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
rgb0 = jnp.asarray(rng.uniform(0, 255, (H, W, 3)).astype(np.float32))


def timed_scan(step, init, reduce_out, repeats=3, k=K):
    @jax.jit
    def run(x0):
        def body(c, _):
            return step(c), 0.0
        c, _ = jax.lax.scan(body, x0, None, length=k)
        return reduce_out(c)
    out = run(init)
    np.asarray(out)
    best = 1e9
    for _ in range(repeats):
        t0 = time.perf_counter()
        s = np.asarray(run(init))
        best = min(best, time.perf_counter() - t0)
        assert np.all(np.isfinite(s))
    return best / k * 1e3


def op_orb():
    def step(x):
        f = orb.orb_detect(x, params)
        # perturb input from output so iterations chain
        return x + f["response"][0] * 1e-9
    return timed_scan(step, img0, lambda c: jnp.sum(c[:2, :2]))


def op_gray():
    def step(x):
        g = im.rgb_to_gray(x)
        return x + g[0, 0] * 1e-9
    return timed_scan(step, rgb0, lambda c: jnp.sum(c[:2, :2]))


def _pyr_levels(x):
    level_imgs = [x]
    for lvl in range(1, params.n_levels):
        scale = params.scale_factor ** lvl
        lh = max(1, int(round(H / scale)))
        lw = max(1, int(round(W / scale)))
        level_imgs.append(im.resize_bilinear(level_imgs[-1][..., None],
                                             (lh, lw))[..., 0])
    return level_imgs


def op_resize8():
    def step(x):
        ls = _pyr_levels(x)
        return x + sum(l[0, 0] for l in ls[1:]) * 1e-12
    return timed_scan(step, img0, lambda c: jnp.sum(c[:2, :2]))


def op_fast8():
    def step(x):
        ls = _pyr_levels(x)
        s = sum(orb.fast_score_map(l)[0, 0] for l in ls)
        return x + s * 1e-12
    r_all = timed_scan(step, img0, lambda c: jnp.sum(c[:2, :2]))
    return r_all - op_resize8()


def op_select8():
    quotas = params.features_per_level()

    def step(x):
        ls = _pyr_levels(x)
        s = 0.0
        for l, q in zip(ls, quotas):
            score = orb.fast_score_map(l)
            xy, resp, valid = orb.select_keypoints(
                score, max(q, 1), params.cell, params.min_threshold)
            s = s + resp[0]
        return x + s * 1e-12
    r_all = timed_scan(step, img0, lambda c: jnp.sum(c[:2, :2]))
    return r_all - op_resize8() - op_fast8()


def op_match():
    d1 = jnp.asarray(rng.integers(0, 2, (N, 256)).astype(np.uint8))

    def step(d):
        dist = matching.hamming_matrix(d, d1)
        idx, ok = matching.match(dist, jnp.ones(N, bool), jnp.ones(N, bool),
                                 max_dist=80.0)
        return jnp.where((d + idx[:, None].astype(jnp.uint8)) > 0, d1, d)
    return timed_scan(step, d1, lambda c: jnp.sum(c))


def op_lm():
    p3d = jnp.asarray(rng.normal(0, 10, (N, 3)).astype(np.float32))
    rays = jnp.asarray(rng.normal(0, 0.3, (N, 2)).astype(np.float32))
    wgt = jnp.ones((N,), jnp.float32)
    T0 = jnp.asarray([0, 0, 50.0, 1, 0, 0, 0], jnp.float32)

    def step(T):
        T2, _, _ = ba.optimize_pose(T, p3d, rays, wgt, iters=8,
                                    huber_delta=2e-3)
        return T2
    return timed_scan(step, T0, lambda c: jnp.sum(c))


def op_pyrdown1080():
    def step(x):
        h = im.pyr_down(x)
        return x + h[0, 0, 0] * 1e-12
    return timed_scan(step, rgb0, lambda c: jnp.sum(c[:2, :2]))


def op_warp768():
    hm = jnp.asarray(np.array([[1.2, 0.1, 30.0], [0.05, 1.1, 20.0],
                               [1e-5, -2e-5, 1.0]], np.float32))
    src = im.pyr_down(rgb0)

    def step(x):
        w, live, _ = shearwarp.warp_patch_pallas(x, hm, (768, 768))
        return x + w[0, 0, 0] * 1e-12
    return timed_scan(step, src, lambda c: jnp.sum(c[:2, :2]))


def op_lap768():
    src = jnp.asarray(rng.uniform(0, 255, (768, 768, 3)).astype(np.float32))

    def step(x):
        lap = im.build_laplacian_pyramid(x, 4)
        return x + sum(l[0, 0, 0] for l in lap) * 1e-12
    return timed_scan(step, src, lambda c: jnp.sum(c[:2, :2]))


def op_wchain():
    hm = jnp.asarray(np.array([[1.2, 0.1, 30.0], [0.05, 1.1, 20.0],
                               [1e-5, -2e-5, 1.0]], np.float32))

    def step(x):
        p_w = M.analytic_weight_pyramid(
            x, (H, W), (1536, 1536), 0, 0, None)
        for _ in range(5):
            p_w.append(im.pyr_down(p_w[-1]))
        return x + sum(w[0, 0, 0] for w in p_w) * 1e-9
    return timed_scan(step, hm, lambda c: jnp.sum(c))


def op_comp():
    CT = 10 * 256
    lap = [jnp.zeros((max(CT >> i, 1), max(CT >> i, 1), 3), jnp.float32)
           for i in range(6)]
    w = [jnp.zeros((max(CT >> i, 1), max(CT >> i, 1), 1), jnp.float32)
         for i in range(6)]
    p_lap = [jnp.ones((max(1536 >> i, 1), max(1536 >> i, 1), 3),
                      jnp.float32) for i in range(6)]
    p_w = [jnp.ones((max(1536 >> i, 1), max(1536 >> i, 1), 1), jnp.float32)
           for i in range(6)]

    def step(c):
        c_lap, c_w = c
        oyx = (c_w[0][0, 0, 0]).astype(jnp.int32) % 256 + jnp.asarray([256, 256])
        return M.composite_patch(c_lap, c_w, p_lap, p_w, oyx)
    return timed_scan(step, (lap, w),
                      lambda c: sum(jnp.sum(x[:2, :2]) for x in c[0]))


OPS = {
    "orb": op_orb, "gray": op_gray, "resize8": op_resize8,
    "fast8": op_fast8, "select8": op_select8,
    "match": op_match, "lm": op_lm,
    "pyrdown1080": op_pyrdown1080, "warp768": op_warp768,
    "lap768": op_lap768, "wchain": op_wchain, "comp": op_comp,
}

names = sys.argv[1:] or list(OPS)
for nm in names:
    ms = OPS[nm]()
    print(f"{nm:>12}: {ms:7.3f} ms/frame", flush=True)
