"""One-off probe: time pyramid/fastselect Pallas kernels vs the XLA chain.

Each candidate runs inside a K-iteration lax.scan with a data-dependent
carry (iteration i's input is perturbed by iteration i-1's output) so XLA
cannot hoist or batch; timing = wall clock around a forced device fetch.
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

from pislamfusion_tpu.ops import image as im                   # noqa: E402
from pislamfusion_tpu.ops.features import orb                  # noqa: E402

H, W, K, N = 1080, 1920, 24, 1000
params = orb.OrbParams(n_features=N, n_levels=8)
rng = np.random.default_rng(0)
img0 = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))


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
        assert np.isfinite(s)
    return best / k


def levels_of(img):
    chain_dt = jnp.bfloat16 if im._use_mxu_stencil() else jnp.float32
    level_imgs = [img]
    li = img.astype(chain_dt)
    for lvl in range(1, params.n_levels):
        scale = params.scale_factor ** lvl
        lh = max(1, int(round(H / scale)))
        lw = max(1, int(round(W / scale)))
        li = im.resize_bilinear(li[..., None], (lh, lw))[..., 0]
        level_imgs.append(li.astype(jnp.float32))
    return level_imgs


which = sys.argv[1:] or ["pyrxla", "pyrpallas", "selxla", "selpallas"]

if "pyrxla" in which:
    def step(c):
        lv = levels_of(c)
        return c + 1e-6 * lv[-1][0, 0]
    t = timed_scan(step, img0, lambda c: jnp.sum(c[:2, :2]))
    print(f"pyr XLA chain:      {t*1e3:7.3f} ms/frame")

if "pyrpallas" in which:
    from pislamfusion_tpu.ops.features import pyramid_pallas as pp
    r = orb._GATHER_R
    assert pp.pyramid_available(H, W, 8, params.scale_factor, r)

    def step(c):
        packed = pp.build_packed_pyramid(c, 8, params.scale_factor, r)
        return c + 1e-6 * packed[0, 0]
    t = timed_scan(step, img0, lambda c: jnp.sum(c[:2, :2]))
    print(f"pyr Pallas packed:  {t*1e3:7.3f} ms/frame")

if "selxla" in which:
    lv = [jnp.asarray(np.asarray(x)) for x in levels_of(img0)]
    quotas = params.features_per_level()

    def step(c):
        acc = c * 0.0
        out = 0.0
        for li, q in zip(lv, quotas):
            score = orb.fast_score_map(li + c[0, 0] * 1e-9)
            xy, resp, valid = orb.select_keypoints(
                score, max(q, 1), params.cell, params.min_threshold)
            out = out + jnp.sum(resp)
        return c + out * 1e-12
    t = timed_scan(step, img0, lambda c: jnp.sum(c[:2, :2]))
    print(f"fast+sel XLA:       {t*1e3:7.3f} ms/frame")

if "selpallas" in which:
    from pislamfusion_tpu.ops.features.fastselect import fast_cell_winners
    lv = [jnp.asarray(np.asarray(x)) for x in levels_of(img0)]
    quotas = params.features_per_level()

    def step(c):
        lvp = [li + c[0, 0] * 1e-9 for li in lv]
        winners = fast_cell_winners(lvp, params.cell,
                                    params.min_threshold,
                                    orb.EDGE_THRESHOLD)
        out = 0.0
        for (cv2d, ci2d), q in zip(winners, quotas):
            wp = ci2d.shape[1] * params.cell
            xy, resp, valid = orb._topk_flat(
                cv2d.reshape(-1), (ci2d // wp).reshape(-1),
                (ci2d % wp).reshape(-1), max(q, 1))
            out = out + jnp.sum(resp)
        return c + out * 1e-12
    t = timed_scan(step, img0, lambda c: jnp.sum(c[:2, :2]))
    print(f"fast+sel Pallas:    {t*1e3:7.3f} ms/frame")

if "flat" in which:
    from pislamfusion_tpu.ops.features import orb as _o
    quotas = params.features_per_level()

    def mk(stage):
        def step(c):
            H, W = c.shape
            plan = _o._flat_plan(H, W, 8, params.scale_factor, params.cell)
            mats = _o._flat_matrices(H, W, 8, params.scale_factor,
                                     params.cell)
            cell = params.cell
            src = c.astype(jnp.bfloat16)[..., None]
            blocks = [jnp.pad(c, ((cell, plan.block_rows[0] - H - cell),
                                  (cell, plan.wp - W - cell)), mode="edge")]
            for lvl in range(1, 8):
                mr, mc = mats[lvl]
                blocks.append(im._matmul_sep(src, mr, mc)[..., 0]
                              .astype(jnp.float32))
            packed = jnp.concatenate(blocks, 0)
            if stage == "pyr":
                return c + 1e-9 * packed[0, 0]
            score = _o.fast_score_map(packed)
            if stage == "score":
                return c + 1e-9 * score[0, 0]
            feats, packed, pxy = _o._detect_flat(c, params, quotas)
            if stage == "select":
                return c + 1e-9 * feats["response"][0]
            out = _o._descriptor_tail(feats, packed, pxy, params)
            return c + 1e-9 * out["response"][0]
        return step

    for stage in ("pyr", "score", "select", "full"):
        t = timed_scan(mk(stage), img0, lambda c: jnp.sum(c[:2, :2]))
        print(f"flat {stage}:        {t*1e3:7.3f} ms/frame")

if "flatk" in which:
    from pislamfusion_tpu.ops.features import flatpyr_pallas as fpp
    quotas = params.features_per_level()
    plan = orb._flat_plan(H, W, 8, params.scale_factor, params.cell)

    def mk2(stage):
        def step(c):
            packed = fpp.build_flat_pyramid(c, 8, params.scale_factor,
                                            params.cell)
            if stage == "pyr":
                return c + 1e-9 * packed[0, 0]
            cl, pl_ = plan.cell, plan.pad_left
            level_imgs = [
                jax.lax.slice(packed, (b + cl, pl_), (b + cl + lh, pl_ + lw))
                for b, (lh, lw) in zip(plan.bases, plan.shapes)]
            if stage == "slices":
                return c + 1e-9 * sum(li[0, 0] for li in level_imgs)
            out = 0.0
            for li, q in zip(level_imgs, quotas):
                score = orb.fast_score_map(li)
                xy, resp, valid = orb.select_keypoints(
                    score, max(q, 1), params.cell, params.min_threshold)
                out = out + jnp.sum(resp)
            return c + out * 1e-12
        return step

    for stage in ("pyr", "slices", "select"):
        t = timed_scan(mk2(stage), img0, lambda c: jnp.sum(c[:2, :2]))
        print(f"flatk {stage}:        {t*1e3:7.3f} ms/frame")

if "flatdense" in which:
    plan = orb._flat_plan(H, W, 8, params.scale_factor, params.cell)
    mats = orb._flat_matrices(H, W, 8, params.scale_factor, params.cell)
    mrs = [None] + [jnp.asarray(m[0], jnp.bfloat16) for m in mats[1:]]
    mcs = [None] + [jnp.asarray(m[1], jnp.bfloat16) for m in mats[1:]]

    def step(c):
        src = c.astype(jnp.bfloat16)
        blocks = [jnp.pad(c, ((32, plan.block_rows[0] - H - 32),
                              (plan.pad_left,
                               plan.wp - W - plan.pad_left)),
                          mode="edge")]
        for lvl in range(1, 8):
            t1 = jnp.dot(mrs[lvl], src,
                         preferred_element_type=jnp.bfloat16)
            blk = jnp.dot(t1, mcs[lvl].T,
                          preferred_element_type=jnp.float32)
            blocks.append(blk)
        packed = jnp.concatenate(blocks, 0)
        return c + 1e-9 * packed[0, 0]

    t = timed_scan(step, img0, lambda c: jnp.sum(c[:2, :2]))
    print(f"flatdense pyr:      {t*1e3:7.3f} ms/frame")
