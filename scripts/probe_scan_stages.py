"""In-scan marginal cost per stage of the FastVO step (round 5).

probe_group_orders measured the REAL scan step at 5.13 ms/frame (G=2)
while the round-4 isolated-stage probes summed to 2.24 ms — the gap is
inside the scan (layout boundaries, carry traffic), so attribution must
be measured inside the scan too. This builds cumulative scan programs:

  S0: gray+cast only          -> frame staging floor
  S1: + ORB extraction        -> extract marginal
  S2: + match + pose LM       -> track marginal
  S3: + mosaic feed (full)    -> feed marginal

each at G=2 grouping (two extraction chains per body, like the shipped
_step_group), timed with the two-K subtraction (K=96 vs 48) to cancel
per-call fixed costs. Outputs stage marginals in ms/frame.

Usage: python scripts/probe_scan_stages.py [s0 s1 s2 s3 ...]
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
from probe_group_orders import build_vo, H, W, K_HI, K_LO      # noqa: E402

G = 2


def _detect_partial(gray, params, stage: str):
    """Replicates orb_detect's production TPU path up to `stage`:
    x0 = flat-pyramid kernel only; x1 = + per-level FAST/NMS/select;
    x2 = full (gather + angle + blur + BRIEF) == orb.orb_detect."""
    import jax.numpy as jnp
    from pislamfusion_tpu.ops.features import orb as _o
    from pislamfusion_tpu.ops.features import flatpyr_pallas as fpp
    params_q = params.features_per_level()
    Hh, Ww = gray.shape
    pyr = fpp.build_flat_pyramid(gray, params.n_levels,
                                 params.scale_factor, params.cell)
    plan = _o._flat_plan(Hh, Ww, params.n_levels, params.scale_factor,
                         params.cell)
    if stage == "x0":
        return jnp.sum(pyr[::191, ::191])
    cl, pl_ = plan.cell, plan.pad_left
    level_imgs = [
        jax.lax.slice(pyr, (b + cl, pl_), (b + cl + lh, pl_ + lw))
        for b, (lh, lw) in zip(plan.bases, plan.shapes)]
    acc = jnp.float32(0.0)
    for lvl in range(params.n_levels):
        k = max(params_q[lvl], 1)
        score = _o.fast_score_map(level_imgs[lvl])
        xy, resp, valid = _o.select_keypoints(score, k, params.cell,
                                              params.min_threshold)
        acc = acc + jnp.sum(xy.astype(jnp.float32)) + jnp.sum(resp)
    if stage == "x1":
        return acc
    f = _o.orb_detect(gray, params)
    return (acc + jnp.sum(f["xy"]) + jnp.sum(
        f["desc"].astype(jnp.float32)[:, ::37]))


def _detect_flatsel(gray, params, stage: str):
    """xf = the packed cross-level XLA selection (_detect_flat: its own
    composed-matrix pyramid + ONE score/NMS/cell-max over the stack +
    batched per-level top-k); xg = + the descriptor tail."""
    import jax.numpy as jnp
    from pislamfusion_tpu.ops.features import orb as _o
    quotas = params.features_per_level()
    outs, packed, pxy = _o._detect_flat(gray, params, quotas)
    if stage == "xf":
        return (jnp.sum(outs["xy"]) + jnp.sum(outs["response"])
                + jnp.sum(packed[::191, ::191]))
    feats = _o._descriptor_tail(outs, packed, pxy, params)
    return (jnp.sum(feats["xy"]) + jnp.sum(
        feats["desc"].astype(jnp.float32)[:, ::37]))


def _detect_sel_stacked(grays, params):
    """Selection with the G frames' same-shape per-level images STACKED:
    one vmapped score/NMS/select per level instead of one per frame per
    level — halves the op count of the 1.53 ms/frame selection chain if
    per-op latency (not data volume) is the bound."""
    import jax.numpy as jnp
    from pislamfusion_tpu.ops.features import orb as _o
    from pislamfusion_tpu.ops.features import flatpyr_pallas as fpp
    quotas = params.features_per_level()
    Gn, Hh, Ww = grays.shape
    pyrs = [fpp.build_flat_pyramid(grays[b], params.n_levels,
                                   params.scale_factor, params.cell)
            for b in range(Gn)]
    plan = _o._flat_plan(Hh, Ww, params.n_levels, params.scale_factor,
                         params.cell)
    cl, pl_ = plan.cell, plan.pad_left
    acc = jnp.float32(0.0)
    for lvl in range(params.n_levels):
        b0, (lh, lw) = plan.bases[lvl], plan.shapes[lvl]
        imgs = jnp.stack([
            jax.lax.slice(p, (b0 + cl, pl_), (b0 + cl + lh, pl_ + lw))
            for p in pyrs])                          # [G, lh, lw]
        k = max(quotas[lvl], 1)
        scores = jax.vmap(_o.fast_score_map)(imgs)

        def sel(s, k=k):
            return _o.select_keypoints(s, k, params.cell,
                                       params.min_threshold)
        xy, resp, valid = jax.vmap(sel)(scores)
        acc = acc + jnp.sum(xy.astype(jnp.float32)) + jnp.sum(resp)
    return acc


def make_runner(vo, stage: str):
    if stage == "xs1":
        def steps(carry, rgbs):
            tcarry, c_lap, c_w, acc = carry
            rgbs = rgbs.astype(jnp.float32)
            grays = im.rgb_to_gray(rgbs)
            acc = acc + _detect_sel_stacked(grays, vo.params)
            return (tcarry, c_lap, c_w, acc), 0.0

        @jax.jit
        def runs(frames, pose0, c_lap, c_w):
            Kf = frames.shape[0]
            fp = frames.reshape((Kf // G, G) + frames.shape[1:])
            carry, _ = jax.lax.scan(
                steps, ((), c_lap, c_w, jnp.float32(0.0)), fp)
            return carry[3]

        return runs
    if stage.startswith("x"):
        def stepx(carry, rgbs):
            tcarry, c_lap, c_w, acc = carry
            rgbs = rgbs.astype(jnp.float32)
            grays = im.rgb_to_gray(rgbs)
            if stage == "xb":      # batched extractor, G frames at once
                from pislamfusion_tpu.ops.features import orb as _o
                f = _o.orb_detect_batch(grays, vo.params)
                acc = acc + jnp.sum(f["xy"]) + jnp.sum(
                    f["desc"].astype(jnp.float32)[..., ::37])
            elif stage in ("xf", "xg"):
                for b in range(G):
                    acc = acc + _detect_flatsel(grays[b], vo.params,
                                                stage)
            else:
                for b in range(G):
                    acc = acc + _detect_partial(grays[b], vo.params,
                                                stage)
            return (tcarry, c_lap, c_w, acc), 0.0

        @jax.jit
        def runx(frames, pose0, c_lap, c_w):
            Kf = frames.shape[0]
            fp = frames.reshape((Kf // G, G) + frames.shape[1:])
            carry, _ = jax.lax.scan(
                stepx, ((), c_lap, c_w, jnp.float32(0.0)), fp)
            return carry[3]

        return runx

    if stage.endswith("l"):
        # N independent VO LANES: frames interleave round-robin across
        # lanes, each lane tracks its own stride-N chain (motion model +
        # plane re-unprojection unchanged; matches span N frames of
        # baseline — wide survey overlap keeps them dense), and the
        # shared canvas serializes only the feeds. Unlike G-grouping
        # (which overlaps extraction only), EVERYTHING in lane A overlaps
        # everything in lane B.
        L = int(stage[:-1])

        def stepl(carry, rgbs):
            tcs = list(carry[0])
            c_lap, c_w, acc = carry[1], carry[2], carry[3]
            rgbs = rgbs.astype(jnp.float32)
            grays = im.rgb_to_gray(rgbs)
            poses = []
            for i in range(L):
                f = vo._detect(grays[i])
                tcs[i], (pose_new, n_match) = vo._track_core(tcs[i], f)
                poses.append(pose_new)
                acc = acc + n_match.astype(jnp.float32)
            for i in range(L):
                c_lap, c_w = vo._feed(poses[i], rgbs[i], c_lap, c_w)
            return (tuple(tcs), c_lap, c_w, acc), 0.0

        @jax.jit
        def runl(frames, pose0, c_lap, c_w):
            first = frames[0].astype(jnp.float32)
            f0 = vo._detect(im.rgb_to_gray(first))
            p3d0 = vo._plane_points(f0["xy"], pose0)
            tc0 = (f0["desc"], f0["valid"], p3d0, pose0, pose0)
            Kf = frames.shape[0]
            fp = frames.reshape((Kf // L, L) + frames.shape[1:])
            carry, _ = jax.lax.scan(
                stepl, ((tc0,) * L, c_lap, c_w, jnp.float32(0.0)), fp)
            out = carry[3]
            out = out + sum(jnp.sum(b[::4, ::512, ::512])
                            for b in carry[1])
            return out

        return runl

    def step(carry, rgbs):
        tcarry, c_lap, c_w, acc = carry[0], carry[1], carry[2], carry[3]
        rgbs = rgbs.astype(jnp.float32)
        grays = im.rgb_to_gray(rgbs)
        if stage == "s0":
            acc = acc + jnp.sum(grays[:, ::191, ::191])
            return (tcarry, c_lap, c_w, acc), 0.0
        fs = [vo._detect(grays[b]) for b in range(G)]
        feats_g = {k: jnp.stack([f[k] for f in fs]) for k in fs[0]}
        if stage == "s1":
            acc = acc + jnp.sum(feats_g["xy"]) + jnp.sum(
                feats_g["desc"].astype(jnp.float32)[:, ::37])
            return (tcarry, c_lap, c_w, acc), 0.0
        poses = []
        for b in range(G):
            feats = {k: v[b] for k, v in feats_g.items()}
            tcarry, (pose_new, n_match) = vo._track_core(tcarry, feats)
            poses.append(pose_new)
            acc = acc + n_match.astype(jnp.float32)
        if stage == "s2":
            acc = acc + sum(jnp.sum(p) for p in poses)
            return (tcarry, c_lap, c_w, acc), 0.0
        for b in range(G):
            c_lap, c_w = vo._feed(poses[b], rgbs[b], c_lap, c_w)
        return (tcarry, c_lap, c_w, acc), 0.0

    @jax.jit
    def run(frames, pose0, c_lap, c_w):
        first = frames[0].astype(jnp.float32)
        g0 = im.rgb_to_gray(first)
        f0 = vo._detect(g0)
        p3d0 = vo._plane_points(f0["xy"], pose0)
        tcarry = (f0["desc"], f0["valid"], p3d0, pose0, pose0)
        Kf = frames.shape[0]
        fp = frames.reshape((Kf // G, G) + frames.shape[1:])
        carry, _ = jax.lax.scan(step, (tcarry, c_lap, c_w,
                                       jnp.float32(0.0)), fp)
        # reduce everything live so no stage is DCE'd; tiny output
        out = carry[3]
        out = out + sum(jnp.sum(b[::4, ::512, ::512]) for b in carry[1])
        return out

    return run


def main(argv):
    stages = argv or ["s0", "s1", "s2", "s3"]
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 255, (K_HI, H, W, 3), dtype=np.uint8))
    jax.block_until_ready(frames)
    pose0 = jnp.asarray([90.0, 120.0, 120.0, 1, 0, 0, 0], jnp.float32)
    os.environ["PISLAM_PAIR"] = "2"
    vo = build_vo()
    vo2 = build_vo()   # fresh canvases per stage family is overkill;
    del vo2            # reuse one instance's buffers
    c_lap = vo.canvas_lap
    c_w = vo.canvas_w
    prev = 0.0
    results = {}
    for st in stages:
        run = make_runner(vo, st)
        ts = {}
        for k in (K_LO, K_HI):
            fr = frames[:k]
            # block_until_ready LIES on this backend (returns while the
            # program still runs) — force a real device->host fetch
            float(run(fr, pose0, c_lap, c_w))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(fr, pose0, c_lap, c_w))
                best = min(best, time.perf_counter() - t0)
            ts[k] = best
        pf = (ts[K_HI] - ts[K_LO]) / (K_HI - K_LO)
        results[st] = pf
        print(f"{st}: per-frame {pf * 1e3:6.2f} ms  "
              f"(marginal vs prev {1e3 * (pf - prev):+6.2f} ms)",
              flush=True)
        prev = pf
    if len(results) > 1:
        names = {"s1": "extract", "s2": "match+LM", "s3": "feed"}
        keys = list(results)
        print("attribution:", ", ".join(
            f"{names.get(k, k)} {(results[k] - results[keys[i - 1]]) * 1e3:.2f}"
            for i, k in enumerate(keys) if i > 0), "ms/frame")


if __name__ == "__main__":
    main(sys.argv[1:])
