"""Real-hardware validation of the opt-in Pallas kernels.

The round-2 kernels (ops/features/fastselect.py + ops/features/
pyramid_pallas.py behind PISLAM_PALLAS_EXTRACT; ops/stencil_pallas.py
behind PISLAM_PALLAS_STENCIL) landed interpret-verified while the TPU
tunnel was down. Their gates stay off until THIS script has confirmed,
on the real chip, that each kernel (a) compiles through the Mosaic
lowering, (b) reproduces the XLA path's outputs, and (c) is actually
faster — then it writes the `.pallas_extract_ok` / `.pallas_stencil_ok`
marker files at the repo root that flip the defaults (see
ops/features/orb.py::_extract_kernels_on, ops/image.py::
_use_pallas_stencil).

Usage:
  python scripts/validate_pallas.py            # validate both families
  python scripts/validate_pallas.py stencil    # one family
  python scripts/validate_pallas.py --worker stencil  # (internal)

Each family runs as two subprocesses (gate env 0 / 1) because the gates
are process-lifetime caches baked into jit traces. Workers dump outputs
to /tmp npz + one JSON line of timings; the parent compares and decides.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MARKERS = {
    "extract": os.path.join(REPO, ".pallas_extract_ok"),
    "stencil": os.path.join(REPO, ".pallas_stencil_ok"),
}
GATE_ENV = {
    "extract": "PISLAM_PALLAS_EXTRACT",
    "stencil": "PISLAM_PALLAS_STENCIL",
}


def _timed(fn, *args, repeats: int = 5):
    """Best-of wall time against a forced device->host fetch
    (block_until_ready is not a reliable fence on the tunneled backend)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)
    best = 1e9
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        s = float(sum(float(jnp.sum(jnp.abs(x).astype(jnp.float32)))
                      for x in jax.tree_util.tree_leaves(out)
                      if hasattr(x, "dtype")))
        best = min(best, time.perf_counter() - t0)
        assert np.isfinite(s)
    return best, out


def worker_stencil(out_path: str):
    import numpy as np
    import jax.numpy as jnp

    from pislamfusion_tpu.ops import image as im
    from pislamfusion_tpu.ops.features import sift

    rng = np.random.default_rng(7)
    img3 = jnp.asarray(rng.uniform(0, 255, (1080, 1920, 3)).astype(np.float32))
    gray = jnp.asarray(rng.uniform(0, 255, (1080, 1920)).astype(np.float32))

    times, outs = {}, {}
    times["blur_s2_1080p3"], outs["blur"] = _timed(
        lambda x: im.gaussian_blur(x, 2.0), img3)
    times["pyr_down_1080p3"], outs["down"] = _timed(im.pyr_down, img3)
    half = outs["down"]
    times["pyr_up_540p3"], outs["up"] = _timed(
        lambda x: im.pyr_up(x, (1080, 1920)), half)
    times["resize_1080to540p3"], outs["resize"] = _timed(
        lambda x: im.resize_bilinear(x, (540, 960)), img3)
    times["sift_octave_stack_1080p"], stack = _timed(
        lambda x: sift._octave_stack(x, sift.SiftParams()), gray)
    outs["stack"] = stack
    times["sift_detect_1080p"], sd = _timed(
        lambda x: sift.sift_detect(x), gray)
    outs["sift_xy"] = sd["xy"]
    outs["sift_desc"] = sd["desc"]
    outs["sift_valid"] = sd["valid"]

    np.savez(out_path, **{k: np.asarray(v) for k, v in outs.items()})
    print(json.dumps({"times": times}))


def worker_extract(out_path: str):
    import numpy as np
    import jax.numpy as jnp

    from pislamfusion_tpu.ops.features import orb

    rng = np.random.default_rng(7)
    # textured image (pure noise makes FAST scores tie-heavy; blend a few
    # smooth blobs so selection has stable winners)
    base = rng.uniform(0, 255, (1080, 1920)).astype(np.float32)
    yy, xx = np.mgrid[0:1080, 0:1920].astype(np.float32)
    for cx, cy, s in [(300, 400, 90), (1500, 700, 130), (900, 200, 60)]:
        base += 80 * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s)))
    img = jnp.asarray(base)

    times, outs = {}, {}
    # jitted, like every production caller (FastVO scan / fused track
    # step): under jit XLA's excess precision elides the score chain's
    # bf16 casts, which is the semantics the kernel must reproduce
    import jax
    det_fn = jax.jit(lambda x: orb.orb_detect(x))
    times["orb_detect_1080p"], det = _timed(det_fn, img)
    for k in ("xy", "response", "angle", "octave", "desc", "valid"):
        outs[k] = det[k]

    # pipeline-level decision data: the bench-shaped FastVO scan (24
    # frames @1080p, forced fetch) — per-call RTT noise amortizes over
    # the scan, unlike the single-dispatch orb timing above
    from pislamfusion_tpu.core.camera import Camera
    from pislamfusion_tpu.models.fastvo import FastVO
    from pislamfusion_tpu.ops import mosaic as M

    H, W, K, N = 1080, 1920, 24, 1000
    fx = fy = 1200.0
    alt = 120.0
    tex_rng = np.random.default_rng(3)
    frames = np.empty((K, H, W, 3), np.float32)
    basef = tex_rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    for i in range(K):
        frames[i] = np.roll(basef, -8 * i, axis=1)  # sliding texture
    poses = np.stack([np.array([90.0 + 4.0 * i, 120.0, alt, 1, 0, 0, 0],
                               np.float32) for i in range(K)])
    lp = (2 * (0.5 * alt * np.hypot(W / fx, H / fy)) / np.hypot(W, H)) / 0.5
    ELE = M.ELE_PIXELS
    patch_tiles = int(np.ceil(int(np.hypot(W, H) * 0.5) / ELE)) + 1
    canvas_tiles = patch_tiles + int(np.ceil(K * 4.0 / (ELE * lp))) + 2
    patch_px = patch_tiles * ELE
    min_xy = np.array([90.0 - 0.5 * patch_px * lp,
                       120.0 - 0.5 * patch_px * lp])
    cam = Camera(W, H, fx, fy, W / 2.0, H / 2.0)
    vo = FastVO(cam, min_xy, canvas_tiles, lp, bands=5, n_features=N,
                n_levels=8, window_radius=60.0, patch_tiles=patch_tiles)
    fd = jnp.asarray(frames)
    pj = jnp.asarray(poses)
    times["fastvo_scan_24f"], (est, n_match) = _timed(
        lambda f: vo.process(f, pj[0]), fd, repeats=3)
    outs["vo_min_match"] = jnp.asarray(np.asarray(n_match)[1:].min())
    outs["vo_drift"] = jnp.asarray(
        np.linalg.norm(np.asarray(est)[-1, :3] - poses[-1, :3]))

    np.savez(out_path, **{k: np.asarray(v) for k, v in outs.items()})
    print(json.dumps({"times": times}))


def _run_worker(family: str, gate: str):
    out_path = f"/tmp/pallas_val_{family}_{gate}.npz"
    env = dict(os.environ)
    env[GATE_ENV[family]] = gate
    env.pop("JAX_PLATFORMS", None)
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", family,
         "--out", out_path],
        env=env, capture_output=True, text=True, timeout=1800)
    if p.returncode != 0:
        return None, None, p.stderr[-4000:]
    line = p.stdout.strip().splitlines()[-1]
    return json.loads(line)["times"], out_path, p.stderr[-2000:]


def _kp_match_frac(a, b, tol=0.75):
    """Fraction of valid keypoints in `a` with a neighbor in `b` within
    tol px (order-independent; ties may reshuffle between backends)."""
    import numpy as np
    av = a["xy"][np.asarray(a["valid"], bool)]
    bv = b["xy"][np.asarray(b["valid"], bool)]
    if len(av) == 0 or len(bv) == 0:
        return 0.0
    d = np.sqrt(((av[:, None, :] - bv[None, :, :]) ** 2).sum(-1))
    return float((d.min(1) <= tol).mean())


def validate(family: str) -> bool:
    import numpy as np

    print(f"=== {family}: XLA baseline pass (gate=0)")
    t0, p0, err0 = _run_worker(family, "0")
    if t0 is None:
        print(f"{family}: BASELINE worker failed:\n{err0}")
        return False
    print(f"=== {family}: Pallas pass (gate=1)")
    t1, p1, err1 = _run_worker(family, "1")
    if t1 is None:
        print(f"{family}: PALLAS worker failed (kernel broken on hw):\n{err1}")
        return False

    a = dict(np.load(p0, allow_pickle=False))
    b = dict(np.load(p1, allow_pickle=False))

    equiv = True
    notes = []
    sub = {}
    if family == "stencil":
        # the family carries TWO independently-gated kernels (see
        # ops/image.py::_stencil_gates): the per-op banded sandwich
        # (blur/down/up/resize) and the whole-octave SIFT stack.
        # Decide each on its own ops' equivalence AND speed.
        def _close(k):
            ref, got = a[k], b[k]
            tol = 1e-2 * max(1.0, float(np.abs(ref).max()))
            md = float(np.abs(ref - got).max())
            ok = md <= tol
            notes.append(f"{k}: max|d|={md:.3e} ({'ok' if ok else 'FAIL'})")
            return ok

        sand_eq = all([_close(k) for k in ("blur", "down", "up", "resize")])
        stack_eq = _close("stack")
        frac = _kp_match_frac(
            {"xy": a["sift_xy"], "valid": a["sift_valid"]},
            {"xy": b["sift_xy"], "valid": b["sift_valid"]})
        notes.append(f"sift kp match: {frac:.3f}")
        stack_eq &= frac >= 0.98
        sand_keys = ("blur_s2_1080p3", "pyr_down_1080p3", "pyr_up_540p3",
                     "resize_1080to540p3")
        stack_keys = ("sift_octave_stack_1080p", "sift_detect_1080p")
        sub["sandwich"] = (sand_eq and sum(t1[k] for k in sand_keys)
                           < sum(t0[k] for k in sand_keys))
        sub["stack"] = (stack_eq and sum(t1[k] for k in stack_keys)
                        < sum(t0[k] for k in stack_keys))
        equiv = sand_eq and stack_eq
    else:
        # bit-parity with the jitted XLA chain is unattainable: XLA's own
        # fusion-boundary bf16 roundings perturb scores by <1 gray level,
        # so near-tie cell winners and top-N boundary picks swap. The
        # drop-in criteria are: (a) >=95% identical picks, (b) matched
        # same-octave responses agree to rounding (p99 < 1.0 level),
        # (c) the FastVO pipeline still tracks (min matches, drift).
        frac = _kp_match_frac(a, b)
        notes.append(f"orb kp match: {frac:.3f}")
        equiv &= frac >= 0.95
        oa, ob = a["octave"], b["octave"]
        va, vb = np.asarray(a["valid"], bool), np.asarray(b["valid"], bool)
        axy, bxy = a["xy"][va], b["xy"][vb]
        dd = np.sqrt(((axy[:, None, :] - bxy[None, :, :]) ** 2).sum(-1))
        dd = np.where(oa[va][:, None] == ob[vb][None, :], dd, 1e9)
        okm = dd.min(1) <= 0.75
        dv = np.abs(a["response"][va][okm]
                    - b["response"][vb][dd.argmin(1)[okm]])
        p99 = float(np.percentile(dv, 99)) if okm.any() else 1e9
        notes.append(f"matched resp p99 |d|: {p99:.3f}")
        equiv &= p99 < 1.0
        for k in ("vo_min_match", "vo_drift"):
            notes.append(f"{k}: xla {float(a[k]):.3f} "
                         f"pallas {float(b[k]):.3f}")
        equiv &= float(b["vo_min_match"]) >= 50
        equiv &= float(b["vo_drift"]) <= max(2.0, 2 * float(a["vo_drift"]))

    if family == "extract":
        # decide speed on the amortized pipeline scan, not the
        # single-dispatch op (tunnel RTT noise swamps one-shot calls)
        speed0 = t0.get("fastvo_scan_24f", sum(t0.values()))
        speed1 = t1.get("fastvo_scan_24f", sum(t1.values()))
    else:
        speed0 = sum(t0.values())
        speed1 = sum(t1.values())
    print("  " + "\n  ".join(notes))
    for k in sorted(t0):
        print(f"  {k}: xla {t0[k]*1e3:7.2f} ms -> pallas {t1[k]*1e3:7.2f} ms"
              f"  ({t0[k]/max(t1[k],1e-9):.2f}x)")
    faster = speed1 < speed0
    print(f"  total: xla {speed0*1e3:.2f} ms, pallas {speed1*1e3:.2f} ms, "
          f"equiv={equiv}, faster={faster}, sub-gates={sub or None}")

    marker = MARKERS[family]
    win = any(sub.values()) if sub else (equiv and faster)
    if win:
        rec = {"validated": time.strftime("%Y-%m-%d %H:%M:%S"),
               "xla_ms": {k: v * 1e3 for k, v in t0.items()},
               "pallas_ms": {k: v * 1e3 for k, v in t1.items()}}
        rec.update(sub)
        with open(marker, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"  -> wrote {marker} "
              f"(ON: {[k for k, v in sub.items() if v] or 'all'})")
        return True
    if os.path.exists(marker):
        os.remove(marker)
        print(f"  -> removed stale {marker}")
    print("  -> gate stays OFF")
    return False


def main():
    args = sys.argv[1:]
    if args[:1] == ["--worker"]:
        family = args[1]
        out_path = args[args.index("--out") + 1]
        from pislamfusion_tpu.core.jaxcache import enable_persistent_cache
        enable_persistent_cache()
        (worker_stencil if family == "stencil" else worker_extract)(out_path)
        return
    fams = [a for a in args if a in MARKERS] or ["stencil", "extract"]
    results = {f: validate(f) for f in fams}
    print(json.dumps({"validated": results}))


if __name__ == "__main__":
    main()
