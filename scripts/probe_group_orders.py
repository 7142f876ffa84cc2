"""Measure the FastVO scan's per-frame DEVICE cost across group orders.

VERDICT r4 weak #2: the in-pipeline frame (5.41 ms) sits ~1.6 ms above
the device-true step (3.83 ms), and ~1.5 ms of intra-step serialization
is only partially recovered by G=2 extraction overlap. This probe
attributes both:

  * per-frame cost is measured as (T(K=96) - T(K=48)) / 48 — the two-K
    subtraction cancels every per-call fixed cost (dispatch ~25 ms,
    fetch round trip) exactly, leaving pure device time per frame;
  * the per-call fixed cost itself is reported as T(96) - 96*perframe.

Configs swept: G=1; G=2/3/4 interleaved (track,feed per frame) vs split
(all track chains, then all feeds — see fastvo._step_group).

Usage: python scripts/probe_group_orders.py [G[,split] ...]
  default sweep: 1 2 2s 3s 4s
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
from pislamfusion_tpu.ops import mosaic as M                   # noqa: E402

H, W = 1080, 1920
N = 1000
K_HI, K_LO = 96, 48
fx = fy = 1200.0
alt = 120.0
ELE = M.ELE_PIXELS


def build_vo(detector="orb"):
    lp = (2 * (0.5 * alt * np.hypot(W / fx, H / fy)) / np.hypot(W, H)) / 0.5
    footprint_px = int(np.hypot(W, H) * 0.5)
    patch_tiles = int(np.ceil(footprint_px / ELE)) + 1
    span_m = 4.0 * K_HI
    canvas_tiles = patch_tiles + int(np.ceil(span_m / (ELE * lp))) + 2
    patch_px = patch_tiles * ELE
    min_xy = np.array([90.0 - 0.5 * patch_px * lp,
                       120.0 - 0.5 * patch_px * lp])
    cam = Camera(W, H, fx, fy, W / 2.0, H / 2.0)
    return FastVO(cam, min_xy, canvas_tiles, lp, bands=5, n_features=N,
                  n_levels=8, window_radius=60.0, patch_tiles=patch_tiles,
                  detector=detector)


def main(argv):
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 255, (K_HI, H, W, 3), dtype=np.uint8))
    jax.block_until_ready(frames)
    poses = np.stack([
        np.array([90.0 + 4.0 * i, 120.0, alt, 1, 0, 0, 0], np.float32)
        for i in range(K_HI)])
    pose0 = jnp.asarray(poses[0])

    specs = argv or ["1", "2", "2s", "3s", "4s"]
    detector = os.environ.get("PROBE_DETECTOR", "orb")
    results = {}
    for spec in specs:
        split = spec.endswith("s")
        g = int(spec.rstrip("s"))
        os.environ["PISLAM_PAIR"] = str(g)
        os.environ["PISLAM_PAIR_STEP"] = "0" if g == 1 else ""
        os.environ["PISLAM_GROUP_SPLIT"] = "1" if split else "0"
        vo = build_vo(detector)
        ts = {}
        for k in (K_LO, K_HI):
            fr = frames[:k]
            vo.process(fr, pose0)            # compile + warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                vo.process(fr, pose0)
                best = min(best, time.perf_counter() - t0)
            ts[k] = best
        per_frame = (ts[K_HI] - ts[K_LO]) / (K_HI - K_LO)
        fixed = ts[K_HI] - K_HI * per_frame
        fps = 1.0 / per_frame
        results[spec] = (per_frame, fixed, fps)
        print(f"G={spec:>3}: per-frame {per_frame * 1e3:6.2f} ms "
              f"({fps:6.1f} fps device), fixed/call {fixed * 1e3:6.1f} ms, "
              f"T48={ts[K_LO] * 1e3:.0f} T96={ts[K_HI] * 1e3:.0f}",
              flush=True)
    best = min(results, key=lambda s: results[s][0])
    print(f"best: G={best} at {results[best][2]:.1f} device fps "
          f"({results[best][0] * 1e3:.2f} ms/frame)")


if __name__ == "__main__":
    main(sys.argv[1:])
