"""Quick on-chip probe of the shipped slam.track() loop configurations.

Replicates bench.py's slam section (synthetic sliding-texture frames,
ORB-1000) across {per-frame, chain=8} x {full-res, TrackScale=2} and
prints per-config FPS, plus the raw transfer model (fixed + bandwidth)
so the numbers can be checked against the tunnel ceiling.

Usage: python scripts/probe_slam_path.py [n_frames] [config ...]
  configs: pf chain pf2 chain2 (default: all)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pislamfusion_tpu.core.jaxcache import enable_persistent_cache

enable_persistent_cache()

import numpy as np                                             # noqa: E402
import jax                                                     # noqa: E402
import jax.numpy as jnp                                        # noqa: E402


def transfer_model():
    dev = jax.devices()[0]
    out = {}
    for mb in (0.25, 2.0):
        a = np.random.randint(0, 255, int(mb * 1024 * 1024), dtype=np.uint8)
        x = jax.device_put(a, dev)
        float(jnp.sum(x[:8].astype(jnp.float32)))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            x = jax.device_put(a, dev)
            float(jnp.sum(x[:8].astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        out[mb] = min(ts)
    fixed = out[0.25] - 0.25 / ((2.0 - 0.25) / (out[2.0] - out[0.25]))
    bw = (2.0 - 0.25) / (out[2.0] - out[0.25])
    print(f"transfer: 0.25MB {out[0.25]*1e3:.0f} ms, 2MB {out[2.0]*1e3:.0f}"
          f" ms -> fixed ~{max(fixed,0)*1e3:.0f} ms + {bw:.1f} MB/s",
          flush=True)


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    configs = [a for a in sys.argv[2:]] or ["pf", "chain", "pf2", "chain2"]
    transfer_model()

    H, W, N = 1080, 1920, 1000
    fx = fy = 1200.0
    rng = np.random.default_rng(3)
    base = rng.uniform(0, 255, (H, W)).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    for cx_, cy_, s in [(300, 400, 90), (1500, 700, 130), (900, 200, 60)]:
        base += 80 * np.exp(-(((xx - cx_) ** 2 + (yy - cy_) ** 2)
                              / (2 * s * s)))
    frames = np.empty((n_frames, H, W), np.uint8)
    for i in range(n_frames):
        frames[i] = np.clip(np.roll(base, -8 * i, axis=1), 0, 255)

    from pislamfusion_tpu.core.camera import Camera
    from pislamfusion_tpu.core.svar import Svar
    from pislamfusion_tpu.models.slam import create_slam

    cam = Camera(W, H, fx, fy, W / 2.0, H / 2.0)
    order = list(range(n_frames)) + list(range(n_frames - 2, -1, -1))

    def run(chain, scale, label):
        cfg = Svar()
        cfg.set("FeatureDetector", "ORB")
        cfg.set("SLAM.nFeature", str(N))
        cfg.set("SLAM.LoopClose", "0")
        cfg.set("SLAM.isOnline", "1")
        if chain > 1:
            cfg.set("SLAM.TrackChain", str(chain))
        if scale > 1:
            cfg.set("SLAM.TrackScale", str(scale))
        from pislamfusion_tpu.core.timer import timer as _timer
        best = None
        for p in range(2):
            _timer.reset()     # dump reflects the LAST (steady) pass only
            slam = create_slam(cfg, cam)
            t0 = time.perf_counter()
            for j, fi in enumerate(order):
                slam.track(frames[fi], float(j))
            slam.finish()
            dt = time.perf_counter() - t0
            fps = len(order) / dt
            print(f"  {label} pass{p}: {fps:.2f} fps "
                  f"({slam.frames_tracked}/{len(order)} tracked, "
                  f"errors {slam.track_errors})", flush=True)
            best = max(best or 0, fps)
        return best

    res = {}
    if "pf" in configs:
        res["pf"] = run(1, 1, "per-frame @1080p")
    if "chain" in configs:
        res["chain"] = run(8, 1, "chain=8  @1080p")
    if "pf2" in configs:
        res["pf2"] = run(1, 2, "per-frame @540p-track")
    if "chain2" in configs:
        res["chain2"] = run(8, 2, "chain=8  @540p-track")
    if os.environ.get("PROBE_TIMERS", "0") == "1":
        from pislamfusion_tpu.core.timer import timer
        print(timer.dump())
    print({k: round(v, 2) for k, v in res.items()})


if __name__ == "__main__":
    main()
