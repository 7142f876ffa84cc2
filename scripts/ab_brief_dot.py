"""On-chip A/B of the two binned-BRIEF formulations (OrbParams.brief_dot).

The select variant runs `bins` one-hot matmuls + a select chain; the dot
variant slices the patch to the tap extent and does ONE matmul against a
static +-1 difference matrix (~2.7x fewer MXU flops). Both are bit-equal
(tests/test_features.py); which ships is a hardware question. Timing:
a 24-iteration lax.scan with a loop-carried dependency per variant
(single-dispatch timings are tunnel-RTT noise), forced device->host
fetch of a reduction.

Usage: python scripts/ab_brief_dot.py
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

from pislamfusion_tpu.ops.features import orb                  # noqa: E402


def main():
    H, W, N = 1080, 1920, 1000
    rng = np.random.default_rng(3)
    base = rng.uniform(0, 255, (H, W)).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    for cx, cy, s in [(300, 400, 90), (1500, 700, 130), (900, 200, 60)]:
        base += 80 * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2)
                              / (2 * s * s)))
    img = jnp.asarray(base)

    K = 24

    def scan_detect(params):
        @jax.jit
        def run(x):
            def step(carry, _):
                f = orb.orb_detect(carry, params)
                # loop-carried dependency so the scan cannot be hoisted
                nudge = jnp.sum(f["response"]) * 1e-12
                return carry + nudge, jnp.sum(f["desc"].astype(jnp.int32))
            _, sums = jax.lax.scan(step, x, None, length=K)
            return jnp.sum(sums)
        return run

    out = {}
    for dot in (False, True):
        params = orb.OrbParams(n_features=N, brief_dot=dot)
        fn = scan_detect(params)
        s = int(fn(img))              # compile + warm
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            s2 = int(fn(img))
            ts.append(time.perf_counter() - t0)
        per = min(ts) / K * 1e3
        out[dot] = per
        print(f"brief_dot={int(dot)}: {per:7.3f} ms/frame "
              f"(desc checksum {s2})", flush=True)
        if dot:
            if s2 != out.get("sum0", s2):
                print(f"NOTE: checksums differ on this backend "
                      f"({out['sum0']} vs {s2}) — descriptor bits are NOT "
                      f"drop-in equal here; a validate_pallas-style "
                      f"keypoint-level equivalence pass must gate any "
                      f"default flip")
        else:
            out["sum0"] = s2
    gain = out[False] / out[True]
    print(f"dot variant: {gain:.3f}x vs select "
          f"({'WINS' if gain > 1.02 else 'flat/loses'})")


if __name__ == "__main__":
    main()
