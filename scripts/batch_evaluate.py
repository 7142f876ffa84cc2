"""Batch ablation harness: run the pipeline across module combinations.

Equivalent of GSLAM-DIYSLAM/scripts/batch_evaluat.py (:1-60): spawn the
binary per (Map/FeatureDetector/Matcher/Tracker/Mapper/...) combination,
redirect stdout per run into named result directories for comparison.
Here each combination runs `examples/pipeline_demo.py`-style synthetic
surveys in-process per subprocess and records the JSON metrics.

Usage:
    python scripts/batch_evaluate.py /tmp/ablation \
        "FeatureDetector=ORB,Sift" "SLAM.LoopClose=0,1"

Each `key=v1,v2` argument enumerates values; the cartesian product runs.
"""
import itertools
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import json, sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {repo!r} + "/examples")
from pipeline_demo import run_demo
m = run_demo({out!r}, verbose=False, **json.loads(sys.argv[2]))
print("METRICS " + json.dumps(m))
"""


def main(argv):
    if len(argv) < 1:
        print(__doc__)
        return 1
    out_root = argv[0]
    axes = []
    for spec in argv[1:]:
        key, _, vals = spec.partition("=")
        axes.append([(key, v) for v in vals.split(",")])
    combos = list(itertools.product(*axes)) if axes else [()]
    results = {}
    for combo in combos:
        name = "_".join(f"{k.split('.')[-1]}-{v}" for k, v in combo) \
            or "default"
        out_dir = os.path.join(out_root, name)
        os.makedirs(out_dir, exist_ok=True)
        kwargs = {"overrides": {}}
        for k, v in combo:
            if k == "SLAM.LoopClose":
                kwargs["loop_close"] = v not in ("0", "false")
            elif k == "SLAM.nFeature":
                kwargs["n_feats"] = int(v)
            elif k == "fixture":     # scene family (run_demo fixture axis)
                kwargs["fixture"] = v
            elif k == "seed":        # texture/world RNG seed
                kwargs["seed"] = int(v)
            elif k == "gps":         # per-frame GPS noise sigma in meters
                kwargs["gps_sigma"] = (float(v)
                                       if v not in ("0", "off") else None)
            elif k == "refresh":     # mosaic pose-refresh machinery on/off
                if v in ("0", "off"):
                    kwargs["overrides"]["Fusion.RefreshCacheMB"] = "0"
                    kwargs["overrides"]["Fusion.FinalRefresh"] = "0"
            else:   # any other Svar key (Tracker, Matcher, ...) passes through
                kwargs["overrides"][k] = v
        print(f"== {name} ==", flush=True)
        code = RUNNER.format(repo=REPO, out=out_dir)
        with open(os.path.join(out_dir, "stdout.log"), "w") as log:
            r = subprocess.run(
                [sys.executable, "-c", code, json.dumps(dict(combo)),
                 json.dumps(kwargs)],
                stdout=subprocess.PIPE, stderr=log, text=True)
        metrics = None
        for line in r.stdout.splitlines():
            if line.startswith("METRICS "):
                metrics = json.loads(line[8:])
        results[name] = metrics
        open(os.path.join(out_dir, "metrics.json"), "w").write(
            json.dumps(metrics, indent=1))
        if metrics:
            print(f"   tracked {100 * metrics['tracked_ratio']:.0f}% "
                  f"ATE {metrics['ate_pct']:.2f}% "
                  f"PSNR {metrics['psnr']:.1f} dB "
                  f"({metrics['wall_s']:.0f}s)", flush=True)
        else:
            print("   FAILED (see stdout.log)", flush=True)
    open(os.path.join(out_root, "summary.json"), "w").write(
        json.dumps(results, indent=1))
    _aggregate_over_seeds(out_root, results)
    return 0


def _aggregate_over_seeds(out_root, results):
    """Group runs that differ only in `seed` and report mean +- std for
    the headline metrics — conclusions must clear the seed spread to be
    conclusions (doc/ABLATION.md v2 methodology)."""
    import math
    import re
    groups = {}
    for name, m in results.items():
        if m is None:
            continue
        base = re.sub(r"_?seed-\d+", "", name) or "default"
        groups.setdefault(base, []).append(m)
    agg = {}
    for base, ms in groups.items():
        if not ms:
            continue
        row = {"n_runs": len(ms)}
        for key in ("tracked_ratio", "ate_pct", "psnr", "points",
                    "keyframes"):
            vals = [m[key] for m in ms if key in m]
            mean = sum(vals) / len(vals)
            std = math.sqrt(sum((v - mean) ** 2 for v in vals)
                            / max(len(vals) - 1, 1))
            row[key] = {"mean": round(mean, 4), "std": round(std, 4)}
        agg[base] = row
    with open(os.path.join(out_root, "aggregate.json"), "w") as f:
        f.write(json.dumps(agg, indent=1))
    for base in sorted(agg):
        r = agg[base]
        print(f"{base}: ATE {r['ate_pct']['mean']:.2f}+-"
              f"{r['ate_pct']['std']:.2f}% "
              f"PSNR {r['psnr']['mean']:.1f}+-{r['psnr']['std']:.1f} dB "
              f"tracked {100 * r['tracked_ratio']['mean']:.0f}% "
              f"(n={r['n_runs']})", flush=True)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
