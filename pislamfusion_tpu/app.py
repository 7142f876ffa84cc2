"""Application glue: `python -m pislamfusion_tpu <dataset> [key=value ...]`.

Equivalent of src/main.cpp (:6-43) — ParseMain, Act dispatch, positional
args opened as datasets — plus the SLAM feed loop of gui/pislam.cpp
(slamThread :132-183) and the result saving that the reference spreads
over MainWindow/TestSystem. Headless: the Qt GUI has no TPU analogue; the
observability surface is the saved result.png / trajectory.txt / map.ply
and the section-timer report (core/timer.py).
"""
from __future__ import annotations

import os
import sys
import time
from typing import List, Optional

import numpy as np

from .core.svar import Svar
from .core.timer import timer
from .io.dataset import open_dataset
from .models.fusion import FusionSystem
from .models.slam import create_slam


def run_slam(cfg: Svar, dataset_paths: List[str], out_dir: str = "."):
    """Open datasets, run the SLAM feed loop with the fusion consumer
    attached, save outputs. Returns (slam, fusion)."""
    if not dataset_paths:
        raise SystemExit("no dataset given (pass e.g. survey.npudronemap)")
    # validate end-of-run export knobs UP FRONT: a typo'd datum must fail
    # here, not after the multi-hour survey has already been tracked
    datum = cfg.get_string("GeoTiles.Datum", "wgs84").strip().lower()
    if datum not in ("wgs84", "gcj02", "bd09"):
        raise SystemExit(f"GeoTiles.Datum={datum!r} unknown "
                         "(expected wgs84, gcj02 or bd09)")
    cfg.set("GeoTiles.Datum", datum)
    datasets = []
    for p in dataset_paths:
        ds = open_dataset(p)
        if ds is None or not ds.is_opened():
            raise SystemExit(f"could not open dataset {p}")
        # dataset config (camera, plane, GPS origin) fills gaps; CLI wins
        for k in ds.cfg.keys():
            cfg.insert(k, ds.cfg.get(k), overwrite=False)
        datasets.append(ds)

    camera = datasets[0].camera
    slam = create_slam(cfg, camera)
    fusion = FusionSystem(cfg, camera).start()

    # SLAM_Call command surface (gui/pislam.cpp:43 RegisterCommand):
    # Start/Pause/Stop gate the feed loop; everything else forwards to the
    # plugin's call() (DIYSLAM.cpp:366-394) — usable from other threads or
    # embedded callers via core.svar.scommand.
    from .core.svar import scommand
    run_state = {"paused": False, "stop": False}

    def _slam_call(arg: str):
        a = arg.strip()
        if a == "Start":
            run_state["paused"] = False
        elif a == "Pause":
            run_state["paused"] = True
        elif a == "Stop":
            run_state["stop"] = True
        else:
            cmd, _, rest = a.partition(" ")
            slam.call(cmd, rest or None)
    scommand.register("SLAM_Call", _slam_call)

    freq = cfg.get_double("Frequency", 0.0)   # gui/pislam.cpp:134 (100 Hz)
    period = 1.0 / freq if freq > 0 else 0.0
    viz_dir = cfg.get_string("Viz.Dir", "")
    visualizer = None
    if viz_dir:
        from . import viz
        visualizer = viz.Visualizer(viz_dir, cfg.get_int("Viz.Every", 25))
    # native decode-ahead pipeline (C++ worker threads, native/imageio.cpp)
    # — the reference's dataset prepare thread (DatasetRTMapper.cpp:171-205)
    prefetcher = None
    if cfg.get_bool("Dataset.NativeIO", True):
        from .io import native_io
        if native_io.available():
            prefetcher = native_io.Prefetcher(
                threads=cfg.get_int("Dataset.PrefetchThreads", 2))
    depth = max(1, cfg.get_int("Dataset.PrefetchDepth", 4))

    t0 = time.perf_counter()
    n_images = 0
    last_gps = None
    from collections import deque
    for ds in datasets:
        if run_state["stop"]:
            break
        pending = deque()   # (frame, ticket-or-None)

        def fill():
            while len(pending) < depth:
                nxt = ds.grab_frame(load=False)
                if nxt is None:
                    return False
                t = None
                if prefetcher is not None and nxt.image_path \
                        and nxt.image is None and not nxt.is_gps_only:
                    t = prefetcher.submit(nxt.image_path)
                pending.append((nxt, t))
            return True

        while True:
            if run_state["stop"]:
                break
            while run_state["paused"] and not run_state["stop"]:
                time.sleep(0.02)
            fill()
            if not pending:
                break
            fr, ticket = pending.popleft()
            if fr.is_gps_only:
                last_gps = fr                       # attach to next image
                continue
            img = None
            if ticket is not None:
                with timer.scope("App::prefetchWait"):
                    img = prefetcher.wait(ticket)
            if img is None:
                img = fr.load_image()
            if img is None:
                continue
            gps_src = fr if fr.gps_lla is not None else last_gps
            gps_lla = gps_src.gps_lla if gps_src is not None else None
            gps_acc = 5.0
            if gps_src is not None and gps_src.gps_sigma is not None:
                gps_acc = float(np.mean(gps_src.gps_sigma))
            last_gps = None
            with timer.scope("App::track"):
                tracked = slam.track(
                    img, fr.timestamp, gps_lla=gps_lla, gps_acc=gps_acc,
                    pyr=(gps_src.pyr if gps_src is not None else None),
                    height_ground=(gps_src.height_ground
                                   if gps_src is not None else None))
            if tracked is not None and fr.image_path:
                tracked.image_path = fr.image_path   # for .mf/folder export
            if visualizer is not None:
                visualizer.update(slam=slam, fusion=fusion, frame=tracked)
            n_images += 1
            if period:
                dt = t0 + n_images * period - time.perf_counter()
                if dt > 0:
                    time.sleep(dt)
    if prefetcher is not None:
        prefetcher.close()
    slam.finish()
    if slam.mapper is not None:
        slam.mapper.force_plane()   # publish plane even on short runs
    fusion.finish()

    wall = time.perf_counter() - t0
    os.makedirs(out_dir, exist_ok=True)
    result_png = cfg.get_string("Map.File2Save",
                                os.path.join(out_dir, "result.png"))
    saved = fusion.save(result_png)
    if slam.map is not None:
        slam.map.export_trajectory(os.path.join(out_dir, "trajectory.txt"))
        slam.map.export_ply(os.path.join(out_dir, "map.ply"))
        map_file = cfg.get_string("MapFile2Save", "")
        if map_file:
            slam.map.save(map_file)
        from .io import exporters
        m2df = cfg.get_string("Map2DFusionFolder", "")
        origin = cfg.get_vec("GPS.Origin") or None
        if m2df:
            exporters.save_map2dfusion(slam.map, m2df, plane=slam.plane,
                                       gps_origin=origin)
        mf = cfg.get_string("MapFusionFile", "")
        if mf:
            exporters.save_mapfusion(slam.map, mf)
        tiles_dir = cfg.get_string("GeoTiles.Dir", "")
        if tiles_dir and origin and fusion.map2d is not None:
            n = exporters.export_geo_tiles(
                fusion.map2d, origin, tiles_dir,
                zoom=cfg.get_int("GeoTiles.Zoom", 19),
                datum=cfg.get_string("GeoTiles.Datum", "wgs84"))
            print(f"geo-tiles: wrote {n} tiles to {tiles_dir}")

    ratio = slam.frames_tracked / max(slam.frames_total, 1)
    print(f"frames: {slam.frames_total} tracked {slam.frames_tracked} "
          f"({100 * ratio:.1f}%) in {wall:.1f}s "
          f"({slam.frames_total / max(wall, 1e-9):.1f} fps)")
    if slam.map is not None:
        print(f"map: {len(slam.map.keyframes())} keyframes, "
              f"{slam.map.point_num()} points")
    print(f"mosaic: fed {fusion.frames_fed} frames, "
          f"trajectory length {fusion.length_calc.length:.2f}"
          + (f", saved {result_png}" if saved else ", nothing blended"))
    if fusion.error:
        print(f"fusion error: {fusion.error}", file=sys.stderr)
    if cfg.get_bool("Timer.Report", True):
        timer.dump()
    return slam, fusion


def main(argv: Optional[List[str]] = None) -> int:
    from .core.jaxcache import enable_persistent_cache
    from .core.svar import svar
    if argv is None:
        argv = sys.argv[1:]
    # crash stacktraces on SIGSEGV/SIGABRT/fatal signals — the reference
    # installs installStackTrace() first thing in main (src/main.cpp:12,
    # gui/StackTrace.cpp:334 prints 100 frames to stderr). faulthandler is
    # the CPython-native equivalent (covers C-extension/XLA crashes that a
    # Python traceback would miss). Opt out with StackTrace=0.
    import faulthandler
    if "StackTrace=0" not in argv:
        faulthandler.enable()
    enable_persistent_cache()
    positional = svar.parse_main(argv)
    act = svar.get_string("Act", "SLAM")
    if act == "SLAM":
        run_slam(svar, positional,
                 out_dir=svar.get_string("Out.Dir", "."))
        return 0
    if act == "TestMap2D":
        fusion = FusionSystem(svar)
        fusion.run()        # inline (no SLAM producer to overlap with)
        saved = fusion.save(svar.get_string(
            "Map.File2Save", os.path.join(
                svar.get_string("Out.Dir", "."), "result.png")))
        print(f"mosaic: fed {fusion.frames_fed} frames, saved={saved}")
        if fusion.error:
            print(f"error: {fusion.error}", file=sys.stderr)
            return 1
        return 0
    if act == "Tests":      # gtest runner parity (gui/pislam.cpp:228-232)
        import pytest
        return pytest.main(["-q"] + positional)
    print(f"No act {act}!", file=sys.stderr)
    return 1
