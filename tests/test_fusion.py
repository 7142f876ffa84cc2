"""FusionSystem unit tests: TestMap2D trajectory playback + the
Map2DWithSLAM queue consumer (Map2DFusion.cpp:153-338)."""
import os
import threading

import numpy as np

from pislamfusion_tpu.core.messenger import DataTrans
from pislamfusion_tpu.core.svar import Svar
from pislamfusion_tpu.models.fusion import FusionSystem, TrajectoryLength
from pislamfusion_tpu.models.map2d import _write_png, read_png


def _write_playback_dataset(root, rng, n=6):
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    with open(os.path.join(root, "config.cfg"), "w") as f:
        f.write("Plane=0 0 0 0 0 0 1\n"
                "Camera.Paraments=160 120 130 130 80 60\n"
                "Map2D.BandNumber=3\n")
    entries = []
    with open(os.path.join(root, "trajectory.txt"), "w") as tf:
        for i in range(n):
            name = f"{float(i):.6f}"
            img = rng.uniform(0, 255, (120, 160, 3)).astype(np.uint8)
            # PIL picks the JPEG encoder from the .jpg extension
            _write_png(os.path.join(root, "rgb", name + ".jpg"), img)
            pose = f"{25.0 + i * 2.0} 30.0 20.0 1 0 0 0"
            tf.write(f"{name} {pose}\n")
            entries.append(name)
    return entries


def test_testmap2d_playback(tmp_path, rng):
    root = str(tmp_path / "ds")
    _write_playback_dataset(root, rng)
    cfg = Svar()
    cfg.set("Map2D.Act", "TestMap2D")
    cfg.set("Map2D.DataPath", root)
    cfg.set("PrepareFrameNum", "3")
    fusion = FusionSystem(cfg)
    fusion.run()   # inline
    assert fusion.error is None, fusion.error
    assert fusion.frames_fed == 6
    assert fusion.length_calc.length > 0
    out = str(tmp_path / "result.png")
    assert fusion.save(out)
    img = read_png(out)
    assert img.size > 0 and (img < 250).any()


def test_map2dwithslam_consumer(tmp_path, rng):
    """Producer thread feeds (image, pose) + plane through fresh queues;
    the consumer prepares and blends."""
    trans_q = DataTrans(30)
    plane_q = DataTrans(30)
    cfg = Svar()
    cfg.set("PrepareFrameNum", "3")
    cfg.set("Camera.Paraments", "160 120 130 130 80 60")
    cfg.set("Map2D.BandNumber", "3")
    fusion = FusionSystem(cfg, trans_q=trans_q, plane_q=plane_q).start()

    def produce():
        for i in range(8):
            img = rng.uniform(0, 255, (120, 160, 3)).astype(np.float32)
            pose = np.array([25.0 + 2.0 * i, 30.0, 20.0, 1, 0, 0, 0])
            trans_q.product((img, pose))
        plane_q.product(np.array([0, 0, 0, 0, 0, 0, 1.0]))

    t = threading.Thread(target=produce)
    t.start()
    t.join()
    assert fusion.finish(timeout=120)
    assert fusion.error is None, fusion.error
    assert fusion.frames_fed == 8
    assert fusion.map2d is not None
    out, covered = fusion.map2d.blended()
    assert covered.any()


def test_trajectory_length():
    tl = TrajectoryLength()
    tl.feed([0, 0, 0])
    tl.feed([3, 4, 0])
    tl.feed([3, 4, 12])
    assert abs(tl.length - 17.0) < 1e-9
