"""Dataset adapter tests: RTM XML mode + npurgbd (the two adapters landed
in round 2; the rest are covered by round-1 tests/usage)."""
import os

import numpy as np

from pislamfusion_tpu.io.dataset import open_dataset


def test_rtm_xml_mode(tmp_path):
    xml = """<?xml version="1.0"?>
<doc>
 <project>
  <ProjectType value="rtmapper"/>
  <Dataset><Camera value="cam0"/></Dataset>
  <cam0><Paraments value="320 240 260 260 160 120"/></cam0>
 </project>
 <images>
  <frame timestamp="1.5" image="img/a.jpg">
   <gps longtitude="116.1" latitude="40.2" altitude="95.0"/>
   <gpsSigma longtitude="2.0" latitude="2.0" altitude="5.0"/>
   <height value="70.0" sigma="3.0"/>
   <attitude pitch="1.0" yaw="2.0" roll="3.0"/>
   <attitudeSigma pitch="0.1" yaw="0.2" roll="0.3"/>
  </frame>
  <frame timestamp="2.5" image="/abs/b.jpg">
   <gps longtitude="116.2" latitude="40.3" altitude="96.0"/>
   <gpsSigma longtitude="2.0" latitude="2.0" altitude="5.0"/>
  </frame>
 </images>
</doc>"""
    path = str(tmp_path / "project.rtm")
    open(path, "w").write(xml)
    ds = open_dataset(path)
    assert ds is not None and ds.is_opened()
    assert ds.camera is not None and ds.camera.width == 320
    fr = ds.grab_frame.__self__._frames[0]
    np.testing.assert_allclose(fr.gps_lla, [116.1, 40.2, 95.0])
    np.testing.assert_allclose(fr.gps_sigma, [2.0, 2.0, 5.0])
    # 14-double layout: pyr = v[8:11] = attitude
    np.testing.assert_allclose(fr.pyr, [1.0, 2.0, 3.0])
    assert fr.timestamp == 1.5
    assert fr.image_path.endswith(os.path.join("img", "a.jpg"))
    fr2 = ds._frames[1]
    # 6-double layout: sigma = v[3:6], no pyr
    np.testing.assert_allclose(fr2.gps_sigma, [2.0, 2.0, 5.0])
    assert fr2.pyr is None
    assert fr2.image_path == "/abs/b.jpg"


def test_npurgbd(tmp_path):
    root = tmp_path / "rgbd"
    os.makedirs(root)
    (root / "assoc.txt").write_text(
        "1.0 0 0 0 0 0 0 1 1.0 depth/1.png 1.0 rgb/1.png\n"
        "2.0 1 0 0 0 0 0 1 2.0 depth/2.png 2.0 rgb/2.png\n")
    (root / "ds.npurgbd").write_text(
        "Camera=kinect\nkinect.Paraments=640 480 525 525 320 240\n"
        "VideoFile=assoc.txt\n")
    ds = open_dataset(str(root / "ds.npurgbd"))
    assert ds is not None and ds.is_opened()
    assert len(ds) == 2
    fr = ds._frames[1]
    assert fr.timestamp == 2.0
    np.testing.assert_allclose(fr.pose_c2w[:3], [1, 0, 0])
    assert fr.image_path.endswith(os.path.join("rgb", "2.png"))
    assert fr.depth_path.endswith(os.path.join("depth", "2.png"))
    assert ds.camera.fx == 525


def test_cfg_dataset(tmp_path):
    root = tmp_path / "cfgds"
    os.makedirs(root)
    (root / "video.txt").write_text("1.0 rgb/a.jpg\n2.0 rgb/b.jpg\n")
    (root / "gps.txt").write_text("0.9 116.0 40.0 95.0 5.0\n"
                                  "1.9 116.001 40.0 95.0 5.0\n")
    (root / "play.cfg").write_text(
        "Video.Type=GSLAM\nVideo.File=video.txt\n"
        "Video.CameraInName=cam\ncam.Paraments=320 240 260 260 160 120\n")
    ds = open_dataset(str(root / "play.cfg"))
    assert ds is not None and ds.is_opened()
    kinds = [("gps" if f.is_gps_only else "img") for f in ds._frames]
    assert kinds == ["gps", "img", "gps", "img"]
    assert ds._frames[0].gps_lla[0] == 116.0
    assert ds._frames[1].image_path.endswith(os.path.join("rgb", "a.jpg"))
    assert ds.camera.fx == 260
