"""MapHash binary checkpoint compatibility (MapHash.cpp:365-545).

Three layers: (1) a golden fixture crafted byte-for-byte the way the C++
OutStream writes it (raw little-endian structs, empty GImage slots, pad
bytes in pair<FrameID,int>) parses to the right semantics; (2) our writer
round-trips byte-stably; (3) a WorldMap survives a save/load cycle through
the format with poses, points, observations and connections intact.
"""
import struct

import numpy as np

from pislamfusion_tpu.io import maphash


def _golden_blob():
    """Hand-build the bytes the reference writer emits for a tiny map:
    1 point, 1 frame with 2 keypoints, 1 observation, 1 parent link."""
    out = bytearray()
    out += b"Hash\nbinary\n"
    out += struct.pack("<QQ", 1, 1)                     # frameNum, pointNum
    # point: id, pos, normal, color(3b), refKF, empty GImage
    out += struct.pack("<Q", 7)
    out += np.asarray([1.5, -2.0, 30.0], "<f8").tobytes()
    out += np.asarray([0.0, 0.0, -1.0], "<f8").tobytes()
    out += bytes([10, 20, 30])
    out += struct.pack("<Q", 4)
    out += struct.pack("<iii", 0, 0, 0)
    # frame: id, ts, SIM3 (q xyzw, t, scale)
    out += struct.pack("<Q", 4)
    out += struct.pack("<d", 123.25)
    out += np.asarray([0.0, 0.0, 0.0, 1.0], "<f8").tobytes()   # quat xyzw
    out += np.asarray([10.0, 20.0, 120.0], "<f8").tobytes()    # translation
    out += struct.pack("<d", 1.0)                              # scale
    out += struct.pack("<iii", 0, 0, 0)                 # image: empty
    path = b"img/000004.jpg"
    out += struct.pack("<Q", len(path)) + path
    out += struct.pack("<i", 3)                         # channels
    cam = [1920.0, 1080.0, 1200.0, 1200.0, 960.0, 540.0]
    out += struct.pack("<Q", len(cam)) + np.asarray(cam, "<f8").tobytes()
    gps = [116.3, 39.9, 50.0, 2.0, 2.0, 5.0]
    out += struct.pack("<Q", len(gps)) + np.asarray(gps, "<f8").tobytes()
    out += struct.pack("<iii", 0, 0, 0)                 # descriptors: empty
    # keypoints: 2 x 28B
    out += struct.pack("<Q", 2)
    out += struct.pack("<fffffii", 100.0, 200.0, 31.0, 90.0, 5.0, 0, -1)
    out += struct.pack("<fffffii", 300.0, 400.0, 37.2, -1.0, 3.0, 1, -1)
    # colors: 2 x 3B
    out += struct.pack("<Q", 2) + bytes([1, 2, 3, 4, 5, 6])
    # observations: 1 pair<u64, u64>
    out += struct.pack("<Q", 1) + struct.pack("<QQ", 7, 1)
    # children: 0; parents: 1 pair<u64, i32+pad> — reference writes stack
    # garbage in the pad; emulate with nonzero pad bytes
    out += struct.pack("<Q", 0)
    out += struct.pack("<Q", 1) + struct.pack("<QiI", 2, 57, 0xDEADBEEF)
    return bytes(out)


def test_golden_fixture_parses():
    data = maphash.loads(_golden_blob())
    assert len(data.points) == 1 and len(data.frames) == 1
    p = data.points[0]
    assert p.id == 7 and p.ref_frame == 4
    np.testing.assert_allclose(p.position, [1.5, -2.0, 30.0])
    np.testing.assert_array_equal(p.color, [10, 20, 30])
    f = data.frames[0]
    assert f.id == 4 and f.timestamp == 123.25
    np.testing.assert_allclose(f.pose_qtxyzw_t_s,
                               [0, 0, 0, 1, 10, 20, 120, 1])
    assert f.image_path == "img/000004.jpg"
    assert f.image_channels == 3
    assert f.camera_params[2] == 1200.0
    assert f.gps_data[:2] == [116.3, 39.9]
    assert len(f.keypoints) == 2
    assert f.keypoints["x"][1] == 300.0
    assert f.keypoints["octave"][1] == 1
    np.testing.assert_array_equal(f.colors, [[1, 2, 3], [4, 5, 6]])
    assert f.observations == [(7, 1)]
    assert f.parents == [(2, 57)]   # pad garbage ignored
    assert f.children == []


def test_roundtrip_byte_stable():
    """load -> save -> load -> save must emit identical bytes (our writer
    zeroes the pad garbage, so stability starts after one rewrite)."""
    d1 = maphash.loads(_golden_blob())
    b1 = maphash.dumps(d1)
    d2 = maphash.loads(b1)
    b2 = maphash.dumps(d2)
    assert b1 == b2
    # and the rewrite preserved every field
    assert d2.frames[0].observations == d1.frames[0].observations
    assert d2.frames[0].parents == d1.frames[0].parents
    np.testing.assert_allclose(d2.points[0].position, d1.points[0].position)


def test_worldmap_cycle(tmp_path):
    from pislamfusion_tpu.core.camera import Camera
    from pislamfusion_tpu.models.frame import Frame, MapPoint
    from pislamfusion_tpu.models.worldmap import WorldMap

    rng = np.random.default_rng(0)
    wmap = WorldMap()
    cam = Camera.from_parameters([640, 480, 500, 500, 320, 240])
    N = 32
    for fid in (1, 2):
        fr = Frame(id=fid, timestamp=10.0 + fid, camera=cam)
        fr.pose_c2w = np.array([fid, 0, 30, 0, 0, 0, 1], np.float32)
        feats = {
            "xy": rng.uniform(0, 480, (N, 2)).astype(np.float32),
            "desc": rng.integers(0, 2, (N, 256)).astype(np.uint8),
            "angle": rng.uniform(0, 2 * np.pi, N).astype(np.float32),
            "octave": rng.integers(0, 8, N).astype(np.int32),
            "response": rng.uniform(1, 50, N).astype(np.float32),
            "valid": np.ones(N, bool),
        }
        fr.set_features(feats, "orb")
        fr.is_keyframe = True
        wmap.insert_frame(fr)
    wmap.frame(1).connections[2] = 25
    wmap.frame(2).connections[1] = 25
    for pid in range(100, 110):
        mp = MapPoint(id=pid,
                      position=rng.uniform(-5, 5, 3).astype(np.float32),
                      descriptor=rng.integers(0, 2, 256).astype(np.uint8))
        mp.ref_frame = 1
        wmap.insert_point(mp)
        wmap.add_observation(pid, 1, pid - 100)
        wmap.add_observation(pid, 2, pid - 95)

    path = str(tmp_path / "ckpt.map")
    assert wmap.save(path)
    with open(path, "rb") as fh:
        assert fh.read(12) == b"Hash\nbinary\n"

    re = WorldMap()
    assert re.load(path)
    assert re.frame_num() == 2 and re.point_num() == 10
    f1 = re.frame(1)
    np.testing.assert_allclose(f1.pose_c2w, wmap.frame(1).pose_c2w,
                               atol=1e-6)
    assert f1.connections == {2: 25}
    np.testing.assert_allclose(f1.xy, wmap.frame(1).xy, atol=1e-4)
    # ORB bit-planes survive the packed-byte round trip exactly
    np.testing.assert_array_equal(f1.desc, wmap.frame(1).desc)
    mp = re.point(105)
    np.testing.assert_allclose(mp.position, wmap.point(105).position,
                               atol=1e-6)
    np.testing.assert_array_equal(mp.descriptor, wmap.point(105).descriptor)
    assert mp.observations == {1: 5, 2: 10}
    # kp2mp reconstructed from the observation lists
    assert f1.kp2mp[5] == 105
    # id allocators moved past the loaded ids
    assert re.get_fid() > 2 and re.get_pid() > 109


def test_worldmap_save_dispatch_and_angle_sentinel(tmp_path):
    """save() writes MapHash only for the explicit binary extensions —
    any other user path keeps the lossless native format — and the -1
    undefined-angle keypoint sentinel survives the MapHash round trip."""
    from pislamfusion_tpu.core.camera import Camera
    from pislamfusion_tpu.models.frame import Frame
    from pislamfusion_tpu.models.worldmap import WorldMap

    rng = np.random.default_rng(1)
    wmap = WorldMap()
    cam = Camera.from_parameters([640, 480, 500, 500, 320, 240])
    fr = Frame(id=1, timestamp=11.0, camera=cam)
    fr.pose_c2w = np.array([0, 0, 30, 0, 0, 0, 1], np.float32)
    N = 8
    ang = rng.uniform(0, 2 * np.pi, N).astype(np.float32)
    ang[2] = -1.0                      # cv::KeyPoint undefined orientation
    fr.set_features({
        "xy": rng.uniform(0, 480, (N, 2)).astype(np.float32),
        "desc": rng.integers(0, 2, (N, 256)).astype(np.uint8),
        "angle": ang,
        "octave": np.zeros(N, np.int32),
        "response": rng.uniform(1, 50, N).astype(np.float32),
        "valid": np.ones(N, bool),
    }, "orb")
    fr.is_keyframe = True
    wmap.insert_frame(fr)

    p_native = str(tmp_path / "user_path.psf")   # arbitrary extension
    assert wmap.save(p_native)
    with open(p_native, "rb") as fh:
        assert fh.read(12) != b"Hash\nbinary\n"  # native format kept
    re1 = WorldMap()
    assert re1.load(p_native)                    # header-sniffed load

    p_mh = str(tmp_path / "ckpt.map")
    assert wmap.save(p_mh)
    with open(p_mh, "rb") as fh:
        assert fh.read(12) == b"Hash\nbinary\n"
    re2 = WorldMap()
    assert re2.load(p_mh)
    a = np.asarray(re2.frame(1).angle)
    assert a[2] == -1.0, a[2]
    ok = np.arange(N) != 2
    np.testing.assert_allclose(a[ok], ang[ok], atol=1e-5)
