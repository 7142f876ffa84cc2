"""Checkpoint v2 + exporter tests (MapHash save/load :365-545,
saveMap2DFusion :655-767, saveMapFusion :786-836, geo-tile export)."""
import os

import numpy as np
import pytest

from pislamfusion_tpu.core.camera import Camera
from pislamfusion_tpu.models.frame import Frame, MapPoint
from pislamfusion_tpu.models.worldmap import WorldMap
from pislamfusion_tpu.io import exporters


def _tiny_map(rng, n_frames=4, n_points=40, n_kp=32):
    m = WorldMap()
    cam = Camera(320, 240, 260.0, 260.0, 160.0, 120.0)
    for i in range(n_frames):
        fr = Frame(id=m.get_fid(), timestamp=float(i), camera=cam)
        feats = dict(
            xy=rng.uniform(0, 320, (n_kp, 2)).astype(np.float32),
            desc=rng.integers(0, 2, (n_kp, 256)).astype(np.uint8),
            angle=rng.uniform(0, 6.28, n_kp).astype(np.float32),
            octave=rng.integers(0, 4, n_kp).astype(np.int32),
            response=rng.uniform(0, 1, n_kp).astype(np.float32),
            valid=np.ones(n_kp, bool))
        fr.set_features(feats, "orb")
        fr.pose_c2w = np.array([i * 2.0, 0, 25, 1, 0, 0, 0], np.float32)
        fr.is_keyframe = True
        fr.gps_lla = np.array([116.0 + i * 1e-5, 40.0, 65.0])
        fr.gps_enu = np.array([i * 2.0, 0, 25], np.float32)
        fr.image = np.full((240, 320), 128, np.float32)
        m.insert_frame(fr)
    frames = m.frames()
    for j in range(n_points):
        mp = MapPoint(id=m.get_pid(),
                      position=rng.uniform(-5, 5, 3).astype(np.float32),
                      descriptor=rng.integers(0, 2, 256).astype(np.uint8))
        mp.position[2] = rng.normal(0, 0.05)
        mp.color = rng.integers(0, 255, 3).astype(np.uint8)
        mp.ref_frame = frames[j % n_frames].id
        m.insert_point(mp)
        for fr in frames[:2]:
            m.add_observation(mp.id, fr.id, j % n_kp)
    frames[0].connections[frames[1].id] = 30
    frames[1].connections[frames[0].id] = 30
    return m


@pytest.fixture
def tiny_map(rng):
    return _tiny_map(rng)


def test_checkpoint_v2_roundtrip(tiny_map, tmp_path):
    # .npz keeps the native format; other extensions now emit the
    # reference's MapHash binary layout (tests/test_maphash.py)
    path = str(tmp_path / "map.npz")
    assert tiny_map.save(path)
    # v2 header, no pickle inside
    with open(path, "rb") as f:
        assert f.read(13) == b"PSFTPU_MAP_V2"
    m2 = WorldMap()
    assert m2.load(path)
    assert m2.frame_num() == tiny_map.frame_num()
    assert m2.point_num() == tiny_map.point_num()
    f0 = tiny_map.frames()[0]
    g0 = m2.frame(f0.id)
    np.testing.assert_allclose(g0.pose_c2w, f0.pose_c2w)
    np.testing.assert_array_equal(g0.desc, f0.desc)
    np.testing.assert_array_equal(g0.kp2mp, f0.kp2mp)
    np.testing.assert_allclose(g0.gps_enu, f0.gps_enu)
    assert g0.connections == f0.connections
    p0 = tiny_map.points()[0]
    q0 = m2.point(p0.id)
    np.testing.assert_allclose(q0.position, p0.position)
    assert q0.observations == p0.observations
    assert m2.get_fid() == tiny_map._next_fid


def test_map2dfusion_folder(tiny_map, tmp_path):
    folder = str(tmp_path / "m2df")
    assert exporters.save_map2dfusion(tiny_map, folder,
                                      gps_origin=[116.0, 40.0, 65.0])
    cfg = open(os.path.join(folder, "config.cfg")).read()
    assert "Plane=" in cfg and "Camera.Paraments=" in cfg
    assert "GPS.Origin=" in cfg
    traj = open(os.path.join(folder, "trajectory.txt")).read().splitlines()
    assert len(traj) == 4
    assert len(traj[0].split()) == 8
    assert len(os.listdir(os.path.join(folder, "rgb"))) == 4
    # the folder must reopen through the Svar config parser
    from pislamfusion_tpu.core.svar import Svar
    s = Svar()
    assert s.parse_file(os.path.join(folder, "config.cfg"))
    assert len(s.get_vec("Plane")) == 7
    assert len(s.get_vec("Camera.Paraments")) == 6


def test_mapfusion_mf(tiny_map, tmp_path):
    path = str(tmp_path / "map.mf")
    assert exporters.save_mapfusion(tiny_map, path)
    lines = open(path).read().splitlines()
    assert len(lines) == 4
    parts = lines[0].split(", ")
    assert len(parts) >= 1 + 7 + 1 + 6 + 1
    n_params = int(parts[8])
    assert n_params == 6
    n_pairs = int(parts[9 + n_params])
    assert len(parts) == 10 + n_params + 4 * n_pairs


def test_geo_tiles(rng, tmp_path):
    from pislamfusion_tpu.core.svar import Svar
    from pislamfusion_tpu.models.map2d import create_map2d
    cam = Camera(320, 240, 260.0, 260.0, 160.0, 120.0)
    cfg = Svar()
    m2d = create_map2d("weighted", cfg)
    plane = np.array([0, 0, 0, 0, 0, 0, 1.0])
    poses = [np.array([x, 30.0, 25.0, 1, 0, 0, 0]) for x in (25.0, 30.0)]
    assert m2d.prepare(plane, cam, [(None, p) for p in poses])
    img = rng.uniform(0, 255, (240, 320, 3)).astype(np.float32)
    for p in poses:
        assert m2d.feed(img, p)
    n = exporters.export_geo_tiles(m2d, [116.35, 39.96, 40.0],
                                   str(tmp_path), zoom=18)
    assert n >= 1
    z_dir = os.path.join(str(tmp_path), "18")
    tiles = [os.path.join(r, f) for r, _, fs in os.walk(z_dir) for f in fs]
    assert len(tiles) == n
    from pislamfusion_tpu.models.map2d import read_png
    t = read_png(tiles[0])
    assert t.shape == (256, 256, 3)
    assert (t < 250).any()   # some actual content, not all background

def test_geo_tiles_datum_shift(rng, tmp_path):
    """GeoTiles.Datum=gcj02 places tiles on the China-offset grid
    (TileProjection.h GCJ02Projection): inside China the GCJ-02 offset is
    hundreds of meters, so the tile x/y indices shift vs plain WGS-84."""
    from pislamfusion_tpu.core.svar import Svar
    from pislamfusion_tpu.models.map2d import create_map2d
    cam = Camera(320, 240, 260.0, 260.0, 160.0, 120.0)
    origin = [116.35, 39.96, 40.0]                    # Beijing: in China
    tile_sets = {}
    for datum in ("wgs84", "gcj02"):
        m2d = create_map2d("weighted", Svar())
        plane = np.array([0, 0, 0, 0, 0, 0, 1.0])
        poses = [np.array([x, 30.0, 25.0, 1, 0, 0, 0]) for x in (25.0, 30.0)]
        assert m2d.prepare(plane, cam, [(None, p) for p in poses])
        img = rng.uniform(0, 255, (240, 320, 3)).astype(np.float32)
        for p in poses:
            assert m2d.feed(img, p)
        out = os.path.join(str(tmp_path), datum)
        n = exporters.export_geo_tiles(m2d, origin, out, zoom=18,
                                       datum=datum)
        assert n >= 1
        z_dir = os.path.join(out, "18")
        tile_sets[datum] = {
            (os.path.basename(r), f) for r, _, fs in os.walk(z_dir)
            for f in fs}
    # the ~300 m GCJ-02 offset at zoom 18 (~0.6 m/px, 256px tiles) moves
    # the survey by roughly 2 tiles: the index sets must differ
    assert tile_sets["wgs84"] != tile_sets["gcj02"]
