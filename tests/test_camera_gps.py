"""Camera model and geodesy tests (reference: Camera.h, GPS.h)."""
import numpy as np
import jax.numpy as jnp

from pislamfusion_tpu.core.camera import Camera, CameraATAN, CameraOpenCV
from pislamfusion_tpu.core import gps


def test_pinhole_roundtrip(rng):
    cam = Camera(640, 480, 500.0, 500.0, 320.0, 240.0)
    p3d = jnp.asarray(rng.uniform(-1, 1, size=(32, 3)), jnp.float32)
    p3d = p3d.at[:, 2].set(jnp.abs(p3d[:, 2]) + 1.0)
    pix = cam.project(p3d)
    rays = cam.unproject(pix)
    np.testing.assert_allclose(rays * p3d[:, 2:3], p3d, atol=1e-4)


def test_camera_factory_dispatch():
    assert Camera.from_parameters([640, 480]).name == "Ideal"
    assert Camera.from_parameters([640, 480, 500, 500, 320, 240]).name == "PinHole"
    assert isinstance(Camera.from_parameters([640, 480, 500, 500, 320, 240, 0.9]),
                      CameraATAN)
    p = [640, 480, 500, 500, 320, 240, 0.1, -0.05, 0.001, 0.001, 0.0]
    assert isinstance(Camera.from_parameters(p), CameraOpenCV)


def test_atan_roundtrip(rng):
    cam = CameraATAN(640, 480, 500.0, 500.0, 320.0, 240.0, d=0.9)
    p3d = jnp.asarray(rng.uniform(-0.5, 0.5, size=(32, 3)), jnp.float32)
    p3d = p3d.at[:, 2].set(1.0)
    pix = cam.project(p3d)
    np.testing.assert_allclose(cam.unproject(pix), p3d, atol=1e-3)


def test_opencv_roundtrip(rng):
    cam = CameraOpenCV(640, 480, 500.0, 500.0, 320.0, 240.0,
                       k1=0.1, k2=-0.05, p1=0.001, p2=-0.001, k3=0.01)
    p3d = jnp.asarray(rng.uniform(-0.4, 0.4, size=(32, 3)), jnp.float32)
    p3d = p3d.at[:, 2].set(1.0)
    pix = cam.project(p3d)
    np.testing.assert_allclose(cam.unproject(pix), p3d, atol=1e-3)


def test_camera_scaled():
    cam = Camera(640, 480, 500.0, 500.0, 320.0, 240.0).scaled(0.5)
    assert cam.width == 320 and abs(cam.fx - 250.0) < 1e-9


def test_camera_downsampled_preserves_model(rng):
    """downsampled(s) must keep the distortion model (SLAM.TrackScale
    path) and map pixels with the s*s box convention: downsampled pixel
    j has its center at original coordinate j*s + (s-1)/2, so a 3D point
    projecting to p full-res projects to (p - (s-1)/2)/s downsampled."""
    s = 2
    cams = [
        Camera(640, 480, 500.0, 500.0, 321.0, 239.0),
        CameraATAN(640, 480, 500.0, 500.0, 321.0, 239.0, d=0.9),
        CameraOpenCV(640, 480, 500.0, 500.0, 321.0, 239.0,
                     k1=0.1, k2=-0.05, p1=0.001, p2=-0.001, k3=0.01),
    ]
    p3d = np.asarray(rng.uniform(-0.4, 0.4, size=(64, 3)), np.float32)
    p3d[:, 2] = 1.0
    for cam in cams:
        small = cam.downsampled(s)
        assert type(small) is type(cam)
        if isinstance(cam, CameraOpenCV):
            assert small.k1 == cam.k1 and small.p2 == cam.p2
        pix_full = np.asarray(cam.project(p3d))
        pix_small = np.asarray(small.project(p3d))
        np.testing.assert_allclose(
            pix_small, (pix_full - (s - 1) / 2.0) / s, atol=1e-4)


def test_camera_downsampled_ocam():
    from test_ocam import _synthetic_ocam
    s = 2
    cam = _synthetic_ocam()
    small = cam.downsampled(s)
    rng = np.random.default_rng(3)
    ang = rng.uniform(0, 2 * np.pi, 100)
    rad = rng.uniform(5.0, 320.0, 100)
    px = np.stack([cam.cx + rad * np.cos(ang),
                   cam.cy + rad * np.sin(ang)], -1)
    rays = np.asarray(cam.unproject(px))
    pix_full = np.asarray(cam.project(rays))
    pix_small = np.asarray(small.project(rays))
    np.testing.assert_allclose(
        pix_small, (pix_full - (s - 1) / 2.0) / s, atol=2e-2)
    # unprojection through the rescaled pol stays parallel to full-res
    rays_small = np.asarray(small.unproject((px - (s - 1) / 2.0) / s))
    cos = np.sum(rays_small * rays, -1)
    assert cos.min() > 1.0 - 1e-5


def test_ecef_roundtrip():
    lon, lat, alt = 108.9, 34.2, 400.0  # near Xi'an (the reference datasets)
    xyz = gps.lla_to_ecef(lon, lat, alt)
    assert abs(np.linalg.norm(xyz) - 6371e3) < 30e3
    lla = gps.ecef_to_lla(xyz)
    np.testing.assert_allclose(lla, [lon, lat, alt], atol=1e-6)


def test_local_frame():
    f = gps.LocalFrame(108.9, 34.2, 400.0)
    # 100 m north should be ~(0, 100, 0) in ENU
    enu = f.to_local(108.9, 34.2 + 100.0 / 111320.0, 400.0)
    np.testing.assert_allclose(enu, [0.0, 100.0, 0.0], atol=0.5)
    # roundtrip
    lla = f.local_to_lla(np.array([50.0, -20.0, 5.0]))
    enu2 = f.to_local(*lla)
    np.testing.assert_allclose(enu2, [50.0, -20.0, 5.0], atol=1e-6)


def test_lnglat_distance_roundtrip():
    lng, lat = gps.lnglat_from_distance(108.9, 34.2, 120.0, -45.0)
    dx, dy = gps.distance_from_lnglat(108.9, 34.2, lng, lat)
    np.testing.assert_allclose([dx, dy], [120.0, -45.0], rtol=1e-3)


def test_gps_array_interpolation():
    arr = gps.GPSArray()
    arr.add(0.0, 108.0, 34.0, 100.0)
    arr.add(10.0, 108.001, 34.001, 200.0)
    mid = arr.at(5.0)
    np.testing.assert_allclose(mid, [108.0005, 34.0005, 150.0], atol=1e-9)
    assert arr.at(100.0) is None


def test_parse_gpshpyr_layouts():
    """Sigma decoding parity with MapFrame.h:65-69 (size>=6 reads v[3:6])."""
    from pislamfusion_tpu.io.dataset import _parse_gpshpyr
    v11 = [116.0, 40.0, 100.0, 1.5, 2.5, 3.5, 0.1, 0.2, 0.3, 9.0, 9.0]
    lla, sigma, pyr, height = _parse_gpshpyr(v11)
    np.testing.assert_allclose(lla, [116.0, 40.0, 100.0])
    np.testing.assert_allclose(sigma, [1.5, 2.5, 3.5])
    np.testing.assert_allclose(pyr, [3.5, 0.1, 0.2])
    assert height is None
    v14 = list(range(14))
    lla, sigma, pyr, height = _parse_gpshpyr(v14)
    np.testing.assert_allclose(sigma, [3, 4, 5])
    np.testing.assert_allclose(pyr, [8, 9, 10])
    assert height == 6.0   # getHeight2Ground: (v[6], sigma v[7] < 100)
    v8 = [116.0, 40.0, 100.0, 1.0, 1.0, 2.0, 55.0, 3.0]
    lla, sigma, pyr, height = _parse_gpshpyr(v8)
    assert height == 55.0 and pyr is None


def test_pyr_to_rotation_nadir():
    """PYR2Rotation parity (MapFrame.cpp:360-367): a nadir gimbal
    (pitch=-90, yaw=0, roll=0) must look straight down in ENU with the
    image x-axis east."""
    from pislamfusion_tpu.core.gps import pyr_to_rotation
    from pislamfusion_tpu.utils import host_se3 as hse3
    q = pyr_to_rotation(-90.0, 0.0, 0.0)
    view = hse3.quat_rotate(q, np.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(view, [0, 0, -1], atol=1e-6)
    xaxis = hse3.quat_rotate(q, np.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(xaxis, [1, 0, 0], atol=1e-6)
    # the near-180 roll fold (fabs(180-fabs(roll))<10 -> roll+180)
    q_folded = pyr_to_rotation(-90.0, 0.0, 175.0)
    q_explicit = pyr_to_rotation(-90.0, 0.0, -5.0)   # 355 == 175+180 mod 360
    d = min(np.linalg.norm(q_folded - q_explicit),
            np.linalg.norm(q_folded + q_explicit))
    assert d < 1e-6


def test_priory_pose_frame():
    """Frame.priory_pose: ENU fix + attitude -> camera-to-ENU SE3."""
    from pislamfusion_tpu.models.frame import Frame
    from pislamfusion_tpu.utils import host_se3 as hse3
    cam = Camera(320, 240, 260.0, 260.0, 160.0, 120.0)
    fr = Frame(id=0, timestamp=0.0, camera=cam)
    assert fr.priory_pose() is None
    fr.gps_enu = np.array([10.0, 20.0, 30.0], np.float32)
    fr.pyr = np.array([-90.0, 0.0, 0.0])
    fr.height_ground = 30.0
    T, scale = fr.priory_pose()
    np.testing.assert_allclose(T[:3], [10, 20, 30], atol=1e-5)
    assert scale == 30.0
    view = hse3.quat_rotate(T[3:7], np.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(view, [0, 0, -1], atol=1e-5)


def test_gcj02_bd09_datum_shifts():
    """GCJ-02/BD-09 converters (TileProjection.h GPSConverter): round-trips
    close to identity inside China, exact identity outside."""
    from pislamfusion_tpu.core import gps as G
    # Beijing-ish
    lat, lon = 39.9042, 116.4074
    glat, glon = G.wgs84_to_gcj02(lat, lon)
    # the GCJ offset in China is a few hundred meters
    assert 1e-4 < abs(glat - lat) < 0.01 and 1e-4 < abs(glon - lon) < 0.01
    blat, blon = G.wgs84_to_bd09(lat, lon)
    assert abs(blat - glat) > 1e-4 and abs(blon - glon) > 1e-4
    # round trips (the gcj inverse is the reference's one-step approx)
    rlat, rlon = G.gcj02_to_wgs84(glat, glon)
    assert abs(rlat - lat) < 5e-5 and abs(rlon - lon) < 5e-5
    rlat, rlon = G.bd09_to_gcj02(blat, blon)
    assert abs(rlat - glat) < 1e-5 and abs(rlon - glon) < 1e-5
    # outside China: identity (outOfChina gate)
    assert G.wgs84_to_gcj02(48.8566, 2.3522) == (48.8566, 2.3522)
    # datum_shift dispatch
    assert G.datum_shift(lat, lon, "gcj02") == (glat, glon)
    assert G.datum_shift(lat, lon, "wgs84") == (lat, lon)
