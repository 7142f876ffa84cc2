"""Native C++ image decode + prefetch pipeline (native/imageio.cpp via
ctypes). Skipped when the toolchain/libs are absent (the library layer
falls back to PIL everywhere)."""
import numpy as np
import pytest

from pislamfusion_tpu.io import native_io

pytestmark = pytest.mark.skipif(not native_io.available(),
                                reason="native imageio unavailable")


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    from PIL import Image
    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("imgs")
    img = rng.integers(0, 255, (96, 128, 3)).astype(np.uint8)
    Image.fromarray(img).save(str(d / "t.png"))
    Image.fromarray(img).save(str(d / "t.jpg"), quality=95)
    gray8 = img[..., 0]
    Image.fromarray(gray8).save(str(d / "g.png"))
    return d, img, gray8


def test_png_decode_exact(images):
    d, img, _ = images
    a = native_io.imread_f32(str(d / "t.png"))
    assert a.dtype == np.float32
    np.testing.assert_array_equal(a, img.astype(np.float32))


def test_jpeg_matches_pil(images):
    from PIL import Image
    d, img, _ = images
    a = native_io.imread_f32(str(d / "t.jpg"))
    ref = np.asarray(Image.open(str(d / "t.jpg")).convert("RGB"), np.float32)
    assert np.abs(a - ref).max() <= 1.0   # both use libjpeg; tiny idct slack


def test_gray_conversion(images):
    d, img, _ = images
    g = native_io.imread_f32(str(d / "t.png"), gray=True)
    ref = img.astype(np.float32) @ np.asarray([0.299, 0.587, 0.114],
                                              np.float32)
    assert np.abs(g - ref).max() < 1e-3


def test_gray_png_promoted(images):
    d, _, gray8 = images
    a = native_io.imread_f32(str(d / "g.png"))
    assert a.shape == (96, 128, 3)
    np.testing.assert_array_equal(a[..., 0], gray8.astype(np.float32))


def test_prefetcher_order_and_errors(images):
    d, img, _ = images
    pf = native_io.Prefetcher(threads=3)
    try:
        tickets = [pf.submit(str(d / "t.png")) for _ in range(12)]
        bad = pf.submit(str(d / "missing.png"))
        outs = [pf.wait(t) for t in tickets]
        assert all(o is not None and o.shape == (96, 128, 3) for o in outs)
        assert pf.wait(bad) is None
    finally:
        pf.close()
