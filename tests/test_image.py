"""Image op tests: pyramids round-trip, warp correctness
(reference: MultiBandMap2DCPU.cpp:441-474, UtilGPU.cu:29-120)."""
import numpy as np
import jax.numpy as jnp

from pislamfusion_tpu.ops import image


def _img(rng, h=64, w=48, c=3):
    return jnp.asarray(rng.uniform(0, 255, size=(h, w, c)), jnp.float32)


def test_gaussian_blur_preserves_mean(rng):
    img = _img(rng)
    out = image.gaussian_blur(img, 1.5)
    assert out.shape == img.shape
    np.testing.assert_allclose(jnp.mean(out), jnp.mean(img), rtol=0.01)


def test_pyr_down_shape_and_smooth(rng):
    img = _img(rng, 64, 48)
    d = image.pyr_down(img)
    assert d.shape == (32, 24, 3)
    # constant image stays constant
    c = jnp.ones((64, 48, 3)) * 7.0
    np.testing.assert_allclose(image.pyr_down(c), 7.0, atol=1e-4)


def test_pyr_up_shape(rng):
    img = _img(rng, 32, 24)
    u = image.pyr_up(img)
    assert u.shape == (64, 48, 3)
    c = jnp.ones((32, 24, 3)) * 5.0
    np.testing.assert_allclose(image.pyr_up(c)[2:-2, 2:-2], 5.0, atol=1e-4)


def test_laplacian_roundtrip(rng):
    """createLaplacePyr + restoreImageFromLaplacePyr must be lossless."""
    img = _img(rng, 64, 64)
    lap = image.build_laplacian_pyramid(img, bands=5)
    assert len(lap) == 6
    rec = image.restore_from_laplacian(lap)
    np.testing.assert_allclose(rec, img, atol=1e-2)


def test_laplacian_roundtrip_odd_sizes(rng):
    img = _img(rng, 50, 37)
    lap = image.build_laplacian_pyramid(img, bands=3)
    rec = image.restore_from_laplacian(lap)
    np.testing.assert_allclose(rec, img, atol=1e-2)


def test_bilinear_sample_exact_at_integers(rng):
    img = _img(rng, 16, 16)
    xy = jnp.asarray([[3.0, 5.0], [0.0, 0.0], [15.0, 15.0]], jnp.float32)
    v, valid = image.bilinear_sample(img, xy)
    np.testing.assert_allclose(v[0], img[5, 3], atol=1e-5)
    np.testing.assert_allclose(v[1], img[0, 0], atol=1e-5)
    assert bool(valid.all())
    v2, valid2 = image.bilinear_sample(img, jnp.asarray([[-1.0, 0.0]]))
    assert not bool(valid2[0]) and float(v2[0, 0]) == 0.0


def test_warp_identity(rng):
    img = _img(rng, 32, 32)
    out, valid = image.warp_perspective(img, jnp.eye(3), (32, 32))
    np.testing.assert_allclose(out, img, atol=1e-4)
    assert bool(valid.all())


def test_warp_translation(rng):
    img = _img(rng, 32, 32)
    # dst->src: src_x = dst_x + 4  => image shifts left by 4
    H = jnp.eye(3).at[0, 2].set(4.0)
    out, _ = image.warp_perspective(img, H, (32, 32))
    np.testing.assert_allclose(out[:, :28], img[:, 4:], atol=1e-4)
    np.testing.assert_allclose(out[:, 28:], 0.0, atol=1e-6)


def test_perspective_transform_from_quad():
    src = jnp.asarray([[0., 0.], [10., 0.], [10., 10.], [0., 10.]])
    dst = jnp.asarray([[2., 3.], [12., 3.], [12., 13.], [2., 13.]])
    H = image.perspective_transform_from_quad(src, dst)
    p = jnp.concatenate([src, jnp.ones((4, 1))], -1) @ H.T
    np.testing.assert_allclose(p[:, :2] / p[:, 2:], dst, atol=1e-4)
    # a genuinely projective quad
    dst2 = jnp.asarray([[0., 0.], [8., 1.], [9., 9.], [1., 10.]])
    H2 = image.perspective_transform_from_quad(src, dst2)
    p2 = jnp.concatenate([src, jnp.ones((4, 1))], -1) @ H2.T
    np.testing.assert_allclose(p2[:, :2] / p2[:, 2:], dst2, atol=1e-3)


def test_warp_offset_tile(rng):
    """Rendering with an offset grid must equal cropping the full warp."""
    img = _img(rng, 40, 40)
    H = jnp.asarray([[0.9, 0.05, 2.0], [-0.03, 1.1, 1.0], [1e-4, -2e-4, 1.0]],
                    jnp.float32)
    full, _ = image.warp_perspective(img, H, (64, 64))
    tile, _ = image.warp_perspective(img, H, (16, 16), offset=(32.0, 16.0))
    np.testing.assert_allclose(tile, full[16:32, 32:48], atol=1e-4)


def test_rgb_to_gray():
    img = jnp.ones((4, 4, 3)) * jnp.asarray([100.0, 50.0, 25.0])
    g = image.rgb_to_gray(img)
    np.testing.assert_allclose(g, 100 * 0.299 + 50 * 0.587 + 25 * 0.114,
                               atol=1e-3)


def test_remap_undistorts_atan():
    """remap + undistort_map must invert an ATAN camera's distortion
    (Undistorter.h prepareReMap/undistortFast semantics)."""
    import numpy as np
    import jax.numpy as jnp
    from pislamfusion_tpu.core.camera import Camera, CameraATAN, undistort_map

    cam = CameraATAN(160, 120, 130.0, 130.0, 80.0, 60.0, 0.9)
    pin = Camera(160, 120, 130.0, 130.0, 80.0, 60.0)

    def scene(rays):
        # smooth pattern over ray direction
        return (128 + 90 * np.sin(6.0 * np.asarray(rays[..., 0]))
                * np.cos(5.0 * np.asarray(rays[..., 1]))).astype(np.float32)

    ys, xs = np.meshgrid(np.arange(120, dtype=np.float32),
                         np.arange(160, dtype=np.float32), indexing="ij")
    grid = jnp.stack([xs, ys], -1)
    img_dist = scene(np.asarray(cam.unproject(grid)))
    expected = scene(np.asarray(pin.unproject(grid)))
    out = np.asarray(image.remap(jnp.asarray(img_dist), undistort_map(cam)))
    # compare away from the border (replication pollutes the edge)
    err = np.abs(out[10:-10, 10:-10] - expected[10:-10, 10:-10])
    assert np.percentile(err, 95) < 3.0, np.percentile(err, 95)
