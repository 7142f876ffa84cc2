"""ORB extractor + MXU matcher tests (reference: FeatureDetectorORB.cpp,
MatcherBoW/MatcherBFMultiH)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pislamfusion_tpu.ops.features import orb
from pislamfusion_tpu.ops import matching


def corner_image(rng, h=240, w=320, n=40):
    """Random bright rectangles on dark background -> strong corners."""
    img = np.full((h, w), 30.0, np.float32)
    img += rng.normal(0, 2.0, size=(h, w)).astype(np.float32)
    for _ in range(n):
        y, x = rng.integers(30, h - 60), rng.integers(30, w - 60)
        hh, ww = rng.integers(12, 40, 2)
        img[y:y + hh, x:x + ww] = rng.uniform(120, 240)
    return np.clip(img, 0, 255)


PARAMS = orb.OrbParams(n_features=300, n_levels=4)


@pytest.fixture(scope="module")
def img():
    return corner_image(np.random.default_rng(3))


def test_fast_score_corners():
    img = np.full((64, 64), 10.0, np.float32)
    img[20:40, 20:40] = 200.0
    s = np.asarray(orb.fast_score_map(jnp.asarray(img)))
    # corners of the square score high, flat regions zero
    assert s[20, 20] > 50
    assert s[10, 10] == 0.0
    assert s[30, 30] == 0.0  # interior is flat


def test_detect_shapes_and_validity(img):
    f = orb.orb_detect(jnp.asarray(img), PARAMS)
    n = PARAMS.n_features
    assert f["xy"].shape == (n, 2) and f["desc"].shape == (n, 256)
    nv = int(np.sum(np.asarray(f["valid"])))
    assert nv > 50, f"too few keypoints: {nv}"
    xy = np.asarray(f["xy"])[np.asarray(f["valid"])]
    assert xy[:, 0].max() < img.shape[1] and xy[:, 1].max() < img.shape[0]
    # strongest-first ordering
    resp = np.asarray(f["response"])
    v = np.asarray(f["valid"])
    rv = resp[v]
    assert np.all(np.diff(rv) <= 1e-5)


def test_pack_unpack_roundtrip(img):
    f = orb.orb_detect(jnp.asarray(img), PARAMS)
    packed = orb.pack_bits(f["desc"])
    assert packed.shape == (PARAMS.n_features, 32)
    np.testing.assert_array_equal(np.asarray(orb.unpack_bits(packed)),
                                  np.asarray(f["desc"]))


def test_descriptor_shift_matching(img):
    """Descriptors must match across a small translation."""
    sh = np.roll(img, (0, 5), (0, 1))
    fa = orb.orb_detect(jnp.asarray(img), PARAMS)
    fb = orb.orb_detect(jnp.asarray(sh), PARAMS)
    idx, ok = matching.match_descriptors(fa["desc"], fa["valid"],
                                         fb["desc"], fb["valid"], "orb",
                                         max_dist=60.0)
    idxn = np.asarray(idx)
    okn = np.asarray(ok)
    assert okn.sum() > 30, f"too few matches: {okn.sum()}"
    # matched points should be displaced by ~(+5, 0)
    xa = np.asarray(fa["xy"])[okn]
    xb = np.asarray(fb["xy"])[idxn[okn]]
    d = xb - xa
    med = np.median(d, 0)
    assert abs(med[0] - 5.0) < 1.0 and abs(med[1]) < 1.0, med


def test_rotation_angle_estimate():
    """IC_Angle tracks the intensity-centroid direction: a blob right of
    center gives angle ~0; transposing the patch moves it below center
    (angle ~pi/2)."""
    patch = np.zeros((31, 31), np.float32)
    patch[13:18, 22:28] = 200.0  # blob to the right of center (15, 15)
    a0 = float(orb.ic_angle(jnp.asarray(patch[None]))[0])
    assert abs(a0) < 0.3, a0
    a90 = float(orb.ic_angle(jnp.asarray(patch.T[None]))[0])
    assert abs(a90 - np.pi / 2) < 0.3, a90


def test_hamming_matrix_exact():
    a = jnp.asarray(np.random.default_rng(0).integers(0, 2, (8, 256)), jnp.uint8)
    b = jnp.asarray(np.random.default_rng(1).integers(0, 2, (6, 256)), jnp.uint8)
    d = np.asarray(matching.hamming_matrix(a, b))
    ref = (np.asarray(a)[:, None, :] != np.asarray(b)[None, :, :]).sum(-1)
    np.testing.assert_array_equal(d, ref)


def test_l2_matrix_exact():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(5, 128)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(7, 128)), jnp.float32)
    d = np.asarray(matching.l2sq_matrix(a, b))
    ref = ((np.asarray(a)[:, None] - np.asarray(b)[None]) ** 2).sum(-1)
    np.testing.assert_allclose(d, ref, atol=1e-3)


def test_cross_check_and_ratio():
    # b0 close to a0; b1 close to a1; b2 is a near-duplicate of b1
    a = jnp.asarray([[0, 0], [10, 0]], jnp.float32)
    b = jnp.asarray([[0, 1], [10, 1], [10, 1.1]], jnp.float32)
    d = matching.l2sq_matrix(a, b)
    valid2 = jnp.ones((2,), bool)
    valid3 = jnp.ones((3,), bool)
    idx, ok = matching.match(d, valid2, valid3, max_dist=5.0)
    assert list(np.asarray(idx)) == [0, 1]
    # ratio test kills the ambiguous a1 (b1 vs b2 nearly equal)
    idx2, ok2 = matching.match(d, valid2, valid3, max_dist=5.0, ratio=0.8)
    assert bool(ok2[0]) and not bool(ok2[1])


def test_window_mask():
    pred = jnp.asarray([[0.0, 0.0]])
    xyb = jnp.asarray([[1.0, 0.0], [10.0, 0.0]])
    m = matching.window_mask(pred, xyb, 5.0)
    assert bool(m[0, 0]) and not bool(m[0, 1])


def test_rotation_consistency():
    n = 100
    rng = np.random.default_rng(0)
    aa = jnp.zeros((n,))
    ab = jnp.full((n,), 0.5)  # consistent 0.5 rad offset
    ab = ab.at[:10].set(jnp.asarray(rng.uniform(-3, 3, 10)))  # 10 outliers
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = jnp.ones((n,), bool)
    keep = matching.rotation_consistency_mask(aa, ab, idx, valid)
    kn = np.asarray(keep)
    assert kn[10:].all()          # inliers kept
    assert kn[:10].sum() <= 4     # most outliers dropped


def test_brief_binned_matches_per_bin_tap_compare():
    """The one-dispatch +-1-difference formulation of binned BRIEF must be
    BIT-EXACT vs the definition: quantize the angle to its bin, gather the
    reference's rounded rotated taps from the bf16 patch, strict compare
    (f32 accumulation makes the matmul's sign the exact bf16 difference)."""
    rng = np.random.default_rng(7)
    n, bins = 64, 30
    G = orb._GATHER
    patches = jnp.asarray(rng.uniform(0, 255, (n, G, G)).astype(np.float32))
    angles = jnp.asarray(
        rng.uniform(-np.pi, np.pi, n).astype(np.float32))
    got = np.asarray(orb._brief_binned_dot(patches, angles, bins))
    got_sel = np.asarray(orb._brief_binned_select(patches, angles, bins))
    bf = np.asarray(patches.astype(jnp.bfloat16).astype(jnp.float32))
    bi = np.asarray(
        jnp.round(angles * (bins / (2 * np.pi))).astype(jnp.int32) % bins)
    taps_idx = orb._binned_tap_indices(bins)
    flat = bf.reshape(n, -1)
    exp = np.zeros((n, 256), np.uint8)
    for i in range(n):
        t = flat[i, taps_idx[bi[i]]]
        exp[i] = (t[:256] < t[256:]).astype(np.uint8)
    np.testing.assert_array_equal(got, exp)
    np.testing.assert_array_equal(got_sel, exp)
