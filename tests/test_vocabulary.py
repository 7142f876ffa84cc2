"""Vocabulary tests: training, batched-descent correctness vs a sequential
reference walk, .gbow round-trip, TF-IDF/L1 scoring, meanValue/distance.
Mirrors the semantics of GSLAM/GSLAM/core/Vocabulary.h."""
import numpy as np
import pytest

from pislamfusion_tpu.ops.vocabulary import (Vocabulary, TF_IDF, L1_NORM)


def _rand_binary(rng, n, d_bytes=32):
    return rng.integers(0, 256, (n, d_bytes), dtype=np.uint8)


def _rand_float(rng, n, d=128):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def voc_bin():
    rng = np.random.default_rng(0)
    train = _rand_binary(rng, 600)
    return Vocabulary.create(train, k=4, L=3), train


@pytest.fixture(scope="module")
def voc_float():
    rng = np.random.default_rng(1)
    train = _rand_float(rng, 500)
    return Vocabulary.create(train, k=5, L=2), train


def _sequential_descend(voc, d):
    """The reference's per-feature walk (Vocabulary.h:1573-1611)."""
    cur = 0
    for _ in range(voc.L):
        ch = voc.node_children[cur]
        ch = ch[ch >= 0]
        if len(ch) == 0:
            break
        dists = [Vocabulary.distance(d, voc.node_desc[c]) for c in ch]
        cur = int(ch[int(np.argmin(dists))])
    return cur


@pytest.mark.parametrize("which", ["bin", "float"])
def test_batched_descent_matches_sequential(which, voc_bin, voc_float):
    voc, train = voc_bin if which == "bin" else voc_float
    rng = np.random.default_rng(7)
    q = (_rand_binary(rng, 64) if which == "bin" else _rand_float(rng, 64))
    wid, w, nid = voc.transform_arrays(q)
    wid = np.asarray(wid)
    for i in range(len(q)):
        leaf = _sequential_descend(voc, q[i])
        assert wid[i] == voc.node_word[leaf], i


def test_words_nonempty(voc_bin):
    voc, _ = voc_bin
    assert voc.size() > 10
    assert (voc.node_weight[voc.words] >= 0).all()


def test_gbow_roundtrip(tmp_path, voc_bin):
    voc, train = voc_bin
    path = str(tmp_path / "test.gbow")
    assert voc.save(path)
    v2 = Vocabulary.load(path)
    assert v2 is not None
    assert (v2.k, v2.L, v2.scoring, v2.weighting) == \
        (voc.k, voc.L, voc.scoring, voc.weighting)
    np.testing.assert_array_equal(v2.node_desc, voc.node_desc)
    np.testing.assert_array_equal(v2.node_parent, voc.node_parent)
    np.testing.assert_allclose(v2.node_weight, voc.node_weight, atol=1e-6)
    np.testing.assert_array_equal(v2.words, voc.words)
    rng = np.random.default_rng(3)
    q = _rand_binary(rng, 32)
    w1 = np.asarray(voc.transform_arrays(q)[0])
    w2 = np.asarray(v2.transform_arrays(q)[0])
    np.testing.assert_array_equal(w1, w2)


def test_bow_scoring_self_vs_other(voc_bin):
    """A descriptor set must score ~1 against itself and lower against a
    disjoint random set (scaled L1, Nister 2006, in [0, 1])."""
    voc, train = voc_bin
    rng = np.random.default_rng(5)
    a = _rand_binary(rng, 128)
    b = _rand_binary(rng, 128)
    bow_a, _ = voc.transform(a)
    bow_b, _ = voc.transform(b)
    s_aa = voc.score(bow_a, bow_a)
    s_ab = voc.score(bow_a, bow_b)
    assert abs(s_aa - 1.0) < 1e-6
    assert 0.0 <= s_ab < s_aa


def test_feature_vector_levels(voc_bin):
    voc, _ = voc_bin
    rng = np.random.default_rng(9)
    q = _rand_binary(rng, 32)
    bow, fv = voc.transform(q, levelsup=1)
    # every feature appears exactly once across the feature vector
    feats = sorted(i for lst in fv.values() for i in lst)
    assert feats == list(range(32))
    # nodes at levelsup=1 are one level above leaves: they must have children
    for nid in fv:
        assert (voc.node_children[nid] >= 0).any()


def test_mean_value_binary():
    d = np.asarray([[0b11110000], [0b11000000], [0b11001111]], np.uint8)
    m = Vocabulary.mean_value(d)
    assert m[0] == 0b11000000  # bit-majority (>= half)


def test_distance_binary_and_float():
    a = np.asarray([0xFF, 0x00], np.uint8)
    b = np.asarray([0x0F, 0x00], np.uint8)
    assert Vocabulary.distance(a, b) == 4
    x = np.asarray([1.0, 2.0], np.float32)
    y = np.asarray([0.0, 0.0], np.float32)
    assert Vocabulary.distance(x, y) == pytest.approx(5.0)


def test_valid_mask(voc_bin):
    voc, _ = voc_bin
    rng = np.random.default_rng(11)
    q = _rand_binary(rng, 16)
    valid = np.zeros(16, bool)
    valid[:4] = True
    wid, w, nid = voc.transform_arrays(q, valid)
    wid = np.asarray(wid)
    assert (wid[4:] == -1).all() and (wid[:4] >= 0).all()
