"""Descriptor matching on the MXU.

Replaces the reference's per-keypoint scalar loops — FLANN / brute force /
BoW-bucketed matchers (MatcherBFMultiH.cpp:265-294, MatcherBoW.cpp:186-300,
MatcherMultiH.cpp:197-450, SiftGPU's SiftMatchCU.cpp) — with dense distance
matrices computed as matmuls:

  * binary ORB:  Hamming(a, b) = |a| + |b| - 2 a.b     (bit-planes {0,1})
  * float SIFT:  L2^2(a, b)   = |a|^2 + |b|^2 - 2 a.b

followed by row/column argmin, cross-check, absolute threshold (SIFT 0.2 /
ORB 80 — MatcherBoW.cpp:133-174), Lowe ratio, windowed search masks, and the
rotation-consistency histogram (MatcherBFMultiH.cpp:296-376). All fixed-shape,
mask-driven; N, M are the padded keypoint capacities.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = 1e9


def hamming_matrix(a_bits, b_bits):
    """a_bits [N, 256], b_bits [M, 256] in {0,1} -> [N, M] float32 distances."""
    a = a_bits.astype(jnp.bfloat16)
    b = b_bits.astype(jnp.bfloat16)
    ab = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    na = jnp.sum(a_bits, -1).astype(jnp.float32)
    nb = jnp.sum(b_bits, -1).astype(jnp.float32)
    return na[:, None] + nb[None, :] - 2.0 * ab


def l2sq_matrix(a, b):
    """a [N, D], b [M, D] float -> [N, M] squared L2 distances."""
    ab = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    na = jnp.sum(a.astype(jnp.float32) ** 2, -1)
    nb = jnp.sum(b.astype(jnp.float32) ** 2, -1)
    return jnp.maximum(na[:, None] + nb[None, :] - 2.0 * ab, 0.0)


def distance_matrix(desc_a, desc_b, kind: str):
    """kind: 'orb' (Hamming over bit-planes) or 'sift' (L2, not squared —
    the reference thresholds plain L2 at 0.2 for RootSIFT)."""
    if kind == "orb":
        return hamming_matrix(desc_a, desc_b)
    return jnp.sqrt(l2sq_matrix(desc_a, desc_b))


def _masked(dist, valid_a, valid_b, extra_mask=None):
    m = valid_a[:, None] & valid_b[None, :]
    if extra_mask is not None:
        m = m & extra_mask
    return jnp.where(m, dist, _BIG)


@functools.partial(jax.jit,
                   static_argnames=("cross_check", "max_dist", "ratio"))
def match(dist, valid_a, valid_b, max_dist: float, ratio: float = 1.0,
          window_mask=None, cross_check: bool = True):
    """Nearest-neighbour matching with cross-check / threshold / ratio.

    dist: [N, M]; returns (idx [N] int32 — index into b or -1, valid [N]).
    """
    d = _masked(dist, valid_a, valid_b, window_mask)
    best = jnp.argmin(d, 1)
    bd = jnp.take_along_axis(d, best[:, None], 1)[:, 0]
    ok = bd < max_dist
    if ratio < 1.0:
        d2 = d.at[jnp.arange(d.shape[0]), best].set(_BIG)
        second = jnp.min(d2, 1)
        ok &= bd < ratio * second
    if cross_check:
        col_best = jnp.argmin(d, 0)       # [M]
        ok &= col_best[best] == jnp.arange(d.shape[0])
    return jnp.where(ok, best, -1).astype(jnp.int32), ok


def window_mask(xy_pred, xy_b, radius):
    """[N, M] mask: b within `radius` px of a's predicted location.

    Replicates findMatchWindow's grid-area candidate set
    (MapFrame::getFeaturesInArea + MatcherBoW.cpp:133-174) as a dense mask.
    radius may be scalar or per-row [N].
    """
    dx = xy_pred[:, 0:1] - xy_b[None, :, 0]
    dy = xy_pred[:, 1:2] - xy_b[None, :, 1]
    r = radius if jnp.ndim(radius) == 0 else radius[:, None]
    return (dx * dx + dy * dy) <= r * r


def rotation_consistency_mask(angle_a, angle_b, idx, valid, bins: int = 30,
                              keep: int = 3, consecutive: bool = False):
    """Rotation-histogram filter (MatcherBFMultiH.cpp:296-376): keep matches
    whose angle difference falls in the `keep` most popular of `bins` bins.

    consecutive=False keeps the `keep` individually-best bins (top-k);
    consecutive=True keeps the best CIRCULAR RUN of `keep` adjacent bins —
    the reference's exact sliding-window vote (MatcherBFMultiH.cpp:326-376),
    which tolerates an angle-difference mode that straddles a bin edge."""
    diff = angle_a - jnp.where(idx >= 0, angle_b[idx], 0.0)
    two_pi = 2.0 * jnp.pi
    diff = jnp.mod(diff, two_pi)
    bin_idx = jnp.clip((diff * bins / two_pi).astype(jnp.int32), 0, bins - 1)
    hist = jnp.zeros((bins,), jnp.int32).at[bin_idx].add(
        valid.astype(jnp.int32))
    if consecutive:
        # circular sliding-window sum of width `keep`; best start wins
        runs = sum(jnp.roll(hist, -k) for k in range(keep))   # [bins]
        start = jnp.argmax(runs)
        off = jnp.mod(bin_idx - start, bins)
        in_top = off < keep
    else:
        _, top = jax.lax.top_k(hist, keep)
        in_top = jnp.any(bin_idx[:, None] == top[None, :], -1)
    return valid & in_top


@functools.partial(jax.jit, static_argnames=("kind", "max_dist", "ratio",
                                             "cross_check"))
def _match_descriptors_jit(desc_a, valid_a, desc_b, valid_b, kind,
                           max_dist, ratio, window, cross_check):
    dist = distance_matrix(desc_a, desc_b, kind)
    return match(dist, valid_a, valid_b, max_dist, ratio, window,
                 cross_check)


def match_descriptors(desc_a, valid_a, desc_b, valid_b, kind: str,
                      max_dist: float | None = None, ratio: float = 1.0,
                      window=None, cross_check: bool = True):
    """One-call matcher. kind 'orb' -> Hamming, default threshold 80;
    kind 'sift' -> L2, default 0.2 (the reference's absolute thresholds).
    Jitted end-to-end: callers sit on the host side of a high-latency
    link, so the distance matrix + matching must be ONE dispatch."""
    if max_dist is None:
        max_dist = 80.0 if kind == "orb" else 0.2
    return _match_descriptors_jit(desc_a, valid_a, desc_b, valid_b, kind,
                                  float(max_dist), float(ratio), window,
                                  cross_check)


@functools.partial(jax.jit, static_argnames=("kind", "max_dist", "ratio",
                                             "cross_check"))
def _match_windowed_jit(desc_a, valid_a, xy_pred, desc_b, valid_b, xy_b,
                        radius, kind, max_dist, ratio, cross_check):
    w = window_mask(xy_pred, xy_b, radius)
    dist = distance_matrix(desc_a, desc_b, kind)
    return match(dist, valid_a, valid_b, max_dist, ratio, w, cross_check)


def match_descriptors_windowed(desc_a, valid_a, xy_pred, desc_b, valid_b,
                               xy_b, radius, kind: str,
                               max_dist: float | None = None,
                               ratio: float = 1.0,
                               cross_check: bool = True):
    """Windowed matcher with the window mask built IN-PROGRAM: callers that
    computed predicted pixel locations host-side (mapper dataAssociation,
    LOST-state re-match) get one dispatch instead of ~7 eager window ops +
    a jitted match. radius is traced (per-call radii don't recompile)."""
    if max_dist is None:
        max_dist = 80.0 if kind == "orb" else 0.2
    return _match_windowed_jit(desc_a, valid_a, xy_pred, desc_b, valid_b,
                               xy_b, radius, kind, float(max_dist),
                               float(ratio), cross_check)


def match_descriptors_bucketed(desc_a, valid_a, nid_a, desc_b, valid_b,
                               nid_b, kind: str,
                               max_dist: float | None = None,
                               ratio: float = 1.0,
                               cross_check: bool = True):
    """BoW-bucketed brute force (MatcherBoW.cpp:186-300): candidates are
    restricted to features sharing the vocabulary node at levelsup. The
    reference walks aligned FeatureVector buckets; here the SAME candidate
    set is a dense node-equality mask over the MXU distance matrix —
    bucketing as masking, no data-dependent loops. nid_*: [N]/[M] int32
    node ids (-1 = invalid feature)."""
    if max_dist is None:
        max_dist = 80.0 if kind == "orb" else 0.2
    return _match_bucketed_jit(desc_a, valid_a, nid_a, desc_b, valid_b,
                               nid_b, kind, float(max_dist), float(ratio),
                               cross_check)


@functools.partial(jax.jit, static_argnames=("kind", "max_dist", "ratio",
                                             "cross_check"))
def _match_bucketed_jit(desc_a, valid_a, nid_a, desc_b, valid_b, nid_b,
                        kind, max_dist, ratio, cross_check):
    same = (nid_a[:, None] == nid_b[None, :]) & (nid_a >= 0)[:, None]
    dist = distance_matrix(desc_a, desc_b, kind)
    return match(dist, valid_a, valid_b, max_dist, ratio, same,
                 cross_check)


@functools.partial(jax.jit, static_argnames=("kind", "ratio"))
def match_descriptors_batch(desc_a, valid_a, desc_b, valid_b, kind: str,
                            ratio: float = 0.8):
    """Match MANY candidate keyframes against one frame in ONE dispatch.

    desc_a: [K, Na, D] stacked candidate descriptors; valid_a: [K, Na];
    desc_b/valid_b: the frame. Returns (idx [K, Na], ok [K, Na]).

    Exists for LOST-state relocalization (TrackerOpt::relocalize,
    :1307-1350): the up-to-25-candidate sweep as one vmapped program +
    one fetch instead of a device round trip per candidate — on the
    tunneled build box a relocalization episode otherwise stalls the
    online queue for seconds (one ~30-60 ms round trip each)."""
    max_dist = 80.0 if kind == "orb" else 0.2

    def one(da, va):
        return _match_descriptors_jit(da, va, desc_b, valid_b, kind,
                                      max_dist, float(ratio), None, True)

    return jax.vmap(one)(desc_a, valid_a)


def matches_to_pairs(idx, valid):
    """Dense [N]->[M] assignment to padded pair list [(ia, ib)] with mask —
    convenience for estimators that want explicit index pairs."""
    n = idx.shape[0]
    ia = jnp.arange(n, dtype=jnp.int32)
    ib = jnp.where(valid, idx, 0)
    return jnp.stack([ia, ib], -1), valid
