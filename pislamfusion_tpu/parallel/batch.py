"""Data-parallel frame processing over a device mesh.

Frame-level data parallelism (`dp` axis): batches of frames are extracted
and matched simultaneously — the throughput path for offline mapping, where
the reference processed one frame at a time on one GPU. Matching's [N, M]
distance matmul additionally shards its row dimension over `tp`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.features import orb
from ..ops import matching


def batched_orb_detect(images, params: orb.OrbParams, mesh: Mesh = None):
    """images: [B, H, W] -> dict of [B, ...] feature arrays. With a mesh,
    the batch is sharded over 'dp' (and XLA parallelizes per shard)."""
    fn = jax.vmap(lambda im: orb.orb_detect(im, params))
    fn = jax.jit(fn)
    if mesh is not None:
        images = jax.device_put(
            images, NamedSharding(mesh, P("dp", None, None)))
    return fn(images)


def batched_sift_detect(images, params, mesh: Mesh = None):
    """images: [B, H, W] -> dict of [B, ...] SIFT feature arrays, batch
    sharded over 'dp' (the reference's DEFAULT detector, scaled the same
    way as ORB)."""
    from ..ops.features import sift
    fn = jax.vmap(lambda im: sift.sift_detect(im, params))
    fn = jax.jit(fn)
    if mesh is not None:
        images = jax.device_put(
            images, NamedSharding(mesh, P("dp", None, None)))
    return fn(images)


@functools.partial(jax.jit, static_argnames=("kind", "max_dist"))
def _pairwise_match(desc_a, valid_a, desc_b, valid_b, kind, max_dist):
    return matching.match_descriptors(desc_a, valid_a, desc_b, valid_b,
                                      kind, max_dist=max_dist)


def batched_consecutive_match(feats, kind: str = "orb",
                              max_dist: float = 80.0, mesh: Mesh = None,
                              wrap: bool = True):
    """Match frame t against frame t+1 for a whole batch at once.

    wrap=True matches frame B-1 back to frame 0 so the output batch keeps
    size B (stays divisible by the dp axis); wrap=False returns B-1 rows.
    [B, N, D] descriptors -> (idx [B(,-1), N], ok [B(,-1), N]).
    """
    desc = feats["desc"]
    valid = feats["valid"]
    if wrap:
        db, vb = jnp.roll(desc, -1, 0), jnp.roll(valid, -1, 0)
        da, va = desc, valid
    else:
        da, va = desc[:-1], valid[:-1]
        db, vb = desc[1:], valid[1:]
    fn = jax.vmap(lambda a, x, b, y: matching.match_descriptors(
        a, x, b, y, kind, max_dist=max_dist))
    fn = jax.jit(fn)
    if mesh is not None:
        sh = NamedSharding(mesh, P("dp"))
        da, va, db, vb = (jax.device_put(x, sh) for x in (da, va, db, vb))
    return fn(da, va, db, vb)
