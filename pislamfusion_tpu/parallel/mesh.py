"""Device-mesh helpers for scale-out.

The reference has no multi-device story (SURVEY.md section 2.9: pthreads +
queues only); this module is the framework's extension point: frame-level
data parallelism (`dp`) and intra-problem tensor parallelism (`tp` — RANSAC
hypothesis shards, matching-matrix shards, BA observation shards) over ICI
via `jax.sharding.Mesh` + shard_map, with XLA collectives doing the
reductions.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def default_mesh_shape(n_devices: int) -> Tuple[int, int]:
    """Split devices into (dp, tp): tp gets factors up to 4, dp the rest."""
    tp = 1
    for cand in (4, 2):
        if n_devices % cand == 0:
            tp = cand
            break
    return n_devices // tp, tp


def make_mesh(devices: Sequence = None, shape: Tuple[int, int] = None,
              axis_names=("dp", "tp")) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = default_mesh_shape(n)
    assert shape[0] * shape[1] == n, (shape, n)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def shard_batch(mesh: Mesh, x, axis: str = "dp"):
    """Place a batched array with its leading axis sharded over `axis`."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))
