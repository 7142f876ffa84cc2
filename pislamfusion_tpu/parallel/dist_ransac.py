"""Mesh-sharded RANSAC: hypothesis search fanned out over every device.

The single-chip estimators (ops/ransac.py) score a fixed vmapped hypothesis
batch. Here the batch is multiplied across the WHOLE mesh with shard_map —
each device draws its own hypothesis set from an independent key, scores it
locally, and the global best model is selected with one all_gather over the
flattened mesh axes (ICI collective; no host involvement).

This is the scale-out path SURVEY.md section 2.9 scopes as an extension
(the reference has nothing to match — EstimatorOpenCV's RANSAC loops are
single-threaded C++): D devices buy D x the hypothesis budget at the same
wall-clock, which matters for low-inlier-ratio relocalization/loop-verify
problems where budget is accuracy.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .dist_ba import shard_map   # version-compat shim (check_vma/check_rep)
from ..ops import ransac
from ..ops.ransac import RansacResult


def _flat_axes(mesh: Mesh):
    return tuple(mesh.axis_names)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "threshold", "iters_per_device"))
def find_pnp_sharded(key, p3d, p2n, valid, mesh: Mesh,
                     threshold: float = 0.01,
                     iters_per_device: int = 256) -> RansacResult:
    """PnP RANSAC with D x iters_per_device total hypotheses (D = mesh
    size). Inputs replicated; returns a replicated RansacResult identical
    in structure to ops.ransac.find_pnp's."""
    axes = _flat_axes(mesh)
    n_dev = int(np.prod([mesh.shape[a] for a in axes]))
    keys = jax.random.split(key, n_dev)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axes), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_rep=False)   # lax.scan inside; shim maps to check_vma
    def run(keys, p3d, p2n, valid):
        r = ransac.find_pnp(keys[0], p3d, p2n, valid,
                            threshold=threshold, iters=iters_per_device)
        # global best by inlier count across the flattened mesh
        counts = jax.lax.all_gather(r.score, axes)      # [D]
        models = jax.lax.all_gather(r.model, axes)          # [D, 7]
        inls = jax.lax.all_gather(r.inliers, axes)          # [D, N]
        oks = jax.lax.all_gather(r.ok, axes)                # [D]
        best = jnp.argmax(jnp.where(oks, counts, -1.0))
        return (models[best], inls[best], counts[best], oks[best])

    model, inliers, n_inl, ok = run(keys, p3d, p2n, valid)
    return RansacResult(model, inliers, n_inl, ok)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "threshold", "iters_per_device"))
def find_homography_sharded(key, pa, pb, valid, mesh: Mesh,
                            threshold: float = 3.0,
                            iters_per_device: int = 256) -> RansacResult:
    """Homography RANSAC over the mesh (same reduction as find_pnp_sharded)."""
    axes = _flat_axes(mesh)
    n_dev = int(np.prod([mesh.shape[a] for a in axes]))
    keys = jax.random.split(key, n_dev)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axes), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_rep=False)
    def run(keys, pa, pb, valid):
        r = ransac.find_homography(keys[0], pa, pb, valid,
                                   threshold=threshold,
                                   iters=iters_per_device)
        counts = jax.lax.all_gather(r.score, axes)
        models = jax.lax.all_gather(r.model, axes)
        inls = jax.lax.all_gather(r.inliers, axes)
        oks = jax.lax.all_gather(r.ok, axes)
        best = jnp.argmax(jnp.where(oks, counts, -1.0))
        return (models[best], inls[best], counts[best], oks[best])

    model, inliers, n_inl, ok = run(keys, pa, pb, valid)
    return RansacResult(model, inliers, n_inl, ok)
