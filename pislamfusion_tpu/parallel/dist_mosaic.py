"""Sharded orthomosaic compositing: the canvas pyramid striped over the mesh.

The mosaic feed is the heaviest per-pixel workload (homography warp +
Laplacian pyramid + per-band max-weight composite over a canvas that grows
with survey extent — MultiBandMap2DCPU.cpp:311-558 / UtilGPU.cu). The canvas
lives in HBM; striping its ROWS across the device mesh splits both the
memory footprint and the composite bandwidth, which is what lets one canvas
scale past a single chip's HBM.

GSPMD does the partitioning: the feed scan is a plain jnp program with the
canvas constrained to a row-striped layout; XLA turns each
dynamic-update-slice into shard-local updates + halo exchanges where a
patch straddles a stripe boundary. No per-shard index math in user code —
this is the sharding-annotation recipe (mesh -> constraints -> collectives),
not hand-written RDMA.
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import mosaic as M


def canvas_shardings(mesh: Mesh, bands: int):
    """Row-striped shardings for the canvas pyramid (every band level keeps
    the same row partitioning; all mesh axes combined stripe dim 0)."""
    s = NamedSharding(mesh, P(mesh.axis_names))
    return [s] * (bands + 1), [s] * (bands + 1)


def shard_canvas(canvas_lap: List[jnp.ndarray], canvas_w: List[jnp.ndarray],
                 mesh: Mesh):
    """Place an allocated canvas pyramid onto the mesh, row-striped."""
    lap_sh, w_sh = canvas_shardings(mesh, len(canvas_lap) - 1)
    lap = [jax.device_put(c, s) for c, s in zip(canvas_lap, lap_sh)]
    w = [jax.device_put(c, s) for c, s in zip(canvas_w, w_sh)]
    return lap, w


@functools.lru_cache(maxsize=8)
def _build_feed(mesh: Mesh, bands: int, patch_hw: Tuple[int, int],
                weight_type: int):
    """Per-(mesh, shape) compiled multi-frame feed. mesh=None -> no
    sharding constraints (single device)."""
    if mesh is not None:
        lap_sh, w_sh = canvas_shardings(mesh, bands)
    else:
        lap_sh = w_sh = [None] * (bands + 1)

    def pin(arrs, shs):
        return [a if s is None else jax.lax.with_sharding_constraint(a, s)
                for a, s in zip(arrs, shs)]

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def feed(canvas_lap, canvas_w, imgs, h_mats, origins_yx):
        def step(carry, inp):
            lap, w = carry
            img, Hm, oyx = inp
            lap, w = M.composite_frame(lap, w, img, Hm, oyx, bands=bands,
                                       patch_hw=patch_hw,
                                       weight_type=weight_type)
            # keep the carry pinned to the striped layout so XLA never
            # gathers the whole canvas onto one device between steps
            return (pin(lap, lap_sh), pin(w, w_sh)), 0

        (canvas_lap, canvas_w), _ = jax.lax.scan(
            step, (canvas_lap, canvas_w), (imgs, h_mats, origins_yx))
        return canvas_lap, canvas_w

    return feed


def feed_frames(canvas_lap, canvas_w, imgs, h_mats, origins_yx, bands: int,
                patch_hw: Tuple[int, int], mesh: Mesh = None,
                weight_type: int = 0):
    """Composite a batch of frames into the canvas. With a mesh, the canvas
    is row-striped across it and stays distributed between frames. imgs
    [K, H, W, 3]; h_mats [K, 3, 3]; origins_yx [K, 2] (tile-aligned)."""
    if mesh is not None:
        canvas_lap, canvas_w = shard_canvas(canvas_lap, canvas_w, mesh)
    feed = _build_feed(mesh, int(bands), tuple(patch_hw), int(weight_type))
    return feed(canvas_lap, canvas_w, jnp.asarray(imgs),
                jnp.asarray(h_mats), jnp.asarray(origins_yx, jnp.int32))
