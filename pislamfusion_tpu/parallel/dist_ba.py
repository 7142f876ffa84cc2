"""Distributed bundle adjustment: observation-sharded normal equations.

The LM "training step" of this framework, sharded over a device mesh: each
device holds a shard of the reprojection observations, computes its partial
normal-equation terms (Hpp, bp, Hcc, bc, U — pure sums over observations,
ops/ba._reproj_normal_terms), `psum`s them over ICI, and then every device
runs the identical small Schur-complement solve and applies the update
(replicated). Graph terms (relative SE3 edges, GPS priors) are tiny and
computed replicated.

This is the scale-out path the reference never had (SURVEY.md section 2.9:
no multi-device anything) — it lets one LM iteration over millions of
observations ride a TPU pod slice with a single psum per iteration.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import inspect

try:
    from jax import shard_map as _shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map

# jax 0.8 renamed check_rep -> check_vma
_CHECK_KW = ("check_vma" if "check_vma"
             in inspect.signature(_shard_map).parameters else "check_rep")


def shard_map(f, **kw):
    if "check_rep" in kw:
        kw[_CHECK_KW] = kw.pop("check_rep")
    return _shard_map(f, **kw)

from ..ops import ba, lie


def _pad_obs_to(problem: ba.BAProblem, multiple: int) -> ba.BAProblem:
    O = problem.obs_uv.shape[0]
    pad = (-O) % multiple
    if pad == 0:
        return problem
    return problem._replace(
        obs_frame=jnp.pad(problem.obs_frame, (0, pad)),
        obs_point=jnp.pad(problem.obs_point, (0, pad)),
        obs_uv=jnp.pad(problem.obs_uv, ((0, pad), (0, 0))),
        obs_weight=jnp.pad(problem.obs_weight, (0, pad)),
    )


def optimize_sharded(problem: ba.BAProblem, mesh: Mesh, iters: int = 15,
                     huber_delta: float = 0.0061):
    """LM bundle adjustment with observations sharded over every mesh device.

    Returns (poses, points, cost) — replicated outputs identical on all
    devices.
    """
    n_dev = mesh.devices.size
    axes = mesh.axis_names                     # e.g. ("dp", "tp")
    problem = _pad_obs_to(problem, n_dev)

    obs_spec = P(axes)                         # shard over all axes combined
    rep = P()

    in_specs = ba.BAProblem(
        poses=rep, pose_fixed=rep, points=rep, point_fixed=rep,
        obs_frame=obs_spec, obs_point=obs_spec, obs_uv=obs_spec,
        obs_weight=obs_spec,
        rel_i=rep, rel_j=rep, rel_meas=rep, rel_weight=rep,
        prior_frame=rep, prior_pose=rep, prior_info=rep)

    @functools.partial(shard_map, mesh=mesh, in_specs=(in_specs,),
                       out_specs=(rep, rep, rep), check_rep=False)
    def run(p: ba.BAProblem):
        def dist_cost(poses, points):
            pp = p._replace(poses=poses, points=points)
            # only the observation shard is device-local: psum the
            # reprojection cost; graph terms (rel edges, priors) are
            # replicated, so add them exactly once OUTSIDE the psum.
            c = jax.lax.psum(ba._reproj_cost(pp, huber_delta), axes)
            return c + ba._graph_cost(pp)

        def step(state, _):
            poses, points, lam, cost = state
            pp = p._replace(poses=poses, points=points)
            Hpp, bp, Hcc, bc, U = ba._reproj_normal_terms(pp, huber_delta)
            # the only collective of the iteration: sum partial terms
            Hpp, bp, Hcc, bc, U = jax.lax.psum((Hpp, bp, Hcc, bc, U), axes)
            S_full, Hcc, bc = ba._graph_terms(pp, Hcc, bc)
            dc, dpt = ba._schur_solve(pp, Hpp, bp, Hcc, bc, U, S_full, lam)
            new_poses = lie.se3_mul(lie.se3_exp(dc), poses)
            new_poses = jnp.where(p.pose_fixed[:, None], poses, new_poses)
            new_points = points + dpt
            new_cost = dist_cost(new_poses, new_points)
            accept = new_cost < cost
            poses = jnp.where(accept, new_poses, poses)
            points = jnp.where(accept, new_points, points)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0).clip(1e-9, 1e6)
            cost = jnp.where(accept, new_cost, cost)
            return (poses, points, lam, cost), cost

        init_cost = dist_cost(p.poses, p.points)
        (poses, points, _, cost), _ = jax.lax.scan(
            step, (p.poses, p.points, jnp.float32(1e-4), init_cost),
            None, length=iters)
        return poses, points, cost

    return jax.jit(run)(problem)
