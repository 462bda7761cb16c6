"""Multi-stream scale-out: data parallelism over camera streams + sharded BA.

The reference is one camera per process (SURVEY §2.7 P6 — absent).  The
TPU-native scale-out axis is a leading `stream` batch dimension: extraction,
matching and pose optimization are pure functions, so `vmap` + `pjit` over a
`jax.sharding.Mesh` turns the per-frame pipeline into an S-stream batched
program whose shards ride ICI — the framework's replacement for a NCCL/MPI
"distributed backend".

Global BA at scale shards the *observation/edge* dimension instead (the
factor-graph cousin of context parallelism, SURVEY §5): each device reduces
its edge shard into camera-system blocks and a `psum` over the mesh
assembles the full reduced system — XLA collectives instead of hand-written
comms.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import tracking
from ..optim import pose_opt, residuals


def make_mesh(n_devices: int | None = None, axis: str = "stream") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (axis,))


def batched_track_step(cam, scale_factors, sigma2_levels, n_levels, scale):
    """vmapped `track_local_map` over a leading stream axis. Returns a
    function (ms_batch, feats_batch, T_pred_batch) -> TrackResult batch."""
    f = partial(tracking.track_local_map, cam,
                scale_factors=scale_factors, sigma2_levels=sigma2_levels,
                n_levels=n_levels, scale=scale)
    return jax.vmap(f)


def shard_streams(mesh: Mesh, tree, axis: str = "stream"):
    """Place a stream-batched pytree with its leading axis sharded over the
    mesh; scalars/replicated leaves stay replicated."""
    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, NamedSharding(mesh, P(axis)))
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map(put, tree)


# ----------------------------------------------------------------------
# Edge-sharded pose optimization: the reduced normal equations of a pose
# (or BA camera block) are a sum over observation edges; shard the edge
# axis over the mesh and psum the 6x6/6 blocks — the pattern that scales
# global BA over ICI.
# ----------------------------------------------------------------------

def sharded_pose_normal_equations(mesh: Mesh, cam, T, pt_xyz, pt_uv, pt_w,
                                  axis: str = "edge"):
    """Compute H (6,6), b (6,) of a pose-only GN step with the edge arrays
    sharded over `axis`. Runs under shard_map; each device reduces its shard
    and `psum` assembles the global system."""

    def local_reduce(T_rep, xyz, uv, w):
        r, J, _, z = residuals.point_residual(cam, T_rep, xyz, uv)
        m = w * (z > 0)
        H = jnp.einsum("nij,nik,n->jk", J, J, m)
        b = -jnp.einsum("nij,ni,n->j", J, r, m)
        H = jax.lax.psum(H, axis)
        b = jax.lax.psum(b, axis)
        return H, b

    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # older jax
        from jax.experimental.shard_map import shard_map
    fn = shard_map(
        local_reduce, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
    )
    return fn(T, pt_xyz, pt_uv, pt_w)
