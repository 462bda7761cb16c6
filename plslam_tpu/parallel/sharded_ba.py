"""Landmark-sharded global bundle adjustment over a device mesh.

The factor-graph analogue of context parallelism (SURVEY §5): global BA's
work and memory are dominated by the LANDMARK axis (points/line endpoints —
hundreds of thousands at KITTI scale), while the camera axis stays small
(≤ ~1k keyframes).  The fixed-shape `BAProblem` stores observations as a
dense (K, P) grid, so every observation of landmark p lives in column p —
sharding the landmark axis over the mesh keeps the per-landmark Hessian
blocks (Hpp), the cross blocks (Hcp) and the back-substitution entirely
local to each device.  The only cross-device data dependency is the reduced
camera system S (6K, 6K) and its RHS, assembled with ONE `psum` per LM
iteration (riding ICI), after which the small dense solve runs replicated.

This is the TPU-native equivalent of the reference's single-threaded g2o
`GlobalBundleAdjustemnt` (`src/Optimizer.cc:41-640`) at scales one chip
cannot hold; the LM schedule (robust rounds -> chi2 demotion -> rounds,
`src/Optimizer.cc:1957-2005`) is unchanged — `optim.local_ba` runs under
`shard_map` with `axis="lm"`, its accept/reject decisions driven by the
psum'd global cost so every device takes identical branches.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..optim import local_ba
from ..optim.local_ba import BAProblem, BAResult


AXIS = "lm"


def problem_specs(prob: BAProblem = None, axis: str = AXIS) -> BAProblem:
    """PartitionSpecs for a BAProblem with the landmark axes sharded.

    Mirrors `prob`'s optional fields: `obs_ur` (stereo right-column grid,
    None on mono problems — None is an empty pytree so its spec is None)
    and `bf` (a scalar, replicated)."""
    return BAProblem(
        kf_T=P(), kf_fixed=P(), kf_mask=P(),
        pt_xyz=P(axis), pt_mask=P(axis),
        obs_uv=P(None, axis), obs_mask=P(None, axis),
        obs_sigma2=P(None, axis),
        ln_xyz=P(axis), ln_mask=P(axis),
        ln_obs_l2d=P(None, axis), ln_obs_mask=P(None, axis),
        ln_info=P(axis),
        obs_ur=(P(None, axis)
                if prob is not None and prob.obs_ur is not None else None),
        bf=P(),
    )


def result_specs(axis: str = AXIS) -> BAResult:
    return BAResult(
        kf_T=P(), pt_xyz=P(axis), ln_xyz=P(axis),
        obs_inlier=P(None, axis), ln_obs_inlier=P(None, axis), cost=P())


def prepare_problem(prob: BAProblem, n_devices: int) -> BAProblem:
    """Pad the landmark axes to a multiple of the mesh size and force the
    per-line info to a (L,) array (shard_map needs every leaf shardable)."""
    Pn = prob.pt_mask.shape[0]
    Ln = prob.ln_mask.shape[0]

    def pad_to(x, n, axis, fill=0):
        want = -(-n // n_devices) * n_devices
        if want == n:
            return x
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, want - n)
        return jnp.pad(x, pad, constant_values=fill)

    ln_info = jnp.asarray(prob.ln_info, jnp.float32)
    if ln_info.ndim == 0:
        ln_info = jnp.full((Ln,), ln_info)
    if prob.obs_ur is not None:
        prob = prob._replace(obs_ur=pad_to(prob.obs_ur, Pn, 1))
    return prob._replace(
        bf=jnp.asarray(prob.bf, jnp.float32),
        pt_xyz=pad_to(prob.pt_xyz, Pn, 0),
        pt_mask=pad_to(prob.pt_mask, Pn, 0),
        obs_uv=pad_to(prob.obs_uv, Pn, 1),
        obs_mask=pad_to(prob.obs_mask, Pn, 1),
        obs_sigma2=pad_to(jnp.maximum(prob.obs_sigma2, 1e-6), Pn, 1, fill=1.0),
        ln_xyz=pad_to(prob.ln_xyz, Ln, 0),
        ln_mask=pad_to(prob.ln_mask, Ln, 0),
        ln_obs_l2d=pad_to(prob.ln_obs_l2d, Ln, 1),
        ln_obs_mask=pad_to(prob.ln_obs_mask, Ln, 1),
        ln_info=pad_to(ln_info, Ln, 0),
    )


def sharded_bundle_adjust(mesh: Mesh, prob: BAProblem, cam,
                          iters_a: int = 5, iters_b: int = 10,
                          axis: str = AXIS) -> BAResult:
    """Full staged BA (robust rounds -> demotion -> rounds -> verdicts) with
    the landmark axis sharded over `mesh`.  `prob` must be prepared with
    :func:`prepare_problem` (landmark axes divisible by the mesh size,
    per-line info as an array)."""
    fn = jax.shard_map(
        partial(local_ba.bundle_adjust, cam=cam, iters_a=iters_a,
                iters_b=iters_b, axis=axis),
        mesh=mesh, in_specs=(problem_specs(prob, axis),),
        out_specs=result_specs(axis), check_vma=False)
    return fn(prob)
