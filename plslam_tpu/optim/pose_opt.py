"""Pose-only Levenberg-Marquardt with staged chi2 outlier reclassification.

TPU-native replacement for `Optimizer::PoseOptimization`
(`src/Optimizer.cc:640-975`): an SE3 vertex with unary point-reprojection
edges and two unary line-endpoint edges per matched line, optimized in 4
rounds x 10 LM iterations with chi2 gates (5.991 points / 3.84 per line
endpoint) and Huber kernels dropped in the final round.

The whole optimization is ONE `lax.fori_loop` over fixed-shape padded edge
arrays: per iteration we form the 6x6 normal equations with masked einsums
(thousands of edges -> MXU/VPU reductions) and solve in closed form. It
vmaps cleanly over a batch of streams.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from . import residuals

CHI2_POINT = 5.991
CHI2_STEREO = 7.815   # 3-dof stereo edges (src/Optimizer.cc:678)
CHI2_LINE = 3.84


class PoseObs(NamedTuple):
    """Fixed-shape observation set for pose-only optimization."""

    # point edges
    pt_xyz: jnp.ndarray    # (P, 3) world points
    pt_uv: jnp.ndarray     # (P, 2) observed (undistorted) pixels
    pt_sigma2: jnp.ndarray  # (P,) per-octave variance (scale^2)
    pt_mask: jnp.ndarray   # (P,) bool — structurally present edges
    # line endpoint edges (two per matched line, flattened)
    ln_xyz: jnp.ndarray    # (L, 3) world endpoint
    ln_l2d: jnp.ndarray    # (L, 3) observed 2D line (unit-normalized normal)
    ln_mask: jnp.ndarray   # (L,) bool
    ln_info: jnp.ndarray   # (L,) information weight (reference uses 1.0)
    # stereo: per-keypoint right-image column (u_r <= 0 -> monocular edge);
    # None keeps the pure-mono 2-component program (`EdgeSE3ProjectXYZ
    # OnlyPose` vs the stereo variant, types_six_dof_expmap.h:144)
    pt_ur: jnp.ndarray = None   # (P,) or None
    bf: float = 0.0             # fx * baseline (the reference's mbf)

    @staticmethod
    def empty_lines(n: int = 1):
        return (jnp.zeros((n, 3), jnp.float32),
                jnp.asarray([[1.0, 0.0, -1e9]] * n, jnp.float32),
                jnp.zeros((n,), bool),
                jnp.ones((n,), jnp.float32))


class PoseOptResult(NamedTuple):
    T: jnp.ndarray           # (4,4) optimized pose
    pt_inlier: jnp.ndarray   # (P,) bool
    ln_inlier: jnp.ndarray   # (L,) bool
    n_inliers: jnp.ndarray   # () int32 — point inliers (the tracking gate)


def _pt_edges(cam, T, obs: PoseObs):
    """Point residual/Jacobian terms + the per-edge chi2 gate (2-dof mono
    5.991 / 3-dof stereo 7.815, `src/Optimizer.cc:676-678`)."""
    if obs.pt_ur is None:
        r, J, _, z = residuals.point_residual(cam, T, obs.pt_xyz, obs.pt_uv)
        return r, J, z, CHI2_POINT
    r, J, _, z = residuals.point_residual_stereo(
        cam, obs.bf, T, obs.pt_xyz, obs.pt_uv, obs.pt_ur)
    gate = jnp.where(obs.pt_ur > 0, CHI2_STEREO, CHI2_POINT)
    return r, J, z, gate


def _normal_equations(cam, T, obs: PoseObs, pt_in, ln_in, robust: bool):
    """Masked 6x6 H, 6 b, and per-edge chi2 values at pose T."""
    r_p, J_p, z_p, gate_p = _pt_edges(cam, T, obs)
    w_p = 1.0 / obs.pt_sigma2
    chi2_p = jnp.sum(r_p * r_p, axis=-1) * w_p
    rw_p = jnp.where(robust, residuals.huber_weight(chi2_p, gate_p), 1.0)
    m_p = (obs.pt_mask & pt_in & (z_p > 0)).astype(jnp.float32) * w_p * rw_p
    H_p = jnp.einsum("nij,nik,n->jk", J_p, J_p, m_p)
    b_p = -jnp.einsum("nij,ni,n->j", J_p, r_p, m_p)

    r_l, J_l, _, z_l = residuals.line_endpoint_residual(cam, T, obs.ln_xyz, obs.ln_l2d)
    w_l = obs.ln_info
    chi2_l = r_l * r_l * w_l
    rw_l = jnp.where(robust, residuals.huber_weight(chi2_l, CHI2_LINE), 1.0)
    m_l = (obs.ln_mask & ln_in & (z_l > 0)).astype(jnp.float32) * w_l * rw_l
    H_l = jnp.einsum("nj,nk,n->jk", J_l, J_l, m_l)
    b_l = -jnp.einsum("nj,n,n->j", J_l, r_l, m_l)

    return H_p + H_l, b_p + b_l, chi2_p, chi2_l, z_p, z_l, gate_p


def _cost(cam, T, obs: PoseObs, pt_in, ln_in, robust: bool):
    robust = jnp.asarray(robust)
    r_p, _, z_p, gate_p = _pt_edges(cam, T, obs)
    chi2_p = jnp.sum(r_p * r_p, axis=-1) / obs.pt_sigma2
    rho_p = jnp.where(robust & (chi2_p > gate_p),
                      2.0 * jnp.sqrt(gate_p * jnp.maximum(chi2_p, 0.0)) - gate_p,
                      chi2_p)
    c_p = jnp.sum(jnp.where(obs.pt_mask & pt_in & (z_p > 0), rho_p, 0.0))

    r_l, _, _, z_l = residuals.line_endpoint_residual(cam, T, obs.ln_xyz, obs.ln_l2d)
    chi2_l = r_l * r_l * obs.ln_info
    rho_l = jnp.where(robust & (chi2_l > CHI2_LINE),
                      2.0 * jnp.sqrt(CHI2_LINE * jnp.maximum(chi2_l, 0.0)) - CHI2_LINE,
                      chi2_l)
    c_l = jnp.sum(jnp.where(obs.ln_mask & ln_in & (z_l > 0), rho_l, 0.0))
    return c_p + c_l


def pose_optimize(cam, T_init, obs: PoseObs,
                  rounds: int = 4, iters_per_round: int = 10) -> PoseOptResult:
    """Run the 4x10 staged LM of `Optimizer::PoseOptimization`.

    Rounds 1-3 use Huber kernels; outliers (chi2 over gate at round end) are
    excluded from the next round but re-tested each round (matching the
    reference's re-classification at `src/Optimizer.cc:876-958`).
    """
    P = obs.pt_xyz.shape[0]
    L = obs.ln_xyz.shape[0]

    def round_body(rd, carry):
        T, pt_in, ln_in = carry
        robust = rd < rounds - 1

        def lm_body(it, state):
            T, lam, c_cur = state
            H, b, *_ = _normal_equations(cam, T, obs, pt_in, ln_in, robust)
            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(6)
            dx = jnp.linalg.solve(Hd, b)
            T_new = se3.se3_exp(dx) @ T
            c_new = _cost(cam, T_new, obs, pt_in, ln_in, robust)
            accept = (c_new < c_cur) & jnp.all(jnp.isfinite(T_new))
            T = jnp.where(accept, T_new, T)
            lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-10),
                            jnp.minimum(lam * 4.0, 1e6))
            return T, lam, jnp.where(accept, c_new, c_cur)

        c0 = _cost(cam, T, obs, pt_in, ln_in, robust)
        T, _, _ = jax.lax.fori_loop(0, iters_per_round, lm_body,
                                    (T, jnp.float32(1e-3), c0))

        # Reclassify inliers for the next round (all edges re-tested).
        _, _, chi2_p, chi2_l, z_p, z_l, gate_p = _normal_equations(
            cam, T, obs, jnp.ones(P, bool), jnp.ones(L, bool), robust)
        pt_in = (chi2_p <= gate_p) & (z_p > 0) & obs.pt_mask
        ln_in = (chi2_l <= CHI2_LINE) & (z_l > 0) & obs.ln_mask
        return T, pt_in, ln_in

    pt_in0 = obs.pt_mask
    ln_in0 = obs.ln_mask
    T, pt_in, ln_in = jax.lax.fori_loop(
        0, rounds, round_body, (T_init, pt_in0, ln_in0))
    return PoseOptResult(T, pt_in, ln_in,
                         jnp.sum(pt_in.astype(jnp.int32)))
