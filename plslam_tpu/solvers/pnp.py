"""Vmapped RANSAC PnP for relocalization.

TPU-native replacement for `PnPsolver` (EPnP + RANSAC,
`src/PnPsolver.cc`): instead of iterating minimal sets until an adaptive
count is hit (`iterate`, `:165`), ALL hypotheses are generated, solved and
scored in parallel.  The minimal solver is a 6-point DLT of the projection
matrix (nullvec of a 12x12 normal matrix + Procrustes rotation recovery) —
less per-sample accuracy than EPnP but RANSAC + the staged-LM refinement
that follows (as in `Tracking::Relocalization`, `src/Tracking.cc:2083`)
makes the end result equivalent.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

CHI2 = 5.991


class PnPResult(NamedTuple):
    ok: jnp.ndarray        # () bool
    T: jnp.ndarray         # (4,4) world->cam
    inliers: jnp.ndarray   # (N,) bool
    n_inliers: jnp.ndarray  # () i32


def _dlt_projection(X, uv):
    """Minimal 6-point DLT: (6,3),(6,2) -> (3,4) projection matrix (in
    normalized image coords)."""
    n = X.shape[0]
    o = jnp.ones((n,))
    z = jnp.zeros((n, 4))
    Xh = jnp.concatenate([X, o[:, None]], -1)          # (6,4)
    r1 = jnp.concatenate([Xh, z, -uv[:, 0:1] * Xh], -1)  # (6,12)
    r2 = jnp.concatenate([z, Xh, -uv[:, 1:2] * Xh], -1)
    A = jnp.concatenate([r1, r2], 0)                    # (12,12)
    A = A / jnp.maximum(jnp.linalg.norm(A, axis=-1, keepdims=True), 1e-12)
    AtA = A.T @ A
    _, v = jnp.linalg.eigh(AtA)
    P = v[:, 0].reshape(3, 4)
    return P


def _pose_from_projection(P):
    """(3,4) normalized projection -> (R, t) with R in SO(3) (Procrustes),
    sign fixed by det and cheirality handled by the caller's scoring."""
    M = P[:, :3]
    U, S, Vt = jnp.linalg.svd(M)
    d = jnp.linalg.det(U @ Vt)
    R = U @ jnp.diag(jnp.asarray([1.0, 1.0, 1.0]) * jnp.stack(
        [jnp.ones(()), jnp.ones(()), d])) @ Vt
    scale = jnp.sum(S) / 3.0 * jnp.sign(d)
    t = P[:, 3] / jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
    return R, t


def ransac_pnp(key, X, uv, mask, cam, sigma2=None, n_iters: int = 256,
               min_inliers: int = 10) -> PnPResult:
    """X: (N,3) world points, uv: (N,2) observed (undistorted) pixels,
    mask: (N,) candidate validity. Fully jitted."""
    N = X.shape[0]
    if sigma2 is None:
        sigma2 = jnp.ones((N,))
    # normalized image coordinates
    xn = jnp.stack([(uv[:, 0] - cam.cx) / cam.fx,
                    (uv[:, 1] - cam.cy) / cam.fy], -1)

    g = jax.random.gumbel(key, (n_iters, N))
    g = jnp.where(mask[None, :], g, -jnp.inf)
    _, sets = jax.lax.top_k(g, 6)                       # (iters, 6)

    def solve_one(idx):
        P = _dlt_projection(X[idx], xn[idx])
        R, t = _pose_from_projection(P)
        return R, t

    Rs, ts = jax.vmap(solve_one)(sets)                  # (iters,3,3),(iters,3)

    def score_one(R, t):
        Xc = X @ R.T + t
        z = Xc[:, 2]
        # try both sign conventions (DLT sign ambiguity)
        def count(Rr, tt):
            Xc = X @ Rr.T + tt
            z = Xc[:, 2]
            u = cam.fx * Xc[:, 0] / jnp.maximum(z, 1e-6) + cam.cx
            v = cam.fy * Xc[:, 1] / jnp.maximum(z, 1e-6) + cam.cy
            chi = ((u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2) / sigma2
            good = mask & (z > 0) & (chi < CHI2)
            return jnp.sum(good.astype(jnp.int32)), good
        n1, g1 = count(R, t)
        return n1, g1

    n_good, goods = jax.vmap(score_one)(Rs, ts)
    best = jnp.argmax(n_good)
    R, t = Rs[best], ts[best]
    T = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t)
    n = n_good[best]
    return PnPResult(ok=n >= min_inliers, T=T, inliers=goods[best], n_inliers=n)
