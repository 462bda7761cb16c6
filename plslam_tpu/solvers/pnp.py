"""Vmapped RANSAC PnP for relocalization.

TPU-native replacement for `PnPsolver` (EPnP + RANSAC,
`src/PnPsolver.cc`): instead of iterating minimal sets until an adaptive
count is hit (`iterate`, `:165`), ALL hypotheses are generated, solved and
scored in parallel.

The minimal solver is EPnP (Lepetit et al. IJCV'09, re-derived here from
the published algorithm — the reference implements the same:
`choose_control_points` PCA `src/PnPsolver.cc:375`, barycentric coords
`:411`, M-matrix nullspace `:436`, betas + Gauss-Newton `:667-858`,
Procrustes R,t recovery `:569`) on the reference's 4-point minimal sets,
with a case-1 beta start + 5 Gauss-Newton iterations on the 6 control-
point distance constraints. The previous 6-point DLT minimal solver is
kept as `_dlt_projection` for A/B (`minimal="dlt"`): EPnP's smaller sets
raise the all-inlier sample probability (eps^4 vs eps^6) and its
per-sample pose is markedly less noisy (see tests/test_optim.py EPnP
cases).
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


def _procrustes_rt(Xw, Xc):
    """Rigid (R, t) minimizing ||R Xw + t - Xc|| — `estimate_R_and_t`
    (`src/PnPsolver.cc:569`), closed-form SVD."""
    mw = Xw.mean(0)
    mc = Xc.mean(0)
    H = (Xw - mw).T @ (Xc - mc)
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.linalg.det(Vt.T @ U.T)
    D = jnp.diag(jnp.stack([jnp.ones(()), jnp.ones(()), d]))
    R = Vt.T @ D @ U.T
    t = mc - R @ mw
    return R, t


_PAIR_I = jnp.asarray([0, 0, 0, 1, 1, 2])
_PAIR_J = jnp.asarray([1, 2, 3, 2, 3, 3])


def _epnp_minimal(X, xn):
    """EPnP on one minimal set: X (S,3) world, xn (S,2) normalized image
    coords -> (R, t). Case-1 beta start + Gauss-Newton on the 6 pairwise
    control-point distance constraints (cf `src/PnPsolver.cc:667-858`)."""
    S = X.shape[0]
    # control points: centroid + principal directions (choose_control_points)
    c0 = X.mean(0)
    A = X - c0
    cov = A.T @ A / S
    w, V = jnp.linalg.eigh(cov)                    # ascending
    sc = jnp.sqrt(jnp.maximum(w, 1e-12))
    C = jnp.concatenate([c0[None, :],
                         c0[None, :] + sc[:, None] * V.T], 0)   # (4,3)
    # barycentric coordinates: [C^T;1] a_i = [X_i;1]
    Ch = jnp.concatenate([C.T, jnp.ones((1, 4))], 0)            # (4,4)
    Xh = jnp.concatenate([X.T, jnp.ones((1, S))], 0)            # (4,S)
    alpha = jnp.linalg.solve(Ch, Xh).T                          # (S,4)

    # M (2S, 12): fill_M with fx=fy=1, cx=cy=0 (normalized coords)
    zeros = jnp.zeros((S, 4))
    mu = jnp.stack([alpha, zeros, -alpha * xn[:, 0:1]], -1)     # (S,4,3)
    mv = jnp.stack([zeros, alpha, -alpha * xn[:, 1:2]], -1)
    M = jnp.concatenate([mu.reshape(S, 12), mv.reshape(S, 12)], 0)
    _, Vm = jnp.linalg.eigh(M.T @ M)
    nullv = Vm[:, :4]                                           # (12,4)

    dw = C[_PAIR_I] - C[_PAIR_J]
    rho = jnp.sum(dw * dw, -1)                                  # (6,)
    Vc = nullv.T.reshape(4, 4, 3)                               # (4 vecs,4 cp,3)
    dv = Vc[:, _PAIR_I, :] - Vc[:, _PAIR_J, :]                  # (4,6,3)

    # case-1 start: x = beta * v1
    d1 = jnp.sum(dv[0] * dv[0], -1)
    b1 = jnp.sum(jnp.sqrt(jnp.maximum(d1, 1e-18))
                 * jnp.sqrt(rho)) / jnp.maximum(jnp.sum(d1), 1e-18)
    betas0 = jnp.stack([b1, 0.0, 0.0, 0.0])

    # Gauss-Newton on f_k(beta) = ||sum_i beta_i dv_i[k]||^2 - rho_k
    G = jnp.einsum(" akd,bkd->kab", dv, dv)                     # (6,4,4)

    def gn_step(_, b):
        f = jnp.einsum("a,kab,b->k", b, G, b) - rho             # (6,)
        J = 2.0 * jnp.einsum("kab,b->ka", G, b)                 # (6,4)
        JtJ = J.T @ J + 1e-9 * jnp.eye(4)
        db = jnp.linalg.solve(JtJ, J.T @ f)
        return b - db

    betas = jax.lax.fori_loop(0, 5, gn_step, betas0)
    Cc = jnp.einsum("a,acd->cd", betas, Vc)                     # (4,3) cam
    Xc = alpha @ Cc                                             # (S,3)
    # depth-sign fix (compute_ccs/compute_pcs sign convention)
    flip = jnp.sum(Xc[:, 2]) < 0
    Xc = jnp.where(flip, -Xc, Xc)
    return _procrustes_rt(X, Xc)


def ransac_pnp(key, X, uv, mask, cam, sigma2=None, n_iters: int = 256,
               min_inliers: int = 10, minimal: str = "epnp") -> PnPResult:
    """X: (N,3) world points, uv: (N,2) observed (undistorted) pixels,
    mask: (N,) candidate validity. Fully jitted; all minimal sets solved
    and scored in parallel. `minimal`: "epnp" (reference-parity 4-point
    sets) or "dlt" (the former 6-point projective solver)."""
    N = X.shape[0]
    if sigma2 is None:
        sigma2 = jnp.ones((N,))
    # normalized image coordinates
    xn = jnp.stack([(uv[:, 0] - cam.cx) / cam.fx,
                    (uv[:, 1] - cam.cy) / cam.fy], -1)

    n_min = 4 if minimal == "epnp" else 6
    g = jax.random.gumbel(key, (n_iters, N))
    g = jnp.where(mask[None, :], g, -jnp.inf)
    _, sets = jax.lax.top_k(g, n_min)                   # (iters, n_min)

    def solve_one(idx):
        if minimal == "epnp":
            return _epnp_minimal(X[idx], xn[idx])
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
