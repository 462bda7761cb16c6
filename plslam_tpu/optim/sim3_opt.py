"""Sim3 refinement between two keyframes (`Optimizer::OptimizeSim3`,
`src/Optimizer.cc:2367-2562`): one Sim3 vertex, fixed matched landmark
pairs, forward + inverse projection residuals, Huber + chi2 recheck.

Jacobians come from forward-mode autodiff of the 7-dim tangent (7 JVPs per
iteration — negligible), the whole LM loop is one `lax.fori_loop`.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import sim3 as sim3_mod
from ..geometry.sim3 import Sim3

CHI2 = 10.0  # src/LoopClosing.cc:326 (th2 for OptimizeSim3)


class Sim3OptResult(NamedTuple):
    S12: Sim3
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


def optimize_sim3(cam, S12_init: Sim3, X1, X2, uv1, uv2, mask,
                  sigma2_1=None, sigma2_2=None, iters: int = 10,
                  fix_scale: bool = False) -> Sim3OptResult:
    N = X1.shape[0]
    if sigma2_1 is None:
        sigma2_1 = jnp.ones((N,))
    if sigma2_2 is None:
        sigma2_2 = jnp.ones((N,))

    def project(Xc):
        z = jnp.maximum(Xc[..., 2], 1e-6)
        return jnp.stack([cam.fx * Xc[..., 0] / z + cam.cx,
                          cam.fy * Xc[..., 1] / z + cam.cy], -1)

    def residuals(xi, S_ref: Sim3):
        S = sim3_mod.compose(sim3_mod.expmap(xi), S_ref)
        if fix_scale:
            S = Sim3(S_ref.s, S.R, S.t)
        S_inv = sim3_mod.inverse(S)
        r1 = project(sim3_mod.apply(S, X2)) - uv1       # (N,2)
        r2 = project(sim3_mod.apply(S_inv, X1)) - uv2
        return jnp.concatenate([r1 / jnp.sqrt(sigma2_1)[:, None],
                                r2 / jnp.sqrt(sigma2_2)[:, None]], 0)  # (2N,2)

    def chi2_of(S: Sim3):
        S_inv = sim3_mod.inverse(S)
        e1 = jnp.sum((project(sim3_mod.apply(S, X2)) - uv1) ** 2, -1) / sigma2_1
        e2 = jnp.sum((project(sim3_mod.apply(S_inv, X1)) - uv2) ** 2, -1) / sigma2_2
        return e1, e2

    m2 = jnp.concatenate([mask, mask])

    def huber_cost(r):
        """Huber-robustified chi2 per residual row (delta^2 = CHI2) — the
        reference attaches `RobustKernelHuber` to every Sim3 edge
        (`src/Optimizer.cc:2420-2450`); without it a handful of gross
        outliers in the guided match set drags the quadratic cost off the
        basin and the chi2 recheck then reports zero inliers."""
        c = jnp.sum(r * r, -1)
        return jnp.where(c <= CHI2, c, 2.0 * jnp.sqrt(CHI2 * c) - CHI2)

    def lm_body(_, carry):
        S, lam, inl = carry
        zero = jnp.zeros(7)
        J = jax.jacfwd(lambda xi: residuals(xi, S))(zero)   # (2N,2,7)
        r = residuals(zero, S)
        # IRLS Huber weight: d(rho)/d(chi2) clipped to [0, 1]
        c_row = jnp.sum(r * r, -1)
        hub = jnp.minimum(1.0, jnp.sqrt(CHI2 / jnp.maximum(c_row, 1e-9)))
        w = (m2 & inl).astype(jnp.float32) * hub
        H = jnp.einsum("nia,nib,n->ab", J, J, w)
        b = -jnp.einsum("nia,ni,n->a", J, r, w)
        Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-6 * jnp.eye(7)
        dx = jnp.linalg.solve(Hd, b)
        S_new = sim3_mod.compose(sim3_mod.expmap(dx), S)
        if fix_scale:
            S_new = Sim3(S.s, S_new.R, S_new.t)
        c_old = jnp.sum(jnp.where(m2 & inl, huber_cost(r), 0.0))
        r_new = residuals(zero, S_new)
        c_new = jnp.sum(jnp.where(m2 & inl, huber_cost(r_new), 0.0))
        ok = (c_new < c_old) & jnp.isfinite(c_new)
        S = Sim3(jnp.where(ok, S_new.s, S.s), jnp.where(ok, S_new.R, S.R),
                 jnp.where(ok, S_new.t, S.t))
        lam = jnp.where(ok, jnp.maximum(lam * 0.5, 1e-9), jnp.minimum(lam * 4.0, 1e6))
        return S, lam, inl

    inl0 = jnp.concatenate([mask, mask])
    S, lam, _ = jax.lax.fori_loop(0, iters, lm_body,
                                  (S12_init, jnp.float32(1e-3), inl0))
    # chi2 recheck + reoptimize (the reference's two-pass structure)
    e1, e2 = chi2_of(S)
    good = mask & (e1 < CHI2) & (e2 < CHI2)
    inl = jnp.concatenate([good, good])
    S, _, _ = jax.lax.fori_loop(0, iters, lm_body, (S, jnp.float32(1e-3), inl))
    e1, e2 = chi2_of(S)
    good = mask & (e1 < CHI2) & (e2 < CHI2)
    return Sim3OptResult(S, good, jnp.sum(good.astype(jnp.int32)))
