"""Sim3 essential-graph optimization (`Optimizer::OptimizeEssentialGraph`,
`src/Optimizer.cc:2102-2365`): 7-dof similarity poses per keyframe, relative
Sim3 edge constraints (spanning tree, covisibility >= 100, loop edges),
Levenberg-Marquardt over a dense (7K, 7K) system — dense is right-sized for
the keyframe counts SLAM maps carry (the reference's sparse machinery exists
because CPUs hate dense; the MXU prefers it).

Edge residual: e_ij = log(S_ij_meas ∘ S_j ∘ S_i^{-1}) with left-mult
updates on each node; Jacobians from forward-mode autodiff of the 14 tangent
coords of the two endpoint nodes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import sim3 as sim3_mod
from ..geometry.sim3 import Sim3


class PoseGraphEdges(NamedTuple):
    """Fixed-size edge set. i/j: (E,) node ids; meas: Sim3 measurements
    S_ij = S_i ∘ S_j^{-1} at edge creation; mask: (E,) validity."""
    i: jnp.ndarray
    j: jnp.ndarray
    meas: Sim3
    mask: jnp.ndarray
    weight: jnp.ndarray


def _edge_residual(xi_i, xi_j, S_i: Sim3, S_j: Sim3, meas: Sim3):
    Si = sim3_mod.compose(sim3_mod.expmap(xi_i), S_i)
    Sj = sim3_mod.compose(sim3_mod.expmap(xi_j), S_j)
    err = sim3_mod.compose(meas, sim3_mod.compose(Sj, sim3_mod.inverse(Si)))
    return sim3_mod.logmap(err)  # (7,)


def optimize_essential_graph(nodes: Sim3, node_mask, fixed_mask,
                             edges: PoseGraphEdges, iters: int = 20,
                             fix_scale: bool = False) -> Sim3:
    """nodes: Sim3 with batch (K,). Returns optimized Sim3 (K,)."""
    K = nodes.s.shape[0]

    def gather(S: Sim3, idx):
        return Sim3(S.s[idx], S.R[idx], S.t[idx])

    def build_system(S: Sim3, lam):
        Si = gather(S, edges.i)
        Sj = gather(S, edges.j)
        zero = jnp.zeros(7)

        def per_edge(si_s, si_R, si_t, sj_s, sj_R, sj_t, m_s, m_R, m_t):
            Si1 = Sim3(si_s, si_R, si_t)
            Sj1 = Sim3(sj_s, sj_R, sj_t)
            M1 = Sim3(m_s, m_R, m_t)
            r = _edge_residual(zero, zero, Si1, Sj1, M1)
            Ji = jax.jacfwd(lambda x: _edge_residual(x, zero, Si1, Sj1, M1))(zero)
            Jj = jax.jacfwd(lambda x: _edge_residual(zero, x, Si1, Sj1, M1))(zero)
            return r, Ji, Jj

        r, Ji, Jj = jax.vmap(per_edge)(Si.s, Si.R, Si.t, Sj.s, Sj.R, Sj.t,
                                       edges.meas.s, edges.meas.R, edges.meas.t)
        w = (edges.mask & node_mask[edges.i] & node_mask[edges.j]
             ).astype(jnp.float32) * edges.weight

        H = jnp.zeros((K, K, 7, 7))
        b = jnp.zeros((K, 7))
        Hii = jnp.einsum("eab,eac,e->ebc", Ji, Ji, w)
        Hjj = jnp.einsum("eab,eac,e->ebc", Jj, Jj, w)
        Hij = jnp.einsum("eab,eac,e->ebc", Ji, Jj, w)
        bi = -jnp.einsum("eab,ea,e->eb", Ji, r, w)
        bj = -jnp.einsum("eab,ea,e->eb", Jj, r, w)
        H = H.at[edges.i, edges.i].add(Hii)
        H = H.at[edges.j, edges.j].add(Hjj)
        H = H.at[edges.i, edges.j].add(Hij)
        H = H.at[edges.j, edges.i].add(jnp.swapaxes(Hij, -1, -2))
        b = b.at[edges.i].add(bi).at[edges.j].add(bj)

        free = (node_mask & ~fixed_mask).astype(jnp.float32)
        F = free[:, None] * free[None, :]
        H = H * F[:, :, None, None]
        b = b * free[:, None]
        diag = jnp.einsum("kkaa->ka", H)
        damp = lam * jnp.maximum(diag, 1e-6)[:, :, None] * jnp.eye(7)
        H = H.at[jnp.arange(K), jnp.arange(K)].add(
            damp + (1.0 - free)[:, None, None] * jnp.eye(7) + 1e-8 * jnp.eye(7))
        return H, b, r, w

    def total_cost(S: Sim3):
        Si = gather(S, edges.i)
        Sj = gather(S, edges.j)
        zero = jnp.zeros(7)
        r = jax.vmap(lambda a, b_, c, d, e, f, g, h, i_: _edge_residual(
            zero, zero, Sim3(a, b_, c), Sim3(d, e, f), Sim3(g, h, i_)))(
            Si.s, Si.R, Si.t, Sj.s, Sj.R, Sj.t,
            edges.meas.s, edges.meas.R, edges.meas.t)
        w = (edges.mask & node_mask[edges.i] & node_mask[edges.j]
             ).astype(jnp.float32) * edges.weight
        return jnp.sum(jnp.sum(r * r, -1) * w)

    def lm_body(_, carry):
        S, lam = carry
        H, b, _, _ = build_system(S, lam)
        Hd = H.transpose(0, 2, 1, 3).reshape(K * 7, K * 7)
        dx = jnp.linalg.solve(Hd, b.reshape(K * 7)).reshape(K, 7)
        if fix_scale:
            dx = dx.at[:, 6].set(0.0)
        dx = dx * (node_mask & ~fixed_mask)[:, None]
        S_new = sim3_mod.compose(sim3_mod.expmap(dx), S)
        c_old = total_cost(S)
        c_new = total_cost(S_new)
        ok = (c_new < c_old) & jnp.isfinite(c_new)
        S = Sim3(jnp.where(ok, S_new.s, S.s),
                 jnp.where(ok[..., None, None] if ok.ndim else ok, S_new.R, S.R),
                 jnp.where(ok, S_new.t, S.t))
        lam = jnp.where(ok, jnp.maximum(lam * 0.5, 1e-16),
                        jnp.minimum(lam * 4.0, 1e8))
        return S, lam

    # lambda init 1e-16 like the reference's essential graph (src/Optimizer.cc:2150)
    S, _ = jax.lax.fori_loop(0, iters, lm_body, (nodes, jnp.float32(1e-8)))
    return S
