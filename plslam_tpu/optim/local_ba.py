"""Local/global bundle adjustment: batched Schur-complement Levenberg-Marquardt.

TPU-native replacement for the g2o sparse block solver used by
`Optimizer::LocalBundleAdjustmentWithLine` (`src/Optimizer.cc:1645-2100`),
`BundleAdjustment` (`:59,275`) and `GlobalBundleAdjustemnt` (`:41`):

- the window is FIXED SHAPE: K camera slots, P point slots, L line slots
  (2 endpoint landmarks each), observations as dense (K, P) / (K, L) grids
  with validity masks — padding discipline instead of sparse graphs;
- landmark blocks are eliminated by a batched Schur complement (3x3 block
  inverses vmapped over landmarks, reduced camera system (6K, 6K) solved by
  Cholesky on the MXU);
- the LM loop (5 robust iters -> chi2 outlier demotion -> 10 more iters,
  matching `src/Optimizer.cc:1957-2005`) is `lax.fori_loop`s around pure
  functions, so the whole BA is one XLA program; it vmaps over independent
  windows (batched-stream mapping mode).

Lines use the reference's parameterization: each 3D line is TWO independent
XYZ endpoint landmarks; each observation contributes one signed
point-to-line residual per endpoint against the observed infinite line
(`include/lineEdge.h:270-281`), info weight 0.5 (`src/Optimizer.cc:1909`).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.triangulation import inv3x3
from . import residuals

CHI2_POINT = 5.991
CHI2_STEREO = 7.815  # 3-dof stereo point edges (src/Optimizer.cc:1734)
CHI2_LINE = 3.84  # per endpoint residual
# max landmark move per LM iteration, in map units (mono maps are
# median-depth-normalized to ~1 by the initializer)
LANDMARK_MAX_STEP = 0.25


class BAProblem(NamedTuple):
    """Fixed-shape BA window.

    K cameras, P point landmarks, L line landmarks (2 endpoints each).
    """

    kf_T: jnp.ndarray        # (K, 4, 4) world->cam
    kf_fixed: jnp.ndarray    # (K,) bool — pose held constant
    kf_mask: jnp.ndarray     # (K,) bool — slot populated
    pt_xyz: jnp.ndarray      # (P, 3)
    pt_mask: jnp.ndarray     # (P,) bool
    obs_uv: jnp.ndarray      # (K, P, 2) observed undistorted pixels
    obs_mask: jnp.ndarray    # (K, P) bool
    obs_sigma2: jnp.ndarray  # (K, P) per-obs variance (octave scale^2)
    # lines (endpoints a/b stacked on axis -2)
    ln_xyz: jnp.ndarray      # (L, 2, 3) endpoint world positions
    ln_mask: jnp.ndarray     # (L,) bool
    ln_obs_l2d: jnp.ndarray  # (K, L, 3) observed 2D infinite line (unit normal)
    ln_obs_mask: jnp.ndarray  # (K, L) bool
    # scalar, or (L,) per-line information: base 0.5 (`src/Optimizer.cc:1909`)
    # scaled by each line's triangulation conditioning (MapState.ln_cond) so
    # short-baseline triangulations cannot corrupt the window
    ln_info: float = 0.5
    # stereo: per-observation right-image column; <= 0 marks a monocular
    # observation. None keeps the pure-mono 2-component program
    # (`EdgeStereoSE3ProjectXYZ`, types_six_dof_expmap.h:144)
    obs_ur: jnp.ndarray = None   # (K, P) or None
    bf: float = 0.0              # fx * baseline (the reference's mbf)

    @staticmethod
    def empty_lines(K: int, L: int = 1):
        return dict(
            ln_xyz=jnp.zeros((L, 2, 3), jnp.float32),
            ln_mask=jnp.zeros((L,), bool),
            ln_obs_l2d=jnp.broadcast_to(
                jnp.asarray([1.0, 0.0, -1e9], jnp.float32), (K, L, 3)),
            ln_obs_mask=jnp.zeros((K, L), bool),
        )


class BAResult(NamedTuple):
    kf_T: jnp.ndarray
    pt_xyz: jnp.ndarray
    ln_xyz: jnp.ndarray
    obs_inlier: jnp.ndarray     # (K, P) bool — post-BA chi2 verdict
    ln_obs_inlier: jnp.ndarray  # (K, L) bool
    cost: jnp.ndarray


def _point_terms(prob: BAProblem, kf_T, pt_xyz, obs_w, cam):
    """Residuals/Jacobians for every (camera, point) cell.

    Returns r (K,P,C), Jc (K,P,C,6), Jp (K,P,C,3), chi2 (K,P), depth (K,P),
    gate (K,P) — C = 2 mono-only, 3 when the window carries stereo
    observations (the per-edge chi2 gate is then 7.815 for stereo cells,
    5.991 for mono, `src/Optimizer.cc:1729-1735`).
    """
    K, P = prob.obs_mask.shape
    Xw = jnp.broadcast_to(pt_xyz[None], (K, P, 3))
    T = jnp.broadcast_to(kf_T[:, None], (K, P, 4, 4))
    if prob.obs_ur is None:
        r, Jc, Jp, z = residuals.point_residual(cam, T, Xw, prob.obs_uv)
        gate = jnp.full((K, P), CHI2_POINT, jnp.float32)
    else:
        r, Jc, Jp, z = residuals.point_residual_stereo(
            cam, prob.bf, T, Xw, prob.obs_uv, prob.obs_ur)
        gate = jnp.where(prob.obs_ur > 0, CHI2_STEREO, CHI2_POINT)
    chi2 = jnp.sum(r * r, axis=-1) / prob.obs_sigma2
    return r, Jc, Jp, chi2, z, gate


def _ln_w(prob: BAProblem):
    """Line information as a (K, L, 2)-broadcastable weight."""
    w = jnp.asarray(prob.ln_info, jnp.float32)
    return w if w.ndim == 0 else w[None, :, None]


def _line_terms(prob: BAProblem, kf_T, ln_xyz, cam):
    """Per (camera, line, endpoint): scalar residual vs observed line.

    Returns r (K,L,2), Jc (K,L,2,6), Jp (K,L,2,3), chi2 (K,L,2), z (K,L,2).
    """
    K = prob.kf_T.shape[0]
    L = prob.ln_mask.shape[0]
    Xw = jnp.broadcast_to(ln_xyz[None], (K, L, 2, 3))
    T = jnp.broadcast_to(kf_T[:, None, None], (K, L, 2, 4, 4))
    l2d = jnp.broadcast_to(prob.ln_obs_l2d[:, :, None, :], (K, L, 2, 3))
    r, Jc, Jp, z = residuals.line_endpoint_residual(cam, T, Xw, l2d)
    chi2 = r * r * _ln_w(prob)
    return r, Jc, Jp, chi2, z


def _psum(x, axis):
    return jax.lax.psum(x, axis) if axis is not None else x


def _solve_lm_step(prob, cam, kf_T, pt_xyz, ln_xyz, obs_in, ln_in, lam, robust,
                   axis=None):
    """One damped normal-equations solve with Schur elimination of landmarks.

    `axis`: optional mesh-axis name when running under `shard_map` with the
    LANDMARK dimension sharded (parallel/sharded_ba.py).  The dense (K, P)
    observation grid keeps every observation of landmark p in column p, so
    a landmark shard owns all of its landmarks' data: Hpp/Hcp/back-
    substitution stay local and only the reduced camera system (S, bs) is
    `psum`ed over ICI — the sharded-GBA scale-out pattern (SURVEY §5)."""
    K, P = prob.obs_mask.shape
    L = prob.ln_mask.shape[0]

    r, Jc, Jp, chi2, z, gate = _point_terms(prob, kf_T, pt_xyz, None, cam)
    w = 1.0 / prob.obs_sigma2
    rw = jnp.where(robust, residuals.huber_weight(chi2, gate), 1.0)
    m = (prob.obs_mask & obs_in & (z > 0)).astype(jnp.float32) * w * rw  # (K,P)

    # Camera blocks
    Hcc = jnp.einsum("kpia,kpib,kp->kab", Jc, Jc, m)          # (K,6,6)
    bc = -jnp.einsum("kpia,kpi,kp->ka", Jc, r, m)             # (K,6)
    # Point blocks
    Hpp = jnp.einsum("kpia,kpib,kp->pab", Jp, Jp, m)          # (P,3,3)
    bp = -jnp.einsum("kpia,kpi,kp->pa", Jp, r, m)             # (P,3)
    # Cross terms
    Hcp = jnp.einsum("kpia,kpib,kp->kpab", Jc, Jp, m)         # (K,P,6,3)

    # --- line endpoint landmarks (treated exactly like 3-dof points) ---
    rl, Jcl, Jpl, chi2l, zl = _line_terms(prob, kf_T, ln_xyz, cam)
    wl = _ln_w(prob)
    rwl = jnp.where(robust, residuals.huber_weight(chi2l, CHI2_LINE), 1.0)
    ml = (prob.ln_obs_mask[:, :, None] & ln_in[:, :, None] & (zl > 0)
          ).astype(jnp.float32) * wl * rwl                     # (K,L,2)

    Hcc = Hcc + jnp.einsum("klea,kleb,kle->kab", Jcl, Jcl, ml)
    bc = bc - jnp.einsum("klea,kle,kle->ka", Jcl, rl, ml)
    Hll = jnp.einsum("klea,kleb,kle->leab", Jpl, Jpl, ml)      # (L,2,3,3)
    bl = -jnp.einsum("klea,kle,kle->lea", Jpl, rl, ml)         # (L,2,3)
    Hcl = jnp.einsum("klea,kleb,kle->kleab", Jcl, Jpl, ml)     # (K,L,2,6,3)

    # --- damping + fixed-landmark masking ---
    pt_free = prob.pt_mask
    ln_free = prob.ln_mask
    eye3 = jnp.eye(3)
    Hpp_d = Hpp + lam * eye3 * jnp.maximum(
        jnp.einsum("pii->p", Hpp)[:, None, None] / 3.0, 1e-6) + 1e-6 * eye3
    Hll_d = Hll + lam * eye3 * jnp.maximum(
        jnp.einsum("leii->le", Hll)[..., None, None] / 3.0, 1e-6) + 1e-6 * eye3
    # closed-form 3x3 inverses: generic batched linalg.inv lowers to slow
    # factorization kernels on TPU
    Hpp_inv = inv3x3(Hpp_d) * pt_free[:, None, None]
    Hll_inv = inv3x3(Hll_d) * ln_free[:, None, None, None]

    # --- Schur complement ---
    # S[k,l'] = Hcc diag - sum_p Hcp[k,p] Hpp_inv[p] Hcp[l',p]^T  (+ lines)
    S = -jnp.einsum("kpab,pbc,qpdc->kqad", Hcp, Hpp_inv, Hcp)
    S = S - jnp.einsum("kleab,lebc,qledc->kqad", Hcl, Hll_inv, Hcl)
    S = S.at[jnp.arange(K), jnp.arange(K)].add(Hcc)
    bs = bc - jnp.einsum("kpab,pbc,pc->ka", Hcp, Hpp_inv, bp)
    bs = bs - jnp.einsum("kleab,lebc,lec->ka", Hcl, Hll_inv, bl)
    # landmark-sharded: assemble the global reduced camera system over the
    # mesh; the (dense, small) solve below then runs replicated per device
    S = _psum(S, axis)
    bs = _psum(bs, axis)

    # Fix cameras: zero rows/cols, identity diagonal.
    free_c = (prob.kf_mask & ~prob.kf_fixed).astype(jnp.float32)
    Fc = free_c[:, None] * free_c[None, :]
    S = S * Fc[:, :, None, None]
    bs = bs * free_c[:, None]
    # damp camera diagonal + identity for fixed slots
    diagS = jnp.einsum("kkaa->ka", S)  # (K, 6)
    damp = lam * jnp.maximum(diagS, 1e-6)[:, :, None] * jnp.eye(6)
    S = S.at[jnp.arange(K), jnp.arange(K)].add(
        damp + (1.0 - free_c)[:, None, None] * jnp.eye(6) + 1e-6 * jnp.eye(6))

    Sd = S.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
    dc = jnp.linalg.solve(Sd, bs.reshape(K * 6)).reshape(K, 6)
    dc = dc * free_c[:, None]

    # back-substitute landmarks
    dp = jnp.einsum("pab,pb->pa", Hpp_inv,
                    bp - jnp.einsum("kpab,ka->pb", Hcp, dc))
    dl = jnp.einsum("leab,leb->lea", Hll_inv,
                    bl - jnp.einsum("kleab,ka->leb", Hcl, dc))
    dp = dp * pt_free[:, None]
    dl = dl * ln_free[:, None, None]
    # Per-landmark trust region: near-singular landmark blocks (e.g. a line
    # endpoint seen in 2 nearly-coplanar views) otherwise launch landmarks
    # to infinity along their weakly-observed directions.
    def clamp(d, max_step):
        n = jnp.linalg.norm(d, axis=-1, keepdims=True)
        return d * jnp.minimum(1.0, max_step / jnp.maximum(n, 1e-12))
    dp = clamp(dp, LANDMARK_MAX_STEP)
    dl = clamp(dl, LANDMARK_MAX_STEP)

    kf_T_new = se3.se3_exp(dc) @ kf_T
    kf_T_new = jnp.where((prob.kf_mask & ~prob.kf_fixed)[:, None, None],
                         kf_T_new, kf_T)
    return kf_T_new, pt_xyz + dp, ln_xyz + dl


def _total_cost(prob, cam, kf_T, pt_xyz, ln_xyz, obs_in, ln_in, robust,
                axis=None):
    _, _, _, chi2, z, gate = _point_terms(prob, kf_T, pt_xyz, None, cam)
    rho = jnp.where(jnp.asarray(robust) & (chi2 > gate),
                    2.0 * jnp.sqrt(gate * jnp.maximum(chi2, 0.0)) - gate,
                    chi2)
    c = jnp.sum(jnp.where(prob.obs_mask & obs_in & (z > 0), rho, 0.0))
    _, _, _, chi2l, zl = _line_terms(prob, kf_T, ln_xyz, cam)
    rhol = jnp.where(jnp.asarray(robust) & (chi2l > CHI2_LINE),
                     2.0 * jnp.sqrt(CHI2_LINE * jnp.maximum(chi2l, 0.0)) - CHI2_LINE,
                     chi2l)
    c = c + jnp.sum(jnp.where(
        prob.ln_obs_mask[:, :, None] & ln_in[:, :, None] & (zl > 0), rhol, 0.0))
    return _psum(c, axis)


class LMState(NamedTuple):
    """Resumable LM solver state: the unit of cooperative interruption.

    The reference runs global BA in a detachable thread with an abort flag
    checked between solver iterations (`mbStopGBA`, `src/LoopClosing.cc:
    575-579`; `mbAbortBA` for local BA, `src/LocalMapping.cc:140`).  The
    TPU-native equivalent: the LM loop is cut into per-round programs over
    this state, the host dispatches one round at a time between tracking
    frames and can simply stop dispatching (abort) or run rounds to
    completion (finish)."""
    kf_T: jnp.ndarray
    pt_xyz: jnp.ndarray
    ln_xyz: jnp.ndarray
    obs_in: jnp.ndarray
    ln_in: jnp.ndarray
    lam: jnp.ndarray
    cost: jnp.ndarray


def ba_init(prob: BAProblem, cam, robust: bool = True, axis=None) -> LMState:
    c0 = _total_cost(prob, cam, prob.kf_T, prob.pt_xyz, prob.ln_xyz,
                     prob.obs_mask, prob.ln_obs_mask, robust, axis=axis)
    return LMState(prob.kf_T, prob.pt_xyz, prob.ln_xyz,
                   prob.obs_mask, prob.ln_obs_mask, jnp.float32(1e-4), c0)


def ba_rounds(prob: BAProblem, cam, st: LMState, n_iters: int,
              robust: bool = True, axis=None) -> LMState:
    """Run `n_iters` LM iterations from `st` (one resumable program).

    With `axis` set (landmark-sharded shard_map), the psum'd cost makes the
    accept/reject decision identical on every device."""
    def body(i, s):
        T2, p2, l2 = _solve_lm_step(prob, cam, s.kf_T, s.pt_xyz, s.ln_xyz,
                                    s.obs_in, s.ln_in, s.lam, robust,
                                    axis=axis)
        c_new = _total_cost(prob, cam, T2, p2, l2, s.obs_in, s.ln_in, robust,
                            axis=axis)
        ok = (c_new < s.cost) & jnp.isfinite(c_new)
        return LMState(
            kf_T=jnp.where(ok, T2, s.kf_T),
            pt_xyz=jnp.where(ok, p2, s.pt_xyz),
            ln_xyz=jnp.where(ok, l2, s.ln_xyz),
            obs_in=s.obs_in, ln_in=s.ln_in,
            lam=jnp.where(ok, jnp.maximum(s.lam * 0.5, 1e-9),
                          jnp.minimum(s.lam * 4.0, 1e8)),
            cost=jnp.where(ok, c_new, s.cost))

    return jax.lax.fori_loop(0, n_iters, body, st)


def ba_demote(prob: BAProblem, cam, st: LMState, axis=None) -> LMState:
    """Chi2 outlier demotion between the two LM phases
    (`src/Optimizer.cc:1957-2005`); resets lambda and the reference cost."""
    _, _, _, chi2, z, gate = _point_terms(prob, st.kf_T, st.pt_xyz, None, cam)
    obs_in = prob.obs_mask & (chi2 <= gate) & (z > 0)
    _, _, _, chi2l, zl = _line_terms(prob, st.kf_T, st.ln_xyz, cam)
    ln_ep_ok = (chi2l <= CHI2_LINE) & (zl > 0)
    ln_in = prob.ln_obs_mask & ln_ep_ok[..., 0] & ln_ep_ok[..., 1]
    c0 = _total_cost(prob, cam, st.kf_T, st.pt_xyz, st.ln_xyz, obs_in,
                     ln_in, True, axis=axis)
    return st._replace(obs_in=obs_in, ln_in=ln_in, lam=jnp.float32(1e-4),
                       cost=c0)


def ba_finalize(prob: BAProblem, cam, st: LMState, axis=None) -> BAResult:
    """Final chi2 verdicts (observations to erase from the map)."""
    _, _, _, chi2, z, gate = _point_terms(prob, st.kf_T, st.pt_xyz, None, cam)
    obs_inlier = prob.obs_mask & (chi2 <= gate) & (z > 0)
    _, _, _, chi2l, zl = _line_terms(prob, st.kf_T, st.ln_xyz, cam)
    lep = (chi2l <= CHI2_LINE) & (zl > 0)
    ln_obs_inlier = prob.ln_obs_mask & lep[..., 0] & lep[..., 1]
    cost = _total_cost(prob, cam, st.kf_T, st.pt_xyz, st.ln_xyz, obs_inlier,
                       ln_obs_inlier, False, axis=axis)
    return BAResult(st.kf_T, st.pt_xyz, st.ln_xyz, obs_inlier,
                    ln_obs_inlier, cost)


def bundle_adjust(prob: BAProblem, cam, iters_a: int = 5, iters_b: int = 10,
                  axis=None) -> BAResult:
    """5 robust iters -> demote chi2 outliers -> 10 iters -> final verdicts,
    replicating the staged schedule of `LocalBundleAdjustmentWithLine`
    (`src/Optimizer.cc:1957-2005`). Fully jitted; composed from the
    resumable ba_init/ba_rounds/ba_demote/ba_finalize pieces that also back
    the asynchronous global BA."""
    st = ba_init(prob, cam, axis=axis)
    st = ba_rounds(prob, cam, st, iters_a, robust=True, axis=axis)
    st = ba_demote(prob, cam, st, axis=axis)
    st = ba_rounds(prob, cam, st, iters_b, robust=True, axis=axis)
    return ba_finalize(prob, cam, st, axis=axis)
