"""Two-view monocular bootstrap: parallel-hypothesis H/F RANSAC + SfM.

TPU-native counterpart of `Initializer` (`src/Initializer.cc`): where the
reference runs 200 sequential RANSAC iterations in two host threads
(H thread || F thread, `src/Initializer.cc:218-224`), here ALL hypotheses for
BOTH models are generated, fitted and scored in one vmapped program — the
canonical TPU reformulation of RANSAC (hypothesize-all, score-all, argmax).

Model selection (RH = SH/(SH+SF) > 0.40 -> homography), scoring thresholds
(5.991 / 3.841), reconstruction gates (cheirality, 4*sigma^2 reprojection,
parallax, 0.9*N winner rule) follow the reference semantics exactly
(`src/Initializer.cc:254, 463-, 548-, 641-741, 747-`; SURVEY appendix A).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import triangulation as tri

CHI2_H = 5.991
CHI2_F = 3.841
SCORE_REF = 5.991  # both models accumulate score against this cap


def normalize_points(uv, mask):
    """Hartley normalization (zero mean, unit mean-abs-dev per axis) over the
    masked points; returns (normalized uv, 3x3 transform T with x_n = T x).
    cf `Initializer::Normalize` (`src/Initializer.cc:865-913`)."""
    m = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(uv * m[:, None], axis=0) / n
    d = jnp.abs(uv - mean) * m[:, None]
    mdev = jnp.maximum(jnp.sum(d, axis=0) / n, 1e-6)
    s = 1.0 / mdev
    uv_n = (uv - mean) * s
    T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    T = T.at[0, 0].set(s[0]).at[1, 1].set(s[1])
    T = T.at[0, 2].set(-mean[0] * s[0]).at[1, 2].set(-mean[1] * s[1])
    return uv_n, T


def _nullvec(A):
    """Smallest right-singular vector of A via eigh(A^T A) — batched-friendly."""
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    _, v = jnp.linalg.eigh(AtA)
    return v[..., :, 0]


def fit_homography(uv1, uv2):
    """DLT homography from 8 correspondences (..., 8, 2) -> (..., 3, 3),
    cf `ComputeH21` (`src/Initializer.cc:384`)."""
    x1, y1 = uv1[..., 0], uv1[..., 1]
    x2, y2 = uv2[..., 0], uv2[..., 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], axis=-1)
    r2 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)  # (..., 16, 9)
    h = _nullvec(A)
    return h.reshape(h.shape[:-1] + (3, 3))


def fit_fundamental(uv1, uv2):
    """8-point fundamental (..., 8, 2) -> rank-2 (..., 3, 3),
    cf `ComputeF21` (`src/Initializer.cc:426`)."""
    x1, y1 = uv1[..., 0], uv1[..., 1]
    x2, y2 = uv2[..., 0], uv2[..., 1]
    o = jnp.ones_like(x1)
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, o], axis=-1)
    f = _nullvec(A)
    F = f.reshape(f.shape[:-1] + (3, 3))
    # enforce rank 2
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[..., 2].set(0.0)
    return U @ (S[..., :, None] * Vt)


def _hom(uv):
    return jnp.concatenate([uv, jnp.ones_like(uv[..., :1])], axis=-1)


def score_homography(H21, uv1, uv2, mask, sigma2: float = 1.0):
    """Symmetric-transfer score, cf `CheckHomography` (`src/Initializer.cc:463`).
    Returns (score, inliers (...,N) bool)."""
    H12 = jnp.linalg.inv(H21)
    p1 = _hom(uv1)
    p2 = _hom(uv2)

    def transfer(H, pa, ub):
        q = jnp.einsum("...ij,...nj->...ni", H, pa)
        q = q[..., :2] / jnp.where(jnp.abs(q[..., 2:]) < 1e-12, 1e-12, q[..., 2:])
        return jnp.sum((q - ub) ** 2, axis=-1) / sigma2

    chi_12 = transfer(H21, p1, uv2)
    chi_21 = transfer(H12, p2, uv1)
    ok = (chi_12 < CHI2_H) & (chi_21 < CHI2_H) & mask
    score = jnp.sum(jnp.where(ok, (SCORE_REF - chi_12) + (SCORE_REF - chi_21), 0.0), axis=-1)
    return score, ok


def score_fundamental(F21, uv1, uv2, mask, sigma2: float = 1.0):
    """Epipolar-distance score, cf `CheckFundamental` (`src/Initializer.cc:548`)."""
    p1 = _hom(uv1)
    p2 = _hom(uv2)

    def epi_chi(F, pa, pb):  # distance of pb to line F @ pa
        l = jnp.einsum("...ij,...nj->...ni", F, pa)
        num = jnp.sum(l * pb, axis=-1)
        den = jnp.maximum(l[..., 0] ** 2 + l[..., 1] ** 2, 1e-12)
        return num * num / den / sigma2

    chi_2 = epi_chi(F21, p1, p2)
    chi_1 = epi_chi(jnp.swapaxes(F21, -1, -2), p2, p1)
    ok = (chi_2 < CHI2_F) & (chi_1 < CHI2_F) & mask
    score = jnp.sum(
        jnp.where((chi_2 < CHI2_F) & mask, SCORE_REF - chi_2, 0.0)
        + jnp.where((chi_1 < CHI2_F) & mask, SCORE_REF - chi_1, 0.0),
        axis=-1,
    )
    return score, ok


def sample_minimal_sets(key, n_matches, match_mask, n_iters: int, set_size: int = 8):
    """(n_iters, set_size) indices drawn from valid matches.

    Counter-based (threefry) sampling — deterministic given the seed, the
    rebuild's answer to `DUtils::Random::SeedRandOnce(0)`
    (`src/Initializer.cc:191`). Uses Gumbel top-k per iteration to sample
    without replacement among valid matches."""
    g = jax.random.gumbel(key, (n_iters, n_matches))
    g = jnp.where(match_mask[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, set_size)
    return idx


def decompose_essential(E):
    """E -> (4, 3, 3) rotations + (4, 3) unit translations (the four-motion
    ambiguity), cf `DecomposeE` (`src/Initializer.cc:1121`)."""
    U, _, Vt = jnp.linalg.svd(E)
    # ensure proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def decompose_homography(H21, K):
    """Faugeras SVD decomposition of a homography into 8 motion hypotheses.

    Returns (Rs (8,3,3), ts (8,3) unit-norm). Math per Faugeras & Lustman
    1988 as used by `ReconstructH` (`src/Initializer.cc:747`)."""
    A = jnp.linalg.inv(K) @ H21 @ K
    U, d, Vt = jnp.linalg.svd(A)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = d[0], d[1], d[2]

    denom = jnp.maximum(d1 * d1 - d3 * d3, 1e-12)
    aux1 = jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) / denom, 0.0, None))
    aux3 = jnp.sqrt(jnp.clip((d2 * d2 - d3 * d3) / denom, 0.0, None))
    x1 = jnp.array([aux1, aux1, -aux1, -aux1])
    x3 = jnp.array([aux3, -aux3, aux3, -aux3])

    # case d' = +d2
    aux_st = jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0, None)) / (
        jnp.maximum((d1 + d3) * d2, 1e-12))
    ctheta = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    stheta = jnp.array([aux_st, -aux_st, -aux_st, aux_st])

    def make_Rp_pos(st):
        return jnp.array([[ctheta, 0.0, -st], [0.0, 1.0, 0.0], [st, 0.0, ctheta]])

    Rp_pos = jax.vmap(make_Rp_pos)(stheta)  # (4,3,3)
    tp_pos = (d1 - d3) * jnp.stack([x1, jnp.zeros(4), -x3], axis=-1)  # (4,3)

    # case d' = -d2
    aux_sp = jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0, None)) / (
        jnp.maximum(jnp.abs(d1 - d3) * d2, 1e-12)) * jnp.sign(d1 - d3)
    cphi = (d1 * d3 - d2 * d2) / jnp.maximum(jnp.abs(d1 - d3) * d2, 1e-12) * jnp.sign(d1 - d3)
    sphi = jnp.array([aux_sp, -aux_sp, -aux_sp, aux_sp])

    def make_Rp_neg(sp):
        return jnp.array([[cphi, 0.0, sp], [0.0, -1.0, 0.0], [sp, 0.0, -cphi]])

    Rp_neg = jax.vmap(make_Rp_neg)(sphi)
    tp_neg = (d1 + d3) * jnp.stack([x1, jnp.zeros(4), x3], axis=-1)

    Rp = jnp.concatenate([Rp_pos, Rp_neg])  # (8,3,3)
    tp = jnp.concatenate([tp_pos, tp_neg])  # (8,3)
    Rs = s * jnp.einsum("ij,njk,kl->nil", U, Rp, Vt)
    ts = jnp.einsum("ij,nj->ni", U, tp)
    ts = ts / jnp.maximum(jnp.linalg.norm(ts, axis=-1, keepdims=True), 1e-12)
    return Rs, ts


def check_rt(R, t, uv1, uv2, mask, K, sigma2: float = 1.0):
    """Score one motion hypothesis by triangulating every match.

    Returns (n_good, parallax_deg, X (N,3), good (N,) bool). Gates follow
    `CheckRT` (`src/Initializer.cc:985`): finite + positive depth both views,
    reprojection chi2 < 4*sigma2 in both, parallax for the 50th-good point.
    """
    T1 = jnp.eye(4)
    T2 = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t)
    P1 = K @ T1[:3, :4]
    P2 = K @ T2[:3, :4]
    X = tri.triangulate_dlt(P1, P2, uv1, uv2)

    finite = jnp.all(jnp.isfinite(X), axis=-1)
    Xc1 = X
    Xc2 = jnp.einsum("ij,nj->ni", R, X) + t
    z1 = Xc1[..., 2]
    z2 = Xc2[..., 2]

    def reproj_chi(P, Xw, uv):
        q = jnp.einsum("ij,nj->ni", P[:, :3], Xw) + P[:, 3]
        q2 = q[..., :2] / jnp.where(jnp.abs(q[..., 2:]) < 1e-12, 1e-12, q[..., 2:])
        return jnp.sum((q2 - uv) ** 2, axis=-1) / sigma2

    chi1 = reproj_chi(P1, X, uv1)
    chi2v = reproj_chi(P2, X, uv2)

    c1 = jnp.zeros(3)
    c2 = -R.T @ t
    cosp = tri.parallax_cos(c1, c2, X)
    # reference gate: squared reprojection error < 4 * sigma2, both views
    good = mask & finite & (z1 > 0) & (z2 > 0) & (chi1 < 4.0 * sigma2) & (chi2v < 4.0 * sigma2) & (cosp < 0.99998)
    n_good = jnp.sum(good.astype(jnp.int32))

    # parallax of the 50th-best (most parallax) good point, in degrees
    cosp_good = jnp.where(good, cosp, 1.0)
    sorted_cos = jnp.sort(cosp_good)  # ascending: most parallax first
    idx50 = jnp.minimum(jnp.int32(50), jnp.maximum(n_good - 1, 0))
    parallax = jnp.degrees(jnp.arccos(jnp.clip(sorted_cos[idx50], -1.0, 1.0)))
    parallax = jnp.where(n_good > 0, parallax, 0.0)
    return n_good, parallax, X, good


class TwoViewResult(NamedTuple):
    success: jnp.ndarray      # () bool
    used_homography: jnp.ndarray  # () bool
    R: jnp.ndarray            # (3,3) frame1 -> frame2
    t: jnp.ndarray            # (3,) unit-scale translation
    X: jnp.ndarray            # (N,3) triangulated points (frame-1 coords)
    good: jnp.ndarray         # (N,) bool triangulation validity
    n_good: jnp.ndarray       # () int32
    inliers: jnp.ndarray      # (N,) bool model inliers


def initialize_two_view(key, uv1, uv2, match_mask, K,
                        n_iters: int = 200, sigma: float = 1.0,
                        min_triangulated: int = 50) -> TwoViewResult:
    """Full two-view relative pose + structure, `Initializer::Initialize`
    equivalent (`src/Initializer.cc:149-274`). Fully jitted; all 200 H and
    200 F hypotheses fit & scored in parallel, all candidate motions checked
    in parallel."""
    sigma2 = sigma * sigma
    n = uv1.shape[0]
    uv1n, T1 = normalize_points(uv1, match_mask)
    uv2n, T2 = normalize_points(uv2, match_mask)

    idx = sample_minimal_sets(key, n, match_mask, n_iters)
    s1 = uv1n[idx]  # (iters, 8, 2)
    s2 = uv2n[idx]

    # --- Homography hypotheses ---
    Hn = fit_homography(s1, s2)                      # (iters,3,3)
    H21 = jnp.linalg.inv(T2)[None] @ Hn @ T1[None]   # denormalize
    h_scores, _ = jax.vmap(lambda H: score_homography(H, uv1, uv2, match_mask, sigma2))(H21)
    bh = jnp.argmax(h_scores)
    SH = h_scores[bh]
    H_best = H21[bh]
    _, h_inliers = score_homography(H_best, uv1, uv2, match_mask, sigma2)

    # --- Fundamental hypotheses ---
    Fn = fit_fundamental(s1, s2)
    F21 = jnp.swapaxes(T2, 0, 1)[None] @ Fn @ T1[None]  # T2^T F T1
    f_scores, _ = jax.vmap(lambda F: score_fundamental(F, uv1, uv2, match_mask, sigma2))(F21)
    bf = jnp.argmax(f_scores)
    SF = f_scores[bf]
    F_best = F21[bf]
    _, f_inliers = score_fundamental(F_best, uv1, uv2, match_mask, sigma2)

    RH = SH / jnp.maximum(SH + SF, 1e-12)
    use_h = RH > 0.40

    # --- Candidate motions: 8 from H, 4 from F (padded to 12, masked) ---
    Rs_h, ts_h = decompose_homography(H_best, K)
    E = jnp.swapaxes(K, 0, 1) @ F_best @ K
    Rs_f, ts_f = decompose_essential(E)
    Rs = jnp.concatenate([Rs_h, jnp.concatenate([Rs_f, jnp.zeros((4, 3, 3)) + jnp.eye(3)])])
    ts = jnp.concatenate([ts_h, jnp.concatenate([ts_f, jnp.zeros((4, 3))])])
    cand_valid = jnp.where(
        use_h,
        jnp.array([1] * 8 + [0] * 8, bool),
        jnp.array([0] * 8 + [1] * 4 + [0] * 4, bool),
    )
    model_inliers = jnp.where(use_h, h_inliers, f_inliers)

    n_goods, parallaxes, Xs, goods = jax.vmap(
        lambda R, t: check_rt(R, t, uv1, uv2, model_inliers, K, sigma2)
    )(Rs, ts)
    n_goods = jnp.where(cand_valid, n_goods, -1)

    best = jnp.argmax(n_goods)
    n_best = n_goods[best]
    n_inliers = jnp.sum(model_inliers.astype(jnp.int32))
    min_good = jnp.maximum(jnp.int32(0.9 * n_inliers), min_triangulated)

    # uniqueness: no second candidate with > 0.7 * best
    n_second = jnp.max(jnp.where(jnp.arange(16) == best, -1, n_goods))
    unique = n_second.astype(jnp.float32) < 0.75 * n_best.astype(jnp.float32)
    enough_parallax = parallaxes[best] > 1.0

    success = (n_best >= min_good) & unique & enough_parallax
    return TwoViewResult(
        success=success,
        used_homography=use_h,
        R=Rs[best],
        t=ts[best],
        X=Xs[best],
        good=goods[best],
        n_good=n_best,
        inliers=model_inliers,
    )
