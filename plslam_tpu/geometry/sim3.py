"""Sim3 (7-dof similarity transform) operations.

TPU-native replacement for g2o's `Sim3` type
(`Thirdparty/g2o/g2o/types/sim3/sim3.h` in the reference), used by loop
closing: Sim3Solver RANSAC, OptimizeSim3 and the essential-graph optimization
(`src/Optimizer.cc:2102-2562`).

A Sim3 ``S`` is a pytree ``(s, R, t)`` with ``s: (...,)``, ``R: (...,3,3)``,
``t: (...,3)`` acting as ``x -> s * R @ x + t``.  Tangent vectors are (...,7)
ordered ``[omega(3), upsilon(3), sigma(1)]`` (rotation, translation,
log-scale).  All ops are batched over leading dims and differentiable.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import se3

_EPS = 1e-7


class Sim3(NamedTuple):
    s: jnp.ndarray  # (...,)
    R: jnp.ndarray  # (...,3,3)
    t: jnp.ndarray  # (...,3)


def identity(batch=(), dtype=jnp.float32) -> Sim3:
    return Sim3(
        jnp.ones(batch, dtype),
        jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3)),
        jnp.zeros(batch + (3,), dtype),
    )


def from_se3(T, s=None) -> Sim3:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    if s is None:
        s = jnp.ones(T.shape[:-2], T.dtype)
    return Sim3(s, R, t)


def to_se3(S: Sim3):
    """Recover an SE3 with scale folded into translation: ``[R | t/s]``.

    Matches the essential-graph pose recovery in the reference
    (`src/Optimizer.cc:2324-2335`).
    """
    return se3.rt_to_mat(S.R, S.t / S.s[..., None])


def compose(A: Sim3, B: Sim3) -> Sim3:
    """A ∘ B : x -> A(B(x))."""
    return Sim3(
        A.s * B.s,
        A.R @ B.R,
        A.s[..., None] * jnp.einsum("...ij,...j->...i", A.R, B.t) + A.t,
    )


def inverse(S: Sim3) -> Sim3:
    Rt = jnp.swapaxes(S.R, -1, -2)
    s_inv = 1.0 / S.s
    return Sim3(s_inv, Rt, -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, S.t))


def apply(S: Sim3, pts):
    """Apply to (...,3) or (...,N,3) points."""
    if pts.ndim == S.R.ndim - 1:
        return S.s[..., None] * jnp.einsum("...ij,...j->...i", S.R, pts) + S.t
    return S.s[..., None, None] * jnp.einsum("...ij,...nj->...ni", S.R, pts) + S.t[..., None, :]


def _calc_w_coeffs(theta, sigma, dtype):
    """Coefficients (A, B, C) of W = A*Ω + B*Ω² + C*I for the Sim3 exp.

    Closed form per Strasdat (Sophus RxSO3/Sim3), with Taylor branches at
    small theta and/or sigma, selected via jnp.where (branch-free, safe
    denominators everywhere so gradients stay finite).
    """
    scale = jnp.exp(sigma)
    theta2 = theta * theta
    sigma2 = sigma * sigma
    small_t = theta < 1e-4
    small_s = jnp.abs(sigma) < 1e-4
    th_safe = jnp.where(small_t, 1.0, theta)
    sg_safe = jnp.where(small_s, 1.0, sigma)
    c = theta2 + sigma2
    c_safe = jnp.where(c < _EPS, 1.0, c)
    a_ = scale * jnp.sin(theta)
    b_ = scale * jnp.cos(theta)

    # sigma ~ 0 branch
    C_s0 = jnp.ones_like(theta)
    A_s0 = jnp.where(small_t, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (th_safe * th_safe))
    B_s0 = jnp.where(small_t, 1.0 / 6.0 - theta2 / 120.0,
                     (theta - jnp.sin(theta)) / (th_safe * th_safe * th_safe))

    # general sigma branch
    C_s = (scale - 1.0) / sg_safe
    A_s_t0 = ((sigma - 1.0) * scale + 1.0) / (sg_safe * sg_safe)
    B_s_t0 = ((0.5 * sigma2 - sigma + 1.0) * scale - 1.0) / (sg_safe * sg_safe * sg_safe)
    A_s_t = (a_ * sigma + (1.0 - b_) * theta) / (th_safe * c_safe)
    B_s_t = (C_s - ((b_ - 1.0) * sigma + a_ * theta) / c_safe) / (th_safe * th_safe)
    A_s = jnp.where(small_t, A_s_t0, A_s_t)
    B_s = jnp.where(small_t, B_s_t0, B_s_t)

    A = jnp.where(small_s, A_s0, A_s)
    B = jnp.where(small_s, B_s0, B_s)
    C = jnp.where(small_s, C_s0, C_s)
    return A, B, C


def _calc_w(w, sigma):
    theta = jnp.sqrt(jnp.maximum(jnp.sum(w * w, axis=-1), _EPS * _EPS))
    A, B, C = _calc_w_coeffs(theta, sigma, w.dtype)
    Om = se3.hat(w)
    Om2 = Om @ Om
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), Om.shape)
    return A[..., None, None] * Om + B[..., None, None] * Om2 + C[..., None, None] * I


def expmap(xi) -> Sim3:
    """(...,7) [omega, upsilon, sigma] -> Sim3 via the exponential map."""
    w = xi[..., :3]
    v = xi[..., 3:6]
    sigma = xi[..., 6]
    R = se3.so3_exp(w)
    W = _calc_w(w, sigma)
    return Sim3(jnp.exp(sigma), R, jnp.einsum("...ij,...j->...i", W, v))


def logmap(S: Sim3):
    """Sim3 -> (...,7) tangent; inverse of :func:`expmap`.

    omega/sigma in closed form; upsilon by solving the 3x3 system
    ``W(omega, sigma) v = t`` (W is well-conditioned for |omega| < pi).
    """
    w = se3.so3_log(S.R)
    sigma = jnp.log(S.s)
    W = _calc_w(w, sigma)
    v = jnp.linalg.solve(W, S.t[..., None])[..., 0]
    return jnp.concatenate([w, v, sigma[..., None]], axis=-1)
