"""SO3 / SE3 Lie-group operations, batched and jit-friendly.

TPU-native replacement for the reference's Eigen/g2o pose algebra
(`Thirdparty/g2o/g2o/types/se3quat.h`, `src/Converter.cc`).  Everything is
float32, shape-polymorphic over leading batch dims, and differentiable.

Conventions
-----------
- A pose ``T`` is a (..., 4, 4) homogeneous matrix mapping world -> camera
  (``Tcw`` in the reference's naming) unless stated otherwise.
- A tangent vector ``xi`` is (..., 6) ordered ``[omega(3), upsilon(3)]``
  (rotation first), matching g2o's ``SE3Quat::exp`` update convention so the
  LM update equations mirror the reference solver's.
- Quaternions are (..., 4) in ``[w, x, y, z]`` (Hamilton) order.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """Skew-symmetric matrix of (...,3) -> (...,3,3). cf include/auxiliar.h:80."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """Inverse of hat: (...,3,3) -> (...,3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_terms(theta2):
    """Stable (sin t / t, (1-cos t)/t^2, (t - sin t)/t^3) from theta^2.

    Taylor branches below a cutoff; denominators in the generic branch are
    clamped so the *untaken* branch stays finite with finite derivatives
    (the jnp.where autodiff-NaN rule: 0 * nan = nan would otherwise poison
    gradients at theta = 0).
    """
    # Clamp at the Taylor-branch cutoff (not smaller): the clamp value feeds
    # quotient-rule gradients whose denominators are ~t2s^3 — with a 1e-16
    # clamp those underflow float32 and give nan * 0 = nan through jnp.where.
    t2s = jnp.maximum(theta2, 1e-8)
    theta = jnp.sqrt(t2s)
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / t2s)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (t2s * theta))
    return a, b, c


def so3_exp(w):
    """Rodrigues: (...,3) axis-angle -> (...,3,3) rotation."""
    theta2 = jnp.sum(w * w, axis=-1)
    a, b, _ = _sinc_terms(theta2)
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R):
    """(...,3,3) rotation -> (...,3) axis-angle.

    Implemented via quaternion extraction (Shepperd) + ``2 atan2(|v|, w)``,
    which is numerically stable over the full angle range in float32 —
    including near pi, where the classic ``theta/(2 sin theta) vee(R - R^T)``
    formula loses precision.
    """
    q = rot_to_quat(R)
    # Force positive scalar part (theta in [0, pi]).
    q = q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
    qw = q[..., 0]
    v = q[..., 1:]
    vn = jnp.linalg.norm(v, axis=-1)
    theta = 2.0 * jnp.arctan2(vn, qw)
    # w = theta * v / |v|; for small angles use 2 v / qw (Taylor of the same).
    small = vn < 1e-6
    scale = jnp.where(small, 2.0 / jnp.maximum(qw, _EPS), theta / jnp.maximum(vn, _EPS))
    return v * scale[..., None]


def left_jacobian(w):
    """SO3 left Jacobian J_l(w): (...,3) -> (...,3,3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    _, b, c = _sinc_terms(theta2)
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + b[..., None, None] * W + c[..., None, None] * (W @ W)


def left_jacobian_inv(w):
    """Inverse of the SO3 left Jacobian."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    half = 0.5 * theta
    cot = jnp.where(theta2 < 1e-8, 1.0 / 12.0 + theta2 / 720.0,
                    (1.0 - half * jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS)) / jnp.maximum(theta2, _EPS * _EPS))
    return I - 0.5 * W + cot[..., None, None] * (W @ W)


def se3_exp(xi):
    """(...,6) [omega, upsilon] -> (...,4,4) via the SE3 exponential map.

    Matches g2o SE3Quat::exp semantics (rotation-first tangent ordering),
    used for multiplicative pose updates T <- exp(xi) @ T in the LM solvers.
    """
    w = xi[..., :3]
    v = xi[..., 3:]
    R = so3_exp(w)
    t = jnp.einsum("...ij,...j->...i", left_jacobian(w), v)
    return rt_to_mat(R, t)


def se3_log(T):
    """(...,4,4) -> (...,6) [omega, upsilon]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    v = jnp.einsum("...ij,...j->...i", left_jacobian_inv(w), t)
    return jnp.concatenate([w, v], axis=-1)


def rt_to_mat(R, t):
    """(...,3,3), (...,3) -> (...,4,4)."""
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_inv(T):
    """Inverse of a rigid transform, exploiting R^T structure."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return rt_to_mat(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def transform(T, pts):
    """Apply (...,4,4) to points (...,N,3) or (...,3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    if pts.ndim == T.ndim - 1:  # (...,3)
        return jnp.einsum("...ij,...j->...i", R, pts) + t
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def rot_to_quat(R):
    """(...,3,3) -> (...,4) [w,x,y,z], Shepperd's method (branch-free blend)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate quaternions, each valid when its pivot is largest
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, _EPS)) * 0.5
    q0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)], axis=-1)
    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 0.5
    q1 = jnp.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1)], axis=-1)
    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS)) * 0.5
    q2 = jnp.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2)], axis=-1)
    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS)) * 0.5
    q3 = jnp.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3], axis=-1)
    cand = jnp.stack([q0, q1, q2, q3], axis=-2)  # (...,4cand,4)
    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].astype(jnp.int32).repeat(4, -1), axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_rot(q):
    """(...,4) [w,x,y,z] -> (...,3,3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )
