"""Batched two-view triangulation of points and line segments.

TPU-native counterpart of `Initializer::Triangulate` (DLT SVD,
`src/Initializer.cc:915-933`), `LocalMapping::CreateNewMapPoints` per-match
SVD (`src/LocalMapping.cc:433-474`) and `Initializer::LineTriangulate`
(`src/Initializer.cc:1143-1212`).

Design notes (not a port):
- The reference does one 4x4 SVD per feature inside a loop. Here every
  candidate triangulates simultaneously: the DLT normal matrix A^T A (4x4
  symmetric) is built with einsums and solved with a batched eigendecomposition
  — thousands of landmarks per XLA program, no host loop.
- 3D lines are triangulated as the intersection of the two back-projected
  planes; endpoints come from intersecting the first view's endpoint rays
  with the second view's plane (same geometry the reference expresses through
  stacked SVDs).
"""
from __future__ import annotations

import jax.numpy as jnp

from . import camera as cam_mod


def projection_matrix(cam, T_cw):
    """K [R|t] : (...,3,4) projection matrix from world to pixels."""
    K = cam.K
    return jnp.einsum("ij,...jk->...ik", K, T_cw[..., :3, :4])


def triangulate_dlt(P1, P2, uv1, uv2):
    """Batched DLT triangulation.

    P1, P2: (3,4) or (...,3,4) projection matrices; uv1, uv2: (...,2) pixel
    observations. Returns (...,3) world points (homogeneous-normalized).

    Solves min ||A x||, ||x||=1 with A the standard 4x4 DLT stack, via the
    smallest eigenvector of A^T A (batched eigh — TPU-friendly, no SVD of
    non-square matrices).
    """
    def rows(P, uv):
        r0 = uv[..., 0:1] * P[..., 2, :] - P[..., 0, :]
        r1 = uv[..., 1:2] * P[..., 2, :] - P[..., 1, :]
        return r0, r1

    a0, a1 = rows(P1, uv1)
    a2, a3 = rows(P2, uv2)
    A = jnp.stack([a0, a1, a2, a3], axis=-2)  # (...,4,4)
    # Normalize rows for conditioning (f32).
    A = A / jnp.maximum(jnp.linalg.norm(A, axis=-1, keepdims=True), 1e-12)
    # Finite-point formulation: with w=1, solve B X = -c in least squares
    # (B = A[:, :3], c = A[:, 3]) via closed-form 3x3 normal equations —
    # batched eigh/SVD of the homogeneous 4x4 lowers to slow generic
    # factorization kernels on TPU; the adjugate solve is pure VPU math.
    # (SLAM landmarks are finite by construction; points near infinity fail
    # the subsequent depth/parallax gates anyway.)
    B = A[..., :, :3]
    c = A[..., :, 3]
    N = jnp.einsum("...ki,...kj->...ij", B, B)
    g = -jnp.einsum("...ki,...k->...i", B, c)
    return solve3x3(N, g)


def solve3x3(N, g, eps: float = 1e-12):
    """Batched closed-form 3x3 solve via the adjugate (Cramer)."""
    a, b, c_ = N[..., 0, 0], N[..., 0, 1], N[..., 0, 2]
    d, e, f = N[..., 1, 0], N[..., 1, 1], N[..., 1, 2]
    gg, h, i = N[..., 2, 0], N[..., 2, 1], N[..., 2, 2]
    A00 = e * i - f * h
    A01 = c_ * h - b * i
    A02 = b * f - c_ * e
    A10 = f * gg - d * i
    A11 = a * i - c_ * gg
    A12 = c_ * d - a * f
    A20 = d * h - e * gg
    A21 = b * gg - a * h
    A22 = a * e - b * d
    det = a * A00 + b * A10 + c_ * A20
    inv_det = 1.0 / jnp.where(jnp.abs(det) < eps, eps, det)
    x = (A00 * g[..., 0] + A01 * g[..., 1] + A02 * g[..., 2]) * inv_det
    y = (A10 * g[..., 0] + A11 * g[..., 1] + A12 * g[..., 2]) * inv_det
    z = (A20 * g[..., 0] + A21 * g[..., 1] + A22 * g[..., 2]) * inv_det
    return jnp.stack([x, y, z], axis=-1)


def inv3x3(N, eps: float = 1e-12):
    """Batched closed-form 3x3 inverse (adjugate / det)."""
    a, b, c_ = N[..., 0, 0], N[..., 0, 1], N[..., 0, 2]
    d, e, f = N[..., 1, 0], N[..., 1, 1], N[..., 1, 2]
    gg, h, i = N[..., 2, 0], N[..., 2, 1], N[..., 2, 2]
    adj = jnp.stack([
        jnp.stack([e * i - f * h, c_ * h - b * i, b * f - c_ * e], -1),
        jnp.stack([f * gg - d * i, a * i - c_ * gg, c_ * d - a * f], -1),
        jnp.stack([d * h - e * gg, b * gg - a * h, a * e - b * d], -1),
    ], -2)
    det = a * adj[..., 0, 0] + b * adj[..., 1, 0] + c_ * adj[..., 2, 0]
    inv_det = 1.0 / jnp.where(jnp.abs(det) < eps, eps, det)
    return adj * inv_det[..., None, None]


def backproject_plane(cam, T_cw, line_2d):
    """Plane through the camera center containing an observed 2D line.

    line_2d: (...,3) homogeneous image line l (so l . (u,v,1) = 0 in
    *undistorted pixel* coords). Returns plane (...,4) in world coords
    (n . X + d = 0, unnormalized).
    """
    P = projection_matrix(cam, T_cw)  # (...,3,4)
    return jnp.einsum("...ji,...j->...i", P, line_2d)  # P^T l


def line_from_endpoints_2d(uv_a, uv_b):
    """Homogeneous 2D line through two pixels, normalized so (l0,l1) is a unit
    normal — same normalization as `LineExtractor.cpp:81-90`."""
    pa = jnp.concatenate([uv_a, jnp.ones_like(uv_a[..., :1])], axis=-1)
    pb = jnp.concatenate([uv_b, jnp.ones_like(uv_b[..., :1])], axis=-1)
    l = jnp.cross(pa, pb)
    n = jnp.maximum(jnp.linalg.norm(l[..., :2], axis=-1, keepdims=True), 1e-12)
    return l / n


def intersect_ray_plane(origin, direction, plane):
    """Intersect rays (origin (...,3), direction (...,3)) with planes (...,4).

    Returns (points (...,3), t (...,) ray parameter)."""
    n = plane[..., :3]
    d = plane[..., 3]
    denom = jnp.sum(n * direction, axis=-1)
    t = -(jnp.sum(n * origin, axis=-1) + d) / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    return origin + t[..., None] * direction, t


def triangulate_line_two_view(cam, T1_cw, T2_cw, uv1_a, uv1_b, uv2_a, uv2_b):
    """Two-view line-segment triangulation.

    Endpoint rays of view 1 are intersected with the plane back-projected
    from view 2's infinite line — the same construction as
    `Initializer::LineTriangulate` (`src/Initializer.cc:1143`), expressed as
    batched plane/ray algebra instead of per-line SVD.

    Returns (Xa_w, Xb_w, depth_a, depth_b): world endpoints + their depths in
    view 1 (for cheirality gating).
    """
    l2 = line_from_endpoints_2d(uv2_a, uv2_b)
    plane2_w = backproject_plane(cam, T2_cw, l2)  # (...,4)

    T1_wc = _se3_inv(T1_cw)
    R1_wc = T1_wc[..., :3, :3]
    c1_w = T1_wc[..., :3, 3]

    ray_a_c = cam_mod.unproject(cam, uv1_a)
    ray_b_c = cam_mod.unproject(cam, uv1_b)
    ray_a_w = jnp.einsum("...ij,...j->...i", R1_wc, ray_a_c)
    ray_b_w = jnp.einsum("...ij,...j->...i", R1_wc, ray_b_c)

    Xa, ta = intersect_ray_plane(c1_w, ray_a_w, plane2_w)
    Xb, tb = intersect_ray_plane(c1_w, ray_b_w, plane2_w)
    # ray direction has unit z in camera frame => t equals depth in view 1
    return Xa, Xb, ta, tb


def _se3_inv(T):
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    Ti = jnp.zeros_like(T)
    Ti = Ti.at[..., :3, :3].set(Rt)
    Ti = Ti.at[..., :3, 3].set(-jnp.einsum("...ij,...j->...i", Rt, t))
    Ti = Ti.at[..., 3, 3].set(1.0)
    return Ti


def parallax_cos(c1_w, c2_w, X_w):
    """Cosine of the parallax angle at X between the two camera centers —
    the gate used throughout `CheckRT` (`src/Initializer.cc:985`)."""
    v1 = c1_w - X_w
    v2 = c2_w - X_w
    n1 = jnp.maximum(jnp.linalg.norm(v1, axis=-1), 1e-12)
    n2 = jnp.maximum(jnp.linalg.norm(v2, axis=-1), 1e-12)
    return jnp.sum(v1 * v2, axis=-1) / (n1 * n2)
