"""Reprojection residuals + analytic Jacobians for points and lines.

TPU-native counterpart of g2o's `EdgeSE3ProjectXYZ(OnlyPose)`
(`Thirdparty/g2o/g2o/types/types_six_dof_expmap.h:59-208`) and the custom
line edges in `include/lineEdge.h` (point-to-line signed distance of a
projected endpoint; the reference's analytic Jacobians are commented out and
it falls back to numeric differentiation — here they are derived analytically
and verified against `jax.jacobian` in tests).

Conventions: pose tangent is [omega(3), upsilon(3)] with LEFT-multiplicative
updates ``T' = exp(xi) @ T`` (g2o's VertexSE3Expmap convention), so
``dX_c/domega = -hat(X_c)`` and ``dX_c/dupsilon = I``.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..geometry import se3


def project_jacobian(cam, Xc):
    """d(pixel)/d(X_c): (..., 2, 3) for camera-frame points (..., 3)."""
    x, y = Xc[..., 0], Xc[..., 1]
    z = jnp.maximum(Xc[..., 2], 1e-6)
    iz = 1.0 / z
    iz2 = iz * iz
    zeros = jnp.zeros_like(x)
    row_u = jnp.stack([cam.fx * iz, zeros, -cam.fx * x * iz2], axis=-1)
    row_v = jnp.stack([zeros, cam.fy * iz, -cam.fy * y * iz2], axis=-1)
    return jnp.stack([row_u, row_v], axis=-2)


def point_residual(cam, T_cw, X_w, uv_obs):
    """Reprojection residual r = proj(T X) - uv and Jacobians.

    Returns (r (...,2), J_pose (...,2,6), J_point (...,2,3), z (...,)).
    """
    Xc = se3.transform(T_cw, X_w)
    z = Xc[..., 2]
    iz = 1.0 / jnp.maximum(z, 1e-6)
    u = cam.fx * Xc[..., 0] * iz + cam.cx
    v = cam.fy * Xc[..., 1] * iz + cam.cy
    r = jnp.stack([u, v], axis=-1) - uv_obs

    Jproj = project_jacobian(cam, Xc)               # (...,2,3)
    dXc_dw = -se3.hat(Xc)                           # (...,3,3)
    J_pose = jnp.concatenate([Jproj @ dXc_dw, Jproj], axis=-1)  # (...,2,6)
    R = T_cw[..., :3, :3]
    J_point = Jproj @ R
    return r, J_pose, J_point, z


def point_residual_stereo(cam, bf, T_cw, X_w, uv_obs, ur_obs):
    """3-component stereo reprojection residual (u_l, v_l, u_r) and
    Jacobians — g2o's `EdgeStereoSE3ProjectXYZ`
    (`Thirdparty/g2o/g2o/types/types_six_dof_expmap.h:144-208`): the right-
    image column prediction is u_r = u_l - bf/z with bf = fx * baseline
    (the reference's `mbf`, `src/Frame.cc:977`). Observations with
    ur_obs <= 0 are monocular: their third component and Jacobian row are
    zeroed, so mixed mono/stereo edge sets share one batched form.

    Returns (r (...,3), J_pose (...,3,6), J_point (...,3,3), z (...,)).
    """
    Xc = se3.transform(T_cw, X_w)
    x, y = Xc[..., 0], Xc[..., 1]
    z = Xc[..., 2]
    iz = 1.0 / jnp.maximum(z, 1e-6)
    iz2 = iz * iz
    u = cam.fx * x * iz + cam.cx
    v = cam.fy * y * iz + cam.cy
    ur = u - bf * iz
    has = ur_obs > 0
    r = jnp.stack([u - uv_obs[..., 0], v - uv_obs[..., 1],
                   jnp.where(has, ur - ur_obs, 0.0)], axis=-1)

    zeros = jnp.zeros_like(x)
    hasf = has.astype(jnp.float32)
    row_u = jnp.stack([cam.fx * iz, zeros, -cam.fx * x * iz2], axis=-1)
    row_v = jnp.stack([zeros, cam.fy * iz, -cam.fy * y * iz2], axis=-1)
    row_ur = (row_u + jnp.stack([zeros, zeros, bf * iz2], axis=-1)
              ) * hasf[..., None]
    Jproj = jnp.stack([row_u, row_v, row_ur], axis=-2)   # (...,3,3)
    dXc_dw = -se3.hat(Xc)
    J_pose = jnp.concatenate([Jproj @ dXc_dw, Jproj], axis=-1)  # (...,3,6)
    R = T_cw[..., :3, :3]
    J_point = Jproj @ R
    return r, J_pose, J_point, z


def line_endpoint_residual(cam, T_cw, X_w, line2d):
    """Signed distance of a projected 3D endpoint to an observed 2D line.

    line2d: (...,3) with (l0, l1) unit-normalized (the `LineExtractor`
    convention, `src/LineExtractor.cpp:81-90`), so the residual is in pixels.
    cf `EdgeLineProjectXYZ::computeError` (`include/lineEdge.h:270-281`).

    Returns (r (...,), J_pose (...,6), J_point (...,3), z (...,)).
    """
    Xc = se3.transform(T_cw, X_w)
    z = Xc[..., 2]
    iz = 1.0 / jnp.maximum(z, 1e-6)
    u = cam.fx * Xc[..., 0] * iz + cam.cx
    v = cam.fy * Xc[..., 1] * iz + cam.cy
    r = line2d[..., 0] * u + line2d[..., 1] * v + line2d[..., 2]

    Jproj = project_jacobian(cam, Xc)               # (...,2,3)
    l01 = line2d[..., :2]                            # (...,2)
    dr_dXc = jnp.einsum("...i,...ij->...j", l01, Jproj)  # (...,3)
    dXc_dw = -se3.hat(Xc)
    J_pose = jnp.concatenate(
        [jnp.einsum("...j,...jk->...k", dr_dXc, dXc_dw), dr_dXc], axis=-1
    )
    R = T_cw[..., :3, :3]
    J_point = jnp.einsum("...j,...jk->...k", dr_dXc, R)
    return r, J_pose, J_point, z


def huber_weight(chi2, delta2):
    """g2o Huber robust-kernel weight rho'(chi2): 1 inside delta^2, else
    delta/sqrt(chi2)."""
    return jnp.where(chi2 <= delta2, 1.0,
                     jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))
