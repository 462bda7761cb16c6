"""Pinhole camera with radial-tangential distortion, batched + jit-friendly.

TPU-native counterpart of the reference's OpenCV camera handling: analytic
keypoint undistortion (`src/Frame.cc:915` via cv::undistortPoints) and the
projection math embedded throughout Tracking/Optimizer.  Unlike the reference
— which recomputes a full-image `initUndistortRectifyMap` EVERY frame
(`src/Frame.cc:220-222`, a known quirk) — undistortion here is a fixed-point
iteration on sparse feature coordinates, or a once-precomputed dense warp.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Camera(NamedTuple):
    """Intrinsics + distortion. All fields are scalars (float32 arrays)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    k1: jnp.ndarray
    k2: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray
    k3: jnp.ndarray
    width: int
    height: int

    @staticmethod
    def create(fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0,
               width=640, height=480) -> "Camera":
        f = lambda v: jnp.asarray(v, jnp.float32)
        return Camera(f(fx), f(fy), f(cx), f(cy), f(k1), f(k2), f(p1), f(p2),
                      f(k3), int(width), int(height))

    @property
    def K(self):
        """(3,3) intrinsic matrix."""
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack([
            jnp.stack([self.fx, z, self.cx]),
            jnp.stack([z, self.fy, self.cy]),
            jnp.stack([z, z, o]),
        ])


def distort_normalized(cam: Camera, xn):
    """Apply radtan distortion to normalized coords (...,2) -> (...,2)."""
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
    xd = x * radial + 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_normalized(cam: Camera, xd, iters: int = 10):
    """Invert radtan distortion by fixed-point iteration (cv::undistortPoints
    contract). Converges fast for the mild distortions of SLAM datasets."""
    x = xd

    for _ in range(iters):
        d = distort_normalized(cam, x) - x  # pure distortion displacement
        x = xd - d
    return x


def project(cam: Camera, Xc, distort: bool = False):
    """Camera-frame points (...,3) -> pixel coords (...,2).

    By default projects with the *pinhole* model (features are matched in
    undistorted pixel space, like the reference's optimizers which consume
    `mvKeysUn`)."""
    z = jnp.maximum(Xc[..., 2], 1e-6)
    xn = Xc[..., :2] / z[..., None]
    if distort:
        xn = distort_normalized(cam, xn)
    u = cam.fx * xn[..., 0] + cam.cx
    v = cam.fy * xn[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


def unproject(cam: Camera, uv, undistort: bool = False):
    """Pixel coords (...,2) -> unit-depth camera rays (...,3)."""
    xn = jnp.stack([(uv[..., 0] - cam.cx) / cam.fx,
                    (uv[..., 1] - cam.cy) / cam.fy], axis=-1)
    if undistort:
        xn = undistort_normalized(cam, xn)
    return jnp.concatenate([xn, jnp.ones_like(xn[..., :1])], axis=-1)


def undistort_pixels(cam: Camera, uv):
    """Distorted pixels -> undistorted pixels (the `mvKeys -> mvKeysUn` map,
    `src/Frame.cc:915`)."""
    xn = jnp.stack([(uv[..., 0] - cam.cx) / cam.fx,
                    (uv[..., 1] - cam.cy) / cam.fy], axis=-1)
    xu = undistort_normalized(cam, xn)
    return jnp.stack([cam.fx * xu[..., 0] + cam.cx,
                      cam.fy * xu[..., 1] + cam.cy], axis=-1)


def undistorted_bounds(cam: Camera):
    """Undistorted image bounds (minx, maxx, miny, maxy), cf
    `Frame::ComputeImageBounds` (`src/Frame.cc:935-963`)."""
    w, h = float(cam.width), float(cam.height)
    corners = jnp.array([[0.0, 0.0], [w, 0.0], [0.0, h], [w, h]], jnp.float32)
    cu = undistort_pixels(cam, corners)
    return (jnp.minimum(cu[0, 0], cu[2, 0]), jnp.maximum(cu[1, 0], cu[3, 0]),
            jnp.minimum(cu[0, 1], cu[1, 1]), jnp.maximum(cu[2, 1], cu[3, 1]))


def in_image(cam: Camera, uv, margin: float = 0.0):
    """Mask of pixels inside the (nominal) image rectangle."""
    return ((uv[..., 0] >= margin) & (uv[..., 0] < cam.width - margin)
            & (uv[..., 1] >= margin) & (uv[..., 1] < cam.height - margin))
