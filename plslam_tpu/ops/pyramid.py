"""Image pyramid + Gaussian blur as XLA programs.

TPU-native counterpart of `ORBextractor::ComputePyramid`
(`src/ORBextractor.cc:1107`: per-level cv::resize + 19px reflected border) and
the pre-descriptor 7x7 sigma=2 GaussianBlur (`src/ORBextractor.cc:1086`).

Levels have static shapes derived from the base resolution at trace time, so
the whole pyramid is one fused XLA program; no borders are materialized —
border semantics are handled by masking in the detector instead.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def level_shapes(height: int, width: int, n_levels: int, scale: float):
    """Static (H, W) per level, matching cv::resize rounding."""
    shapes = []
    for l in range(n_levels):
        inv = 1.0 / (scale ** l)
        shapes.append((int(round(height * inv)), int(round(width * inv))))
    return shapes


def gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def blur(img, ksize: int = 7, sigma: float = 2.0):
    """Separable Gaussian blur, replicate-padded. img: (H, W) float32.

    Implemented as shifted-slice weighted sums (pure VPU adds that XLA
    fuses) — the conv_general_dilated lowering of tiny 1x7 kernels was the
    single hottest op of the whole extraction program on TPU."""
    k = gaussian_kernel1d(ksize, sigma)
    r = ksize // 2
    h, w = img.shape
    x = jnp.pad(img, ((r, r), (0, 0)), mode="edge")
    acc = k[0] * x[0:h, :]
    for i in range(1, ksize):
        acc = acc + k[i] * x[i:i + h, :]
    x = jnp.pad(acc, ((0, 0), (r, r)), mode="edge")
    acc = k[0] * x[:, 0:w]
    for i in range(1, ksize):
        acc = acc + k[i] * x[:, i:i + w]
    return acc


def resize_bilinear(img, out_hw):
    """Bilinear resize (align-corners=False, like cv::resize INTER_LINEAR)."""
    return jax.image.resize(img, out_hw, method="linear")


def build_pyramid(img, n_levels: int, scale: float):
    """img: (H, W) float32 -> list of per-level float32 images.

    Successive downscales from the previous level (like the reference) to
    keep low-pass characteristics rather than decimating from level 0.
    """
    h, w = img.shape
    shapes = level_shapes(h, w, n_levels, scale)
    levels = [img]
    for l in range(1, n_levels):
        levels.append(resize_bilinear(levels[-1], shapes[l]))
    return levels
