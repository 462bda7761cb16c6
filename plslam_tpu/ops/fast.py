"""FAST-16 corner detection as a dense, data-parallel XLA program.

TPU-native counterpart of the per-cell OpenCV `FAST` calls in
`ORBextractor::ComputeKeyPointsOctTree` (`src/ORBextractor.cc:765-853`).

Instead of running a sparse detector per 30x30 cell with a threshold
fallback (20 -> 7), we compute dense corner-score maps for BOTH thresholds
in one pass (the ring test is 16 shifted comparisons — pure VPU work), apply
3x3 non-max suppression, and let the selection stage prefer high-threshold
corners per cell (see `plslam_tpu.ops.select`), which reproduces the
fallback semantics data-parallel.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Bresenham circle of radius 3, 16 points, starting at (row-3, col) going
# clockwise — the standard FAST-9/16 ring.
RING_OFFSETS = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)
ARC_LEN = 9  # FAST-9: need >= 9 contiguous ring pixels brighter/darker


def _shift2d(img, dy: int, dx: int):
    """Shift image content by (dy, dx) with zero fill (borders are masked
    out downstream anyway)."""
    h, w = img.shape[-2:]
    out = jnp.roll(img, shift=(dy, dx), axis=(-2, -1))
    return out


def fast_score_map(img, threshold: float):
    """Dense FAST-9/16 corner score. img: (H, W) float32 -> (H, W) float32.

    Score is the sum over ring pixels of |I_ring - I_c| - t for the dominant
    polarity (bright or dark), zero where the contiguous-arc test fails —
    a smooth, rank-stable variant of OpenCV's max-threshold score.
    """
    center = img
    ring = jnp.stack(
        [_shift2d(img, -int(dy), -int(dx)) for dy, dx in RING_OFFSETS], axis=0
    )  # ring[i][y,x] = img[y+dy, x+dx]
    diff = ring - center[None]
    bright = diff > threshold
    dark = diff < -threshold

    def arc_ok(mask):
        # contiguous run of ARC_LEN among 16 (cyclic): AND of 9 cyclically
        # shifted masks, OR over the 16 start positions.
        acc = jnp.zeros_like(mask[0], dtype=bool)
        for s in range(16):
            run = mask[s]
            for j in range(1, ARC_LEN):
                run = run & mask[(s + j) % 16]
            acc = acc | run
        return acc

    is_bright = arc_ok(bright)
    is_dark = arc_ok(dark)
    sb = jnp.sum(jnp.where(bright, diff - threshold, 0.0), axis=0)
    sd = jnp.sum(jnp.where(dark, -diff - threshold, 0.0), axis=0)
    score = jnp.maximum(jnp.where(is_bright, sb, 0.0), jnp.where(is_dark, sd, 0.0))
    return score


def nms3(score):
    """3x3 non-maximum suppression; keeps strict local maxima."""
    import jax

    m = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where(score >= m, score, 0.0)


def border_mask(h: int, w: int, margin: int):
    """(h, w) bool mask, False within `margin` of the border — replaces the
    reference's EDGE_THRESHOLD=19 border handling (`src/ORBextractor.cc:72`)."""
    import jax

    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return (ys >= margin) & (ys < h - margin) & (xs >= margin) & (xs < w - margin)


def fast_dual_threshold(img, th_high: float, th_low: float, margin: int,
                        high_bonus: float = 1e6, return_raw: bool = False):
    """NMS'd corner score preferring high-threshold corners.

    Low-threshold responses are kept but ranked strictly below any
    high-threshold response via an additive bonus — the data-parallel
    equivalent of the 20 -> 7 per-cell fallback in
    `ComputeKeyPointsOctTree` (`src/ORBextractor.cc:790-810`).

    With `return_raw`, also returns the pre-NMS low-threshold score map
    (sub-pixel refinement needs un-suppressed neighbors).
    """
    s_low = fast_score_map(img, th_low)
    s_high = fast_score_map(img, th_high)
    score = jnp.where(s_high > 0.0, s_low + high_bonus, s_low)
    score = nms3(score)
    h, w = img.shape
    out = jnp.where(border_mask(h, w, margin), score, 0.0)
    if return_raw:
        return out, s_low
    return out
