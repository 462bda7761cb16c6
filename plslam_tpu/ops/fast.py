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


def _arc_ok(mask):
    """Cyclic contiguous-run-of-ARC_LEN test over the 16-mask ring via
    pointer doubling: run lengths 2 -> 4 -> 8 -> 9 in log steps (64 ANDs
    instead of the naive 16x8=128), then OR over start positions."""
    # r_k[s] = AND of mask[s..s+k-1] (cyclic)
    r2 = [mask[s] & mask[(s + 1) % 16] for s in range(16)]
    r4 = [r2[s] & r2[(s + 2) % 16] for s in range(16)]
    r8 = [r4[s] & r4[(s + 4) % 16] for s in range(16)]
    assert ARC_LEN == 9
    r9 = [r8[s] & mask[(s + 8) % 16] for s in range(16)]
    acc = r9[0]
    for s in range(1, 16):
        acc = acc | r9[s]
    return acc


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

    is_bright = _arc_ok(list(bright))
    is_dark = _arc_ok(list(dark))
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

    The ring-difference stack is computed ONCE and shared by both thresholds
    and both polarities (it is the dominant HBM traffic of extraction); the
    high threshold only contributes its arc-test flag — its score value is
    never used, so its polarity sums are skipped entirely.
    """
    ring = jnp.stack(
        [_shift2d(img, -int(dy), -int(dx)) for dy, dx in RING_OFFSETS], axis=0)
    diff = ring - img[None]

    bright_lo = diff > th_low
    dark_lo = diff < -th_low
    is_bright_lo = _arc_ok(list(bright_lo))
    is_dark_lo = _arc_ok(list(dark_lo))
    sb = jnp.sum(jnp.where(bright_lo, diff - th_low, 0.0), axis=0)
    sd = jnp.sum(jnp.where(dark_lo, -diff - th_low, 0.0), axis=0)
    s_low = jnp.maximum(jnp.where(is_bright_lo, sb, 0.0),
                        jnp.where(is_dark_lo, sd, 0.0))

    # high-threshold arc flag only (its numeric score is unused)
    hi = _arc_ok([d > th_high for d in diff]) | _arc_ok(
        [d < -th_high for d in diff])
    score = jnp.where(hi & (s_low > 0.0), s_low + high_bonus, s_low)
    score = nms3(score)
    h, w = img.shape
    out = jnp.where(border_mask(h, w, margin), score, 0.0)
    if return_raw:
        return out, s_low
    return out
