"""Hamming distance search on the MXU.

TPU-native replacement for `ORBmatcher::DescriptorDistance` popcount loops
(`src/ORBmatcher.cc:1764-1780`) and every grid-/BoW-/window-restricted
Hamming search in `ORBmatcher`/`LSDmatcher`: with descriptors as ±1 int8
vectors, ``hamming(a, b) = (256 - a . b) / 2``, so an entire NxM distance
matrix is ONE int8 matmul on the systolic array.  Search windows, octave
gates and rotation-histogram checks become additive masks on the distance
matrix instead of data structures.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

INVALID = jnp.int32(1 << 20)  # sentinel distance for masked pairs


def bits_to_pm1(bits):
    """(..., 256) {0,1} -> (..., 256) int8 in {-1, +1}."""
    return (bits.astype(jnp.int8) * 2 - 1).astype(jnp.int8)


def distance_matrix(bits_q, bits_d):
    """All-pairs Hamming distances.

    bits_q: (N, 256) {0,1}; bits_d: (M, 256) {0,1} -> (N, M) int32 in
    [0, 256]. One int8 matmul: popcount(a XOR b) = (256 - pm(a).pm(b)) / 2.
    """
    a = bits_to_pm1(bits_q)
    b = bits_to_pm1(bits_d)
    dot = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (256 - dot) >> 1


def masked_best2(dist, mask):
    """Best and second-best match per query row under a validity mask.

    dist: (N, M) int32; mask: (N, M) bool (True = pair allowed).
    Returns (best_idx (N,), best (N,), second (N,)) where disallowed pairs
    are INVALID. Implements the NN + NN-ratio machinery used across
    `ORBmatcher` (e.g. `SearchForInitialization`, `src/ORBmatcher.cc:455`).
    """
    d = jnp.where(mask, dist, INVALID)
    best_idx = jnp.argmin(d, axis=1)
    best = jnp.take_along_axis(d, best_idx[:, None], axis=1)[:, 0]
    d2 = d.at[jnp.arange(d.shape[0]), best_idx].set(INVALID)
    second = jnp.min(d2, axis=1)
    return best_idx, best, second


def mutual_best(dist, mask):
    """Mutual-nearest-neighbor mask — the bidirectional consistency check of
    `LSDmatcher::FrameBFMatch` (`src/LSDmatcher.cpp:462-486`).

    Returns (match_idx (N,), best (N,), second (N,), mutual (N,) bool)."""
    best_idx, best, second = masked_best2(dist, mask)
    dT = jnp.where(mask, dist, INVALID).T
    rev_idx = jnp.argmin(dT, axis=1)  # (M,)
    mutual = rev_idx[best_idx] == jnp.arange(dist.shape[0])
    return best_idx, best, second, mutual


def dedup_by_target(idx, matched, best, n_targets: int):
    """Make a per-query match set INJECTIVE over targets: when several
    queries matched the same target, keep only the one with the smallest
    distance (ties -> lowest query index), drop the rest.

    The reference's projection searches iterate LANDMARKS and assign each
    its single best keypoint (`ORBmatcher::SearchByProjection`,
    `src/ORBmatcher.cc:56-144`), so a MapPoint never acquires two
    observations in one frame. A per-query argmin (the matmul formulation)
    is many-to-one: measured on the photo head-to-head, 47% of (keyframe,
    point) pairs carried >= 2 keypoint bindings — duplicate residuals
    double-weight those landmarks in pose opt / BA with conflicting pixels
    (usually the same corner at two pyramid levels, one of them coarse).

    idx: (N,) target index per query; matched: (N,) bool; best: (N,)
    distances. Returns the deduplicated `matched` mask."""
    n = idx.shape[0]
    # mask BEFORE the multiply: unmatched lanes carry best=INVALID (2^20),
    # whose int32 product with n would wrap for n > 2047 (ADVICE r3)
    key = jnp.where(matched, best, 0).astype(jnp.int32) * n \
        + jnp.arange(n, dtype=jnp.int32)
    big = jnp.int32(2 ** 30)
    tgt_best = jnp.full((n_targets,), big, jnp.int32).at[
        jnp.where(matched, idx, n_targets)].min(
        jnp.where(matched, key, big), mode="drop")
    return matched & (key == tgt_best[jnp.clip(idx, 0, n_targets - 1)])


def rotation_histogram_mask(dangle, matched, n_bins: int = 30, n_keep: int = 3,
                            keep_frac: float = 0.1):
    """Rotation-consistency filter, cf `ORBmatcher::ComputeThreeMaxima`
    (`src/ORBmatcher.cc:1718-1762`).

    dangle: (N,) angle differences in radians for candidate matches;
    matched: (N,) bool. Keeps matches falling in the top-3 histogram bins
    (2nd/3rd only if >= keep_frac * max)."""
    two_pi = 2.0 * jnp.pi
    a = jnp.mod(dangle, two_pi)
    bin_idx = jnp.clip((a / two_pi * n_bins).astype(jnp.int32), 0, n_bins - 1)
    hist = jnp.zeros((n_bins,), jnp.int32).at[bin_idx].add(matched.astype(jnp.int32))
    top_vals, top_idx = jax.lax.top_k(hist, n_keep)
    # reference: 2nd/3rd bins dropped if < keep_frac * max (src/ORBmatcher.cc:1750)
    keep = top_vals.astype(jnp.float32) >= keep_frac * top_vals[0].astype(jnp.float32)
    keep = keep & (top_vals > 0)
    allowed = jnp.zeros((n_bins,), bool).at[top_idx].set(keep)
    return matched & allowed[bin_idx]


def hamming_nn_match(bits_q, bits_d, mask=None, max_dist: int = 50,
                     nn_ratio: float = 1.0):
    """One-call NN matcher with distance + ratio gates.

    Returns (idx (N,), ok (N,) bool, best (N,)). TH_LOW/TH_HIGH and ratio
    defaults live at call sites, mirroring the reference's per-use constants
    (`src/ORBmatcher.cc:37-39`, SURVEY appendix A)."""
    dist = distance_matrix(bits_q, bits_d)
    if mask is None:
        mask = jnp.ones(dist.shape, bool)
    idx, best, second = masked_best2(dist, mask)
    ok = (best <= max_dist) & (
        best.astype(jnp.float32) <= nn_ratio * second.astype(jnp.float32)
    )
    return idx, ok, best


def vector_mad(x, valid, scale: float = 1.4826):
    """Scaled median absolute deviation over the masked entries — the
    reference's `vector_mad` (`include/auxiliar.h`, used by the line
    matcher's adaptive gap gate, `src/LSDmatcher.cpp:474-484`).

    Returns 0 when fewer than 2 entries are valid (gate then passes
    trivially, like the reference's empty-vector fallback)."""
    xf = jnp.where(valid, x.astype(jnp.float32), jnp.nan)
    med = jnp.nanmedian(xf)
    mad = jnp.nanmedian(jnp.abs(xf - med))
    return jnp.where(jnp.sum(valid.astype(jnp.int32)) >= 2,
                     scale * jnp.nan_to_num(mad), 0.0)
