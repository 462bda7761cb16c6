"""Oriented binary descriptors: IC-angle orientation + steered binary tests.

TPU-native counterpart of `IC_Angle` (`src/ORBextractor.cc:77-104`) and
`computeOrbDescriptor` (`:108-147`).  Patches for all keypoints of a level
are gathered at once and the 256 binary tests evaluate as a batched gather +
compare — no per-keypoint host loop.

The 256-pair sampling pattern is our own deterministic Gaussian pattern
(generated from a fixed seed, sigma = patch/5, the construction from the
BRIEF paper). The reference uses OpenCV's learned `bit_pattern_31_` table
(`src/ORBextractor.cc:150-408`); any fixed well-spread pattern yields
equivalent matching behavior *within* a self-consistent pipeline, which is
all the system requires (descriptors never cross implementations).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

HALF_PATCH = 15          # IC-angle circular patch radius (reference: 15)
DESC_BITS = 256
PATTERN_CLIP = 13        # pattern coords in [-13, 13] like bit_pattern_31_
SAMPLE_RADIUS = 19       # max |rotated offset| = ceil(13*sqrt(2)) -> 19
PATCH = 2 * SAMPLE_RADIUS + 1


def _make_pattern(seed: int = 20260816) -> np.ndarray:
    """(256, 4) int32 [ax, ay, bx, by] Gaussian test pattern."""
    rng = np.random.default_rng(seed)
    sigma = 31.0 / 5.0
    pts = np.clip(np.round(rng.normal(0.0, sigma, size=(DESC_BITS, 4))),
                  -PATTERN_CLIP, PATTERN_CLIP).astype(np.int32)
    return pts


PATTERN = _make_pattern()

# Circular-patch mask for IC angle (radius HALF_PATCH), plus coordinate grids.
_yy, _xx = np.mgrid[-HALF_PATCH:HALF_PATCH + 1, -HALF_PATCH:HALF_PATCH + 1]
_CIRC_MASK = (_yy * _yy + _xx * _xx <= HALF_PATCH * HALF_PATCH).astype(np.float32)
_IC_X = (_xx * _CIRC_MASK).astype(np.float32)
_IC_Y = (_yy * _CIRC_MASK).astype(np.float32)


def gather_patches(img, uv, radius: int):
    """Gather (K, 2r+1, 2r+1) patches centered at integer keypoints.

    uv: (K, 2) float (x, y). Start indices are clamped so gathers stay in
    bounds (selection already enforces a border margin)."""
    h, w = img.shape
    size = 2 * radius + 1
    x0 = jnp.clip(uv[:, 0].astype(jnp.int32) - radius, 0, w - size)
    y0 = jnp.clip(uv[:, 1].astype(jnp.int32) - radius, 0, h - size)

    def one(y, x):
        return jax.lax.dynamic_slice(img, (y, x), (size, size))

    return jax.vmap(one)(y0, x0)


def ic_angle(img, uv):
    """Intensity-centroid orientation for keypoints. Returns (K,) radians.

    cf `IC_Angle` (`src/ORBextractor.cc:77`): angle = atan2(m01, m10) over a
    radius-15 circular patch."""
    patches = gather_patches(img, uv, HALF_PATCH)  # (K, 31, 31)
    m10 = jnp.einsum("kij,ij->k", patches, jnp.asarray(_IC_X))
    m01 = jnp.einsum("kij,ij->k", patches, jnp.asarray(_IC_Y))
    return jnp.arctan2(m01, m10)


def steered_descriptor(img_blur, uv, angle):
    """256-bit steered binary descriptor. Returns (K, 256) uint8 bits.

    cf `computeOrbDescriptor` (`src/ORBextractor.cc:108`): pattern points are
    rotated by the keypoint angle, sampled (nearest) from the blurred image,
    bit = I(p_a) < I(p_b).

    Samples gather DIRECTLY from the flattened image (K x 512 elements)
    instead of extracting K 39x39 patches first (K x 1521 elements) — the
    patch variant was the single hottest stage of extraction on TPU."""
    h, w = img_blur.shape
    flat = img_blur.reshape(-1)
    k = uv.shape[0]
    x0 = uv[:, 0].astype(jnp.int32)
    y0 = uv[:, 1].astype(jnp.int32)

    pat = jnp.asarray(PATTERN, jnp.float32)  # (256, 4)
    c, s = jnp.cos(angle), jnp.sin(angle)    # (K,)

    def sample(px, py):
        rx = jnp.round(px[None, :] * c[:, None] - py[None, :] * s[:, None]).astype(jnp.int32)
        ry = jnp.round(px[None, :] * s[:, None] + py[None, :] * c[:, None]).astype(jnp.int32)
        X = jnp.clip(x0[:, None] + rx, 0, w - 1)
        Y = jnp.clip(y0[:, None] + ry, 0, h - 1)
        return flat[(Y * w + X).reshape(-1)].reshape(k, -1)

    ia = sample(pat[:, 0], pat[:, 1])
    ib = sample(pat[:, 2], pat[:, 3])
    return (ia < ib).astype(jnp.uint8)


def pack_bits(bits):
    """(..., 256) {0,1} -> (..., 32) uint8 packed descriptor."""
    b = bits.reshape(bits.shape[:-1] + (32, 8))
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    return jnp.sum(b * weights, axis=-1).astype(jnp.uint8)


def unpack_bits(packed):
    """(..., 32) uint8 -> (..., 256) {0,1} uint8."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts) & 1
    return bits.reshape(packed.shape[:-1] + (256,)).astype(jnp.uint8)
