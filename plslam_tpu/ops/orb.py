"""Oriented binary descriptors: IC-angle orientation + steered binary tests.

TPU-native counterpart of `IC_Angle` (`src/ORBextractor.cc:77-104`) and
`computeOrbDescriptor` (`:108-147`).

Design note (what makes this fast on TPU): arbitrary per-keypoint pixel
access is the enemy — XLA lowers element gathers at ~150M elem/s and
vmapped `dynamic_slice` to a serial DMA loop (~2us/keypoint), which made
descriptor sampling the hottest stage of the whole frame. Both are replaced
by an 8x8-tile decomposition: the image is laid out as (H/8*W/8, 64) tile
rows once per frame, each keypoint fetches the 5x5 tile block covering its
patch with ONE row gather (row gathers are near-bandwidth on TPU), and all
per-pixel addressing after that is dense vector/matrix arithmetic:

- IC angle: moments of the 40x40 tile-aligned patch against iota-built
  circular masks (pure VPU).
- Descriptor: the keypoint angle is quantized to 30 bins of 12 deg (the
  quantization proposed with rBRIEF; the reference's rotation histogram
  uses the same 30-bin resolution, `src/ORBmatcher.cc:37-39`) and all 256
  comparisons for ALL bins evaluate as one (K, 961) @ (961, 30*256) +/-1
  matmul on the MXU; the keypoint's bin is then selected with a tiny
  einsum. Integer-valued images make the bf16 matmul exact (values <= 255
  and each column has exactly one +1 and one -1).

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
N_ANGLE_BINS = 30        # 12 deg bins (rBRIEF quantization)
TILE = 8
PATCH40 = 40             # 5x5 tiles cover a 31x31 patch at any 8-alignment


def _make_pattern(seed: int = 20260816) -> np.ndarray:
    """(256, 4) int32 [ax, ay, bx, by] Gaussian test pattern."""
    rng = np.random.default_rng(seed)
    sigma = 31.0 / 5.0
    pts = np.clip(np.round(rng.normal(0.0, sigma, size=(DESC_BITS, 4))),
                  -PATTERN_CLIP, PATTERN_CLIP).astype(np.int32)
    return pts


def _load_learned_pattern() -> np.ndarray:
    """rBRIEF-style decorrelated pattern trained by
    `scripts/learn_pattern.py` on this pipeline's own steered patches
    (held-out rendered scenes — NOT the evaluation seeds, and NOT the
    reference's bit_pattern_31_ table). Falls back to the Gaussian pattern
    if the artifact is absent."""
    import os
    p = os.path.join(os.path.dirname(__file__), "learned_pattern.npy")
    if os.path.exists(p):
        return np.load(p).astype(np.int32)
    return _make_pattern()


PATTERNS = {"gauss": _make_pattern(), "learned": _load_learned_pattern()}
PATTERN = PATTERNS["gauss"]   # back-compat alias (tests/offline tools)


def _binned_test_matrix(pattern: np.ndarray) -> np.ndarray:
    """(961, N_ANGLE_BINS*256) float32 +/-1 sampling matrix: column (b, i)
    has +1 at the bin-b-rotated B position of pair i and -1 at A, so
    patch @ M = I(B_rot) - I(A_rot) for every bin at once; bit = diff > 0."""
    M = np.zeros((31 * 31, N_ANGLE_BINS * DESC_BITS), np.float32)
    for b in range(N_ANGLE_BINS):
        th = 2.0 * np.pi * b / N_ANGLE_BINS
        c, s = np.cos(th), np.sin(th)
        for which, sign in ((0, -1.0), (2, +1.0)):  # A -> -1, B -> +1
            px = pattern[:, which].astype(np.float64)
            py = pattern[:, which + 1].astype(np.float64)
            rx = np.clip(np.round(px * c - py * s), -HALF_PATCH, HALF_PATCH)
            ry = np.clip(np.round(px * s + py * c), -HALF_PATCH, HALF_PATCH)
            p = ((ry + HALF_PATCH) * 31 + (rx + HALF_PATCH)).astype(np.int64)
            M[p, b * DESC_BITS + np.arange(DESC_BITS)] += sign
    return M


_BIN_M_NP: dict = {}


def _bin_matrix(pattern: str = "gauss"):
    # cache the HOST array only: caching a jnp value would capture a tracer
    # when first touched inside a jit trace
    if pattern not in _BIN_M_NP:
        _BIN_M_NP[pattern] = _binned_test_matrix(
            PATTERNS[pattern]).astype(np.float32)
    return jnp.asarray(_BIN_M_NP[pattern], jnp.bfloat16)


# ----------------------------------------------------------------------
# Tile-gather primitives
# ----------------------------------------------------------------------

def image_tiles(img):
    """(H, W) -> ((T, 64) tile rows, padded H, padded W). Zero pad to
    multiples of TILE; tile t = (ty * (Wp/8) + tx) holds the 8x8 block."""
    h, w = img.shape
    hp = -(-h // TILE) * TILE
    wp = -(-w // TILE) * TILE
    if (hp, wp) != (h, w):
        img = jnp.pad(img, ((0, hp - h), (0, wp - w)))
    t = img.reshape(hp // TILE, TILE, wp // TILE, TILE)
    return t.transpose(0, 2, 1, 3).reshape(-1, TILE * TILE), hp, wp


def gather_patches40(img, uv):
    """Fetch 8-aligned (K, 40, 40) patches covering the 31x31 neighborhoods
    of integer keypoints via one tile-row gather.

    Returns (patches, oy, ox) where (oy, ox) locate the patch's 31x31
    logical window: patch[oy + r, ox + c] = img[y - 15 + r, x - 15 + c]."""
    tiles, hp, wp = image_tiles(img)
    ntx = wp // TILE
    x = uv[:, 0].astype(jnp.int32)
    y = uv[:, 1].astype(jnp.int32)
    yq = jnp.clip((y - HALF_PATCH) & ~(TILE - 1), 0, hp - PATCH40)
    xq = jnp.clip((x - HALF_PATCH) & ~(TILE - 1), 0, wp - PATCH40)
    oy = jnp.clip(y - HALF_PATCH - yq, 0, PATCH40 - 31)
    ox = jnp.clip(x - HALF_PATCH - xq, 0, PATCH40 - 31)
    d = jnp.arange(5)
    ti = ((yq[:, None, None] // TILE + d[None, :, None]) * ntx
          + (xq[:, None, None] // TILE + d[None, None, :]))   # (K, 5, 5)
    g = tiles[ti.reshape(-1)]                                  # (K*25, 64)
    k = uv.shape[0]
    p = g.reshape(k, 5, 5, TILE, TILE).transpose(0, 1, 3, 2, 4)
    return p.reshape(k, PATCH40, PATCH40), oy, ox


def tile_sample_nearest(tiles_and_shape, xs, ys):
    """Nearest-pixel sampling of arbitrary positions from tiled image(s).

    `tiles_and_shape` = (tiles (T, 64*C), hp, wp) from `image_tiles` of one
    image or a channel-concatenated pair; xs/ys any shape of float pixel
    coords. Returns samples of shape xs.shape (+ (C,) if C > 1): one row
    gather + an iota one-hot contraction instead of element gathers."""
    tiles, hp, wp = tiles_and_shape
    ntx = wp // TILE
    c = tiles.shape[1] // (TILE * TILE)
    shp = xs.shape
    xi = jnp.clip(xs.astype(jnp.int32), 0, wp - 1).reshape(-1)
    yi = jnp.clip(ys.astype(jnp.int32), 0, hp - 1).reshape(-1)
    ti = (yi // TILE) * ntx + (xi // TILE)
    rows = tiles[ti]                                   # (S, 64*C)
    o = (yi % TILE) * TILE + (xi % TILE)               # (S,)
    sel = (jnp.arange(TILE * TILE)[None, :] == o[:, None]).astype(rows.dtype)
    if c == 1:
        return jnp.sum(rows * sel, axis=-1).reshape(shp)
    vals = jnp.einsum("sco,so->sc", rows.reshape(-1, c, TILE * TILE), sel)
    return vals.reshape(shp + (c,))


def pack_tiles_pair(im_a, im_b):
    """Tile two same-shape images into one (T, 128) row array so ONE gather
    fetches both channels (used for gx/gy sampling in the line descriptor)."""
    ta, hp, wp = image_tiles(im_a)
    tb, _, _ = image_tiles(im_b)
    return jnp.concatenate([ta, tb], axis=1), hp, wp


# ----------------------------------------------------------------------
# IC angle + steered descriptor
# ----------------------------------------------------------------------

def _window_grids(oy, ox):
    """Per-keypoint (K, 40) dy/dx coordinate grids relative to the keypoint
    center, given the 31x31 window offset inside the 40x40 patch."""
    i40 = jnp.arange(PATCH40, dtype=jnp.int32)
    dy = i40[None, :] - oy[:, None] - HALF_PATCH     # (K, 40)
    dx = i40[None, :] - ox[:, None] - HALF_PATCH
    return dy, dx


def ic_angle(img, uv):
    """Intensity-centroid orientation for keypoints. Returns (K,) radians.

    cf `IC_Angle` (`src/ORBextractor.cc:77`): angle = atan2(m01, m10) over a
    radius-15 circular patch. Moments are masked sums over the tile-aligned
    patch — no per-pixel gathers."""
    patches, oy, ox = gather_patches40(img, uv)       # (K, 40, 40)
    dy, dx = _window_grids(oy, ox)
    r2 = (dy * dy)[:, :, None] + (dx * dx)[:, None, :]
    mask = (r2 <= HALF_PATCH * HALF_PATCH).astype(img.dtype)
    wp = patches * mask
    m10 = jnp.sum(wp * dx[:, None, :], axis=(1, 2))
    m01 = jnp.sum(wp * dy[:, :, None], axis=(1, 2))
    return jnp.arctan2(m01, m10)


def steered_descriptor(img_blur, uv, angle, pattern: str = "gauss"):
    """256-bit steered binary descriptor. Returns (K, 256) uint8 bits.

    cf `computeOrbDescriptor` (`src/ORBextractor.cc:108`): pattern points
    rotated by the keypoint angle (quantized to 12-deg bins, see module
    docstring), sampled nearest from the blurred image, bit = I(a) < I(b).
    Evaluated as one MXU matmul over all bins + a bin-select einsum."""
    k = uv.shape[0]
    patches, oy, ox = gather_patches40(img_blur, uv)  # (K, 40, 40)
    # integer-valued images keep the bf16 pipeline exact (<= 255, and the
    # matmul output I(b) - I(a) stays an integer in [-255, 255])
    p40 = jnp.round(patches).astype(jnp.bfloat16)

    # select the 31x31 window: two batched one-hot contractions (y then x)
    i40 = jnp.arange(PATCH40, dtype=jnp.int32)
    i31 = jnp.arange(31, dtype=jnp.int32)
    sel_y = (i40[None, None, :] == oy[:, None, None] + i31[None, :, None]
             ).astype(jnp.bfloat16)                   # (K, 31, 40)
    sel_x = (i40[None, None, :] == ox[:, None, None] + i31[None, :, None]
             ).astype(jnp.bfloat16)                   # (K, 31, 40)
    t = jnp.einsum("kyx,kzy->kzx", p40, sel_y)        # (K, 31, 40)
    p31 = jnp.einsum("kzx,kcx->kzc", t, sel_x)        # (K, 31, 31)

    diffs = jax.lax.dot(p31.reshape(k, 31 * 31), _bin_matrix(pattern),
                        preferred_element_type=jnp.bfloat16)   # (K, 30*256)
    step = 2.0 * jnp.pi / N_ANGLE_BINS
    b = jnp.floor(jnp.mod(angle, 2.0 * jnp.pi) / step + 0.5
                  ).astype(jnp.int32) % N_ANGLE_BINS
    onehot = (jnp.arange(N_ANGLE_BINS)[None, :] == b[:, None]
              ).astype(jnp.bfloat16)                  # (K, 30)
    d = jnp.einsum("kbi,kb->ki", diffs.reshape(k, N_ANGLE_BINS, DESC_BITS),
                   onehot)
    return (d > 0).astype(jnp.uint8)


def gather_patches(img, uv, radius: int):
    """Gather (K, 2r+1, 2r+1) patches centered at integer keypoints (exact
    variant used by tests/offline tools; the hot paths use
    `gather_patches40`)."""
    h, w = img.shape
    size = 2 * radius + 1
    x0 = jnp.clip(uv[:, 0].astype(jnp.int32) - radius, 0, w - size)
    y0 = jnp.clip(uv[:, 1].astype(jnp.int32) - radius, 0, h - size)

    def one(y, x):
        return jax.lax.dynamic_slice(img, (y, x), (size, size))

    return jax.vmap(one)(y0, x0)


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
